"""Multimodal binary-column tests: synthetic FIMG/FAUD blobs through Arrow
batches; decode/resize/frame-sample metadata must match the closed forms."""
import os
import sys

import pytest
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from htmlparser_spark import multimodal as mm


@pytest.fixture(scope="module")
def spark():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    s = (SparkSession.builder.master("local[2]")
         .appName("htmlparser-multimodal-tests")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .config("spark.executorEnv.PYTHONPATH", root)
         .getOrCreate())
    yield s
    s.stop()


def test_blob_roundtrip_local():
    kind, blob = mm.make_blob(6)
    assert kind == "image"
    w, h, c, plen = mm._decode_image_blob(blob)
    assert (w, h, c) == mm.image_dims(6)
    assert plen == min(w * h * c, mm.PAYLOAD_CAP)
    kind, blob = mm.make_blob(7)
    assert kind == "audio"
    sr, ns, plen = mm._decode_audio_blob(blob)
    assert (sr, ns) == mm.audio_params(7)
    assert plen == min(ns * 2, mm.PAYLOAD_CAP)


def test_media_decode_spark(spark):
    rows = {r.media_id: r for r in mm.media_decode(spark, 50).collect()}
    assert len(rows) == 50
    for mid, r in rows.items():
        if mid % 2 == 0:
            assert r.kind == "image"
            assert (r.width, r.height, r.channels) == mm.image_dims(mid)
            assert r.sample_rate is None
        else:
            assert r.kind == "audio"
            assert (r.sample_rate, r.n_samples) == mm.audio_params(mid)
            assert r.width is None


def test_image_resize_dims(spark):
    rows = mm.image_resize(spark, 40).collect()
    assert rows and all(r.media_id % 2 == 0 for r in rows)
    for r in rows:
        w, h, c = mm.image_dims(r.media_id)
        assert (r.out_w, r.out_h, r.channels) == (w // 2, h // 2, c)
        plen = min(w * h * c, mm.PAYLOAD_CAP)
        assert r.out_len == min((plen + 3) // 4, r.out_w * r.out_h * c)


def test_audio_frames_cover_samples(spark):
    rows = mm.audio_frame_sample(spark, 40).collect()
    assert rows and all(r.media_id % 2 == 1 for r in rows)
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    for mid, frames in by_id.items():
        _sr, ns = mm.audio_params(mid)
        assert len(frames) == (ns - 1) // mm.FRAME_STRIDE + 1
        idxs = sorted(f.frame_idx for f in frames)
        assert idxs == list(range(len(frames)))


def test_feature_vectors_deterministic(spark):
    a = {r.media_id: r.feature for r in mm.media_feature_vector(spark, 20).collect()}
    b = {r.media_id: r.feature for r in mm.media_feature_vector(spark, 20).collect()}
    assert a == b
    assert all(len(v) == mm.FEATURE_DIM for v in a.values())
    assert all(-0.5 <= x <= 0.5 for v in a.values() for x in v)


def test_pdf_text_round_trip(spark):
    rows = mm.pdf_text_extract(spark, 30).collect()
    # one row per page, n_pages = 1 + doc_id % 5
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(range(30))
    for did, pages in by_doc.items():
        assert len(pages) == 1 + did % 5
        for p in pages:
            assert p.text == mm._pdf_page_text(did, p.page_no)
            assert p.n_words == 10 + (did + p.page_no) % 20
            assert p.n_chars == len(p.text)


def test_pdf_decode_rejects_bad_magic():
    import pytest as _pytest
    with _pytest.raises(ValueError):
        mm._decode_pdf_blob(b"NOPE" + b"\x00" * 8)


def test_video_frames_sample_every_8th(spark):
    rows = mm.video_frame_sample(spark, 30).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == set(range(30))
    for mid, frames in by_id.items():
        _w, _h, fps, nf = mm.video_params(mid)
        assert len(frames) == (nf - 1) // mm.VIDEO_SAMPLE_EVERY + 1
        for r in sorted(frames, key=lambda x: x.frame_idx):
            f = r.frame_idx * mm.VIDEO_SAMPLE_EVERY
            assert r.ts_ms == (f * 1000) // fps
            assert r.frame_bytes == (16 if f < min(nf, mm.VIDEO_PAYLOAD_FRAMES)
                                     else 0)
