"""JSONL shard sink + reader — the de-facto LLM training-data delivery
format (one JSON object per line, gzip shards, a manifest of shard paths).

Same execution shape as the WET sink (warc.py): ONE TASK = ONE SHARD,
executors write directly to the shared output filesystem, the driver only
collects a tiny (path, n_records) manifest. Shards are deterministic —
keys sorted, compact separators, gzip mtime=0 — so a speculative or
retried task attempt renaming over a previous attempt's shard is
byte-identical, and the write-then-rename is atomic on POSIX.

Type mapping (schema-driven, strict): string/bool/int/float pass through;
timestamp → ISO 8601 UTC string; binary → base64 string. Nested types are
rejected up front with the real cause — flatten or json-encode them first
(training shards carry scalars).
"""
from __future__ import annotations

import base64
import datetime as _dt
import gzip
import io
import json
import os
from typing import Iterator

import pandas as pd

_SIMPLE = {"string", "boolean", "tinyint", "smallint", "int", "bigint",
           "float", "double"}
_INTS = {"tinyint", "smallint", "int", "bigint"}


def _check_schema(schema):
    bad = [f"{f.name}:{f.dataType.simpleString()}" for f in schema.fields
           if f.dataType.simpleString() not in _SIMPLE
           and f.dataType.simpleString() not in ("timestamp", "binary")]
    if bad:
        raise ValueError(
            f"jsonl sink supports scalar columns only; offending: {bad} — "
            "flatten or json-encode nested columns first")


def _cell(v, kind: str):
    if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
        return None
    if kind == "timestamp":
        ts = v.to_pydatetime() if isinstance(v, pd.Timestamp) else v
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return ts.astimezone(_dt.timezone.utc).isoformat()
    if kind == "binary":
        return base64.b64encode(bytes(v)).decode("ascii")
    if kind in _INTS:
        # a batch holding any null promotes the pandas column to float64;
        # serialize the surviving values as ints regardless of batch shape
        return int(v)
    if isinstance(v, (bool, int, float, str)):
        return v
    return v.item() if hasattr(v, "item") else v  # numpy scalars


def write_jsonl(df, out_dir: str) -> list:
    """Distributed JSONL sink: each task writes its partition as one
    ``part-NNNNN.jsonl.gz`` shard. Returns [(path, n_records), ...]."""
    from pyspark import TaskContext

    _check_schema(df.schema)
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    cols = list(df.columns)
    os.makedirs(out_dir, exist_ok=True)

    def w(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.jsonl.gz")
        buf = io.StringIO()
        n = 0
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                obj = {c: _cell(v, kinds[c]) for c, v in zip(cols, row)}
                buf.write(json.dumps(obj, ensure_ascii=False,
                                     sort_keys=True,
                                     separators=(",", ":")))
                buf.write("\n")
                n += 1
        if n:
            tmp = f"{path}.attempt-{TaskContext.get().attemptNumber()}.tmp"
            with open(tmp, "wb") as f:
                f.write(gzip.compress(buf.getvalue().encode("utf-8"),
                                      mtime=0))
            os.replace(tmp, path)
        yield pd.DataFrame({"path": [path if n else None],
                            "n_records": [n]})

    manifest = (df.mapInPandas(w, schema="path string, n_records long")
                .collect())
    out = [(r["path"], r["n_records"]) for r in manifest if r["path"]]
    # idempotent re-runs: drop shards a previous (wider) run left behind
    from ._shards import gc_stale_shards
    gc_stale_shards(out_dir, ".jsonl.gz", [p for p, _n in out])
    return out


def read_jsonl(spark, path: str, schema):
    """JSONL shard(s)/glob → DataFrame(schema) — one shard per task via
    binaryFile (no shuffle), inverse of write_jsonl's type mapping."""
    _check_schema(schema)
    kinds = {f.name: f.dataType.simpleString() for f in schema.fields}
    names = [f.name for f in schema.fields]

    blobs = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if p.endswith(".gz"):
                    data = gzip.decompress(data)
                for line in data.decode("utf-8").splitlines():
                    if not line:
                        continue
                    obj = json.loads(line)
                    out = []
                    for c in names:
                        v = obj.get(c)
                        if v is None:
                            out.append(None)
                        elif kinds[c] == "timestamp":
                            out.append(_dt.datetime.fromisoformat(v))
                        elif kinds[c] == "binary":
                            out.append(base64.b64decode(v))
                        else:
                            out.append(v)
                    rows.append(tuple(out))
            yield pd.DataFrame(rows, columns=names)

    return blobs.mapInPandas(split, schema=schema)
