"""Bucketed co-located join evidence: SURVEY §2.3 S10 claims bucketing
lets repeated joins on the same key skip their exchanges. This pins it:
two tables bucketed on doc_id must sort-merge join with ZERO Exchange in
the executed plan — the layout the 100 TB deployment uses for
signature/label tables that are re-joined every ingest."""
import os
import sys

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from htmlparser_spark import ops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = (SparkSession.builder.master("local[4]")
         .appName("bucketing-tests")
         .config("spark.sql.warehouse.dir", wh)
         .config("spark.sql.shuffle.partitions", "4")
         # disable broadcast so the join must prove co-location, not hide
         # behind a small-side broadcast
         .config("spark.sql.autoBroadcastJoinThreshold", "-1")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    yield s
    s.stop()


def test_bucketed_join_has_no_exchange(spark):
    docs = ops._t(spark, SF, "documents").select("doc_id", "text", "lang")
    # repartition on the bucket key first → exactly ONE file per bucket
    # (many tiny files per bucket is the classic bucketed-write mistake)
    (docs.repartition(4, "doc_id")
     .write.bucketBy(4, "doc_id").sortBy("doc_id")
     .mode("overwrite").saveAsTable("docs_bucketed_a"))
    (docs.select("doc_id", F.length("text").alias("n"))
     .repartition(4, "doc_id")
     .write.bucketBy(4, "doc_id").sortBy("doc_id")
     .mode("overwrite").saveAsTable("docs_bucketed_b"))
    a = spark.table("docs_bucketed_a")
    b = spark.table("docs_bucketed_b")
    p = (a.join(b, "doc_id")._jdf.queryExecution().executedPlan().toString())
    assert "SortMergeJoin" in p, p
    # the SHUFFLE is gone — the scale-critical property; a within-partition
    # Sort remains (Spark ignores bucket-file sort order by default:
    # spark.sql.legacy.bucketedTableScan.outputOrdering), and that sort is
    # local, spillable, and O(bucket), not a cluster-wide exchange
    assert "Exchange" not in p, p


def test_unbucketed_join_needs_exchanges(spark):
    """Control: the same join over plain parquet DOES shuffle both sides —
    the bucketing above is what removes it, not some other rewrite."""
    docs = ops._t(spark, SF, "documents").select("doc_id", "lang")
    other = ops._t(spark, SF, "documents").select(
        "doc_id", F.length("text").alias("n"))
    p = (docs.join(other, "doc_id")
         ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" in p, p
