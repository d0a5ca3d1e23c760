"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs every queries() entry at sf0.01, runs the matching oracle_sql() in
DuckDB over the same parquet, and compares row count + column names +
an order-insensitive value hash (columns sorted by name, rows sorted).

Run: python scripts/check_oracles.py [names...]
"""
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v):
    import datetime
    import math
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master("local[8]")
             .appName("oracle-check")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        spark_s = time.monotonic() - t0
        if name not in oracles:
            print(f"  {name:24s} rows-only: {len(srows)} rows  ({spark_s:.1f}s)")
            if len(srows) == 0:
                failures.append((name, "zero rows"))
            continue
        rel = con.sql(oracles[name])
        dcols = [c for c in rel.columns]
        drows = rel.fetchall()
        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sh = value_hash(scols, srows)
        dh = value_hash(dcols, drows)
        ok_hash = sh == dh
        status = "OK " if (ok_count and ok_cols and ok_hash) else "FAIL"
        print(f"  {name:24s} {status} rows {len(srows)}/{len(drows)} "
              f"cols={'=' if ok_cols else 'DIFF'} hash={'=' if ok_hash else 'DIFF'} "
              f"({spark_s:.1f}s)")
        if status == "FAIL":
            failures.append((name, f"count={ok_count} cols={ok_cols} hash={ok_hash}"))
            if not ok_cols:
                print("    spark:", sorted(scols), "duck:", sorted(dcols))
            if ok_cols and not ok_hash:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = {"|".join(norm_cell(r[i]) for i in order) for r in srows}
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dset = {"|".join(norm_cell(r[i]) for i in dorder) for r in drows}
                s_only = sorted(sset - dset)[:3]
                d_only = sorted(dset - sset)[:3]
                for x in s_only:
                    print("    spark-only:", x[:160])
                for x in d_only:
                    print("    duck-only: ", x[:160])
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
