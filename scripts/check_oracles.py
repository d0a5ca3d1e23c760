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


def spark_type_class(dt) -> str:
    """Collapse a Spark DataType to a coarse class comparable with DuckDB's."""
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "i64"
    if s in ("float", "double"):
        return "f"
    if s.startswith("decimal"):
        return "dec"
    if s in ("timestamp", "timestamp_ntz"):
        return "ts"
    return s.split("(")[0].split("<")[0]


def duck_type_class(t) -> str:
    """Collapse a DuckDB type to the same coarse class. HUGEINT deliberately
    maps to its own class: DuckDB sum(BIGINT) -> HUGEINT is the root cause of
    every round-1 driver hash mismatch, and the driver's compare is
    type-sensitive where fetchall() (plain Python ints) is not."""
    s = str(t).upper()
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "i64"
    if s in ("HUGEINT", "UHUGEINT", "UBIGINT"):
        return "i128"
    if s in ("FLOAT", "REAL", "DOUBLE"):
        return "f"
    if s.startswith("DECIMAL"):
        return "dec"
    if s == "VARCHAR":
        return "string"
    if s.startswith("TIMESTAMP"):
        return "ts"
    if s == "BOOLEAN":
        return "boolean"
    if s == "BLOB":
        return "binary"
    return s.split("(")[0].split("<")[0].lower()


def value_hash(cols, rows, type_classes=None):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    if type_classes is not None:
        header = "|".join(f"{cols[i]}:{type_classes[i]}" for i in order)
        h.update(header.encode())
        h.update(b"\n")
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
    # the generated pinned oracles are the strongest gates — a missing
    # pinned_oracles.py must FAIL here, not silently downgrade those
    # queries to rows-only checks
    from gen_pinned_oracles import PINNED
    for q in PINNED:
        if q not in oracles:
            failures.append((q, "pinned oracle missing — regenerate "
                                "pinned_oracles.py"))
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
        dtypes = [duck_type_class(t) for t in rel.types]
        drows = rel.fetchall()
        stypes = [spark_type_class(f.dataType) for f in sdf.schema.fields]
        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sh = value_hash(scols, srows, stypes)
        dh = value_hash(dcols, drows, dtypes)
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
                spairs = sorted(zip(scols, stypes))
                dpairs = sorted(zip(dcols, dtypes))
                if spairs != dpairs:
                    print("    type mismatch — spark:", spairs, "duck:", dpairs)
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
