"""Local mirror of the driver's CORRECTNESS gate: run every
__spark_entry__.queries() entry against its oracle_sql() on the same
sf parquet and compare row count + sorted-column value hash.

Usage: PYTHONPATH=/root/repo python scripts/oracle_sweep.py [sf_dir] [key ...]
"""
import hashlib
import json
import sys

import duckdb

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import __spark_entry__ as E  # noqa: E402
from columnstore_spark.session import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(str(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def norm(v):
    # match the driver's stringification closely enough for parity:
    # both sides go through str() of python objects
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for k, fn in qs.items():
        if only and k not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            cols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"{k}: SPARK ERROR {ex}")
            failures.append(k)
            continue
        if k not in oracles:
            print(f"{k}: rows-only ({len(srows)} rows)")
            continue
        try:
            ores = con.sql(oracles[k])
            ocols = ores.columns
            orows = ores.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"{k}: ORACLE ERROR {ex}")
            failures.append(k)
            continue
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(cols) == sorted(ocols)
        sh = value_hash(cols, srows)
        oh = value_hash(ocols, orows)
        ok_hash = sh == oh
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(f"{k}: {status} rows={len(srows)}/{len(orows)} "
              f"schema={ok_schema} hash={ok_hash}")
        if status == "FAIL":
            failures.append(k)
    print(json.dumps({"failures": failures}))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
