"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at a small SF, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize(r[i]) for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple(
        (v is None, str(type(v)), str(v)) for v in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from infinitycrawler_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} spark error: {str(e)[:160]}")
            failures.append(name)
            continue
        if sql is None:
            print(f"rows  {name:28s} spark={len(srows)} (no oracle — rows-only)")
            if len(srows) == 0:
                failures.append(name)
            continue
        try:
            cur = con.execute(sql)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} duckdb error: {str(e)[:160]}")
            failures.append(name)
            continue
        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sset = rows_to_set(scols, srows)
        dset = rows_to_set(dcols, drows)
        ok_vals = sset == dset
        status = "OK  " if (ok_count and ok_cols and ok_vals) else "FAIL"
        print(f"{status}  {name:28s} rows s={len(srows)} d={len(drows)} "
              f"cols={'=' if ok_cols else 'DIFF'} vals={'=' if ok_vals else 'DIFF'}")
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"      spark cols: {sorted(scols)}")
                print(f"      duck  cols: {sorted(dcols)}")
            if not ok_vals:
                sonly = [r for r in sset if r not in dset][:3]
                donly = [r for r in dset if r not in sset][:3]
                print(f"      spark-only: {sonly}")
                print(f"      duck-only : {donly}")
    print("\n==>", "ALL OK" if not failures else f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
