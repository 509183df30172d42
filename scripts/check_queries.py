"""Selective oracle check: `python scripts/check_queries.py name1 name2 ...`
runs only the named queries() entries against their oracle_sql() twins
(driver_sim's compare, scoped) — for fast iteration on new queries.
Optional env SPARK_GRAFT_SF_DIR overrides the sf0.01 default.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from scripts.driver_sim import normalize

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    names = sys.argv[1:]
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = [n for n in names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("check_queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in entrymod._TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failed = []
    for name in names:
        try:
            sdf = queries[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"{name:32s} rows-only spark={len(srows)}")
                continue
            res = con.sql(oracles[name])
            dcols, drows = res.columns, res.fetchall()
            ns, nd = normalize(srows, scols), normalize(drows, dcols)
            ok = (
                len(srows) == len(drows)
                and sorted(scols) == sorted(dcols)
                and ns == nd
            )
            print(f"{name:32s} {'OK' if ok else 'MISMATCH'} "
                  f"spark={len(srows)} oracle={len(drows)}")
            if not ok:
                failed.append(name)
                if sorted(scols) != sorted(dcols):
                    print(f"  cols spark={sorted(scols)} oracle={sorted(dcols)}")
                bad = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                for a, b in bad:
                    print(f"  spark={a}\n  duck ={b}")
        except Exception as e:  # noqa: BLE001 — report and continue
            failed.append(name)
            print(f"{name:32s} ERROR {type(e).__name__}: {e}")
    if failed:
        sys.exit(f"FAILED: {failed}")
    print("all OK")


if __name__ == "__main__":
    main()
