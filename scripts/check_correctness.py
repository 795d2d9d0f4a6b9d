"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry against its oracle_sql() at a chosen
sf and report match status.  Usage:

    python scripts/check_correctness.py [sf_dir] [query ...]

Defaults to /root/testdata/sf0.001 and all queries."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import __spark_entry__ as E  # noqa: E402
from util_compare import compare, duck_connection  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "12g")
             .appName("correctness").getOrCreate())
    qs = E.queries()
    oracles = E.oracle_sql()
    con = duck_connection(sf_dir)
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"{name}: (rows-only, skipped)")
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = [c.lower() for c in sdf.columns]
        drel = con.sql(oracles[name])
        drows = drel.fetchall()
        dcols = [c.lower() for c in drel.columns]
        from util_compare import _canon
        ok_cols = sorted(scols) == sorted(dcols)
        ok_vals = ok_cols and _canon(srows, scols) == _canon(drows, dcols)
        status = "OK" if (ok_cols and ok_vals and len(srows) == len(drows)) \
            else "FAIL"
        print(f"{name}: {status} spark={len(srows)} duck={len(drows)} "
              f"cols={ok_cols} vals={ok_vals}")
        if status == "FAIL":
            failed.append(name)
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all checked queries match")


if __name__ == "__main__":
    main()
