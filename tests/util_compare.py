"""Cross-engine comparison harness mimicking the driver's correctness
check: run Spark query and DuckDB oracle on the same parquet, compare
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb


def register_views(spark, sf_dir: str) -> None:
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["|".join(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark, con, spark_sql: str, duck_sql: str) -> dict:
    sdf = spark.sql(spark_sql)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]
    drel = con.sql(duck_sql)
    drows = drel.fetchall()
    dcols = [c.lower() for c in drel.columns]
    res = {
        "spark_rows": len(srows), "duck_rows": len(drows),
        "cols_match": sorted(scols) == sorted(dcols),
        "spark_cols": scols, "duck_cols": dcols,
    }
    if res["cols_match"]:
        a, b = _canon(srows, scols), _canon(drows, dcols)
        res["values_match"] = a == b
        if not res["values_match"]:
            sa, sb = set(a), set(b)
            res["spark_only"] = sorted(sa - sb)[:3]
            res["duck_only"] = sorted(sb - sa)[:3]
    return res
