#!/usr/bin/env python
"""Round-6 measurement harness (guide §1: measure first; §1.4 noop sink).

Reproduces bench.py's mirror-stage methodology (cached stage views in
the same order), but additionally:
  * captures .explain("formatted") for every stage into plans/r06/
  * times each stage with the noop sink (isolates compute from the
    count/caching path when asked)
  * labels jobs (setJobDescription) so the UI/event log is readable

Usage:
    python bench_extra.py [--plans-suffix before|after] [--repeats N]

Writes one JSON line with per-stage seconds (cache+count methodology,
identical to bench.py) so numbers are comparable with BENCH_r*.json.
bench.py itself is FROZEN (driver contract); this file carries the
round's extra instrumentation.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-suffix", default=None,
                    help="write plans/r06/<stage>_<suffix>.txt")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--skip-pipeline", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from polyminhash_spark.plans import sql_mirror as M
    from polyminhash_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="polyminhash-bench-extra",
                          master=f"local[{cpus}]",
                          shuffle_partitions=max(cpus, 16))
    for t in ("documents", "embeddings"):
        spark.read.parquet(f"{args.sf_dir}/{t}.parquet") \
            .createOrReplaceTempView(t)

    plans_dir = "/root/repo/plans/r06"
    os.makedirs(plans_dir, exist_ok=True)

    def _inner(cte: str) -> str:
        return cte[cte.index("(") + 1 : cte.rindex(")")]

    d = M.SPARK
    timings: dict[str, list[float]] = {}

    def save_plan(name: str, df) -> None:
        if args.plans_suffix:
            with open(f"{plans_dir}/{name}_{args.plans_suffix}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))

    def stage_view(name: str, sql: str) -> None:
        df = spark.sql(sql)
        save_plan(name, df)
        df.createOrReplaceTempView(name)
        spark.catalog.cacheTable(name)
        spark.sparkContext.setJobDescription(f"stage:{name}")
        t0 = time.time()
        spark.table(name).count()
        timings.setdefault(name, []).append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)

    def timed(name: str, df, noop: bool = False) -> None:
        save_plan(name, df)
        spark.sparkContext.setJobDescription(f"q:{name}")
        t0 = time.time()
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        timings.setdefault(name, []).append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)

    for _ in range(args.repeats):
        spark.catalog.clearCache()
        stage_view("docs", _inner(M.cte_docs(d)))
        stage_view("grams", _inner(M.cte_grams(d)))
        stage_view("ghash", _inner(M.cte_ghash(d)))
        spark.sql("SELECT * FROM (" + " UNION ALL ".join(
            f"SELECT {p} AS p, {M.seed_for(p)} AS s" for p in range(M.P)) + ") t"
        ).createOrReplaceTempView("perms")
        stage_view("mh", _inner(M.cte_minhash(d)))
        stage_view("bk", _inner(M.cte_bands(d)))
        stage_view("cands", _inner(M.cte_cands(d)))
        stage_view("verify", _inner(M.cte_verify(d)))
        timed("topk_neighbors",
              spark.sql("WITH " + M._topk_tail(5).lstrip(", ")))
        simhash_cols = ", ".join(
            f"sum(CASE WHEN (shiftright(h, {j})) % 2 = 1 THEN 1 ELSE -1 END) AS b{j}"
            for j in range(16))
        timed("simhash16", spark.sql(
            f"SELECT doc_id, {simhash_cols} FROM ghash GROUP BY doc_id"))
        timed("doc_fingerprint", spark.sql(
            "SELECT doc_id, min(h) AS fingerprint FROM ghash GROUP BY doc_id"))
        timed("embedding_topk", spark.sql(M.spark_sql("embedding_topk")),
              noop=True)

    out = {"stage_seconds": {k: v for k, v in timings.items()},
           "stage_min": {k: min(v) for k, v in timings.items()},
           "sf_dir": args.sf_dir, "cpus": cpus}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
