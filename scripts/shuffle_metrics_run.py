"""Per-stage shuffle-byte measurement (r4 verdict #5: measure the
bandwidth-bound fraction per stage instead of inferring it from
aggregate walls).

Runs the production pipeline once with the UI REST endpoint enabled and
collect_metrics=True, then prints one JSON line with per-stage seconds
AND per-stage shuffle read/write MB (pipeline.shuffle_totals deltas).
Not part of the timed bench protocol (metrics collection adds counts),
so walls printed here are indicative, not the scaling numbers.

Usage: python scripts/shuffle_metrics_run.py <corpus.parquet> [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    corpus = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from polyminhash_spark.config import default_config
    from polyminhash_spark.pipeline import run_pipeline
    from polyminhash_spark.session import build_session

    spark = build_session(
        app_name="polyminhash-shuffle-metrics", master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
        extra_conf={"spark.ui.enabled": "true",
                    "spark.ui.port": "4049"})
    src = spark.read.parquet(corpus)
    src.count()
    t0 = time.time()
    res = run_pipeline(spark, src, default_config(), collect_metrics=True)
    wall = round(time.time() - t0, 2)
    out = {"corpus": corpus, "cores": cores, "wall_sec_with_metrics": wall,
           "clusters": res.clusters.select("cluster_id").distinct().count(),
           "metrics": res.metrics}
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
