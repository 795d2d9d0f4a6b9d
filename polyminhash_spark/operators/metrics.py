"""Evaluation + instrumentation — SURVEY.md O22/O23/O24.

O22: join LSH top-k <-> BF top-k per query; per-query recall =
matched/|LSH|, BF-recall = matched/|BF|, MSE over matched pair
distances, FP-rate = unmatched/|LSH| (reference src/main.cpp:379-471).
O23: recall@1 similarity stats — mean/median/p10/p90 of s = 1-dist for
rank-1 neighbors, count s >= 0.8 (src/main.cpp:255-287).
O24: per-stage metrics rows (rows/candidates/pruning ratio/wall time),
the analog of the reference's MPI_MAX-reduced timers + pruning ratio
(src/query.cpp:184-206).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def evaluation_join(lsh_topk: DataFrame, bf_topk: DataFrame) -> DataFrame:
    """Per-query metrics DataFrame:
    (query_id, n_lsh, n_bf, n_matched, recall, bf_recall, mse, fp_rate)."""
    l = lsh_topk.select("query_id", "neighbor_id",
                        F.col("distance").alias("lsh_distance"))
    b = bf_topk.select("query_id", "neighbor_id",
                       F.col("distance").alias("bf_distance"))
    joined = l.join(b, ["query_id", "neighbor_id"], "full_outer")
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("lsh_distance").alias("n_lsh"),
            F.count("bf_distance").alias("n_bf"),
            F.count(F.when(F.col("lsh_distance").isNotNull()
                           & F.col("bf_distance").isNotNull(), 1)).alias("n_matched"),
            F.avg(F.pow(F.col("lsh_distance") - F.col("bf_distance"), 2)).alias("mse"),
        )
        .select(
            "query_id", "n_lsh", "n_bf", "n_matched",
            F.when(F.col("n_lsh") > 0, F.col("n_matched") / F.col("n_lsh"))
             .otherwise(F.lit(0.0)).alias("recall"),
            F.when(F.col("n_bf") > 0, F.col("n_matched") / F.col("n_bf"))
             .otherwise(F.lit(0.0)).alias("bf_recall"),
            F.coalesce("mse", F.lit(0.0)).alias("mse"),
            F.when(F.col("n_lsh") > 0,
                   (F.col("n_lsh") - F.col("n_matched")) / F.col("n_lsh"))
             .otherwise(F.lit(0.0)).alias("fp_rate"),
        )
    )


def global_metrics(per_query: DataFrame) -> DataFrame:
    return per_query.agg(
        F.avg("recall").alias("avg_recall"),
        F.avg("bf_recall").alias("avg_bf_recall"),
        F.avg("mse").alias("avg_mse"),
        F.avg("fp_rate").alias("avg_fp_rate"),
        F.count(F.lit(1)).alias("n_queries"),
    )


def recall_at_1_stats(topk: DataFrame) -> DataFrame:
    """O23: similarity distribution of the best neighbor per query."""
    best = topk.filter(F.col("rank") == 1).withColumn(
        "similarity", 1 - F.col("distance"))
    return best.agg(
        F.avg("similarity").alias("mean_sim"),
        F.expr("percentile(similarity, 0.5)").alias("median_sim"),
        F.expr("percentile(similarity, 0.1)").alias("p10_sim"),
        F.expr("percentile(similarity, 0.9)").alias("p90_sim"),
        F.sum((F.col("similarity") >= 0.8).cast("int")).alias("n_ge_08"),
        F.count(F.lit(1)).alias("n_queries"),
    )


def pruning_ratio(n_records: int, n_candidates: int) -> float:
    """Reference pruning metric: 1 - refined/(|Q|*|D|)
    (src/query.cpp:197-206); self-join domain = n*(n-1)/2."""
    total = n_records * (n_records - 1) / 2
    return 1.0 - (n_candidates / total) if total else 0.0
