"""Brute-force exact oracle — SURVEY.md O21 (reference
src/brute_force.cpp:8-77): all-pairs exact set-Jaccard, per-query
ascending sort with id tie-break, top-k.  Used only at test scale as
the recall/metrics oracle (the reference runs it on every invocation;
we run it in pytest and the metrics job)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from polyminhash_spark.config import DedupConfig
from polyminhash_spark.functions.udfs import make_verify_udf
from polyminhash_spark.operators.topk import topk_neighbors


def brute_force_pairs(normalized: DataFrame, cfg: DedupConfig) -> DataFrame:
    """All unordered pairs with exact set-Jaccard (id_a < id_b).
    O(n²) — test-scale only, mirrors src/brute_force.cpp:30-50."""
    a = normalized.select(F.col("id").alias("id_a"),
                          F.col("norm_content").alias("norm_content_a"))
    b = normalized.select(F.col("id").alias("id_b"),
                          F.col("norm_content").alias("norm_content_b"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    verify = make_verify_udf(cfg)
    return pairs.withColumn(
        "v", verify(F.col("id_a"), F.col("norm_content_a"),
                    F.col("id_b"), F.col("norm_content_b"))
    ).select("id_a", "id_b",
             F.col("v.jaccard").alias("jaccard"),
             F.col("v.clone").alias("clone"))


def brute_force_topk(normalized: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(query_id, neighbor_id, distance, rank) — the exact top-k the
    reference's BFquery emits (ascending distance, id tie-break,
    src/brute_force.cpp:52)."""
    return topk_neighbors(brute_force_pairs(normalized, cfg), cfg.top_k)
