"""Candidate generation — SURVEY.md O15 (probe = equi-join on band key)
with the skew handling the reference lacks (SURVEY.md §4, north_rule).

Shape: one shuffle on (band, band_key); within that single exchange a
window caps hot buckets deterministically BEFORE any list is
materialized, then pairs are generated JVM-side (nested `transform`
over the capped, sorted id list — no Python).  The cross-band
visited-set dedupe of the reference (src/query.cpp:122-162
`visitedForQuery`) is `dropDuplicates` on the pair key.

Scale notes (100 TB):
* A license-header bucket with 10^6 members would otherwise emit
  5·10^11 pairs; the cap bounds any bucket to max_bucket_size members
  (=> <= cap²/2 pairs) and the truncation is COUNTED, not silent — the
  stage emits a truncated-buckets metric.
* The cap is deterministic (ids sorted) so reruns/resumes agree.
* AQE skew-join handles residual imbalance in the verify join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

PAIR_EXPR = (
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids) - i - 1), "
    "y -> struct(x AS id_a, y AS id_b))))"
)


def candidate_pairs(bands_df: DataFrame, max_bucket_size: int = 1000
                    ) -> tuple[DataFrame, DataFrame]:
    """bands_df (id, band, band_key) -> (pairs (id_a, id_b),
    bucket_stats (band, band_key, bucket_n, truncated)).

    id_a < id_b always (canonical pair orientation, the analog of the
    reference's one-visit-per-pair contract)."""
    w_rank = Window.partitionBy("band", "band_key").orderBy("id")
    w_all = Window.partitionBy("band", "band_key")

    ranked = (
        bands_df
        .withColumn("rn", F.row_number().over(w_rank))
        .withColumn("bucket_n", F.count("id").over(w_all))
        .filter(F.col("bucket_n") >= 2)
    )
    bucket_stats = (
        ranked.filter(F.col("rn") == 1)
        .select(
            "band", "band_key", "bucket_n",
            (F.col("bucket_n") > max_bucket_size).alias("truncated"),
        )
    )
    pairs = (
        ranked.filter(F.col("rn") <= max_bucket_size)
        .groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .select(F.explode(F.expr(PAIR_EXPR)).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs, bucket_stats
