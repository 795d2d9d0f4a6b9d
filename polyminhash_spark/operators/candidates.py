"""Candidate generation — SURVEY.md O15 (probe = equi-join on band key)
with the skew handling the reference lacks (SURVEY.md §4, north_rule).

Physical shape:
1. bucket sizes: one partial-aggregated groupBy (cheap, no sort).
2. hot-bucket detection: buckets above the cap are collected to the
   driver — there are few by construction (exact-dup pre-grouping
   removed identical content; caps target residual near-dup crowds).
   The common case is ZERO hot buckets, and then NO window/sort ever
   touches the band table.
3. hot buckets only: deterministic rank-cap (window over the hot
   subset, which is bounded by |hot| × bucket size).
4. pair generation: groupBy (band, band_key) + sorted collect_list +
   JVM nested-transform explode — no Python.
5. pair dedup across bands via groupBy count; the count doubles as the
   tier-0 verification cut (shared-band count, config.min_band_matches).

The cross-band visited-set dedupe of the reference
(src/query.cpp:122-162) is step 5; the bucket index the reference
hand-rolls (src/util.cpp:153-184) is the shuffle hash partitioner.
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
    """bands_df (id, band, band_key) -> (pairs (id_a, id_b,
    n_shared_bands), bucket_stats (band, band_key, bucket_n, truncated)).

    id_a < id_b always (canonical pair orientation)."""
    sizes = bands_df.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("bucket_n"))
    bucket_stats = sizes.filter(F.col("bucket_n") >= 2).select(
        "band", "band_key", "bucket_n",
        (F.col("bucket_n") > max_bucket_size).alias("truncated"))

    hot = [(r["band"], r["band_key"])
           for r in bucket_stats.filter("truncated").collect()]

    member_src = bands_df
    if hot:
        spark = bands_df.sparkSession
        hot_df = spark.createDataFrame(hot, ["band", "band_key"]) \
            .withColumn("is_hot", F.lit(True))
        marked = bands_df.join(F.broadcast(hot_df), ["band", "band_key"],
                               "left")
        cold = marked.filter(F.col("is_hot").isNull()).drop("is_hot")
        w = Window.partitionBy("band", "band_key").orderBy("id")
        hot_capped = (marked.filter(F.col("is_hot").isNotNull())
                      .drop("is_hot")
                      .withColumn("rn", F.row_number().over(w))
                      .filter(F.col("rn") <= max_bucket_size)
                      .drop("rn"))
        member_src = cold.unionByName(hot_capped)

    pairs = (
        member_src
        .groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode(F.expr(PAIR_EXPR)).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        # same shuffle as a dropDuplicates, but the count is free and
        # becomes the tier-0 verification cut (config.min_band_matches)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    return pairs, bucket_stats
