"""Candidate generation — SURVEY.md O15 (probe = equi-join on band key)
with the skew handling the reference lacks (SURVEY.md §4, north_rule
"skewed repos/buckets handled with explicit salting and repartitioning").

Physical shape:
1. bucket sizes: one partial-aggregated groupBy (cheap, no sort).
2. hot-bucket detection: buckets above the cap are collected to the
   driver — there are few by construction (exact-dup pre-grouping
   removed identical content; caps target residual near-dup crowds).
   The common case is ZERO hot buckets, and then NO extra work ever
   touches the band table.
3. hot buckets only — connectivity-preserving salted pair generation:
   * STAR edges: every bucket member pairs with the bucket MIN id —
     O(n) pairs per bucket, and any clique that lands in one bucket
     stays connected through verify + connected components no matter
     how large it is (no member ever loses all its edges).
   * SALTED sub-buckets: the non-min members are deterministically
     hashed into `salt_buckets` sub-buckets; all-pairs WITHIN each
     sub-bucket adds the intra-crowd edges back at 1/salt_buckets of
     the all-pairs volume.  A sub-bucket still above the cap emits
     star edges only (pair volume stays bounded).
   Star and salted pair sets are disjoint by construction (star pairs
   always contain the min id; salted pairs never do), so per band each
   unordered pair is emitted at most once and the cross-band
   n_shared_bands count keeps its exact semantics.
4. pair generation: groupBy (band, band_key) + sorted collect_list +
   JVM nested-transform explode — no Python, no window/sort anywhere.
5. pair dedup across bands via groupBy count; the count doubles as the
   tier-0 verification cut (shared-band count, config.min_band_matches).

The cross-band visited-set dedupe of the reference
(src/query.cpp:122-162) is step 5; the bucket index the reference
hand-rolls (src/util.cpp:153-184) is the shuffle hash partitioner.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PAIR_EXPR = (
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids) - i - 1), "
    "y -> struct(x AS id_a, y AS id_b))))"
)

# binary ids: pack each pair into ONE concat column through the dedup
# shuffle — an UnsafeRow with one variable-length field instead of two
# carries one offset word less per row, and at 1M files the pair-dedup
# groupBy moves ~71M rows, so the per-row bytes are the stage's cost
PAIR_EXPR_PACKED = (
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids) - i - 1), "
    "y -> concat(x, y))))"
)


def _is_binary_id(df: DataFrame) -> bool:
    from pyspark.sql.types import BinaryType

    return isinstance(df.schema["id"].dataType, BinaryType)


def _pack(id_a: F.Column, id_b: F.Column) -> F.Column:
    return F.concat(id_a, id_b)


def _all_pairs(members: DataFrame, group_cols: list[str],
               max_size: int | None = None,
               packed: bool = False) -> DataFrame:
    """All unordered pairs within each group, via sorted collect_list +
    JVM transform-explode.  Groups above `max_size` are skipped (their
    connectivity is carried by the star edges).  packed=True (binary
    ids of uniform length) emits concat(id_a, id_b) as a single `pair`
    column; callers unpack after the final groupBy."""
    grouped = (members.groupBy(*group_cols)
               .agg(F.sort_array(F.collect_list("id")).alias("ids"))
               .filter(F.size("ids") >= 2))
    if max_size is not None:
        grouped = grouped.filter(F.size("ids") <= max_size)
    if packed:
        return grouped.select(
            F.explode(F.expr(PAIR_EXPR_PACKED)).alias("pair"))
    return (grouped
            .select(F.explode(F.expr(PAIR_EXPR)).alias("p"))
            .select(F.col("p.id_a").alias("id_a"),
                    F.col("p.id_b").alias("id_b")))


def candidate_pairs(bands_df: DataFrame, max_bucket_size: int = 1000,
                    salt_buckets: int = 8) -> tuple[DataFrame, DataFrame]:
    """bands_df (id, band, band_key) -> (pairs (id_a, id_b,
    n_shared_bands), bucket_stats (band, band_key, bucket_n, salted)).

    id_a < id_b always (canonical pair orientation).  Buckets larger
    than `max_bucket_size` switch to star + salted pair generation
    (connectivity preserved, pair volume ~bucket_n * bucket_n /
    salt_buckets instead of bucket_n^2); they are flagged `salted` in
    bucket_stats, never silently dropped.

    Binary ids (the pipeline's 16-byte record ids; REQUIRED uniform
    length per call) travel the dedup shuffle packed as one
    concat(id_a, id_b) column and are split after the groupBy —
    non-binary ids (bigints from the SimHash/IVF callers) keep the
    two-column path."""
    packed = _is_binary_id(bands_df)
    sizes = bands_df.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("bucket_n"))
    bucket_stats = sizes.filter(F.col("bucket_n") >= 2).select(
        "band", "band_key", "bucket_n",
        (F.col("bucket_n") > max_bucket_size).alias("salted"))

    hot = [(r["band"], r["band_key"])
           for r in bucket_stats.filter("salted").collect()]

    member_src = bands_df
    hot_pairs = None
    if hot:
        spark = bands_df.sparkSession
        hot_df = spark.createDataFrame(hot, ["band", "band_key"]) \
            .withColumn("is_hot", F.lit(True))
        marked = bands_df.join(F.broadcast(hot_df), ["band", "band_key"],
                               "left")
        member_src = marked.filter(F.col("is_hot").isNull()).drop("is_hot")
        hot_members = marked.filter(F.col("is_hot").isNotNull()) \
                            .drop("is_hot")

        # star: every member -> bucket min id (connectivity floor)
        mins = hot_members.groupBy("band", "band_key") \
                          .agg(F.min("id").alias("min_id"))
        nonmin = hot_members.join(F.broadcast(mins), ["band", "band_key"]) \
                            .filter(F.col("id") != F.col("min_id"))
        if packed:
            star = nonmin.select(
                _pack(F.col("min_id"), F.col("id")).alias("pair"))
        else:
            star = nonmin.select(F.col("min_id").alias("id_a"),
                                 F.col("id").alias("id_b"))

        # salted: all-pairs within deterministic sub-buckets of the
        # non-min members (disjoint from star: min id excluded)
        salted = _all_pairs(
            nonmin.withColumn(
                "salt", F.pmod(F.xxhash64("id"), F.lit(salt_buckets))),
            ["band", "band_key", "salt"], max_size=max_bucket_size,
            packed=packed)
        hot_pairs = star.unionByName(salted)

    per_band = _all_pairs(member_src, ["band", "band_key"], packed=packed)
    if hot_pairs is not None:
        per_band = per_band.unionByName(hot_pairs)

    if packed:
        pairs = (
            per_band
            # same shuffle as a dropDuplicates, but the count is free and
            # becomes the tier-0 verification cut (config.min_band_matches)
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("n_shared_bands"))
            .select(
                F.expr("substring(pair, 1, octet_length(pair) div 2)")
                 .alias("id_a"),
                F.expr("substring(pair, octet_length(pair) div 2 + 1, "
                       "octet_length(pair) div 2)").alias("id_b"),
                "n_shared_bands")
        )
    else:
        pairs = (
            per_band
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        )
    return pairs, bucket_stats
