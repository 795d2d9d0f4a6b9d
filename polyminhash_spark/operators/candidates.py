"""Candidate generation — SURVEY.md O15 (probe = equi-join on band key)
with the skew handling the reference lacks (SURVEY.md §4, north_rule
"skewed repos/buckets handled with explicit salting and repartitioning").

Physical shape (r4: ONE shuffle, no driver round-trip — the r3 design
paid a second full groupBy + a driver collect of hot-bucket keys + a
broadcast join over the same band table before pair generation):

1. ONE groupBy (band, band_key) + sorted collect_list — the only
   shuffle of the band table.  Everything below is per-row JVM array
   expressions over that aggregate (whole-stage codegen, no Python,
   no window/sort, no second pass, no driver synchronization).
2. under-cap buckets: all unordered pairs via nested transform-explode.
3. over-cap buckets — connectivity-preserving salted pair generation,
   derived from the SAME ids array:
   * STAR edges: every non-min member pairs with ids[1] (the bucket
     MIN — the array is sorted) — O(n) pairs per bucket, and any
     clique that lands in one bucket stays connected through verify +
     connected components no matter how large it is (no member ever
     loses all its edges).
   * SALTED sub-buckets: the non-min members are deterministically
     hashed (xxhash64 mod salt_buckets) into sub-arrays via one
     filter() per salt; all-pairs WITHIN each sub-array adds the
     intra-crowd edges back at ~1/salt_buckets of the all-pairs
     volume.  A sub-array still above the cap emits star edges only
     (pair volume stays bounded).
   Star and salted pair sets are disjoint by construction (star pairs
   always contain the min id; salted pairs never do), so per band each
   unordered pair is emitted at most once and the cross-band
   n_shared_bands count keeps its exact semantics.
4. pair dedup across bands via groupBy count; the count doubles as the
   tier-0 verification cut (shared-band count, config.min_band_matches).

Memory bound: one aggregated row holds one bucket's full id array, so
the largest bucket must fit one task (16 bytes x members).  Exact-dup
pre-grouping (pipeline.exact_groups) removes identical content — the
dominant web-scale megabucket source — before banding, and 64-bit band
keys keep random collisions O(1) even at 1e11 rows, so residual bucket
sizes are near-dup crowd sizes (observed max < 10^3 at 1M files).  A
crowd beyond task memory would need a pre-split pass; that regime is
flagged by bucket_stats.max_bucket before it is hit.

The cross-band visited-set dedupe of the reference
(src/query.cpp:122-162) is step 4; the bucket index the reference
hand-rolls (src/util.cpp:153-184) is the shuffle hash partitioner.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _pairs_expr(arr: str, packed: bool) -> str:
    """All unordered pairs within sorted array `arr` (x < y guaranteed
    by sort order), as array<struct<id_a,id_b>> or packed
    array<binary>.  The packed concat guards per-pair length equality:
    equal halves make the midpoint split exact and collision-free
    across pairs (equal-length halves => equal total => same split)."""
    if packed:
        return (
            f"flatten(transform({arr}, (x, i) -> "
            f"transform(slice({arr}, i + 2, size({arr}) - i - 1), "
            "y -> if(octet_length(x) = octet_length(y), concat(x, y), "
            "raise_error('packed pair path requires uniform-length "
            "binary ids')))))"
        )
    return (
        f"flatten(transform({arr}, (x, i) -> "
        f"transform(slice({arr}, i + 2, size({arr}) - i - 1), "
        "y -> struct(x AS id_a, y AS id_b))))"
    )


def _bucket_pairs_expr(max_bucket_size: int, salt_buckets: int,
                       packed: bool) -> str:
    """Per-bucket pair list over the sorted `ids` array: all pairs when
    under the cap; star + salted sub-array pairs when over it."""
    rest = "slice(ids, 2, size(ids) - 1)"  # non-min members
    if packed:
        star_pair = (
            "if(octet_length(element_at(ids, 1)) = octet_length(y), "
            "concat(element_at(ids, 1), y), "
            "raise_error('packed pair path requires uniform-length "
            "binary ids'))"
        )
    else:
        star_pair = "struct(element_at(ids, 1) AS id_a, y AS id_b)"
    # materialize each salt sub-array ONCE (inner transform), size-gate
    # with filter (keeps both CASE branches the same array type), then
    # expand the survivors to pairs
    salted = (
        "flatten(transform(filter("
        f"transform(sequence(0, {salt_buckets - 1}), s -> "
        f"filter({rest}, y -> pmod(xxhash64(y), {salt_buckets}) = s)), "
        f"sub -> size(sub) >= 2 AND size(sub) <= {max_bucket_size}), "
        f"sub -> {_pairs_expr('sub', packed)}))"
    )
    return (
        f"CASE WHEN size(ids) <= {max_bucket_size} "
        f"THEN {_pairs_expr('ids', packed)} "
        f"ELSE concat(transform({rest}, y -> {star_pair}), {salted}) END"
    )


def _is_binary_id(df: DataFrame) -> bool:
    from pyspark.sql.types import BinaryType

    return isinstance(df.schema["id"].dataType, BinaryType)


def candidate_pairs(bands_df: DataFrame, max_bucket_size: int = 1000,
                    salt_buckets: int = 8) -> tuple[DataFrame, DataFrame]:
    """bands_df (id, band, band_key) -> (pairs (id_a, id_b,
    n_shared_bands), bucket_stats (band, band_key, bucket_n, salted)).

    id_a < id_b always (canonical pair orientation).  Buckets larger
    than `max_bucket_size` switch to star + salted pair generation
    (connectivity preserved, pair volume ~bucket_n * bucket_n /
    salt_buckets instead of bucket_n^2); they are flagged `salted` in
    bucket_stats, never silently dropped.

    Binary ids (the pipeline's 16-byte record ids; uniform length
    enforced by a per-pair guard) travel the dedup shuffle packed as
    one concat(id_a, id_b) column and are split after the groupBy —
    non-binary ids (bigints from the SimHash/IVF callers) keep the
    two-column path.

    bucket_stats is an independent LAZY aggregate (cheap partial-agg
    count) — callers that drop it never pay for it; the pair path
    itself never computes sizes separately or touches the driver."""
    packed = _is_binary_id(bands_df)

    grouped = (bands_df.groupBy("band", "band_key")
               .agg(F.sort_array(F.collect_list("id")).alias("ids"))
               .filter(F.size("ids") >= 2))
    pair_list = F.expr(_bucket_pairs_expr(max_bucket_size, salt_buckets,
                                          packed))
    if packed:
        per_band = grouped.select(F.explode(pair_list).alias("pair"))
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
        per_band = (grouped
                    .select(F.explode(pair_list).alias("p"))
                    .select(F.col("p.id_a").alias("id_a"),
                            F.col("p.id_b").alias("id_b")))
        pairs = (
            per_band
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        )

    bucket_stats = (bands_df.groupBy("band", "band_key")
                    .agg(F.count(F.lit(1)).alias("bucket_n"))
                    .filter(F.col("bucket_n") >= 2)
                    .select("band", "band_key", "bucket_n",
                            (F.col("bucket_n") > max_bucket_size)
                            .alias("salted")))
    return pairs, bucket_stats
