"""r6 (r5 verdict #5): the singleton-bucket cut must be output-
invariant — it only routes rows that can never pair off the wide
bucket aggregate — including under pre-split and the pair prefilter,
and its semi join must be a pinned broadcast."""

import pyspark.sql.functions as F

from polyminhash_spark.operators.candidates import candidate_pairs


def _band_table(spark):
    """Synthetic band table: heavy singleton majority + mixed buckets.

    ids collide across buckets (realistic: one doc in many bands);
    bucket 7/3 shares ids with singleton rows elsewhere."""
    rows = []
    # 500 singleton groups
    for i in range(500):
        rows.append((i, i % 32, 10_000 + i))
    # buckets of sizes 2, 3, 7 across two bands
    for b, key, members in [(0, 1, [3, 9]), (1, 2, [4, 9, 44]),
                            (2, 3, [1, 2, 3, 4, 5, 6, 7])]:
        for m in members:
            rows.append((m, b, key))
    # the same logical pair in TWO bands (n_shared_bands = 2)
    rows += [(100, 5, 77), (101, 5, 77), (100, 6, 78), (101, 6, 78)]
    return spark.createDataFrame(rows, "id long, band int, band_key long")


def _pairs_set(df):
    return {(r.id_a, r.id_b, r.n_shared_bands) for r in df.collect()}


def test_singleton_cut_output_identical(spark):
    bt = _band_table(spark)
    base, _ = candidate_pairs(bt, max_bucket_size=5, salt_buckets=2)
    cut, _ = candidate_pairs(bt, max_bucket_size=5, salt_buckets=2,
                             singleton_prefilter=True)
    assert _pairs_set(base) == _pairs_set(cut)
    plan = cut._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan


def test_singleton_cut_with_presplit_and_prefilter(spark):
    bt = _band_table(spark)
    for kw in ({"presplit_slices": 3}, {"min_band_matches": 2},
               {"presplit_slices": 3, "min_band_matches": 2}):
        base, _ = candidate_pairs(bt, max_bucket_size=5, salt_buckets=2,
                                  **kw)
        cut, _ = candidate_pairs(bt, max_bucket_size=5, salt_buckets=2,
                                 singleton_prefilter=True, **kw)
        assert _pairs_set(base) == _pairs_set(cut), kw


def test_singleton_cut_bucket_stats_unfiltered(spark):
    """bucket_stats is the megabucket monitoring metric — it must keep
    counting FULL buckets regardless of the cut."""
    bt = _band_table(spark)
    _, stats_cut = candidate_pairs(bt, max_bucket_size=5, salt_buckets=2,
                                   singleton_prefilter=True)
    _, stats_base = candidate_pairs(bt, max_bucket_size=5, salt_buckets=2)
    a = {(r.band, r.band_key, r.bucket_n, r.salted)
         for r in stats_cut.collect()}
    b = {(r.band, r.band_key, r.bucket_n, r.salted)
         for r in stats_base.collect()}
    assert a == b and len(a) == 5
