"""Tier-0 hash-count prefilter (operators/candidates.py
min_band_matches) — r5: the pair-dedup shuffle was ~40% of all
pipeline shuffle bytes at 1M files (BENCH/BASELINE.md r5 stage table),
and most of those bytes were single-band accidental collisions that
verify's tier-0 cut was going to drop anyway.  With the prefilter the
sub-threshold pairs cross the shuffle as an 8 B xxhash64; only
surviving pairs are re-derived and counted exactly at full width.

Contract under test: candidate_pairs(..., min_band_matches=m) is
BIT-IDENTICAL to candidate_pairs(..., min_band_matches=1) filtered to
n_shared_bands >= m — on the bigint path, the packed-binary path, and
under megabucket pre-split (where minima-link pairs ride the same
prefilter) — and the end-to-end pipeline is invariant to
config.candidate_prefilter.
"""

import pyspark.sql.functions as F

from polyminhash_spark.config import default_config
from polyminhash_spark.corpus import CorpusParams, corpus_spark_df
from polyminhash_spark.operators.candidates import candidate_pairs


def _band_fixture(spark, binary_ids: bool):
    """60 docs over 4 bands: dup pairs sharing 2-4 bands, background
    pairs sharing exactly 1 band (the tier-0 kill zone), singletons."""
    rows = []
    # clique of 4 docs sharing all 4 bands (keys 100..103)
    for band in range(4):
        for d in range(4):
            rows.append((d, band, 100 + band))
    # pair (10, 11) sharing exactly 2 bands
    for band in (0, 2):
        rows.append((10, band, 200 + band))
        rows.append((11, band, 200 + band))
    # one-band-only collisions: (20+i, 30+i) meet once in band 1
    for i in range(15):
        rows.append((20 + i, 1, 300 + i))
        rows.append((35 + i, 1, 300 + i))
    df = spark.createDataFrame(rows, "id long, band int, band_key long")
    if binary_ids:
        # 16-byte ids like the pipeline's sha-derived record ids
        df = df.withColumn(
            "id", F.expr("unhex(lpad(hex(id), 32, '0'))"))
    return df


def _pairs_set(df):
    return {(bytes(r.id_a) if isinstance(r.id_a, (bytes, bytearray))
             else r.id_a,
             bytes(r.id_b) if isinstance(r.id_b, (bytes, bytearray))
             else r.id_b,
             r.n_shared_bands) for r in df.collect()}


def test_prefilter_equivalence_bigint(spark):
    df = _band_fixture(spark, binary_ids=False)
    base, _ = candidate_pairs(df, max_bucket_size=1000, salt_buckets=8)
    pre, _ = candidate_pairs(df, max_bucket_size=1000, salt_buckets=8,
                             min_band_matches=2)
    want = _pairs_set(base.filter(F.col("n_shared_bands") >= 2))
    got = _pairs_set(pre)
    assert got == want
    # the cut is real on this fixture: 15 one-band pairs die
    assert len(_pairs_set(base)) - len(got) == 15


def test_prefilter_equivalence_packed_binary(spark):
    df = _band_fixture(spark, binary_ids=True)
    base, _ = candidate_pairs(df, max_bucket_size=1000, salt_buckets=8)
    pre, _ = candidate_pairs(df, max_bucket_size=1000, salt_buckets=8,
                             min_band_matches=2)
    want = _pairs_set(base.filter(F.col("n_shared_bands") >= 2))
    assert _pairs_set(pre) == want and want


def test_prefilter_under_presplit(spark):
    """Minima-link pairs flow through the same prefilter: equivalence
    must hold with the megabucket pre-split active too."""
    df = _band_fixture(spark, binary_ids=False)
    base, _ = candidate_pairs(df, max_bucket_size=1000, salt_buckets=8,
                              presplit_slices=3)
    pre, _ = candidate_pairs(df, max_bucket_size=1000, salt_buckets=8,
                             presplit_slices=3, min_band_matches=2)
    want = _pairs_set(base.filter(F.col("n_shared_bands") >= 2))
    assert _pairs_set(pre) == want


def test_prefilter_plan_shape(spark):
    """The prefilter plan carries a LeftSemi join (the hash survivor
    cut); min_band_matches=1 must not add one."""
    df = _band_fixture(spark, binary_ids=True)
    pre, _ = candidate_pairs(df, max_bucket_size=1000, salt_buckets=8,
                             min_band_matches=2)
    base, _ = candidate_pairs(df, max_bucket_size=1000, salt_buckets=8)
    assert "LeftSemi" in pre._jdf.queryExecution().toString()
    assert "LeftSemi" not in base._jdf.queryExecution().toString()


def test_pipeline_invariant_to_prefilter(spark):
    """End-to-end: candidate_prefilter on/off gives identical verified
    pairs and identical clusters on the synthetic corpus."""
    from polyminhash_spark.pipeline import dedup_output, run_pipeline

    params = CorpusParams(n_files=150, dup_frac=0.3, seed=23)
    src = corpus_spark_df(spark, params)
    cfg = default_config()
    on = run_pipeline(spark, src, cfg.with_(candidate_prefilter=True),
                      collect_metrics=False)
    off = run_pipeline(spark, src, cfg.with_(candidate_prefilter=False),
                       collect_metrics=False)
    von = {(bytes(r.id_a), bytes(r.id_b), r.is_duplicate)
           for r in on.verified.collect()}
    voff = {(bytes(r.id_a), bytes(r.id_b), r.is_duplicate)
            for r in off.verified.collect()}
    assert von == voff
    con = {(r.id, r.cluster_id) for r in dedup_output(on).collect()}
    coff = {(r.id, r.cluster_id) for r in dedup_output(off).collect()}
    assert con == coff
    # with the prefilter the candidates frame is already tier-0-cut
    assert on.candidates.filter(
        F.col("n_shared_bands") < cfg.min_band_matches).count() == 0
