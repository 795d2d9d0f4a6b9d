"""verify_semi_filter (operators/verify.py, r5): the tier-3 content
attach must not shuffle the whole corpus's content to verify a small
survivor set — content is cut to the survivors' ids with a broadcast
semi join first.  Output is bit-identical with the flag on or off; the
plan carries the semi join only when on."""

import pyspark.sql.functions as F

from polyminhash_spark.config import default_config
from polyminhash_spark.corpus import CorpusParams, corpus_spark_df
from polyminhash_spark.pipeline import dedup_output, run_pipeline


def test_verify_semi_filter_invariant(spark):
    params = CorpusParams(n_files=150, dup_frac=0.3, seed=31)
    src = corpus_spark_df(spark, params)
    # candidate_prefilter off so the only LeftSemi in the lineage is
    # the one under test
    cfg = default_config().with_(candidate_prefilter=False)
    on = run_pipeline(spark, src, cfg.with_(verify_semi_filter=True),
                      collect_metrics=False)
    off = run_pipeline(spark, src, cfg.with_(verify_semi_filter=False),
                       collect_metrics=False)
    von = {(bytes(r.id_a), bytes(r.id_b), r.jaccard, r.clone,
            r.is_duplicate) for r in on.verified.collect()}
    voff = {(bytes(r.id_a), bytes(r.id_b), r.jaccard, r.clone,
             r.is_duplicate) for r in off.verified.collect()}
    assert von == voff and von
    con = {(r.id, r.cluster_id) for r in dedup_output(on).collect()}
    coff = {(r.id, r.cluster_id) for r in dedup_output(off).collect()}
    assert con == coff
    plan_on = on.verified._jdf.queryExecution().toString()
    plan_off = off.verified._jdf.queryExecution().toString()
    assert "LeftSemi" in plan_on
    assert "LeftSemi" not in plan_off


def test_byte_opt_auto_resolution(spark):
    """None (default) = auto by representative count: off below
    byte_opt_auto_threshold, on at/above it, recorded in metrics,
    output identical either way."""
    params = CorpusParams(n_files=120, dup_frac=0.3, seed=37)
    src = corpus_spark_df(spark, params)
    cfg = default_config()
    assert cfg.candidate_prefilter is None
    assert cfg.verify_semi_filter is None
    low = run_pipeline(spark, src, cfg)  # 120 reps << 500k -> off
    assert low.metrics["candidate_prefilter"] is False
    assert low.metrics["verify_semi_filter"] is False
    forced = run_pipeline(spark, src, cfg.with_(byte_opt_auto_threshold=10))
    assert forced.metrics["candidate_prefilter"] is True
    assert forced.metrics["verify_semi_filter"] is True
    a = {(r.id, r.cluster_id) for r in dedup_output(low).collect()}
    b = {(r.id, r.cluster_id) for r in dedup_output(forced).collect()}
    assert a == b
