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
