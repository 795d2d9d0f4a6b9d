"""Checkpoint/resume + skew handling tests — SURVEY.md §5 items 3 & 5."""

import json
import os
import shutil

import pyspark.sql.functions as F
import pytest

from polyminhash_spark.config import default_config
from polyminhash_spark.corpus import CorpusParams, corpus_spark_df
from polyminhash_spark.pipeline import run_pipeline

CFG = default_config()


def _cluster_set(res):
    return {(r.id, r.cluster_id) for r in res.clusters.collect()}


def test_resume_from_checkpoint(spark, tmp_path):
    """north_rule: stages checkpoint with lineage manifests; a re-run
    reuses them and produces identical final clusters."""
    wd = str(tmp_path / "wd")
    src = corpus_spark_df(spark, CorpusParams(n_files=100, dup_frac=0.3, seed=9))
    r1 = run_pipeline(spark, src, CFG, workdir=wd, collect_metrics=False)
    c1 = _cluster_set(r1)
    # manifests written with lineage
    m = json.load(open(os.path.join(wd, "normalized_polyminhash_manifest.json")))
    assert m["config_hash"] == CFG.config_hash()
    assert m["rows"] == 100
    ms = json.load(open(os.path.join(wd, "signatures_polyminhash_manifest.json")))
    assert ms["inputs"]  # upstream fingerprints recorded
    assert ms["rows"] <= 100  # reps only

    # second run resumes every stage (no recompute)
    r2 = run_pipeline(spark, src, CFG, workdir=wd)
    assert _cluster_set(r2) == c1
    assert r2.metrics.get("clusters_resumed") is True
    assert r2.metrics.get("signatures_resumed") is True


def test_resume_mid_pipeline_after_kill(spark, tmp_path):
    """Kill after stage N (simulated by deleting downstream checkpoints):
    resume recomputes only downstream, final clusters byte-identical."""
    wd = str(tmp_path / "wd2")
    src = corpus_spark_df(spark, CorpusParams(n_files=100, dup_frac=0.3, seed=9))
    r1 = run_pipeline(spark, src, CFG, workdir=wd, collect_metrics=False)
    c1 = _cluster_set(r1)
    # "kill" happened after candidates: downstream outputs lost
    for stage in ("verified", "clusters", "neighbors"):
        shutil.rmtree(os.path.join(wd, stage))
        os.remove(os.path.join(wd, f"{stage}_polyminhash_manifest.json"))
    r2 = run_pipeline(spark, src, CFG, workdir=wd)
    assert r2.metrics.get("candidates_resumed") is True
    assert "verified_resumed" not in r2.metrics
    assert _cluster_set(r2) == c1


def test_config_change_invalidates_checkpoint(spark, tmp_path):
    wd = str(tmp_path / "wd3")
    src = corpus_spark_df(spark, CorpusParams(n_files=60, dup_frac=0.3, seed=9))
    run_pipeline(spark, src, CFG, workdir=wd, collect_metrics=False)
    cfg2 = CFG.with_(jaccard_threshold=0.9)
    r2 = run_pipeline(spark, src, cfg2, workdir=wd, collect_metrics=False)
    assert r2.metrics.get("signatures_resumed") is None  # recomputed


def test_identical_file_avalanche_absorbed_by_exact_groups(spark):
    """The dominant web-scale skew source: a file vendored identically
    into hundreds of repos.  exact_groups must collapse it to ONE
    representative (no hot LSH bucket at all) and still cluster every
    copy together."""
    base = "def vendored():\n    return 42\n" * 20
    rows = [(f"org{i}", f"p{i}", f"c{i:040d}", "python", base) for i in range(60)]
    rows += [(f"orgx{i}", f"q{i}", f"d{i:040d}", "python",
              f"unique file {i} " * 30 + "\n") for i in range(40)]
    src = spark.createDataFrame(rows, ["repo", "path", "commit", "lang", "content"])
    cfg = CFG.with_(max_bucket_size=20)
    res = run_pipeline(spark, src, cfg)
    assert res.metrics["n_reps"] == 41          # 60 copies -> 1 rep
    assert res.metrics["max_bucket"] <= 20      # no hot bucket survives
    clusters = {r.id: r.cluster_id for r in res.clusters.collect()}
    assert len(clusters) == 100
    vendored_ids = {r.id for r in res.normalized.filter(
        F.col("path").startswith("p")).select("id").collect()}
    labels = {clusters[i] for i in vendored_ids}
    assert len(labels) == 1                     # all 60 copies in one cluster
    assert min(vendored_ids) in labels          # label = min member id


def test_near_dup_hot_bucket_salted_stays_connected(spark):
    """Near-dup (non-identical) hot buckets switch to star + salted
    pair generation: the skew is counted, pair volume is bounded, and
    — the part plain truncation got wrong — a near-dup clique LARGER
    than the bucket cap still lands in exactly ONE cluster (no member
    ever loses all its candidate edges)."""
    base = "\n".join(f"line {i} common payload alpha beta gamma" for i in range(40))
    rows = [("o", f"p{i}", f"c{i:040d}", "python", base + f"\n# tail {i}\n")
            for i in range(50)]
    src = spark.createDataFrame(rows, ["repo", "path", "commit", "lang", "content"])
    cfg = CFG.with_(max_bucket_size=10)
    res = run_pipeline(spark, src, cfg)
    assert res.metrics["n_reps"] == 50          # all distinct contents
    assert res.metrics["max_bucket"] > 10       # skew present
    assert res.metrics["n_salted_buckets"] >= 1
    # verification stays exact under salting
    bad = res.verified.filter(
        F.col("is_duplicate") & (F.col("jaccard") < cfg.jaccard_threshold)
    ).count()
    assert bad == 0
    clusters = [r.cluster_id for r in res.clusters.collect()]
    assert len(clusters) == 50
    # connectivity: all 50 members of the over-cap clique in ONE cluster
    assert len(set(clusters)) == 1
    # pair volume is bounded: star (49/band) + salted sub-bucket pairs,
    # far below the 50*49/2 all-pairs volume per band
    n_cand = res.candidates.count()
    assert n_cand < 50 * 49 / 2


def test_salted_pairs_match_unsalted_clusters(spark):
    """Salting is a physical strategy, not a semantic one: on a mixed
    corpus, clusters with a small cap + salting must equal clusters
    with a cap large enough that no bucket is ever hot."""
    src = corpus_spark_df(spark, CorpusParams(n_files=120, dup_frac=0.5, seed=7))
    hot = run_pipeline(spark, src, CFG.with_(max_bucket_size=5, salt_buckets=4),
                       collect_metrics=False)
    cold = run_pipeline(spark, src, CFG.with_(max_bucket_size=100_000),
                        collect_metrics=False)
    assert _cluster_set(hot) == _cluster_set(cold)


def test_metrics_table_persisted_per_stage(spark, tmp_path):
    """O24: every checkpointed stage appends one queryable row to the
    workdir _metrics table; the run adds a 'pipeline' summary row."""
    from polyminhash_spark.sources.catalog import StageCatalog

    wd = str(tmp_path / "wdm")
    src = corpus_spark_df(spark, CorpusParams(n_files=80, dup_frac=0.3, seed=4))
    run_pipeline(spark, src, CFG, workdir=wd)

    mt = StageCatalog(spark, wd).metrics_table()
    assert mt is not None
    assert mt.schema.simpleString() == (
        "struct<stage:string,config_hash:string,rows:bigint,bytes:bigint,"
        "n_files:bigint,n_partitions:bigint,wall_sec:double,"
        "checksum:string,extra:map<string,string>>")
    rows = {r.stage: r for r in mt.collect()}
    expected = {"normalized", "exact_groups", "signatures", "candidates",
                "verified", "clusters", "neighbors", "pipeline"}
    assert set(rows) == expected
    for stage in expected - {"pipeline"}:
        r = rows[stage]
        assert r.rows is not None and r.rows >= 0
        assert r.bytes > 0 and r.n_files > 0
        assert r.wall_sec > 0 and r.checksum is not None
    assert "pruning_ratio" in rows["pipeline"].extra


def test_changed_source_invalidates_checkpoints(spark, tmp_path):
    """Content-aware lineage: re-running against DIFFERENT input data
    with the SAME row count must recompute, not reuse stale stages."""
    wd = str(tmp_path / "wds")
    inp = str(tmp_path / "input.parquet")
    corpus_spark_df(spark, CorpusParams(n_files=60, dup_frac=0.3, seed=1)) \
        .write.mode("overwrite").parquet(inp)
    r1 = run_pipeline(spark, spark.read.parquet(inp), CFG, workdir=wd,
                      collect_metrics=False)
    c1 = _cluster_set(r1)

    # same row count, different contents
    corpus_spark_df(spark, CorpusParams(n_files=60, dup_frac=0.3, seed=2)) \
        .write.mode("overwrite").parquet(inp)
    r2 = run_pipeline(spark, spark.read.parquet(inp), CFG, workdir=wd,
                      collect_metrics=False)
    assert r2.metrics.get("normalized_resumed") is None  # recomputed
    assert _cluster_set(r2) != c1

    # unchanged input still resumes
    r3 = run_pipeline(spark, spark.read.parquet(inp), CFG, workdir=wd,
                      collect_metrics=False)
    assert r3.metrics.get("clusters_resumed") is True
