"""End-to-end pipeline oracle tests — SURVEY.md §5 items 2 & 3.

Mirrors the reference's built-in oracle methodology (every run compares
LSH vs brute force, reference src/main.cpp:291-471): dup-pair recall
gate >= 0.99, cluster assignments vs connected components of true
pairs, per-row sha256 invariant, partition invariance.
"""

import hashlib

import pyspark.sql.functions as F
import pytest

from polyminhash_spark.config import default_config
from polyminhash_spark.corpus import CorpusParams, corpus_spark_df, generate_corpus
from polyminhash_spark.operators.brute_force import brute_force_pairs, brute_force_topk
from polyminhash_spark.operators.metrics import (
    evaluation_join,
    global_metrics,
    pruning_ratio,
    recall_at_1_stats,
)
from polyminhash_spark.pipeline import dedup_output, run_pipeline

N_FILES = 220
PARAMS = CorpusParams(n_files=N_FILES, dup_frac=0.3, seed=42)
CFG = default_config()


@pytest.fixture(scope="module")
def pipe(spark):
    src = corpus_spark_df(spark, PARAMS)
    res = run_pipeline(spark, src, CFG)
    # materialize the expensive shared frames once
    res.verified.cache().count()
    res.normalized.cache().count()
    return res


@pytest.fixture(scope="module")
def bf(spark, pipe):
    """Exact oracle over representatives.  Exact copies (identical
    norm_content) have identical similarity to everything, so
    rep-level BF pairs + the exact-group edges generate the same
    connected components as all-pairs BF."""
    reps = pipe.normalized.join(pipe.signed.select("id"), "id")
    df = brute_force_pairs(reps, CFG).cache()
    df.count()
    return df


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_dup_pair_recall_gate(pipe, bf):
    """BASELINE.md gate: dup-pair recall >= 0.99 vs the exact oracle at
    the same shingle/signature config."""
    bf_pairs = {(r.id_a, r.id_b)
                for r in bf.filter(F.col("jaccard") >= CFG.jaccard_threshold).collect()}
    lsh_pairs = {(r.id_a, r.id_b)
                 for r in pipe.verified.filter("is_duplicate").collect()}
    assert bf_pairs, "oracle found no dup pairs — corpus broken"
    recall = len(bf_pairs & lsh_pairs) / len(bf_pairs)
    assert recall >= 0.99, f"recall {recall}"
    # exact verification tier means no false positives vs the oracle
    assert not (lsh_pairs - bf_pairs)


def test_cluster_assignments_match_oracle(spark, pipe, bf):
    """Pipeline clusters == connected components over true dup pairs."""
    true_pairs = [(r.id_a, r.id_b)
                  for r in bf.filter(F.col("jaccard") >= CFG.jaccard_threshold).collect()]
    exact_edges = [(r.id, r.rep_id) for r in pipe.rep_map.collect() if r.id != r.rep_id]
    oracle = _union_find(true_pairs + exact_edges)
    ours = {r.id: r.cluster_id for r in pipe.clusters.collect()}
    all_ids = [r.id for r in pipe.normalized.select("id").collect()]
    for i in all_ids:
        assert ours[i] == oracle.get(i, i)


def test_cluster_ids_are_min_member(pipe):
    rows = pipe.clusters.groupBy("cluster_id").agg(F.min("id").alias("mn")).collect()
    for r in rows:
        assert r.cluster_id == r.mn


def test_sha256_invariant(spark, pipe):
    """north_rule per-row invariant: content sha256 equality input<->output."""
    rows, _ = generate_corpus(PARAMS)
    expected = {
        (r["repo"], r["path"], r["commit"]):
            hashlib.sha256(r["content"].encode()).hexdigest()
        for r in rows
    }
    out = dedup_output(pipe)
    got = {(r.repo, r.path, r.commit): r.content_sha for r in out.collect()}
    assert got == expected


def test_pruning_ratio_high(pipe):
    m = pipe.metrics
    ratio = pruning_ratio(m["n_records"], m["n_candidates"])
    # reference README claims up to 98% pruning; we should be well past it
    assert ratio > 0.95


def test_topk_and_eval_metrics(spark, pipe, bf):
    """O18/O22/O23: LSH top-k vs BF top-k evaluation, reference
    src/main.cpp:379-471."""
    lsh_topk = pipe.neighbors
    reps = pipe.normalized.join(pipe.signed.select("id"), "id")
    bf_topk = brute_force_topk(reps, CFG)
    # BF top-k includes arbitrarily-distant neighbors; restrict both
    # sides to dup-grade distance for a meaningful recall number
    dup_d = 1 - CFG.jaccard_threshold
    per_q = evaluation_join(
        lsh_topk.filter(F.col("distance") <= dup_d),
        bf_topk.filter(F.col("distance") <= dup_d),
    )
    g = global_metrics(per_q).collect()[0]
    assert g.avg_recall > 0.99
    assert g.avg_fp_rate < 0.01
    assert g.avg_mse < 1e-12  # exact verification => identical distances
    stats = recall_at_1_stats(lsh_topk).collect()[0]
    assert 0 <= stats.p10_sim <= stats.median_sim <= stats.p90_sim <= 1
    # ranks are 1..k dense per query
    bad = (
        lsh_topk.groupBy("query_id")
        .agg(F.max("rank").alias("mx"), F.count("*").alias("n"))
        .filter(F.col("mx") != F.col("n")).count()
    )
    assert bad == 0


def test_partition_invariance(spark):
    """SURVEY.md §5 item 3: same input at different parallelism =>
    identical cluster assignments."""
    params = CorpusParams(n_files=120, dup_frac=0.3, seed=7)
    base = corpus_spark_df(spark, params)
    out = []
    for nparts in (3, 17):
        res = run_pipeline(spark, base.repartition(nparts), CFG,
                           collect_metrics=False)
        out.append({(r.id, r.cluster_id) for r in res.clusters.collect()})
    assert out[0] == out[1]


def test_empty_and_degenerate_inputs(spark):
    src = spark.createDataFrame(
        [("r", "p1", "c", "python", ""),        # filtered by min_content_len=1
         ("r", "p2", "c", "python", "x"),       # shorter than k
         ("r", "p3", "c", "python", None),      # null content
         ("r", "p4", "c", "python", "x")],      # exact dup of p2
        ["repo", "path", "commit", "lang", "content"],
    )
    res = run_pipeline(spark, src, CFG, collect_metrics=False)
    clusters = {r.id: r.cluster_id for r in res.clusters.collect()}
    assert len(clusters) == 2  # only p2/p4 survive the validity filter
    # single-char identical files are exact dups -> same cluster
    assert len(set(clusters.values())) == 1


def test_cc_distributed_rounds_match_driver_finish(spark):
    """The three CC phases are interchangeable physical strategies:
    forcing the distributed star rounds (local_threshold=0) must give
    the same labels as the driver union-find finisher, on a graph with
    chains, cliques, and singletons."""
    from polyminhash_spark.operators.cluster import connected_components

    edges = [(i, i + 1) for i in range(0, 40, 2)]          # 20 pairs
    edges += [(100 + i, 100 + j) for i in range(6) for j in range(i + 1, 6)]
    edges += [(200, 201), (201, 202), (202, 203), (203, 204)]  # chain
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    all_ids = spark.range(0, 300).select(F.col("id").cast("bigint").alias("id"))
    a = connected_components(pairs, all_ids)               # driver finish
    b = connected_components(pairs, all_ids, local_threshold=0)
    sa = {(r.id, r.cluster_id) for r in a.collect()}
    sb = {(r.id, r.cluster_id) for r in b.collect()}
    assert sa == sb
    labels = dict(sa)
    assert labels[204] == 200 and labels[105] == 100 and labels[250] == 250


def test_est_tier_off_identical_clusters(spark):
    """est_tier=False (skip the tier-1 signature-estimate + its
    minhash32 attach joins — the last array shuffle) must yield
    IDENTICAL cluster output: the est cut only pre-prunes pairs the
    exact-verify threshold would reject anyway."""
    import pyspark.sql.functions as F

    from polyminhash_spark.config import default_config
    from polyminhash_spark.pipeline import run_pipeline

    params = CorpusParams(n_files=300, dup_frac=0.3, seed=11)
    src = corpus_spark_df(spark, params)

    def checksum(cfg):
        res = run_pipeline(spark, src, cfg, collect_metrics=False)
        row = res.clusters.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("id", "cluster_id")).alias("h")).collect()[0]
        return row["n"], row["h"]

    assert checksum(default_config()) == \
        checksum(default_config().with_(est_tier=False))


def test_est_tier_auto_resolves_by_scale(spark):
    """est_tier=None (the default) resolves by representative count:
    below est_auto_threshold the tier runs (est_jaccard populated),
    at/above it the tier and its attach joins are dropped (est_jaccard
    NULL) — with identical cluster output either way.  The resolved
    value lands in metrics for observability."""
    import pyspark.sql.functions as F

    from polyminhash_spark.config import default_config
    from polyminhash_spark.pipeline import run_pipeline

    params = CorpusParams(n_files=300, dup_frac=0.3, seed=11)
    src = corpus_spark_df(spark, params)

    small = run_pipeline(spark, src, default_config())
    assert small.metrics["est_tier"] is True
    assert small.verified.filter(F.col("est_jaccard").isNull()).count() == 0

    big = run_pipeline(spark, src,
                       default_config().with_(est_auto_threshold=1))
    assert big.metrics["est_tier"] is False
    assert big.verified.filter(F.col("est_jaccard").isNotNull()).count() == 0

    def checksum(res):
        row = res.clusters.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("id", "cluster_id")).alias("h")).collect()[0]
        return row["n"], row["h"]

    assert checksum(small) == checksum(big)
