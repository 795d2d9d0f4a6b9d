"""merge_rerank (O19) and token-shingle config-path tests."""

import pyspark.sql.functions as F

from polyminhash_spark.config import DedupConfig, default_config
from polyminhash_spark.operators.topk import merge_rerank, topk_neighbors


def test_merge_rerank_matches_single_global_topk(spark):
    """O19 contract: union of partial top-k result sets + re-rank must
    equal one global window top-k (the reference's rank-0 file merge,
    src/main.cpp:204-251, without the files)."""
    rows = []
    for q in range(5):
        for n in range(8):
            rows.append((f"q{q}", f"n{n}", 0.1 * ((q * 3 + n) % 7)))
    verified = spark.createDataFrame(rows, ["id_a", "id_b", "x"]) \
        .select("id_a", "id_b", (1 - F.col("x")).alias("jaccard"))
    k = 3
    full = topk_neighbors(verified, k)

    # "per-rank" partials: split by neighbor parity, top-k each, merge
    part1 = topk_neighbors(verified.filter(F.substring("id_b", 2, 1).cast("int") % 2 == 0), k)
    part2 = topk_neighbors(verified.filter(F.substring("id_b", 2, 1).cast("int") % 2 == 1), k)
    merged = merge_rerank([part1, part2], k)

    got = {(r.query_id, r.neighbor_id, r.rank) for r in merged.collect()}
    want = {(r.query_id, r.neighbor_id, r.rank) for r in full.collect()}
    assert got == want


def test_token_shingle_config_end_to_end(spark):
    """shingle_unit='token' must run the whole pipeline and still unite
    whitespace-variant duplicates (token shingles ignore spacing)."""
    from polyminhash_spark.pipeline import run_pipeline

    base = "def f(a, b):\n    return a + b * 41\n" * 8
    spaced = base.replace("    ", "\t").replace(" + ", "  +  ")
    rows = [("r", "p1", "c" * 40, "python", base),
            ("r", "p2", "d" * 40, "python", spaced)] + [
        ("r", f"q{i}", f"{i:040d}", "python",
         f"unique {i} content " * 20) for i in range(20)]
    src = spark.createDataFrame(
        rows, ["repo", "path", "commit", "lang", "content"])
    cfg = DedupConfig(shingle_unit="token", shingle_k=5, num_perm=128,
                      bands=32, rows_per_band=4)
    res = run_pipeline(spark, src, cfg, collect_metrics=False)
    clusters = {r.id: r.cluster_id for r in res.clusters.collect()}
    assert len(clusters) == 22
    pair_ids = [r.id for r in res.normalized
                .filter(F.col("path").isin("p1", "p2")).collect()]
    assert clusters[pair_ids[0]] == clusters[pair_ids[1]]
    # char-shingle config at the same threshold may or may not unite
    # them; the token path must (whitespace-only mutation)
