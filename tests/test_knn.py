"""Query-vs-data k-NN tests — reference entry point A (two-file mode)."""

import pyspark.sql.functions as F
import pytest

from polyminhash_spark.config import default_config
from polyminhash_spark.corpus import CorpusParams, generate_corpus
from polyminhash_spark.functions.udfs import make_verify_udf
from polyminhash_spark.operators.knn import knn_query

SCHEMA = "repo string, path string, commit string, lang string, content string"
# full-parity config for the oracle comparison: verify every candidate
CFG = default_config().with_(prefilter_estimate=0.0, simhash_hamming_max=64,
                             top_k=5)


@pytest.fixture(scope="module")
def sets(spark):
    rows, _ = generate_corpus(CorpusParams(n_files=120, dup_frac=0.5, seed=33))
    data_rows = [r for i, r in enumerate(rows) if i % 3 != 0]   # 80
    query_rows = [r for i, r in enumerate(rows) if i % 3 == 0]  # 40
    return (spark.createDataFrame(data_rows, SCHEMA),
            spark.createDataFrame(query_rows, SCHEMA))


def _bf_directional(spark, data, queries, cfg):
    """Exact oracle: every query x every data record, exact Jaccard."""
    from polyminhash_spark.operators.normalize import normalize

    qn = normalize(queries, cfg).select(
        F.lower(F.hex("id")).alias("query_id"),
        F.col("norm_content").alias("qc"))
    dn = normalize(data, cfg).select(
        F.lower(F.hex("id")).alias("neighbor_id"),
        F.col("norm_content").alias("dc"))
    verify = make_verify_udf(cfg)
    pairs = qn.crossJoin(dn).withColumn(
        "v", verify(F.col("query_id"), F.col("qc"),
                    F.col("neighbor_id"), F.col("dc")))
    return pairs.select("query_id", "neighbor_id",
                        (1 - F.col("v.jaccard")).alias("distance"))


def test_knn_matches_brute_force_on_near_neighbors(spark, sets):
    data, queries = sets
    got = knn_query(data, queries, CFG)
    got_rows = {(r.query_id, r.neighbor_id): r.distance for r in got.collect()}
    bf = _bf_directional(spark, data, queries, CFG)
    bf_rows = {(r.query_id, r.neighbor_id): r.distance for r in bf.collect()}

    # every returned pair carries the EXACT brute-force distance
    for k, d in got_rows.items():
        assert abs(bf_rows[k] - d) < 1e-12

    # near neighbors (dup-grade, distance <= 0.2) are all recovered
    near = {(q, n) for (q, n), d in bf_rows.items() if d <= 0.2}
    assert near, "corpus produced no cross-set near neighbors"
    missed = near - set(got_rows)
    assert not missed, f"missed {len(missed)}/{len(near)} near neighbors"


def test_knn_ranks_are_dense_and_sorted(spark, sets):
    data, queries = sets
    got = knn_query(data, queries, CFG)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.query_id, []).append(r)
    assert by_q
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= CFG.top_k
        ds = [r.distance for r in rs]
        assert ds == sorted(ds)
