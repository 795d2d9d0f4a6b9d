"""Batch-kernel parity + edge cases (no Spark)."""

import numpy as np

from polyminhash_spark.config import default_config
from polyminhash_spark import kernels as K


CFG = default_config()
SEEDS = K.mixed_seeds(CFG.perm_seeds())


def _single(text):
    sh = K.shingles_for(text, CFG.shingle_k)
    sig = K.minhash(sh, SEEDS)
    sv = K.simhash64(sh)
    sv = sv - (1 << 64) if sv >= (1 << 63) else sv
    return sig, sv, sh.size, K.band_keys(sig, CFG.bands, CFG.rows_per_band)


def test_batch_matches_single_row_path():
    texts = [
        "hello world this is a test of the batch path",
        "",                      # empty -> sentinel signature
        "x",                     # shorter than k
        "another document " * 50,
        "yet another " * 200,
        "naïve ☃ unicode\r\nline",
    ]
    # tiny budget exercises row grouping AND the giant-row fallback
    sig, simh, counts, bkeys = K.signature_batch(
        texts, CFG.shingle_k, "char", 1 << 18, SEEDS,
        CFG.bands, CFG.rows_per_band, shingle_budget=64)
    for i, t in enumerate(texts):
        s_sig, s_sim, s_cnt, s_bk = _single(t)
        assert np.array_equal(sig[i], s_sig), i
        assert simh[i] == s_sim, i
        assert counts[i] == s_cnt, i
        assert np.array_equal(bkeys[i], s_bk), i


def test_batch_budget_invariance():
    texts = [f"document number {i} " * (10 + i % 7) for i in range(50)]
    outs = []
    for budget in (8, 256, 1 << 11, 1 << 18):
        sig, simh, counts, bkeys = K.signature_batch(
            texts, 7, "char", 1 << 18, SEEDS, CFG.bands,
            CFG.rows_per_band, shingle_budget=budget)
        outs.append((sig.copy(), simh.copy(), counts.copy(), bkeys.copy()))
    for o in outs[1:]:
        for a, b in zip(outs[0], o):
            assert np.array_equal(a, b)


def test_batch_none_and_empty_rows():
    sig, simh, counts, bkeys = K.signature_batch(
        [None, "", "abc def ghi jkl"], 7, "char", 1 << 18, SEEDS,
        CFG.bands, CFG.rows_per_band)
    assert (sig[0] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
    assert (sig[1] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
    assert counts[0] == 0 and counts[1] == 0 and counts[2] > 0
    assert simh[0] == 0 and simh[1] == 0


def test_exact_clone_relation_memoized_matches_unmemoized():
    a = "def f():\n    return 1\n" * 5
    b = "# header\n" + a + "# footer\n"
    cache: dict = {}
    assert K.exact_clone_relation(a, b, sa_cache=cache, key_a="a", key_b="b") \
        == K.exact_clone_relation(a, b) == "a_in_b"
    # cache hit path (same keys again)
    assert K.exact_clone_relation(a, b, sa_cache=cache, key_a="a", key_b="b") \
        == "a_in_b"
    assert "b" in cache


def test_oph_batch_matches_single_row_path():
    """impl='oph' batch parity with the per-row oph_minhash kernel,
    across grouping/giant-row/empty shapes."""
    texts = ["hello world this is a test", "", "x",
             "another document " * 50, "yet another " * 200]
    sig, simh, counts, bkeys = K.signature_batch(
        texts, CFG.shingle_k, "char", 1 << 18, SEEDS,
        CFG.bands, CFG.rows_per_band, shingle_budget=64, impl="oph")
    for i, t in enumerate(texts):
        sh = K.shingles_for(t, CFG.shingle_k)
        ref = K.oph_minhash(sh, SEEDS)
        assert np.array_equal(sig[i], ref), i
        assert counts[i] == sh.size
        assert np.array_equal(
            bkeys[i], K.band_keys(ref, CFG.bands, CFG.rows_per_band))
    assert (sig[1] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()


def test_oph_collision_probability_tracks_jaccard():
    """OPH + optimal (independent per-bin) densification stays an
    unbiased-ish Jaccard estimator: mean slot agreement within 0.03 of
    true J."""
    rng = np.random.default_rng(11)
    for m, J in ((1000, 0.8), (1000, 0.3), (60, 0.7)):
        # |A|=|B|=m with intersection giving jaccard ~J
        inter = int(round(J * 2 * m / (1 + J)))
        ests = []
        for _ in range(25):
            common = K.mix64(rng.integers(1, 2**63, inter, dtype=np.uint64))
            ao = K.mix64(rng.integers(1, 2**63, m - inter, dtype=np.uint64))
            bo = K.mix64(rng.integers(1, 2**63, m - inter, dtype=np.uint64))
            A = np.unique(np.concatenate([common, ao]))
            B = np.unique(np.concatenate([common, bo]))
            sa, sb = K.oph_minhash(A, SEEDS), K.oph_minhash(B, SEEDS)
            ests.append(float(np.mean(sa == sb)))
        true_j = inter / (2 * m - inter)
        assert abs(np.mean(ests) - true_j) < 0.03, (m, true_j, np.mean(ests))


def test_oph_deterministic_and_set_function():
    """Same set (any order/duplication) -> same signature."""
    rng = np.random.default_rng(3)
    A = K.mix64(rng.integers(1, 2**63, 500, dtype=np.uint64))
    s1 = K.oph_minhash(A, SEEDS)
    s2 = K.oph_minhash(A[::-1].copy(), SEEDS)
    s3 = K.oph_minhash(np.concatenate([A, A[:100]]), SEEDS)
    assert np.array_equal(s1, s2) and np.array_equal(s1, s3)
    # sparse set exercises densification; still deterministic
    tiny = A[:3]
    assert np.array_equal(K.oph_minhash(tiny, SEEDS),
                          K.oph_minhash(tiny[::-1].copy(), SEEDS))
    assert not (K.oph_minhash(tiny, SEEDS) == K.EMPTY_SLOT).any()


def test_char_shingles_batch_property_parity():
    """The parity the char_shingles_batch docstring claims (r3 advice:
    the claimed property test did not exist): bit-exact equality with
    per-row char_shingles over random multi-byte UTF-8 texts, SLICED
    Arrow arrays (non-zero buffer offset), tiny block_bytes (forces
    row grouping AND the giant-single-row path), and a small
    max_shingles cap."""
    import pyarrow as pa

    rng = np.random.default_rng(77)
    alphabet = list("abcdefgh ") + ["é", "日", "🎉", "ß", "\n", "\t"]
    texts = []
    for i in range(60):
        n = int(rng.integers(0, 120))
        texts.append("".join(rng.choice(alphabet) for _ in range(n)))
    texts += ["", "ab", "🎉" * 3, "x" * 5000]  # empty, sub-k, emoji, giant

    k = 7
    for arr_type, odt in ((pa.string(), np.int32),
                          (pa.large_string(), np.int64)):
        full = pa.array(texts, type=arr_type)
        for sliced in (full, full.slice(3, 50), full.slice(17)):
            assert sliced.null_count == 0
            bufs = sliced.buffers()
            offsets = np.frombuffer(bufs[1], dtype=odt)[
                sliced.offset: sliced.offset + len(sliced) + 1]
            data = np.frombuffer(bufs[2], dtype=np.uint8)
            for block_bytes, max_sh in ((1 << 15, 1 << 18), (64, 1 << 18),
                                        (64, 10)):
                got = K.char_shingles_batch(data, offsets, k,
                                            max_shingles=max_sh,
                                            block_bytes=block_bytes)
                assert len(got) == len(sliced)
                for row_out, text in zip(got, sliced.to_pylist()):
                    expect = K.char_shingles(text, k, max_shingles=max_sh)
                    assert row_out.dtype == expect.dtype
                    assert np.array_equal(row_out, expect), text


def test_band_key_bits_32_narrows_schema_and_keeps_clusters(spark):
    """config.band_key_bits=32 (the narrow-shuffle experiment): the
    bands column narrows to array<int> (4 B/key on the band-table
    shuffle), keys are the TOP 32 bits of the mix64 fold, and —
    because collisions only ADD candidates and verify is exact — the
    end-to-end clusters match the 64-bit run."""
    from polyminhash_spark.corpus import CorpusParams, corpus_spark_df
    from polyminhash_spark.pipeline import dedup_output, run_pipeline

    cfg64 = default_config()
    cfg32 = cfg64.with_(band_key_bits=32)
    src = corpus_spark_df(spark, CorpusParams(n_files=120, dup_frac=0.3,
                                              seed=21))
    r64 = run_pipeline(spark, src, cfg64, collect_metrics=False)
    r32 = run_pipeline(spark, src, cfg32, collect_metrics=False)
    t64 = dict(r64.signed.dtypes)
    t32 = dict(r32.signed.dtypes)
    assert t64["bands"] == "array<bigint>"
    assert t32["bands"] == "array<int>"
    a = {(r.id, r.cluster_id) for r in dedup_output(r64).collect()}
    b = {(r.id, r.cluster_id) for r in dedup_output(r32).collect()}
    assert a == b
    # keys really are the top halves: recompute one row both ways
    row64 = r64.signed.select("id", "bands").orderBy("id").first()
    row32 = r32.signed.select("id", "bands").orderBy("id").first()
    assert row64.id == row32.id
    got64 = np.array(row64.bands, dtype=np.int64).view(np.uint64)
    got32 = np.array(row32.bands, dtype=np.int32).view(np.uint32)
    assert list(got64 >> np.uint64(32)) == [int(x) for x in got32]
