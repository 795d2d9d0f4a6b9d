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
