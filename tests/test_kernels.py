"""Kernel unit tests (no Spark) — SURVEY.md §5 item 1."""

import numpy as np
import pytest

from polyminhash_spark.config import DedupConfig, default_config, reference_config
from polyminhash_spark.kernels import (
    band_keys,
    bytes_hash,
    char_shingles,
    exact_clone_relation,
    hamming64,
    jaccard_arrays,
    minhash,
    mixed_seeds,
    normalize_text,
    rejection_minhash_weighted,
    sa_contains,
    sig_estimate,
    simhash64,
    suffix_array,
    token_shingles,
)


def test_config_seed_derivation_mirrors_reference():
    # reference: seed[h][i] = 100 + h*123 + i*17 (src/query.cpp:352,427-429)
    cfg = reference_config()
    assert cfg.perm_seeds() == [100, 100 + 123]
    cfg = DedupConfig(num_perm=6, bands=3, rows_per_band=2, seed=100)
    assert cfg.perm_seeds() == [100, 117, 223, 240, 346, 363]


def test_config_validation():
    with pytest.raises(ValueError):
        DedupConfig(num_perm=10, bands=3, rows_per_band=4)


def test_char_shingles_known():
    h = char_shingles("hello world", 5)
    assert h.dtype == np.uint64
    # 11 chars -> 7 windows, all distinct here
    assert h.size == 7
    # deterministic across calls
    assert np.array_equal(h, char_shingles("hello world", 5))
    # shared windows hash equal: "abcdefg" and "xabcdefg" share all "abcdefg" grams
    a = char_shingles("abcdefgh", 5)
    b = char_shingles("xabcdefgh", 5)
    assert np.intersect1d(a, b).size == a.size


def test_char_shingles_edges():
    assert char_shingles("", 5).size == 0
    short = char_shingles("ab", 5)
    assert short.size == 1 and int(short[0]) == bytes_hash(b"ab")
    # unicode + CRLF don't crash and are deterministic
    u = char_shingles("naïve\r\nsnow☃man", 5)
    assert u.size > 0 and np.array_equal(u, char_shingles("naïve\r\nsnow☃man", 5))


def test_token_shingles():
    a = token_shingles("def foo(x): return x + 1", 3)
    b = token_shingles("def foo(y): return y + 1", 3)
    assert a.size > 0 and b.size > 0
    assert jaccard_arrays(a, a) == 1.0
    assert 0.0 < jaccard_arrays(a, b) < 1.0
    assert token_shingles("", 3).size == 0
    assert token_shingles("x", 3).size == 1  # fewer tokens than k


def test_normalize_text():
    assert normalize_text("a\r\nb\rc") == "a\nb\nc"
    assert normalize_text("﻿hi") == "hi"
    assert normalize_text(None) is None


def test_minhash_properties():
    cfg = default_config()
    seeds = mixed_seeds(cfg.perm_seeds())
    s = char_shingles("some sample text for hashing purposes", 5)
    sig = minhash(s, seeds)
    assert sig.shape == (cfg.num_perm,)
    assert np.array_equal(sig, minhash(s, seeds))  # deterministic
    # identical sets -> identical signatures
    assert np.array_equal(sig, minhash(s.copy(), seeds))
    # empty set sentinel
    empty = minhash(np.empty(0, dtype=np.uint64), seeds)
    assert (empty == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
    # chunking does not change result
    assert np.array_equal(minhash(s, seeds, chunk=3), sig)


def test_minhash_collision_probability_tracks_jaccard():
    """FIXTURES.md F3: |mean(sig_a==sig_b) - J| within binomial tolerance.
    This is the estimator contract the reference's rejection-sampling
    kernel implements geometrically (src/geoutil.cpp:478-550)."""
    rng = np.random.default_rng(7)
    seeds = mixed_seeds(DedupConfig(num_perm=256, bands=64, rows_per_band=4).perm_seeds())
    for target_j in (0.1, 0.3, 0.5, 0.7, 0.9):
        n_union = 2000
        vals = np.unique(rng.integers(1, 1 << 40, size=n_union * 2, dtype=np.uint64))[:n_union]
        n_common = int(round(target_j * n_union))
        common, rest = vals[:n_common], vals[n_common:]
        half = len(rest) // 2
        a = np.sort(np.concatenate([common, rest[:half]]))
        b = np.sort(np.concatenate([common, rest[half : 2 * half]]))
        j = jaccard_arrays(a, b)
        est = sig_estimate(minhash(a, seeds), minhash(b, seeds))
        tol = 4 * np.sqrt(j * (1 - j) / 256) + 0.02
        assert abs(est - j) < tol, (j, est)


def test_simhash_near_duplicates_have_small_hamming():
    rng = np.random.default_rng(11)
    base = np.unique(rng.integers(1, 1 << 40, size=3000, dtype=np.uint64))
    # 5% perturbation
    variant = base.copy()
    variant[:150] = rng.integers(1 << 41, 1 << 42, size=150, dtype=np.uint64)
    variant = np.unique(variant)
    h1, h2 = simhash64(base), simhash64(variant)
    assert hamming64(h1, h2) <= 10
    # unrelated sets: large hamming
    other = np.unique(rng.integers(1 << 43, 1 << 44, size=3000, dtype=np.uint64))
    assert hamming64(h1, simhash64(other)) > 16
    assert simhash64(np.empty(0, dtype=np.uint64)) == 0


def test_band_keys_and_banding_truth_table():
    """FIXTURES.md F3 banding truth table: candidate iff some band fully
    equal (AND within band, OR across bands — src/util.cpp:381-397,
    src/query.cpp:132-162)."""
    cfg = DedupConfig(num_perm=8, bands=4, rows_per_band=2, seed=100)
    sig_a = np.arange(8, dtype=np.uint64)
    # equal only in band 2 (slots 4,5)
    sig_b = sig_a.copy()
    sig_b[[0, 1, 2, 3, 6, 7]] = np.uint64(999)
    ka, kb = band_keys(sig_a, 4, 2), band_keys(sig_b, 4, 2)
    assert (ka == kb).tolist() == [False, False, True, False]
    # differing in ONE row of a band breaks that band's key (AND semantics)
    sig_c = sig_a.copy()
    sig_c[5] = np.uint64(999)
    kc = band_keys(sig_c, 4, 2)
    assert not kc[2] == ka[2]
    assert (band_keys(sig_a, 4, 2) == ka).all()


def test_jaccard_goldens():
    a = np.array([1, 2, 3, 4], dtype=np.uint64)
    b = np.array([3, 4, 5, 6], dtype=np.uint64)
    assert jaccard_arrays(a, b) == pytest.approx(2 / 6)
    assert jaccard_arrays(a, a) == 1.0
    e = np.empty(0, dtype=np.uint64)
    # both-empty convention: similarity 0 (distance 1), src/geoutil.cpp:157-160
    assert jaccard_arrays(e, e) == 0.0
    assert jaccard_arrays(a, e) == 0.0


def test_suffix_array_and_contains():
    for s in [b"banana", b"abracadabra", b"aaaa", b"ab" * 50, b"x"]:
        sa = suffix_array(s)
        expected = sorted(range(len(s)), key=lambda i: s[i:])
        assert sa.tolist() == expected, s
    text = b"the quick brown fox jumps over the lazy dog"
    sa = suffix_array(text)
    for pat in [b"quick", b"the", b"dog", b"fox jumps", text]:
        assert sa_contains(text, pat, sa) == (pat in text)
    for pat in [b"cat", b"quicker", b"zzz", text + b"!"]:
        assert sa_contains(text, pat, sa) == (pat in text)
    assert sa_contains(text, b"", sa) is True
    assert suffix_array(b"").size == 0


def test_suffix_array_vs_naive_random():
    rng = np.random.default_rng(3)
    for _ in range(20):
        s = bytes(rng.integers(97, 101, size=200, dtype=np.uint8))
        sa = suffix_array(s)
        pat = bytes(rng.integers(97, 101, size=int(rng.integers(1, 8)), dtype=np.uint8))
        assert sa_contains(s, pat, sa) == (pat in s)


def test_exact_clone_relation():
    a = "def f():\n    return 1\n"
    b = "# header\n" + a + "# footer\n"
    assert exact_clone_relation(a, a) == "equal"
    assert exact_clone_relation(a, b) == "a_in_b"
    assert exact_clone_relation(b, a) == "b_in_a"
    assert exact_clone_relation(a, "something else entirely") == "none"


def test_rejection_minhash_fidelity():
    """SURVEY.md §2.3: the reference's attempt-count kernel must rank
    pair similarity consistently with overlap at the same seed config —
    collision prob rises with weighted Jaccard."""
    seeds = [100 + h * 123 for h in range(200)]  # reference seed_fn, b=200, r=1
    domain = 100
    base = {i: 1.0 for i in range(40)}
    near = {i: 1.0 for i in range(5, 45)}    # overlap 35/45
    far = {i: 1.0 for i in range(60, 100)}   # overlap 0
    h_base = rejection_minhash_weighted(base, domain, seeds)
    h_near = rejection_minhash_weighted(near, domain, seeds)
    h_far = rejection_minhash_weighted(far, domain, seeds)
    p_near = float(np.mean(h_base == h_near))
    p_far = float(np.mean(h_base == h_far))
    assert p_near > p_far
    assert p_near > 0.5  # high-overlap pairs collide often


def test_token_shingles_factorized_parity():
    """The factorized token-hash path (pd.factorize + per-distinct-token
    bytes_hash, kernels.py) must equal the straightforward
    hash-every-token loop bit-for-bit on every input shape."""
    from polyminhash_spark.kernels import (_FNV, _TOKEN_RE, bytes_hash,
                                           mix64, token_shingles)

    def reference(text, k):
        toks = _TOKEN_RE.findall(text)
        if not toks:
            return np.empty(0, dtype=np.uint64)
        th = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            th[i] = bytes_hash(t.encode("utf-8", errors="replace"))
        if len(toks) < k:
            h = th[:1].copy()
            for j in range(1, len(toks)):
                h = h * _FNV + th[j:j + 1]
            return mix64(h)
        m = len(toks) - k + 1
        h = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            h = h * _FNV + th[j:j + m]
        return np.unique(mix64(h))

    samples = [
        "", "x", "a b", "def f(x): return x + 1",
        "same same same same same same same same",
        "def handler(req):\n    return req.value * 2\n" * 50,
        "unicode: éè 中文 tokens 123 !!",
    ]
    for k in (2, 7):
        for t in samples:
            assert np.array_equal(token_shingles(t, k), reference(t, k)), (k, t[:40])
