"""Hypothesis property tests for the kernels (no Spark) — deeper
randomized coverage of the estimator/determinism contracts."""

import numpy as np
from hypothesis import given, settings, strategies as st

from polyminhash_spark.config import DedupConfig
from polyminhash_spark import kernels as K

CFG = DedupConfig(num_perm=32, bands=8, rows_per_band=4)
SEEDS = K.mixed_seeds(CFG.perm_seeds())

texts = st.text(min_size=0, max_size=300)
u64sets = st.lists(st.integers(min_value=1, max_value=(1 << 63) - 1),
                   min_size=0, max_size=200, unique=True)


def _arr(xs):
    return np.sort(np.array(xs, dtype=np.uint64))


@settings(max_examples=50, deadline=None)
@given(texts)
def test_shingles_deterministic_and_distinct(t):
    a = K.char_shingles(t, 7)
    b = K.char_shingles(t, 7)
    assert np.array_equal(a, b)
    assert len(np.unique(a)) == a.size  # distinct
    if len(t.encode("utf-8", errors="replace")) > 0:
        assert a.size >= 1


@settings(max_examples=50, deadline=None)
@given(u64sets, u64sets)
def test_jaccard_bounds_and_symmetry(xs, ys):
    a, b = _arr(xs), _arr(ys)
    j = K.jaccard_arrays(a, b)
    assert 0.0 <= j <= 1.0
    assert j == K.jaccard_arrays(b, a)
    if xs and set(xs) == set(ys):
        assert j == 1.0
    if not set(xs) & set(ys):
        assert j == 0.0


@settings(max_examples=30, deadline=None)
@given(u64sets)
def test_minhash_subset_monotonicity(xs):
    """sig(min over union) slot-wise <= is not required, but identical
    sets must agree and supersets can only lower each slot value."""
    a = _arr(xs)
    sig_a = K.minhash(a, SEEDS)
    extra = _arr(list(set(xs) | {(1 << 62) + 17, (1 << 62) + 18}))
    sig_e = K.minhash(extra, SEEDS)
    assert (sig_e <= sig_a).all()  # adding elements can only shrink mins


@settings(max_examples=30, deadline=None)
@given(u64sets)
def test_band_keys_equal_iff_rows_equal(xs):
    a = _arr(xs)
    sig = K.minhash(a, SEEDS)
    keys = K.band_keys(sig, CFG.bands, CFG.rows_per_band)
    # perturbing one slot changes exactly that band's key
    for slot in (0, CFG.num_perm - 1):
        sig2 = sig.copy()
        sig2[slot] = sig2[slot] ^ np.uint64(0xDEADBEEF)
        keys2 = K.band_keys(sig2, CFG.bands, CFG.rows_per_band)
        band = slot // CFG.rows_per_band
        diff = keys != keys2
        assert diff[band]
        assert diff.sum() == 1


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=300), st.binary(min_size=0, max_size=20))
def test_sa_contains_equals_python_in(text, pattern):
    sa = K.suffix_array(text)
    assert K.sa_contains(text, pattern, sa) == (pattern in text)


@settings(max_examples=25, deadline=None)
@given(st.lists(texts, min_size=1, max_size=12))
def test_signature_batch_parity_random(rows):
    sig, simh, counts, bkeys = K.signature_batch(
        rows, CFG.shingle_k, "char", 1 << 18, SEEDS,
        CFG.bands, CFG.rows_per_band, shingle_budget=32)
    for i, t in enumerate(rows):
        sh = K.shingles_for(t or "", CFG.shingle_k)
        assert np.array_equal(sig[i], K.minhash(sh, SEEDS))
        assert counts[i] == sh.size
