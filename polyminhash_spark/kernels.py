"""Pure-numpy kernels — unit-testable without Spark (SURVEY.md §7).

These are the compute hearts of the pipeline; the Spark layer wraps
them in Arrow-vectorized pandas UDFs (polyminhash_spark/functions/udfs.py).
No runtime RNG anywhere: every value is a pure function of
(content, config), per the determinism contract the reference
establishes with its fixed seed scheme (reference src/query.cpp:352,
427-429 — seeds {100 + band*123 + row*17}).

Kernel map to the reference (SURVEY.md §2):
  * char_shingles / token_shingles  — O10 feature extraction (the
    analog of the grid-cell sketch, reference src/geoutil.cpp:417-447)
  * minhash                         — O12 MinHash kernel.  The reference's
    rejection-sampling attempt count (src/geoutil.cpp:478-550) and
    permutation MinHash are the same estimator family (SURVEY.md §2.3);
    `rejection_minhash_weighted` below reproduces the reference
    semantics for the fidelity test.
  * simhash64                       — north_rule secondary bit-signature
  * band_keys                       — O14 banding (b tables × r rows,
    reference src/query.cpp:343-349, src/util.cpp:381-397)
  * jaccard_arrays / sig_estimate   — O16/O17 verification distances
    (reference src/geoutil.cpp:122-201)
  * suffix_array / sa_contains      — north_rule exact-clone substring
    verifier
"""

from __future__ import annotations

import re

import numpy as np

U64 = np.uint64
_MIX1 = U64(0xFF51AFD7ED558CCD)
_MIX2 = U64(0xC4CEB9FE1A85EC53)
_FNV = U64(0x100000001B3)
_GOLDEN = U64(0x9E3779B97F4A7C15)
_SHIFT33 = U64(33)
EMPTY_SLOT = U64(0xFFFFFFFFFFFFFFFF)  # signature slot for an empty shingle set

_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*|\d+|[^\sA-Za-z_0-9]")


def mix64(x: np.ndarray) -> np.ndarray:
    """MurmurHash3 fmix64 finalizer — bijective uint64 mixer."""
    x = x ^ (x >> _SHIFT33)
    x = x * _MIX1
    x = x ^ (x >> _SHIFT33)
    x = x * _MIX2
    x = x ^ (x >> _SHIFT33)
    return x


def normalize_text(text: str) -> str:
    """Deterministic content canonicalization — the analog of the
    reference's centroid normalization applied identically on both sides
    of every comparison (reference src/geoutil.cpp:259-274, applied at
    src/query.cpp:264-272 and src/main.cpp:152-160).

    Must stay in lock-step with operators/normalize.py (JVM-side)."""
    if text is None:
        return None
    if text.startswith("\ufeff"):
        text = text[1:]
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    return text


_MASK64 = (1 << 64) - 1
_FNV_INT = int(_FNV)
_GOLDEN_INT = int(_GOLDEN)


def bytes_hash(data: bytes, seed: int = 0) -> int:
    """FNV-style polynomial hash of a byte string, mixed. Deterministic.
    Python-int arithmetic (only used for short strings: tokens, sub-k
    fallbacks), wrapped mod 2^64 to match the vectorized rolling hash."""
    h = (seed * _FNV_INT + _GOLDEN_INT) & _MASK64
    for b in data:
        h = (h * _FNV_INT + b) & _MASK64
    return int(mix64(np.array([h], dtype=np.uint64))[0])


def char_shingles(text: str, k: int, max_shingles: int = 1 << 18) -> np.ndarray:
    """Distinct k-byte-gram hashes of utf-8 encoded text, as uint64.

    Vectorized rolling polynomial: h(w) = fmix(sum_j w[j] * FNV^(k-1-j)),
    computed with k shifted vector ops (no per-window Python loop)."""
    data = text.encode("utf-8", errors="replace")
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        return np.array([bytes_hash(data)], dtype=np.uint64)
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h = h * _FNV + arr[j : j + m]
    h = np.unique(mix64(h))
    if h.size > max_shingles:
        # deterministic cap: keep smallest hashes (a uniform subsample)
        h = np.partition(h, max_shingles)[:max_shingles]
        h.sort()
    return h


def token_shingles(text: str, k: int, max_shingles: int = 1 << 18) -> np.ndarray:
    """Distinct k-token-gram hashes (identifier/number/punct tokens).

    Token hashing is factorized: pandas codes the token stream at C
    speed, bytes_hash runs once per DISTINCT token (source code repeats
    identifiers heavily — measured ~10-40x fewer hash calls), and the
    rolling k-gram fold over the looked-up code array is pure numpy."""
    import pandas as pd

    toks = _TOKEN_RE.findall(text)
    if not toks:
        return np.empty(0, dtype=np.uint64)
    codes, uniques = pd.factorize(np.asarray(toks, dtype=object))
    lut = np.fromiter(
        (bytes_hash(t.encode("utf-8", errors="replace")) for t in uniques),
        dtype=np.uint64, count=len(uniques))
    th = lut[codes]
    if len(toks) < k:
        h = th[:1].copy()
        for j in range(1, len(toks)):
            h = h * _FNV + th[j : j + 1]
        return mix64(h)
    m = len(toks) - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h = h * _FNV + th[j : j + m]
    h = np.unique(mix64(h))
    if h.size > max_shingles:
        h = np.partition(h, max_shingles)[:max_shingles]
        h.sort()
    return h


def shingles_for(text: str, k: int, unit: str = "char",
                 max_shingles: int = 1 << 18) -> np.ndarray:
    if unit == "char":
        return char_shingles(text, k, max_shingles)
    return token_shingles(text, k, max_shingles)


def char_shingles_batch(buf: np.ndarray, offsets: np.ndarray, k: int,
                        max_shingles: int = 1 << 18,
                        block_bytes: int = 1 << 15) -> list[np.ndarray]:
    """char_shingles over a whole Arrow string batch without
    materializing Python strings: `buf` is the batch's contiguous UTF-8
    data buffer (uint8), `offsets` the n+1 row boundaries.  Rows are
    processed in ~block_bytes groups so the rolling-hash temporaries
    stay cache-resident — one whole-buffer pass allocates multi-MB
    temps per vector op and page-faults its way to ~25x slower
    (measured; the same L2-blocking lesson as signature_batch).
    Bit-identical to per-row char_shingles (Arrow's buffer bytes ARE
    text.encode('utf-8'); property-tested including multi-byte
    UTF-8 and sliced arrays)."""
    n_rows = len(offsets) - 1
    out: list[np.ndarray] = [None] * n_rows  # type: ignore[list-item]
    r = 0
    while r < n_rows:
        # group rows until ~block_bytes (always >= 1 row)
        g0 = r
        glo = int(offsets[r])
        while r < n_rows and int(offsets[r + 1]) - glo <= block_bytes:
            r += 1
        if r == g0:
            r += 1  # giant single row: process alone
        ghi = int(offsets[r])
        if ghi - glo >= k:
            arr = buf[glo:ghi].astype(np.uint64)
            m = len(arr) - k + 1
            h = np.zeros(m, dtype=np.uint64)
            for j in range(k):
                h = h * _FNV + arr[j : j + m]
            h = mix64(h)
        else:
            h = np.empty(0, dtype=np.uint64)
        for i in range(g0, r):
            lo, hi = int(offsets[i]) - glo, int(offsets[i + 1]) - glo
            nb = hi - lo
            if nb == 0:
                out[i] = np.empty(0, dtype=np.uint64)
            elif nb < k:
                out[i] = np.array(
                    [bytes_hash(buf[glo + lo : glo + hi].tobytes())],
                    dtype=np.uint64)
            else:
                g = np.unique(h[lo : hi - k + 1])
                if g.size > max_shingles:
                    g = np.partition(g, max_shingles)[:max_shingles]
                    g.sort()
                out[i] = g
    return out


def mixed_seeds(seeds: list[int] | np.ndarray) -> np.ndarray:
    """Spread the reference's small arithmetic seeds (100 + band*123 +
    row*17) over the full 64-bit space before use as xor keys."""
    s = np.asarray(seeds, dtype=np.uint64)
    return mix64(s * _GOLDEN + _FNV)


def _perm_muls(seeds_mixed: np.ndarray) -> np.ndarray:
    """Odd per-permutation multipliers derived from the mixed seeds."""
    return (seeds_mixed << U64(1)) | U64(1)


def minhash(shingles: np.ndarray, seeds_mixed: np.ndarray,
            chunk: int = 1 << 11) -> np.ndarray:
    """Permutation-MinHash signature: sig[i] = min over shingles of
    (x ^ seed_i) * odd(seed_i)  (a bijective uint64 reordering per
    permutation; shingle hashes are already fmix-uniform, so two cheap
    ops per element suffice — the collision-probability property test
    in tests/test_kernels.py guards the estimator quality).  The
    vectorized analog of the reference's per-slot sampling loop
    (src/geoutil.cpp:478-550).  Empty set → EMPTY_SLOT sentinel."""
    p = len(seeds_mixed)
    if shingles.size == 0:
        return np.full(p, EMPTY_SLOT, dtype=np.uint64)
    muls = _perm_muls(seeds_mixed)
    out = np.full(p, EMPTY_SLOT, dtype=np.uint64)
    for lo in range(0, shingles.size, chunk):
        block = shingles[lo : lo + chunk]
        y = (block[:, None] ^ seeds_mixed[None, :]) * muls[None, :]
        np.minimum(out, y.min(axis=0), out=out)
    return out


def oph_minhash(shingles: np.ndarray, seeds_mixed: np.ndarray) -> np.ndarray:
    """One-permutation MinHash (Shrivastava & Li, ICML 2014) with
    per-bin INDEPENDENT densification (the "optimal densification"
    construction, Shrivastava ICML 2017): ONE pass buckets the shingle
    hashes into P slots (bucket = value mod P) and keeps the
    per-bucket min; each empty bin borrows from a filled bin selected
    by that bin's own seed, re-mixed with the bin seed.  O(N + P)
    versus the P-pass permutation kernel's O(N*P) — the scale kernel
    for wide signatures.

    Why NOT rotation (borrow-from-right) densification: contiguous
    empty runs all borrow the same source, so two sparse documents
    sharing a single shingle match on the WHOLE run — measured on the
    300k corpus it inflated the max LSH bucket 990 -> 5,288 and pair
    volume 3.6x.  Independent per-bin sources decorrelate the runs;
    P(slot_a == slot_b) tracks Jaccard (property-tested).
    Empty set -> EMPTY_SLOT."""
    P = len(seeds_mixed)
    if shingles.size == 0:
        return np.full(P, EMPTY_SLOT, dtype=np.uint64)
    b = (shingles % U64(P)).astype(np.int64)
    # within-bucket order from the bucket's OWN seed (one independent
    # permutation per bin, as in the paper's split of h(x) into
    # (bin, rank) parts) — ranking by the raw value instead correlates
    # winners across docs through corpus-popular small-valued shingles
    v = mix64(shingles ^ seeds_mixed[b])
    order = np.lexsort((v, b))
    bs, vs = b[order], v[order]
    first = np.ones(len(bs), dtype=bool)
    first[1:] = bs[1:] != bs[:-1]
    sig = np.full(P, EMPTY_SLOT, dtype=np.uint64)
    sig[bs[first]] = vs[first]
    empty = sig == EMPTY_SLOT
    if empty.any() and not empty.all():
        # optimal densification (Shrivastava, ICML 2017): each empty
        # bin probes bins in a DOC-INDEPENDENT pseudo-random sequence
        # and borrows from the first non-empty one.  Because the
        # sequence depends only on the bin index, two documents with
        # similar occupancy pick the same donor, so borrowed slots
        # match with probability ~J like filled ones.  (Selecting
        # "k-th element of this doc's filled list" instead decorrelates
        # donors across docs and collapses sparse-set slot agreement —
        # measured 0.32 vs true J 0.69.)
        empty_idx = np.nonzero(empty)[0]
        src = np.full(len(empty_idx), -1, dtype=np.int64)
        pending = np.arange(len(empty_idx))
        t = 0
        while pending.size and t < 8 * P:
            # probe constant via Python-int wraparound (numpy scalar
            # uint64 multiply emits RuntimeWarning on intended overflow)
            tg = U64((t * _GOLDEN_INT) & _MASK64)
            probe = (mix64(seeds_mixed[empty_idx[pending]]
                           ^ tg) % U64(P)).astype(np.int64)
            hit = ~empty[probe]
            src[pending[hit]] = probe[hit]
            pending = pending[~hit]
            t += 1
        if pending.size:  # astronomically unlikely: give up probing
            src[pending] = np.nonzero(~empty)[0][0]
        sig[empty_idx] = mix64(sig[src] ^ seeds_mixed[empty_idx])
    return sig


def _oph_batch(concat: np.ndarray, starts: np.ndarray, sizes: np.ndarray,
               seeds_mixed: np.ndarray) -> np.ndarray:
    """Vectorized one-permutation MinHash over a BLOCK of rows —
    bit-identical to calling oph_minhash per row (property-tested).

    The per-row kernel pays ~15 small numpy calls per document; at
    ~700 shingles/row that call overhead dominates the arithmetic
    (measured 137 us/row at the 100k bench corpus).  This path runs
    the same operations once per block: bucket/value for the whole
    concatenated shingle array, one lexsort on (row*P + bucket, value)
    for the per-(row,bucket) minima, and densification probing driven
    by the SAME doc-independent (bin, t) probe sequence, advanced for
    every still-empty (row, bin) pair of the block at once.  All
    probes test the ORIGINAL occupancy mask and all borrowed values
    are written afterwards, exactly like the per-row kernel."""
    P = len(seeds_mixed)
    m = len(sizes)
    row_idx = np.repeat(np.arange(m, dtype=np.int64), sizes)
    b = (concat % U64(P)).astype(np.int64)
    v = mix64(concat ^ seeds_mixed[b])
    key = row_idx * P + b
    # scatter-min per (row, bucket): identical result to sorting by key
    # and taking the first value, ~40x cheaper than the lexsort
    flat = np.full(m * P, EMPTY_SLOT, dtype=np.uint64)
    np.minimum.at(flat, key, v)
    sig = flat.reshape(m, P)
    empty = sig == EMPTY_SLOT
    ne = empty.sum(axis=1)
    need = np.nonzero((ne > 0) & (ne < P))[0]
    if need.size:
        er, eb = np.nonzero(empty[need])
        er = need[er]  # absolute block-row index per empty bin
        src = np.full(er.size, -1, dtype=np.int64)
        pending = np.arange(er.size)
        t = 0
        while pending.size and t < 8 * P:
            tg = U64((t * _GOLDEN_INT) & _MASK64)
            probe = (mix64(seeds_mixed[eb[pending]] ^ tg)
                     % U64(P)).astype(np.int64)
            hit = ~empty[er[pending], probe]
            src[pending[hit]] = probe[hit]
            pending = pending[~hit]
            t += 1
        if pending.size:  # astronomically unlikely: give up probing
            fallback = np.argmax(~empty, axis=1)
            src[pending] = fallback[er[pending]]
        sig[er, eb] = mix64(sig[er, src] ^ seeds_mixed[eb])
    return sig


def _simhash_block(concat: np.ndarray, starts: np.ndarray,
                   sizes: np.ndarray) -> np.ndarray:
    """Per-row 64-bit SimHash over a block's concatenated shingles —
    the same majority-vote arithmetic as the grouped loop, with the
    bit matrix unpacked bytewise (np.unpackbits on the little-endian
    uint64 view == ((x >> j) & 1) for j in 0..63) when the platform is
    little-endian, falling back to the shift formulation otherwise."""
    import sys

    if sys.byteorder == "little":
        bits = np.unpackbits(concat.view(np.uint8).reshape(-1, 8),
                             axis=1, bitorder="little")
    else:  # pragma: no cover - non-LE platforms
        shifts = np.arange(64, dtype=np.uint64)
        bits = ((concat[:, None] >> shifts[None, :]) & U64(1)) \
            .astype(np.uint8)
    # int16 accumulation is exact for rows <= 32767 shingles (the
    # oph_block budget is 2^14) and twice as SIMD-dense as int64 —
    # with a size-driven fallback so an oversized caller-supplied
    # budget can never overflow silently; 2*s >= n is tested as
    # s >= ceil(n/2) so the sum is never doubled
    dt = np.int16 if (len(sizes) == 0 or sizes.max() <= 32767) else np.int64
    sums = np.add.reduceat(bits, starts, axis=0, dtype=dt)
    shifts = np.arange(64, dtype=np.uint64)
    maj = (sums >= ((sizes + 1) // 2)[:, None]).astype(np.uint64)
    return (maj << shifts[None, :]).sum(axis=1, dtype=np.uint64) \
        .view(np.int64)


def signature_batch(texts, k: int, unit: str, max_shingles: int,
                    seeds_mixed: np.ndarray, bands: int, rows_per_band: int,
                    shingle_budget: int = 1 << 11, impl: str = "perm",
                    sh_list: list | None = None,
                    oph_block: int = 1 << 14):
    """Whole-Arrow-batch signature kernel: shingle every row, then
    process rows in groups whose concatenated shingle count fits the
    budget — ONE (total_shingles × num_perm) matrix per group with
    `np.minimum.reduceat` per-row mins, instead of per-row matrices.
    ~2 ops/element with an L2-cache-resident working set (budget 2048
    shingles x 128 perms x 8 B = 2 MB — measured 4-5x faster than
    DRAM-sized chunks).

    Returns (sig (n, P) uint64, simhash (n,) int64, counts (n,) int32,
    band_keys (n, bands) uint64).

    `sh_list` (precomputed per-row shingle arrays, e.g. from
    char_shingles_batch's zero-copy Arrow path) skips the per-row
    shingling; `texts` is ignored then."""
    n = len(sh_list) if sh_list is not None else len(texts)
    P = len(seeds_mixed)
    muls = _perm_muls(seeds_mixed)
    sig = np.full((n, P), EMPTY_SLOT, dtype=np.uint64)
    simh = np.zeros(n, dtype=np.int64)
    counts = np.zeros(n, dtype=np.int32)

    if sh_list is None:
        sh_list = [shingles_for(t or "", k, unit, max_shingles) for t in texts]
    else:
        sh_list = list(sh_list)  # mutated below (giant-row zeroing)
    for i in range(n):
        counts[i] = sh_list[i].size
        if sh_list[i].size > shingle_budget:
            # giant row: chunked single-row path, then drop from grouping
            sig[i] = (oph_minhash(sh_list[i], seeds_mixed) if impl == "oph"
                      else minhash(sh_list[i], seeds_mixed,
                                   chunk=shingle_budget))
            sv = simhash64(sh_list[i])
            simh[i] = sv - (1 << 64) if sv >= (1 << 63) else sv
            sh_list[i] = np.empty(0, dtype=np.uint64)

    # block budget: the perm kernel's (shingles x P) matrix needs the
    # small L2-resident budget; the oph path's largest temps are the
    # 64-wide bit matrix and the flat lexsort keys, so it groups far
    # more rows per block — fewer numpy dispatches per row (r6: the
    # per-row oph loop + 2048-shingle simhash groups spent more time
    # in call overhead than arithmetic; measured 2.6x on the kernel)
    budget = oph_block if impl == "oph" else shingle_budget
    i = 0
    while i < n:
        rows, starts, tot = [], [], 0
        j = i
        while j < n and (tot == 0 or tot + sh_list[j].size <= budget):
            if sh_list[j].size:
                rows.append(j)
                starts.append(tot)
                tot += sh_list[j].size
            j += 1
        i = j
        if not rows:
            continue
        concat = np.concatenate([sh_list[r] for r in rows])
        starts_a = np.array(starts, dtype=np.int64)
        sizes = np.diff(np.append(starts_a, tot))
        if impl == "oph":
            sig[rows] = _oph_batch(concat, starts_a, sizes, seeds_mixed)
        else:
            X = concat[:, None] ^ seeds_mixed[None, :]
            X *= muls[None, :]
            sig[rows] = np.minimum.reduceat(X, starts_a, axis=0)
        simh[rows] = _simhash_block(concat, starts_a, sizes)

    bkeys = band_keys_batch(sig, bands, rows_per_band)
    return sig, simh, counts, bkeys


def band_keys_batch(sig: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """(n, P) signatures -> (n, bands) band keys; same fold as band_keys."""
    n = sig.shape[0]
    m = sig.reshape(n, bands, rows_per_band)
    h = np.full((n, bands), _GOLDEN, dtype=np.uint64)
    for j in range(rows_per_band):
        h = mix64(h * _FNV ^ m[:, :, j])
    return h


def simhash64(shingles: np.ndarray, chunk: int = 1 << 15) -> int:
    """64-bit SimHash of the shingle hash set: bit j set iff the j-th bit
    is set in >= half the shingle hashes."""
    if shingles.size == 0:
        return 0
    counts = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    one = U64(1)
    for lo in range(0, shingles.size, chunk):
        block = shingles[lo : lo + chunk]
        bits = (block[:, None] >> shifts[None, :]) & one
        counts += bits.sum(axis=0).astype(np.int64)
    maj = (counts * 2 >= shingles.size).astype(np.uint64)
    return int((maj << shifts).sum(dtype=np.uint64))


def hamming64(a: int, b: int) -> int:
    return int(bin(int(a) ^ int(b)).count("1"))


def band_keys(sig: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """Fold each band's r signature slots into one uint64 band key.
    AND-within-band semantics: keys equal iff all r slots equal
    (up to hash collision) — the reference's exact full-vector bucket
    key equality (src/util.cpp:381-397)."""
    m = sig.reshape(bands, rows_per_band)
    h = np.full(bands, _GOLDEN, dtype=np.uint64)
    for j in range(rows_per_band):
        h = mix64(h * _FNV ^ m[:, j])
    return h


def sig_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Signature-space Jaccard estimate: fraction of matching slots.
    The analog of the reference's (unused) sketch-space distances
    (src/geoutil.cpp:144-201), used here as the cheap mid-tier filter."""
    return float(np.mean(sig_a == sig_b))


def jaccard_arrays(a: np.ndarray, b: np.ndarray) -> float:
    """Exact set Jaccard of two distinct-element uint64 arrays — the
    analog of exact area-Jaccard refinement (src/geoutil.cpp:122-142).
    Both-empty convention: distance 1.0, i.e. similarity 0.0
    (reference src/geoutil.cpp:157-160)."""
    if a.size == 0 and b.size == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


# ---------------------------------------------------------------------------
# Suffix array (doubling, numpy-vectorized) + substring containment
# ---------------------------------------------------------------------------

def suffix_array(data: bytes) -> np.ndarray:
    """Suffix array by prefix doubling with numpy lexsort — O(n log^2 n)."""
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    k = 1
    while True:
        second = np.full(n, -1, dtype=np.int64)
        if k < n:
            second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        new_rank = np.empty(n, dtype=np.int64)
        changed = (rank[order][1:] != rank[order][:-1]) | (
            second[order][1:] != second[order][:-1]
        )
        new_rank[order] = np.concatenate(([0], np.cumsum(changed)))
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order.astype(np.int64)
        k *= 2


def sa_contains(text: bytes, pattern: bytes, sa: np.ndarray | None = None) -> bool:
    """Exact substring test via suffix-array binary search."""
    if len(pattern) == 0:
        return True
    if len(pattern) > len(text):
        return False
    if sa is None:
        sa = suffix_array(text)
    lo, hi = 0, len(sa)
    m = len(pattern)
    while lo < hi:
        mid = (lo + hi) // 2
        start = int(sa[mid])
        if text[start : start + m] < pattern:
            lo = mid + 1
        else:
            hi = mid
    if lo == len(sa):
        return False
    start = int(sa[lo])
    return text[start : start + m] == pattern


def exact_clone_relation(a: str, b: str,
                         sa_cache: dict | None = None,
                         key_a=None, key_b=None) -> str:
    """'equal' | 'a_in_b' | 'b_in_a' | 'none' — suffix-array-backed
    exact-clone classification for verified candidate pairs.

    `sa_cache` memoizes suffix arrays by caller-supplied key: candidate
    pairs arrive in cliques, so each content's O(n log^2 n) SA build is
    paid once per batch instead of once per pair."""
    ab, bb = a.encode("utf-8", errors="replace"), b.encode("utf-8", errors="replace")
    if ab == bb:
        return "equal"

    def sa_of(data: bytes, key):
        if sa_cache is None or key is None:
            return suffix_array(data)
        got = sa_cache.get(key)
        if got is None:
            got = suffix_array(data)
            if len(sa_cache) < 4096:
                sa_cache[key] = got
        return got

    if len(ab) < len(bb) and sa_contains(bb, ab, sa_of(bb, key_b)):
        return "a_in_b"
    if len(bb) < len(ab) and sa_contains(ab, bb, sa_of(ab, key_a)):
        return "b_in_a"
    return "none"


# ---------------------------------------------------------------------------
# Reference-fidelity kernel: rejection-sampling MinHash on weighted sets
# ---------------------------------------------------------------------------

def rejection_minhash_weighted(weights: dict[int, float], domain_size: int,
                               seeds: list[int], max_attempts: int = 1_000_000
                               ) -> np.ndarray:
    """The reference's hash semantics transplanted to weighted sets:
    per slot, a seeded dart stream draws (cell, u) uniform over the
    global domain; the hash value is the attempt count at the first
    accepted dart (u < weight[cell]) — reference src/geoutil.cpp:478-550
    (seeded mt19937 at :499-503, accept test at :535-547).  Collision
    probability between two records rises with their weighted overlap,
    same estimator family as permutation MinHash (SURVEY.md §2.3).

    Test-only kernel (used by the fidelity property test); uses Python's
    stdlib Mersenne Twister for cross-version determinism — the same
    generator family as the reference's std::mt19937."""
    import random

    out = np.empty(len(seeds), dtype=np.int64)
    for i, seed in enumerate(seeds):
        rng = random.Random(seed)
        attempt = 0
        while attempt < max_attempts:
            attempt += 1
            cell = rng.randrange(domain_size)
            u = rng.random()
            if u < weights.get(cell, 0.0):
                break
        out[i] = attempt
    return out
