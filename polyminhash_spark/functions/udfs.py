"""Arrow-vectorized pandas UDFs wrapping the numpy kernels.

These are the ONLY Python execution in the hot path (input_hint: "no
per-row Python"); everything else in the pipeline is JVM-side DataFrame
ops.  Each UDF processes whole Arrow batches; per-batch state (mixed
seed vectors) is allocated once per batch, the analog of the
reference's prepared-geometry caching (reference src/geoutil.cpp:516 —
GEOSPrepare once per polygon, reused across all darts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

from polyminhash_spark.config import DedupConfig
from polyminhash_spark import kernels as K

SIGNATURE_SCHEMA = (
    "minhash32 array<int>, simhash bigint, n_shingles int, bands array<bigint>"
)


def _band_key_array(bkeys: np.ndarray, bits: int):
    """Flat Arrow array for the band-key matrix at the configured key
    width: int64 bit-pattern view (default) or the TOP 32 bits of the
    mix64 fold as int32 (config.band_key_bits=32 — the narrow-shuffle
    experiment; top bits so the fold's best-mixed bits survive)."""
    import pyarrow as pa

    if bits == 32:
        narrow = (bkeys >> np.uint64(32)).astype(np.uint32).view(np.int32)
        return pa.array(narrow.reshape(-1), type=pa.int32())
    return pa.array(bkeys.reshape(-1).view(np.int64), type=pa.int64())


def _sig32(sig: np.ndarray) -> np.ndarray:
    """Low 32 bits of each signature slot, bit-pattern int32.

    The est-tier verifier only tests slot EQUALITY; truncating 64 -> 32
    bits adds a per-slot false-match probability of 2^-32 (zero flipped
    tier decisions in any measured run) and halves the bytes the
    signature attach joins shuffle per pair — the dominant shuffle
    volume at scale.  Band keys stay 64-bit: bucket keys hash ~n*bands
    rows into the key space, and a 32-bit space (4e9) would manufacture
    megabuckets from random collisions at 1e11 rows."""
    return (sig & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
VERIFY_SCHEMA = "jaccard double, clone string"


def make_signature_udf(cfg: DedupConfig):
    """content -> (minhash sig, simhash, n_shingles, band keys).

    The MinHash kernel is the Spark re-expression of the reference's
    per-record hash loop (src/query.cpp:367-481 calling
    src/geoutil.cpp:478-550); band keys fold r signature slots per band
    (AND-within-band, src/util.cpp:381-397).  uint64 values are stored
    as int64 via bit-pattern view (equality-preserving)."""
    k, unit = cfg.shingle_k, cfg.shingle_unit
    bands, rows = cfg.bands, cfg.rows_per_band
    max_sh = cfg.max_shingles_per_doc
    seed_list = cfg.perm_seeds()
    impl = cfg.minhash_impl

    @pandas_udf(SIGNATURE_SCHEMA)
    def signature_udf(content: pd.Series) -> pd.DataFrame:
        seeds = K.mixed_seeds(seed_list)  # per-batch allocation
        sig, simh, counts, bkeys = K.signature_batch(
            content.tolist(), k, unit, max_sh, seeds, bands, rows,
            impl=impl)
        bk_i = bkeys.view(np.int64)
        return pd.DataFrame({
            "minhash32": list(_sig32(sig)),
            "simhash": simh,
            "n_shingles": counts,
            "bands": list(bk_i),
        })

    return signature_udf


def make_signature_map(cfg: DedupConfig, content_col: str = "norm_content",
                       carry_cols: tuple = ("id",)):
    """mapInPandas variant of the signature kernel.  A plan NODE rather
    than a column expression — Catalyst cannot duplicate it via
    projection collapse (a struct-returning pandas UDF referenced
    through differing inlined child expressions gets evaluated once per
    distinct expression; observed as double ArrowEvalPython).

    Output is NARROW by default: only carry_cols + the 4 signature
    columns go back through Arrow — content (the bulk of the bytes)
    stays behind and is re-joined only where verification needs it."""
    k, unit = cfg.shingle_k, cfg.shingle_unit
    bands, rows = cfg.bands, cfg.rows_per_band
    max_sh = cfg.max_shingles_per_doc
    seed_list = cfg.perm_seeds()
    impl = cfg.minhash_impl
    kb = cfg.band_key_bits

    def mapper(batches):
        seeds = K.mixed_seeds(seed_list)
        for pdf in batches:
            sig, simh, counts, bkeys = K.signature_batch(
                pdf[content_col].tolist(), k, unit, max_sh, seeds, bands,
                rows, impl=impl)
            out = {c: pdf[c].values for c in carry_cols}
            out["minhash32"] = list(_sig32(sig))
            out["simhash"] = simh
            out["n_shingles"] = counts
            if kb == 32:
                out["bands"] = list(
                    (bkeys >> np.uint64(32)).astype(np.uint32).view(np.int32))
            else:
                out["bands"] = list(bkeys.view(np.int64))
            yield pd.DataFrame(out)

    return mapper


def make_signature_arrow_map(cfg: DedupConfig,
                             content_col: str = "norm_content",
                             carry_cols: tuple = ("id",)):
    """mapInArrow variant of the signature kernel — the production
    default.  Output list columns are assembled directly from the flat
    numpy signature matrices (ListArray.from_arrays over a zero-copy
    int64 view), skipping the pandas object-list detour entirely:
    measured ~16% faster than make_signature_map at 300k files,
    bit-identical output (same kernels, same values)."""
    import pyarrow as pa

    k, unit = cfg.shingle_k, cfg.shingle_unit
    bands, rows = cfg.bands, cfg.rows_per_band
    max_sh = cfg.max_shingles_per_doc
    seed_list = cfg.perm_seeds()
    impl = cfg.minhash_impl
    kb = cfg.band_key_bits

    def _batch_shingles(col):
        """Zero-copy shingling: an Arrow string column's data buffer IS
        the UTF-8 bytes char_shingles would encode, so the rolling hash
        runs once over the whole batch with no Python strings.  Only
        for the char unit on null-free (large_)string arrays; anything
        else falls back to the per-row path."""
        if unit != "char" or col.null_count != 0:
            return None
        if pa.types.is_string(col.type):
            odt = np.int32
        elif pa.types.is_large_string(col.type):
            odt = np.int64
        else:
            return None
        bufs = col.buffers()
        offsets = np.frombuffer(bufs[1], dtype=odt)[
            col.offset : col.offset + len(col) + 1]
        data = np.frombuffer(bufs[2], dtype=np.uint8)
        return K.char_shingles_batch(data, offsets, k, max_sh)

    def mapper(batches):
        seeds = K.mixed_seeds(seed_list)
        for batch in batches:
            col = batch.column(content_col)
            sh_list = _batch_shingles(col)
            texts = None if sh_list is not None else col.to_pylist()
            sig, simh, counts, bkeys = K.signature_batch(
                texts, k, unit, max_sh, seeds, bands, rows, impl=impl,
                sh_list=sh_list)
            n = sig.shape[0]
            off_s = pa.array(
                (np.arange(n + 1, dtype=np.int64) * sig.shape[1])
                .astype(np.int32), type=pa.int32())
            off_b = pa.array(
                (np.arange(n + 1, dtype=np.int64) * bkeys.shape[1])
                .astype(np.int32), type=pa.int32())
            cols = [batch.column(c) for c in carry_cols]
            names = list(carry_cols)
            cols += [
                pa.ListArray.from_arrays(
                    off_s, pa.array(_sig32(sig).reshape(-1),
                                    type=pa.int32())),
                pa.array(simh, type=pa.int64()),
                pa.array(counts, type=pa.int32()),
                pa.ListArray.from_arrays(off_b, _band_key_array(bkeys, kb)),
            ]
            names += ["minhash32", "simhash", "n_shingles", "bands"]
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return mapper


def make_verify_udf(cfg: DedupConfig):
    """(id_a, content_a, id_b, content_b) -> (exact set-Jaccard, exact-clone
    relation).  The analog of the reference's exact jaccardDistance
    refinement on candidate pairs (src/geoutil.cpp:122-142 at
    src/query.cpp:152) plus the north_rule suffix-array exact-clone check.

    Shingle sets are recomputed from content per batch with an id-keyed
    memo (candidate pairs arrive sorted by id_a, so hot ids hit the
    memo) — recomputation for surviving candidates only is cheaper at
    scale than materializing per-row shingle arrays through the shuffle."""
    k, unit = cfg.shingle_k, cfg.shingle_unit
    max_sh = cfg.max_shingles_per_doc
    clone_gate = cfg.jaccard_threshold  # suffix-array check only for dup-grade pairs

    @pandas_udf(VERIFY_SCHEMA)
    def verify_udf(id_a: pd.Series, content_a: pd.Series,
                   id_b: pd.Series, content_b: pd.Series) -> pd.DataFrame:
        memo: dict = {}
        sa_cache: dict = {}

        def sh(doc_id: str, text: str) -> np.ndarray:
            got = memo.get(doc_id)
            if got is None:
                got = K.shingles_for(text or "", k, unit, max_sh)
                if len(memo) < 4096:
                    memo[doc_id] = got
            return got

        n = len(id_a)
        jac = np.zeros(n, dtype=np.float64)
        clone = [None] * n
        for i in range(n):
            a, b = sh(id_a.iloc[i], content_a.iloc[i]), sh(id_b.iloc[i], content_b.iloc[i])
            jac[i] = K.jaccard_arrays(a, b)
            if jac[i] >= clone_gate:
                ca, cb = content_a.iloc[i] or "", content_b.iloc[i] or ""
                clone[i] = K.exact_clone_relation(
                    ca, cb, sa_cache=sa_cache,
                    key_a=id_a.iloc[i], key_b=id_b.iloc[i])
            else:
                clone[i] = "none"
        return pd.DataFrame({"jaccard": jac, "clone": clone})

    return verify_udf
