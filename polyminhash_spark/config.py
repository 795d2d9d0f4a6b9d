"""Pipeline configuration.

Carries the reference's determinism contract (SURVEY.md §2 O12/O14):
the per-(band, row) seed derivation mirrors the reference's
``seed[h][i] = base + h*123 + i*17`` (reference src/query.cpp:427-429,
base seed 100 at src/query.cpp:352), so "same config => same signature
for same input" holds as a pure function with no runtime RNG.

Two named configs:

* ``reference_config()`` — the reference's own defaults translated to
  set-MinHash land: num_perm = b*r with b=2 bands ("nmaps", reference
  src/query.cpp:343), r=1 rows ("hashLength", src/main.cpp:164),
  seed=100.  Used by the estimator-fidelity tests.
* ``default_config()`` — the production-shaped config (num_perm=128,
  b=32, r=4) used for the recall>=0.99 gate and the benchmarks.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field, replace


@dataclass(frozen=True)
class DedupConfig:
    # --- shingling (SURVEY.md O10) ---
    shingle_k: int = 7            # k-gram width
    shingle_unit: str = "char"    # "char" | "token"
    min_content_len: int = 1      # rows shorter than this are filtered (O4)

    # --- MinHash signature (O12) ---
    num_perm: int = 128
    seed: int = 100               # reference base seed (src/query.cpp:352)
    # "oph" = one-permutation hashing (Shrivastava & Li 2014) with
    # optimal (independent per-bin) densification (Shrivastava 2017;
    # rotation densification rejected — see kernels.oph_minhash):
    # O(N + P) per row — the scale kernel,
    # ~2.3x faster end-to-end at P=128 with the same collision-prob ~
    # Jaccard estimator (property-tested).  "perm" = classic P-pass
    # permutation MinHash — the reference-fidelity kernel.
    minhash_impl: str = "oph"

    # --- LSH banding (O14): num_perm must equal bands * rows_per_band ---
    bands: int = 32
    rows_per_band: int = 4

    # --- verification tiers (O16/O17 + north_rule extras) ---
    # Tier-0 cut: a candidate pair must share at least this many bands.
    # The reference surfaces a candidate on ANY band hit (OR semantics,
    # src/query.cpp:132-162); requiring >=2 of b=32 bands keeps
    # P(candidate | J >= 0.8) > 1 - 1e-5 (banding math: p=J^r=0.41,
    # P(<2 hits) = (1-p)^32 + 32p(1-p)^31 ~ 1e-6) while cutting the
    # random-collision pair volume ~30x BEFORE any signature shuffle.
    min_band_matches: int = 2
    # Apply the tier-0 cut INSIDE candidate generation with a
    # hash-count prefilter (operators/candidates.py): sub-threshold
    # pairs cross the pair-dedup shuffle as an 8 B xxhash64 instead of
    # the 32 B packed pair, and only surviving pairs are re-counted
    # (exactly) at full width.  Output is bit-identical to cutting in
    # verify; the win is shuffle BYTES on boilerplate-heavy corpora
    # where most emissions share exactly one band.  Like est_tier the
    # trade flips with scale — the extra aggregate + broadcast round
    # trip costs ~25% wall at 100k files but the byte cut wins 1.5x at
    # 2.6M — so None (default) = AUTO by representative count
    # (byte_opt_auto_threshold, resolved in run_pipeline; direct
    # operator callers resolve None to off).  Explicitly disable at
    # corpus sizes where the survivor set itself outgrows a broadcast
    # (~1e10+ dup pairs).
    candidate_prefilter: bool | None = None
    # Cut SINGLETON (band, band_key) groups from the band table BEFORE
    # the wide bucket aggregate (operators/candidates.py, r6 / r5
    # verdict #5): an 8 B hash-count pass keeps only band keys seen
    # >= 2 times and semi-joins the band table against them, so the
    # collect_list shuffle carries only rows that can produce a pair
    # (~15% of band rows at the bench corpus).  Output bit-identical
    # (collision riders form size-1 groups and are dropped by the
    # existing size filter).  Same AUTO rule and scale shape as
    # candidate_prefilter; disable where the multi-bucket key set
    # outgrows a broadcast (~1e9+ distinct colliding keys).
    # Its AUTO threshold is LOWER than the other byte cuts': the
    # singleton cut has no broadcast-build round trip on the critical
    # path (the count pass shuffles 8 B hashes and its survivors are
    # bucket KEYS, far fewer than pair survivors), and it already wins
    # at the 100k bench corpus (r6 A/B: candidates stage 2.56 -> 1.77 s
    # isolated; full pipeline ~1.5-2.5 s faster per run, clusters
    # bit-identical).
    candidate_singleton_prefilter: bool | None = None
    singleton_auto_threshold: int = 50_000
    # Cut the content table to the verify survivors' ids with a
    # broadcast semi join before the tier-3 attach (operators/verify.py)
    # instead of shuffling every row's content into the join.  Same
    # scale shape and same AUTO rule as candidate_prefilter; disable
    # explicitly if the survivor id set outgrows a broadcast
    # (~1e9+ ids); output is identical either way.
    verify_semi_filter: bool | None = None
    # Representative count at which the two byte-path optimizations
    # auto-enable.  500k sits inside the measured 100k..2.6M crossover,
    # biased low for the same reason as est_auto_threshold: the
    # small-n penalty is a bounded constant (~5 s of extra round
    # trips) while the large-n penalty of full-width shuffles grows
    # with bytes.
    byte_opt_auto_threshold: int = 500_000
    prefilter_estimate: float = 0.5   # signature-estimate Jaccard cut before exact verify
    # est_tier=False drops the tier-1 signature-estimate entirely: no
    # minhash32 attach joins (the largest array shuffle in the
    # pipeline — 38% of all shuffle bytes at 1M, measured per stage in
    # BENCH/BASELINE.md r5), relying on tier-0 band counts + the
    # SimHash tier to gate the exact-verify UDF.  Clusters are
    # bit-identical either way (measured at 300k AND 2.6M; SimHash
    # ham<=16 prunes almost as hard — n_verified 28,767 vs 28,769 at
    # 300k), but which setting is FASTER depends on scale: at <=300k
    # the est cut saves more Python-UDF work than its 512 B/pair
    # attach costs (ON 60.2 vs OFF 66.1 s at 300k/32c), while at 2.6M
    # the attach bytes dominate (OFF 186.9 vs ON 245.9 s at 32c, OFF
    # 412.8 vs ON 430.5 at 8c — and the 8c/32c asymmetry lifts
    # scaling efficiency 0.444 -> 0.552, BENCH/BASELINE.md r5).
    # None (default) = AUTO: run_pipeline resolves by representative
    # count against est_auto_threshold.  Operators called outside
    # run_pipeline resolve None conservatively to True.
    # r6 re-measurement: the r5 crossover (ON below ~300k) no longer
    # holds — the r6 kernel/verify changes shrank exactly the work the
    # est tier saves, and OFF now wins at the 100k bench corpus too
    # (interleaved A/B: OFF 8.2-9.6 s vs ON 11.1-12.0 s per pipeline
    # run, clusters bit-identical 85,716) while r5 already measured OFF
    # winning at 1M and 2.6M.  50k keeps ON for genuinely small inputs
    # — including the SQL-tractable mirror/oracle configs (~500 reps),
    # whose DuckDB kernel mirror encodes the est cut.
    est_tier: bool | None = None
    est_auto_threshold: int = 50_000
    # Explicit repartition of (id, norm_content) before the signature
    # mapInArrow node.  True = always (the historical default: 3x-
    # oversubscribed round-robin amortizes content-length skew when the
    # upstream scan yields FEW partitions).  False = never.  None
    # (default) = AUTO: run_pipeline skips the repartition when the
    # normalized frame already carries >= 2x defaultParallelism
    # partitions — parquet scan splits are BYTE-balanced (bounded by
    # spark.sql.files.maxPartitionBytes), which balances the
    # byte-proportional kernel better than row-balanced round-robin,
    # and skipping deletes the pipeline's single largest shuffle (the
    # full-content pass: 1,055 MB of ~2.95 GB total at 1M files,
    # BENCH/BASELINE.md r5 stage table).  When AUTO skips, the rep-id
    # semi join side gets an explicit broadcast hint so the join cannot
    # fall back to a content shuffle; the hint is gated on
    # sig_broadcast_max_records (above it, a forced broadcast of the
    # id set risks driver memory — the repartition path is kept).
    # Gate for the forced rep-id broadcast when the repartition is
    # skipped — applied to BOTH the AUTO and the explicit
    # sig_repartition=False paths (r6, r5-advice #1/#3), and counted
    # over the rep-id SET (the relation actually broadcast), not the
    # full row count.  20M binary(16) ids build a ~1.4 GB
    # HashedRelation — comfortably inside the 8 GB broadcast hard cap
    # and an 8g driver/executor heap; above it the repartition path is
    # used instead of risking an OOM on a multi-GB forced broadcast.
    sig_repartition: bool | None = None
    sig_broadcast_max_records: int = 20_000_000
    simhash_hamming_max: int = 16     # secondary SimHash filter (of 64 bits)
    jaccard_threshold: float = 0.8    # exact set-Jaccard for a "duplicate" edge
    top_k: int = 10                   # neighbors kept per query (reference k, README.md:59)

    # --- skew / scale controls (north_rule: explicit salting + caps) ---
    # Buckets above max_bucket_size switch to connectivity-preserving
    # star + salted-sub-bucket pair generation (operators/candidates.py):
    # every member keeps an edge to the bucket min (cliques never sever),
    # plus all-pairs within salt_buckets deterministic sub-buckets.
    max_bucket_size: int = 1000
    salt_buckets: int = 8
    shuffle_partitions: int = 32
    # Megabucket pre-split (operators/candidates.py): salts the
    # candidate groupBy key itself so a near-dup crowd beyond task
    # memory is processed as bounded per-task slices linked through
    # their minima.  0 = AUTO — run_pipeline enables
    # presplit_auto_slices when the representative count reaches
    # presplit_auto_threshold (the regime where 1e7+-member template
    # crowds become plausible and slicing cost is noise), else stays
    # exact; 1 = always exact under-cap all-pairs; >1 = forced.
    presplit_slices: int = 0
    presplit_auto_threshold: int = 100_000_000
    presplit_auto_slices: int = 16
    # band_key_bits=32 narrows the LSH bucket key to the top 32 bits
    # of the mix64 band fold — 4 B/row less on the band-table shuffle,
    # at the price of hashing ~n*bands rows into a 4e9 key space.
    # Collisions only ADD candidate pairs (verify is exact, clusters
    # unchanged w.h.p.), so it is safe below ~1e9 rows; the 64-bit
    # default is the 1e11-scale setting where a 32-bit space would
    # manufacture megabuckets from random collisions.  Measured trade
    # in BENCH/BASELINE.md (r5 band-key-width section).
    band_key_bits: int = 64

    # --- misc ---
    max_shingles_per_doc: int = 1 << 18   # distinct-shingle cap per row (memory guard)

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"num_perm ({self.num_perm}) must equal bands*rows_per_band "
                f"({self.bands}*{self.rows_per_band})"
            )
        if self.shingle_unit not in ("char", "token"):
            raise ValueError(f"bad shingle_unit {self.shingle_unit!r}")
        if self.minhash_impl not in ("perm", "oph"):
            raise ValueError(f"bad minhash_impl {self.minhash_impl!r}")
        if self.presplit_slices < 0:
            raise ValueError(
                f"presplit_slices must be >= 0 (0 = auto): "
                f"{self.presplit_slices}")
        if self.band_key_bits not in (32, 64):
            raise ValueError(
                f"band_key_bits must be 32 or 64: {self.band_key_bits}")

    # Reference seed derivation: seed + band*123 + row*17
    # (reference src/query.cpp:427-429).  Permutation i belongs to band
    # i // rows_per_band, row i % rows_per_band.
    def perm_seed(self, i: int) -> int:
        band, row = divmod(i, self.rows_per_band)
        return self.seed + band * 123 + row * 17

    def perm_seeds(self) -> list[int]:
        return [self.perm_seed(i) for i in range(self.num_perm)]

    def config_hash(self) -> str:
        """Stable hash of the config — stamped into every stage manifest so
        a checkpoint is only reused when the producing config matches."""
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]

    def with_(self, **kw) -> "DedupConfig":
        return replace(self, **kw)


def reference_config() -> DedupConfig:
    """Reference defaults: b=2 tables ("nmaps"), r=1 hash per table
    ("hashLength"), seed 100 (reference src/main.cpp:163-164,
    src/query.cpp:343,352).  min_band_matches=1 — the reference's pure
    OR-across-tables contract."""
    return DedupConfig(num_perm=2, bands=2, rows_per_band=1, seed=100,
                       min_band_matches=1, minhash_impl="perm")


def default_config() -> DedupConfig:
    return DedupConfig()
