"""Standalone bucketed SimHash near-duplicate pairs — the production
path for the north_rule's "SimHash as a secondary bit-signature filter"
promoted to a first-class dedup operator.

Pigeonhole construction: split the B-bit signature into
(hamming_max + 1) disjoint bit chunks.  Any pair within hamming
distance <= hamming_max differs in at most hamming_max bits, so at
least one chunk is bit-identical (pigeonhole) — banding on the chunks
is therefore COMPLETE: the bucketed plan finds exactly the pairs the
O(n^2) self-join would, after the exact hamming verify filters the
false candidates.  Same output, no cartesian product anywhere.

Scale shape: the chunk extraction is pure JVM bit arithmetic
(whole-stage codegen); pair generation reuses candidate_pairs, so hot
chunk-value buckets (few distinct values per chunk at small
hamming_max) inherit the star + salted skew handling; the final verify
is one bit_count(xor) per surviving pair.

Reference analog: the multi-table OR-probe of src/query.cpp:132-162
with bit chunks as the tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from polyminhash_spark.operators.candidates import candidate_pairs


def simhash_chunks(df: DataFrame, bits: int, hamming_max: int,
                   id_col: str = "id", sim_col: str = "simhash") -> DataFrame:
    """(id, simhash) -> (id, band, band_key): one row per bit chunk.
    band = chunk index, band_key = the chunk's bit value (zero-extended
    shift so the int64 sign bit never leaks into a chunk)."""
    n_chunks = hamming_max + 1
    chunk_bits = -(-bits // n_chunks)  # ceil
    mask = (1 << chunk_bits) - 1
    rows = []
    for c in range(n_chunks):
        rows.append(
            df.select(
                F.col(id_col).alias("id"),
                F.lit(c).alias("band"),
                F.shiftrightunsigned(F.col(sim_col), c * chunk_bits)
                 .bitwiseAND(F.lit(mask)).alias("band_key"),
            ))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def simhash_near_dup_pairs(df: DataFrame, hamming_max: int = 3,
                           bits: int = 64, id_col: str = "id",
                           sim_col: str = "simhash",
                           max_bucket_size: int = 100_000,
                           salt_buckets: int = 8) -> DataFrame:
    """(id, simhash) -> (id_a, id_b, hamming) for all pairs with
    hamming(simhash_a, simhash_b) <= hamming_max, via pigeonhole
    banding — never an all-pairs join.

    max_bucket_size defaults high here: chunk values are coarse (few
    distinct values when chunks are narrow), and the pigeonhole
    completeness guarantee holds only BELOW the cap.  Above it, a pair
    whose sole agreeing chunk is the over-cap bucket is found only via
    a shared salt sub-bucket (the star hub contributes nothing: for a
    random crowd, hub-member hamming ~B/2 fails the verify), so
    per-pair recall degrades to ~1/salt_buckets per shared over-cap
    chunk — MEASURED 0.18 (expected 0.125, salt_buckets=8) on an
    engineered 650-member over-cap bucket with 50 planted hamming-3
    pairs vs the all-pairs oracle; recall is 1.0 for the same fixture
    under the cap (tests/test_bucketed_dedup.py::
    test_salted_simhash_overcap_recall_measured, which also records
    the bound to the _metrics table).  At 1e11 rows every 16-bit chunk
    bucket is ~1.5M members, so this regime is the norm: keep the cap
    at the largest bucket the cluster can verify, widen chunks (raise
    bits / lower hamming_max), or accept the measured recall floor."""
    chunks = simhash_chunks(df, bits, hamming_max, id_col, sim_col)
    pairs, _ = candidate_pairs(chunks, max_bucket_size, salt_buckets)
    sim = df.select(F.col(id_col).alias("id"), F.col(sim_col).alias("s"))
    return (
        pairs.select("id_a", "id_b")
        .join(sim.select(F.col("id").alias("id_a"), F.col("s").alias("s_a")), "id_a")
        .join(sim.select(F.col("id").alias("id_b"), F.col("s").alias("s_b")), "id_b")
        .withColumn("hamming", F.bit_count(F.col("s_a").bitwiseXOR(F.col("s_b"))))
        .filter(F.col("hamming") <= hamming_max)
        .select("id_a", "id_b", "hamming")
    )
