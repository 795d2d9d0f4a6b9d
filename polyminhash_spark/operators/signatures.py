"""Signature stage — SURVEY.md O10 (shingles) + O12 (MinHash) + SimHash.

One Arrow-batched pandas UDF pass computes shingle count, MinHash
signature, SimHash, and the per-band LSH keys together, so content is
decoded exactly once per row (the reference computes sketch and hash
vector in the same per-record build loop, src/query.cpp:311-324 +
src/query.cpp:367-481).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from polyminhash_spark.config import DedupConfig
from polyminhash_spark.functions.udfs import make_signature_arrow_map


def add_signatures(normalized: DataFrame, cfg: DedupConfig,
                   carry_cols: tuple = ("id",),
                   repartition: bool = True) -> DataFrame:
    """normalized -> (carry_cols..., minhash32 array<int>, simhash
    bigint, n_shingles int, bands array<bigint>).

    minhash32 carries the low 32 bits of each 64-bit signature slot:
    the only consumer is the est-tier slot-equality test in
    operators/verify.py, and the truncation halves the bytes that
    stage's attach joins shuffle per candidate pair (per-slot false
    match 2^-32 — see functions/udfs._sig32).  Band keys are computed
    from the FULL 64-bit slots inside the kernel and stay 64-bit.

    NARROW output: content is consumed for shingling but not shipped
    back through Arrow / the stage cache; consumers that need it
    (exact verification) re-join `normalized` on id.

    Physical shape choices:
    * mapInArrow (a plan node) rather than a struct-returning column
      UDF: Catalyst's projection collapse can inline differing child
      expressions into multiple references of the same pandas UDF and
      evaluate it twice (observed via .explain) — a node can't be
      split.  Arrow (not pandas) because the kernel's flat numpy
      outputs become Arrow list columns zero-copy, skipping the pandas
      object-list detour (~16% stage saving, bit-identical output).
    * Explicit repartition before the node, oversubscribed 3x the
      core count: AQE's coalescing targets shuffle-byte volume, which
      under-parallelizes CPU-heavy Python stages on small-byte inputs,
      and exactly-one-wave scheduling makes the slowest partition the
      stage wall (content length is skewed) — 3 waves amortize it.
      `repartition=False` drops that exchange entirely: the caller
      asserts the input already carries enough partitions (e.g. parquet
      scan splits bounded by maxPartitionBytes, which are BYTE-balanced
      — a stronger skew guarantee than row-balanced round-robin for a
      byte-proportional kernel) and the full-content shuffle — the
      pipeline's single largest (BENCH/BASELINE.md r5) — disappears.
      run_pipeline resolves this per input via cfg.sig_repartition."""
    from pyspark.sql.types import (ArrayType, IntegerType, LongType,
                                   StructField, StructType)

    from polyminhash_spark.functions.udfs import make_signature_arrow_map

    sel_cols = list(carry_cols) + (
        ["norm_content"] if "norm_content" not in carry_cols else [])
    narrow = normalized.select(*sel_cols)
    # StructType.add MUTATES the receiver — never call it on df.schema
    # (the object is cached on the DataFrame; mutating it corrupts every
    # later plan built from the same frame)
    carry_fields = [f for f in narrow.schema.fields if f.name in carry_cols]
    key_type = LongType() if cfg.band_key_bits == 64 else IntegerType()
    out_schema = StructType(carry_fields + [
        StructField("minhash32", ArrayType(IntegerType())),
        StructField("simhash", LongType()),
        StructField("n_shingles", IntegerType()),
        StructField("bands", ArrayType(key_type)),
    ])
    mapper = make_signature_arrow_map(cfg, carry_cols=carry_cols)
    if not repartition:
        return narrow.mapInArrow(mapper, schema=out_schema)
    sc = normalized.sparkSession.sparkContext
    n_parts = max(cfg.shuffle_partitions, sc.defaultParallelism * 3)
    return narrow.repartition(n_parts).mapInArrow(mapper, schema=out_schema)
