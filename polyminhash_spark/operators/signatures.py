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
from polyminhash_spark.functions.udfs import make_signature_udf


def add_signatures(normalized: DataFrame, cfg: DedupConfig) -> DataFrame:
    """normalized -> + (minhash array<bigint>, simhash bigint,
    n_shingles int, bands array<bigint>).

    Explicit repartition before the UDF: AQE's coalescing targets
    shuffle-byte volume, which under-parallelizes CPU-heavy pandas UDFs
    on small-byte inputs (locally this is the difference between 1 and
    32 cores; on a cluster it guards against the same effect after a
    selective upstream filter)."""
    sig = make_signature_udf(cfg)
    return normalized.repartition(cfg.shuffle_partitions) \
        .withColumn("sig", sig(F.col("norm_content"))).select(
        "*",
        F.col("sig.minhash").alias("minhash"),
        F.col("sig.simhash").alias("simhash"),
        F.col("sig.n_shingles").alias("n_shingles"),
        F.col("sig.bands").alias("bands"),
    ).drop("sig")
