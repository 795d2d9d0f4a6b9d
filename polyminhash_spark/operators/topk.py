"""Per-query top-k and global merge — SURVEY.md O18/O19.

The reference sorts each query's candidate list and truncates to k per
rank (src/query.cpp:164-181), then rank 0 re-parses per-rank files,
concatenates and re-ranks (src/main.cpp:204-251).  In Spark both
collapse into ONE window top-k: the shuffle is the merge, no file IPC.
Tie-break is deterministic by neighbor id — the reference's BF path
already does this (std::sort on pair<double,string>,
src/brute_force.cpp:52); we standardize the LSH path on it too
(fixing the reference's unstable tie at src/query.cpp:169-171).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def symmetrize(pairs: DataFrame, cols: list[str]) -> DataFrame:
    """(id_a, id_b, ...) -> (query_id, neighbor_id, ...) in both
    directions — each record is both data and query (self-join dedup)."""
    fwd = pairs.select(
        F.col("id_a").alias("query_id"), F.col("id_b").alias("neighbor_id"), *cols)
    rev = pairs.select(
        F.col("id_b").alias("query_id"), F.col("id_a").alias("neighbor_id"), *cols)
    return fwd.unionByName(rev)


def topk_neighbors(verified: DataFrame, k: int) -> DataFrame:
    """verified pairs -> (query_id, neighbor_id, distance, rank), rank<=k,
    distance = 1 - jaccard ascending, ties by neighbor_id."""
    sym = symmetrize(verified, [(1 - F.col("jaccard")).alias("distance")])
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(),
                                               F.col("neighbor_id").asc())
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "distance", "rank")
    )


def merge_rerank(parts: list[DataFrame], k: int) -> DataFrame:
    """O19: union of partial top-k result sets + one global re-rank —
    the reference's rank-0 merge without the files."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(),
                                               F.col("neighbor_id").asc())
    return (
        out.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "distance", "rank")
    )
