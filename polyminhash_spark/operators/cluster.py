"""Distributed connected components — north_rule clustering stage.

Alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014): converges in
O(log n) rounds, each round two shuffles (groupBy min + join), no
driver-side state, no collect.  This is the DataFrame re-expression of
"union-find via iterative self-joins" from the north_rule; label =
MIN member id, so cluster ids are deterministic regardless of
parallelism or iteration order.

Scale notes:
* Hub nodes (a record in a giant clique) concentrate in large-star's
  groupBy; AQE skew handling plus the bounded candidate generation
  upstream (bucket caps) keep neighbor lists tractable; we never
  collect a neighborhood into one array.
* Every iteration localCheckpoints the edge set to cut lineage —
  iterative plans otherwise grow exponentially in Catalyst.
* Convergence test is a cheap checksum aggregate (count + xor of pair
  hashes), not a full DataFrame comparison.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _canon(edges: DataFrame) -> DataFrame:
    """Orient u > v (strings compare lexicographically), drop loops/dupes."""
    return (
        edges.filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .dropDuplicates(["u", "v"])
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node n: connect every strictly-larger neighbor to
    m = min(N(n) ∪ {n})."""
    sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges to smaller ids; for each node n connect all
    smaller-or-equal neighbors (and n) to m = min(N(n) ∪ {n})."""
    dir_ = _canon(edges)  # u > v
    mins = dir_.groupBy("u").agg(F.min("v").alias("m"))
    relink = dir_.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_ = mins.select("u", F.col("m").alias("v"))
    return relink.unionByName(self_)


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(pairs: DataFrame, all_ids: DataFrame,
                         max_iter: int = 50) -> DataFrame:
    """pairs (id_a, id_b) + all_ids (id) -> (id, cluster_id).

    cluster_id = min id in the component; singletons map to themselves.

    One Spark job per iteration: each round's edge set is a LAZY
    localCheckpoint whose materializing action is the convergence
    checksum (localCheckpoint, not persist — persist leaves the logical
    plan growing exponentially across rounds, which OOMs merely
    rendering plan strings; checkpointing truncates it)."""
    edges = _canon(pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")))
    edges = edges.localCheckpoint(eager=False)
    prev = _checksum(edges)  # materializes the checkpoint
    if prev[0] == 0:
        # no duplicate edges at all: everyone is a singleton
        return all_ids.select("id", F.col("id").alias("cluster_id"))

    for _ in range(max_iter):
        edges = _canon(_small_star(_large_star(edges))) \
            .localCheckpoint(eager=False)
        cur = _checksum(edges)  # one action: materializes + tests convergence
        if cur == prev:
            break
        prev = cur

    # converged: every non-root points directly at its component min
    labels = edges.groupBy("u").agg(F.min("v").alias("cluster_id")) \
                  .select(F.col("u").alias("id"), "cluster_id")
    roots = edges.select(F.col("v").alias("id")).distinct() \
                 .join(labels, "id", "left_anti") \
                 .select("id", F.col("id").alias("cluster_id"))
    assigned = labels.unionByName(roots)
    singletons = all_ids.select("id").join(assigned, "id", "left_anti") \
                        .select("id", F.col("id").alias("cluster_id"))
    return assigned.unionByName(singletons)
