"""Query-set vs data-set k-NN — the reference's primary entry shape
(SURVEY.md §3.1: `spjoin data.wkt query.wkt k`, reference
src/main.cpp:93-105): a partitioned DATA set is indexed, a QUERY set
probes it, and each query gets its top-k nearest neighbors by exact
distance.  The dedup pipeline is the special case queries == data;
this operator is the general form, so a reference user's
two-file workflow ports directly.

Spark shape:
* both sides run the same normalize + signature stages (the reference
  centers both sides identically, src/main.cpp:152-160);
* the probe is an equi-join on (band, band_key) — query side broadcast
  when small, mirroring the reference's replicated query set
  (src/main.cpp:146);
* candidates are deduped across bands (the reference's visitedForQuery
  set, src/query.cpp:122-162), tier-filtered, exactly verified, and
  ranked per query with the deterministic id tie-break.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from polyminhash_spark.config import DedupConfig
from polyminhash_spark.operators.bands import explode_bands
from polyminhash_spark.operators.normalize import normalize
from polyminhash_spark.operators.signatures import add_signatures
from polyminhash_spark.operators.verify import verify_pairs


def knn_query(data: DataFrame, queries: DataFrame, cfg: DedupConfig,
              broadcast_queries: bool = True) -> DataFrame:
    """(data, queries: input_hint-shaped) -> (query_id, neighbor_id,
    distance, rank) with rank <= cfg.top_k, distance = 1 - exact
    set-Jaccard, ascending, ties by neighbor_id.

    Ids are namespaced ('q:'/'d:' prefix on the binary id, hex at the
    output boundary) so a record present in both sets is still a valid
    neighbor of itself — the reference does not exclude self-matches
    across files.

    Band semantics: the reference's probe surfaces a candidate on ANY
    table hit (OR across tables, src/query.cpp:132-162), so the
    query-vs-data path always verifies pairs sharing >= 1 band — the
    dedup pipeline's min_band_matches tier-0 cut (an AND-ish recall/
    volume trade tuned for self-join pair volume) does NOT apply here."""
    cfg = cfg.with_(min_band_matches=1)
    data_norm = normalize(data, cfg).withColumn(
        "id", F.concat(F.lit(b"d"), F.col("id")))
    query_norm = normalize(queries, cfg).withColumn(
        "id", F.concat(F.lit(b"q"), F.col("id")))

    data_signed = add_signatures(data_norm, cfg)
    query_signed = add_signatures(query_norm, cfg)

    q_bands = explode_bands(query_signed).withColumnRenamed("id", "id_a")
    d_bands = explode_bands(data_signed).withColumnRenamed("id", "id_b")
    if broadcast_queries:
        q_bands = F.broadcast(q_bands)

    pairs = (
        q_bands.join(d_bands, ["band", "band_key"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )

    signed = query_signed.unionByName(data_signed)
    content = query_norm.select("id", "norm_content").unionByName(
        data_norm.select("id", "norm_content"))
    verified = verify_pairs(pairs, signed, cfg, content=content)

    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(),
                                               F.col("neighbor_id").asc())
    return (
        verified.select(
            F.lower(F.hex(F.expr("substring(id_a, 2)"))).alias("query_id"),
            F.lower(F.hex(F.expr("substring(id_b, 2)"))).alias("neighbor_id"),
            (1 - F.col("jaccard")).alias("distance"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cfg.top_k)
    )
