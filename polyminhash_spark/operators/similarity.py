"""Approximate-nearest-neighbor search over embedding columns —
training-data-pipeline extra (brief: "similarity search").

Two paths, same contract (query_id, neighbor_id, cosine, rank):

* `brute_force_cosine_topk` — exact baseline.  JVM-side only:
  `zip_with`/`aggregate` dot products inside whole-stage codegen, no
  Python.  O(|Q|·|D|) — the oracle at test scale, and still the right
  answer when |Q| is small and D is broadcast.
* `lsh_cosine_topk` — the scale path: random-hyperplane LSH (sign-bit
  buckets from deterministic ±1 planes), candidates restricted to
  bucket co-members across `n_tables` independent tables, exact cosine
  re-rank.  Same AND/OR banding skeleton as the MinHash text path
  (SURVEY.md O14/O15), so the physical plan is the proven one: explode
  -> shuffle on (table, bucket) -> pair join -> window top-k.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _dot(a: str, b: str, dim: int | None = None) -> F.Column:
    return F.expr(_dot_sql(a, b, dim))


def with_norm(df: DataFrame, vec_col: str = "embedding",
              dim: int | None = None) -> DataFrame:
    return df.withColumn("_norm", F.sqrt(_dot(vec_col, vec_col, dim)))


def brute_force_cosine_topk(queries: DataFrame, data: DataFrame, k: int,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            broadcast_data: bool = False) -> DataFrame:
    """Exact cosine top-k.  Set broadcast_data=True when the data side
    fits in executor memory (classic replicated-queries pattern, the
    analog of the reference's replicated query set, src/main.cpp:146)."""
    q = with_norm(queries.select(F.col(id_col).alias("query_id"),
                                 F.col(vec_col).alias("qv")), "qv")
    qn = q.withColumnRenamed("_norm", "qnorm")
    d = with_norm(data.select(F.col(id_col).alias("neighbor_id"),
                              F.col(vec_col).alias("dv")), "dv")
    dn = d.withColumnRenamed("_norm", "dnorm")
    if broadcast_data:
        dn = F.broadcast(dn)
    pairs = qn.crossJoin(dn).filter(F.col("query_id") != F.col("neighbor_id"))
    sims = pairs.withColumn(
        "cosine", _dot("qv", "dv") / (F.col("qnorm") * F.col("dnorm")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def plane_weights(n_planes: int, dim: int, seed: int = 0) -> list[list[int]]:
    """Deterministic ±1 hyperplanes (md5 parity — no runtime RNG)."""
    out = []
    for p in range(n_planes):
        w = []
        for j in range(dim):
            h = int(hashlib.md5(f"{seed}:{p}:{j}".encode()).hexdigest()[:15], 16)
            w.append(1 if h % 2 == 1 else -1)
        out.append(w)
    return out


def add_hyperplane_buckets(df: DataFrame, dim: int, n_planes: int = 8,
                           n_tables: int = 4, seed: int = 0,
                           vec_col: str = "embedding") -> DataFrame:
    """-> + buckets array<bigint> of length n_tables (one OR-table per
    entry; each bucket = n_planes AND-bits)."""
    # r6: unroll the plane dots into explicit scalar-literal sums (the
    # zip_with lambda is interpreted per element; cast(x)*cast(±1) is
    # the identical arithmetic) — but only while the TOTAL term count
    # stays modest: one unrolled term is ~8 expression-tree nodes, and
    # the 32-table oracle-parity config (32x4x64 = 8k terms, ~65k
    # nodes in one Project) drove the optimizer/codegen to a heap OOM.
    # The production default (8 planes x 4 tables = 2048 terms)
    # unrolls — measured compiling fine — while 4096 terms already
    # OOMed an 8g driver; anything bigger keeps the compact
    # higher-order form.
    unroll = n_tables * n_planes * dim <= 2048
    table_exprs = []
    for t in range(n_tables):
        planes = plane_weights(n_planes, dim, seed + t * 1000)
        bits = []
        for p, w in enumerate(planes):
            if unroll:
                dot = " + ".join(
                    f"cast({vec_col}[{j}] as double) * cast({w[j]} as double)"
                    for j in range(dim))
            else:
                lit = "array(" + ",".join(str(x) for x in w) + ")"
                dot = _dot_sql(vec_col, lit)
            bits.append(f"(CASE WHEN {dot} >= 0 "
                        f"THEN {1 << p} ELSE 0 END)")
        table_exprs.append("cast(" + " + ".join(bits) + " as bigint)")
    return df.withColumn("buckets", F.expr("array(" + ",".join(table_exprs) + ")"))


def _dot_sql(a: str, b: str, dim: int | None = None) -> str:
    """Dot product; with `dim` known, an unrolled explicit sum (r6):
    higher-order-function lambdas are interpreted per element, the
    unrolled sum whole-stage-codegens.  Bit-identical — the fold
    computes ((0 + t0) + t1)... and 0 + t0 == t0 in IEEE754 (only a
    ±0.0 sign can differ, which no consumer's floor/compare observes)."""
    if dim:
        return " + ".join(
            f"cast({a}[{j}] as double) * cast({b}[{j}] as double)"
            for j in range(dim))
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * "
            "cast(y as double)), cast(0 as double), (s, v) -> s + v)")


def lsh_cosine_near_dup_pairs(data: DataFrame, threshold_x1m: int, dim: int,
                              n_planes: int = 8, n_tables: int = 4,
                              seed: int = 0, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              max_bucket_size: int = 2000,
                              salt_buckets: int = 8) -> DataFrame:
    """Bucketed embedding near-duplicate PAIRS (the threshold flavor of
    the dedup operator set): candidates = hyperplane-LSH bucket
    co-members in ANY table, verified by exact cosine, emitted when
    floor(cosine * 1e6) >= threshold_x1m (integer-floored so a DuckDB
    oracle applies the identical cut).  Never an all-pairs join.

    Parameter honesty at scale: hyperplane-LSH recall depends on the
    angle at the threshold.  For production near-dup thresholds
    (cosine >= 0.8) the defaults (8 planes x 4-8 tables) prune
    100-1000x with recall > 0.99; for a WEAK threshold like 0.45 the
    collision probability per plane is only ~0.65, and recall 1.0
    needs short codes and many tables (e.g. 4 planes x 32 tables),
    at which point candidate volume approaches all-pairs — that
    regime exists for oracle parity, not as the scale path."""
    from polyminhash_spark.operators.candidates import candidate_pairs

    with_b = add_hyperplane_buckets(
        data.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        dim, n_planes, n_tables, seed, vec_col="v")
    bands_df = with_b.select("id", F.posexplode("buckets").alias("band", "band_key"))
    pairs, _ = candidate_pairs(bands_df, max_bucket_size, salt_buckets)

    vecs = with_norm(with_b.select("id", "v"), "v", dim)
    a = vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                    F.col("_norm").alias("na"))
    b = vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                    F.col("_norm").alias("nb"))
    return (pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
            .withColumn("sim_x1m",
                        F.floor(_dot("va", "vb", dim)
                                / (F.col("na") * F.col("nb"))
                                * F.lit(1_000_000)).cast("bigint"))
            .filter(F.col("sim_x1m") >= threshold_x1m)
            .select(F.col("id_a").alias("vec_a"),
                    F.col("id_b").alias("vec_b"), "sim_x1m"))


def lsh_cosine_topk(data: DataFrame, k: int, dim: int, n_planes: int = 8,
                    n_tables: int = 4, seed: int = 0,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    max_bucket_size: int = 2000) -> DataFrame:
    """Self-join ANN: candidates are bucket co-members in ANY table,
    re-ranked by exact cosine.  Mirrors the text pipeline's physical
    shape: explode buckets -> capped bucket pair-gen -> exact verify ->
    window top-k."""
    from polyminhash_spark.operators.candidates import candidate_pairs

    with_b = add_hyperplane_buckets(
        data.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        dim, n_planes, n_tables, seed, vec_col="v")
    bands_df = with_b.select("id", F.posexplode("buckets").alias("band", "band_key"))
    pairs, _ = candidate_pairs(bands_df, max_bucket_size)

    vecs = with_norm(with_b.select("id", "v"), "v", dim)
    a = vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                    F.col("_norm").alias("na"))
    b = vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                    F.col("_norm").alias("nb"))
    sims = (pairs.join(a, "id_a").join(b, "id_b")
            .withColumn("cosine",
                        _dot("va", "vb", dim) / (F.col("na") * F.col("nb"))))
    sym = sims.select(F.col("id_a").alias("query_id"),
                      F.col("id_b").alias("neighbor_id"), "cosine") \
        .unionByName(sims.select(F.col("id_b").alias("query_id"),
                                 F.col("id_a").alias("neighbor_id"), "cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (sym.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))
