"""End-to-end dedup pipeline DAG — SURVEY.md §3 entry point A,
re-expressed as checkpointed Spark stages:

  scan -> normalize -> exact_groups -> signatures(reps) -> bands
       -> candidates -> verify -> clusters(expand) (+ topk, + metrics)

Scale design points:
* exact_groups collapses identical normalized content to one
  representative before any hashing — at web scale identical files are
  both the hottest LSH buckets and wasted signature compute; after this
  stage every LSH bucket holds distinct contents only.
* Each stage writes through StageCatalog (resume contract: recompute
  only when config or upstream fingerprints changed — north_rule).
* `workdir=None` runs un-checkpointed (in-memory) for tests/bench.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from polyminhash_spark.config import DedupConfig
from polyminhash_spark.operators.bands import explode_bands
from polyminhash_spark.operators.candidates import candidate_pairs
from polyminhash_spark.operators.cluster import connected_components
from polyminhash_spark.operators.normalize import exact_groups, normalize
from polyminhash_spark.operators.signatures import add_signatures
from polyminhash_spark.operators.topk import topk_neighbors
from polyminhash_spark.operators.verify import verify_pairs
from polyminhash_spark.sources.catalog import StageCatalog, source_fingerprint


def shuffle_totals(spark: SparkSession) -> tuple[int, int] | None:
    """Cumulative (shuffle_read_bytes, shuffle_write_bytes) over all
    completed Spark stages, via the documented REST monitoring API.
    None when the UI server is disabled (the default in tests —
    bench/scaling runs enable it so per-stage shuffle bytes land in
    the metrics table; see r4 verdict #5: measure the bandwidth-bound
    fraction per stage instead of inferring it)."""
    try:
        import json as _json
        from urllib.request import urlopen

        base = spark.sparkContext.uiWebUrl
        if not base:
            return None
        app_id = spark.sparkContext.applicationId
        with urlopen(f"{base}/api/v1/applications/{app_id}/stages"
                     "?status=complete", timeout=5) as r:
            stages = _json.loads(r.read())
        rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
        wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        return rd, wr
    except Exception:
        return None   # monitoring must never fail the pipeline


@dataclass
class PipelineResult:
    normalized: DataFrame     # all rows + ids + shas
    rep_map: DataFrame        # (id, rep_id) exact-duplicate grouping
    signed: DataFrame         # representatives with signatures
    candidates: DataFrame     # rep-level candidate pairs
    verified: DataFrame       # rep-level verified pairs
    clusters: DataFrame       # (id, cluster_id) for ALL input rows
    neighbors: DataFrame      # rep-level top-k
    metrics: dict


def run_pipeline(spark: SparkSession, source: DataFrame, cfg: DedupConfig,
                 workdir: str | None = None, collect_metrics: bool = True
                 ) -> PipelineResult:
    cat = StageCatalog(spark, workdir) if workdir else None
    ch = cfg.config_hash()
    metrics: dict = {}
    # content-aware input fingerprint: changed source data invalidates
    # every downstream checkpoint even at equal row counts
    src_fp = source_fingerprint(source) if cat is not None else "source"

    import time as _time

    def stage(name: str, build, inputs: list[str],
              conf_overrides: dict | None = None) -> DataFrame:
        t0 = _time.time()
        sh0 = shuffle_totals(spark) if collect_metrics else None

        class _conf_ctx:
            """Temporarily override session confs for one stage's
            materialization (restored in all paths)."""

            def __enter__(self):
                self.saved = {}
                for k, v in (conf_overrides or {}).items():
                    self.saved[k] = spark.conf.get(k, None)
                    spark.conf.set(k, v)

            def __exit__(self, *exc):
                for k, v in self.saved.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)

        def record_shuffle() -> None:
            # stage() materializes eagerly (count/write), so the delta
            # attributes each Spark stage to the pipeline stage that
            # actually executed it
            if sh0 is None:
                return
            sh1 = shuffle_totals(spark)
            if sh1 is None:
                return
            metrics[f"{name}_shuffle_read_mb"] = round(
                (sh1[0] - sh0[0]) / 1e6, 2)
            metrics[f"{name}_shuffle_write_mb"] = round(
                (sh1[1] - sh0[1]) / 1e6, 2)

        if cat is None:
            # un-checkpointed mode: cache stage outputs AND materialize
            # them eagerly — downstream consumers (CC iterations,
            # cluster expansion, final join) reuse instead of recompute,
            # and AQE plans each stage against realized statistics
            # instead of replanning one deep 15-shuffle lineage
            # (measured ~35% faster end-to-end than the lazy chain)
            with _conf_ctx():
                df = build().persist()
                df.count()
            metrics[f"{name}_sec"] = round(_time.time() - t0, 2)
            record_shuffle()
            return df
        fps = [src_fp if i == "source" else (cat.fingerprint(i) or i)
               for i in inputs]
        cached = cat.load_if_valid(name, ch, fps)
        if cached is not None:
            metrics[f"{name}_resumed"] = True
            return cached
        with _conf_ctx():
            out = cat.write_stage(name, build(), ch, fps)
        metrics[f"{name}_sec"] = round(_time.time() - t0, 2)
        record_shuffle()
        return out

    normalized = stage("normalized", lambda: normalize(source, cfg), ["source"])
    rep_map = stage("exact_groups", lambda: exact_groups(normalized),
                    ["normalized"])

    # AUTO (cfg.sig_repartition=None): skip the pre-kernel content
    # repartition — the pipeline's single largest shuffle, a full
    # content pass (BENCH/BASELINE.md r5 stage table) — when the
    # normalized frame already carries enough partitions.  Scan
    # splits are byte-balanced (maxPartitionBytes-bounded), which
    # balances the byte-proportional kernel better than the
    # row-balanced round-robin it replaces.  The broadcast gate counts
    # the REP-ID SET (the relation actually broadcast — r5 advice: the
    # full normalized count over-gated duplicate-heavy corpora, where
    # the rep set is smallest and the broadcast cheapest) and guards
    # the explicit sig_repartition=False path too: above the gate a
    # forced broadcast of the id set risks driver/executor memory, so
    # both paths fall back to the repartition shape.  Resolved BEFORE
    # the stage() call so the decision is recorded on checkpoint-
    # resumed runs as well (r5 advice #4).
    _rep_ids = rep_map.filter(F.col("id") == F.col("rep_id")).select("id")
    sig_rep = cfg.sig_repartition
    if sig_rep is None:
        enough = (normalized.rdd.getNumPartitions()
                  >= 2 * spark.sparkContext.defaultParallelism)
        sig_rep = not (enough and
                       _rep_ids.count() <= cfg.sig_broadcast_max_records)
    elif sig_rep is False and _rep_ids.count() > cfg.sig_broadcast_max_records:
        sig_rep = True
    metrics["sig_repartition"] = bool(sig_rep)

    def build_signatures() -> DataFrame:
        rep_ids = _rep_ids
        if not sig_rep:
            # pin the semi join to broadcast: an SMJ fallback would
            # re-introduce a full content shuffle on id, the exact
            # bytes the skipped repartition saves
            rep_ids = F.broadcast(rep_ids)
        reps = normalized.join(rep_ids, "id")
        return add_signatures(reps, cfg, repartition=sig_rep)

    signed = stage("signatures", build_signatures, ["exact_groups"])

    def _resolve_auto(flag: bool | None) -> bool:
        # AUTO = enable the byte-path optimization only at the scale
        # where its bounded small-n cost is outweighed by its
        # byte-proportional win (config.byte_opt_auto_threshold;
        # signed is materialized, so count() is cheap and the
        # resolution is deterministic for a fixed input).
        if flag is not None:
            return flag
        return signed.count() >= cfg.byte_opt_auto_threshold

    def build_candidates() -> DataFrame:
        slices = cfg.presplit_slices
        if slices == 0:
            # AUTO: enable the megabucket pre-split only at the scale
            # where template crowds beyond task memory become
            # plausible (config.presplit_auto_threshold) — below it
            # the exact under-cap all-pairs path is both safe and the
            # stronger recall guarantee.  signed is already
            # materialized (persisted or checkpointed), so the count
            # is cached/metadata, not a recompute.
            n_reps = signed.count()
            slices = (cfg.presplit_auto_slices
                      if n_reps >= cfg.presplit_auto_threshold else 1)
        metrics["presplit_slices"] = slices
        bands_df = explode_bands(signed)
        # tier-0 moves INSIDE the candidates operator when the
        # prefilter is on (the hash-count pass keeps sub-threshold
        # pairs off the full-width dedup shuffle); verify_pairs'
        # own tier-0 filter stays and is simply a no-op then.
        pairs, bucket_stats = candidate_pairs(
            bands_df, cfg.max_bucket_size, cfg.salt_buckets,
            presplit_slices=slices,
            min_band_matches=(cfg.min_band_matches if prefilter else 1),
            singleton_prefilter=singleton_pf)
        if collect_metrics:
            bs = bucket_stats.agg(
                F.count(F.lit(1)).alias("n_buckets"),
                F.sum(F.col("salted").cast("int")).alias("n_salted"),
                F.max("bucket_n").alias("max_bucket"),
            ).collect()[0]
            metrics["n_buckets"] = int(bs["n_buckets"] or 0)
            metrics["n_salted_buckets"] = int(bs["n_salted"] or 0)
            metrics["max_bucket"] = int(bs["max_bucket"] or 0)
        return pairs

    # The prefiltered candidates plan traverses the bucket aggregate
    # twice (hash-count branch + survivor semi join); static exchange
    # reuse makes the band-table map stage run ONCE, but AQE's stage
    # cache fails to canonicalize exchanges over an InMemoryTableScan
    # source (measured: the 968 MB band map ran twice at 1M, wiping
    # the prefilter's byte cut), so this one stage materializes with
    # AQE off.  Nothing in the candidates query needs AQE: its only
    # join carries an explicit broadcast hint and partition counts are
    # fixed; every other stage keeps AQE (skew-join, coalescing).
    prefilter = _resolve_auto(cfg.candidate_prefilter)
    metrics["candidate_prefilter"] = prefilter
    # r6 (r5 verdict #5): singleton-bucket cut before the wide bucket
    # aggregate — own (lower) AUTO threshold: it wins from the 100k
    # bench corpus up (config.singleton_auto_threshold rationale)
    singleton_pf = cfg.candidate_singleton_prefilter
    if singleton_pf is None:
        singleton_pf = signed.count() >= cfg.singleton_auto_threshold
    metrics["candidate_singleton_prefilter"] = singleton_pf
    cands_conf = ({"spark.sql.adaptive.enabled": "false"}
                  if prefilter and cfg.min_band_matches > 1
                  else None)
    cands = stage("candidates", build_candidates, ["signatures"],
                  conf_overrides=cands_conf)

    def build_verified() -> DataFrame:
        est = cfg.est_tier
        if est is None:
            # AUTO: below the threshold the est tier's Python-UDF
            # savings win; above it the minhash32 attach joins (the
            # pipeline's largest array shuffle) cost more than the
            # tier saves (config rationale; BENCH/BASELINE.md r5).
            # signed is already materialized, so count() is cheap, and
            # the resolution is deterministic for a fixed input —
            # checkpoint resume re-resolves identically.
            est = signed.count() < cfg.est_auto_threshold
        metrics["est_tier"] = bool(est)
        semi = _resolve_auto(cfg.verify_semi_filter)
        metrics["verify_semi_filter"] = semi
        return verify_pairs(cands, signed,
                            cfg.with_(est_tier=est, verify_semi_filter=semi),
                            content=normalized.select("id", "norm_content"))

    verified = stage("verified", build_verified, ["candidates", "signatures"])

    def build_clusters() -> DataFrame:
        """CC over rep-level dup edges, then expansion to all rows.

        cluster_id = MIN full-member id, with no relabel pass: rep_id
        is already the MIN id of its exact-dup group (exact_groups),
        and the component label is the MIN rep_id, so the component
        label IS the minimum full-member id."""
        dup_edges = verified.filter(F.col("is_duplicate")).select("id_a", "id_b")
        rep_ids = rep_map.select(F.col("rep_id").alias("id")).distinct()
        rep_clusters = connected_components(dup_edges, rep_ids) \
            .withColumnRenamed("id", "rep_id")
        return rep_map.join(rep_clusters, "rep_id").select("id", "cluster_id")

    clusters = stage("clusters", build_clusters, ["verified", "exact_groups"])
    neighbors = stage(
        "neighbors", lambda: topk_neighbors(verified, cfg.top_k), ["verified"])

    if collect_metrics:
        metrics["n_records"] = normalized.count()
        metrics["n_reps"] = signed.count()
        # with candidate_prefilter on (default), candidates are already
        # tier-0-cut, so n_candidates counts pairs that actually reach
        # verification (pre-r5 it included sub-threshold pairs too —
        # compare across rounds via n_verified, whose meaning is stable)
        metrics["n_candidates"] = cands.count()
        metrics["n_verified"] = verified.count()
        metrics["n_dup_pairs"] = verified.filter(F.col("is_duplicate")).count()
        total = metrics["n_reps"] * (metrics["n_reps"] - 1) / 2
        metrics["pruning_ratio"] = (
            1.0 - metrics["n_candidates"] / total if total else 0.0)

    if cat is not None and collect_metrics:
        # run-level summary row in the queryable _metrics table (O24)
        cat.append_metrics("pipeline", ch, rows=metrics.get("n_records"),
                           extra=metrics)

    return PipelineResult(
        normalized=normalized, rep_map=rep_map, signed=signed,
        candidates=cands, verified=verified, clusters=clusters,
        neighbors=neighbors, metrics=metrics,
    )


def dedup_output(result: PipelineResult) -> DataFrame:
    """Final user-facing table: every input row + its cluster assignment
    + the content sha256 (per-row invariant, north_rule).  Internal
    binary(16) ids are hex-encoded at this boundary."""
    joined = result.normalized.select(
        "id", "repo", "path", "commit", "lang", "content_sha", "n_chars"
    ).join(result.clusters, "id", "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col("id")))
    return joined.select(
        F.lower(F.hex("id")).alias("id"),
        "repo", "path", "commit", "lang", "content_sha", "n_chars",
        F.lower(F.hex("cluster_id")).alias("cluster_id"))
