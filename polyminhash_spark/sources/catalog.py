"""Stage catalog: checkpointed, resumable stage outputs with lineage
manifests — SURVEY.md O20 analog + north_rule "every stage checkpoints
... with per-partition lineage and metrics so runs resume mid-pipeline".

Uses Iceberg (`format('iceberg')`) when a catalog is configured on the
session; otherwise partitioned parquet + a JSON manifest per stage with
the same contract: (stage, config_hash, input fingerprints, row count,
content checksum, wall time, schema).  A checkpoint is reused on resume
ONLY when stage name, config hash, and input fingerprints all match —
the reference's files-as-IPC stage boundary (src/main.cpp:173-251) done
with lineage instead of trust.

Fingerprints are CONTENT-aware, not rowcount-only: each stage's
fingerprint folds in an order-independent xor of xxhash64 over its
rows, and the raw source input is fingerprinted from its file listing
(path, size, mtime) — so re-running against changed input data with an
equal row count recomputes instead of silently reusing stale
checkpoints.

Every stage write also appends one row to a queryable `_metrics` table
under the workdir (SURVEY.md O24; reference src/query.cpp:184-206,
436-469 keeps its timers in-process — here they survive the run):
(stage, config_hash, rows, bytes, n_files, n_partitions, wall_sec,
checksum, extra map).  The pipeline appends a final `pipeline` summary
row with the run-level counters (candidates, pruning ratio, ...).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_polyminhash_manifest.json"
METRICS_DIR = "_metrics"


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        return bool(spark.conf.get("spark.sql.catalog.polyminhash", None))
    except Exception:
        return False


def _count_and_checksum(df: DataFrame) -> tuple[int, int]:
    """One job: row count + order-independent content checksum.

    Folds TWO commutative aggregates of xxhash64 — xor (bit-mixing but
    cancels rows with even multiplicity) and sum (multiplicity-aware
    but linear) — through blake2b, so neither aggregate's blind spot
    survives.  The sum runs in decimal(38,0): Spark 4 ANSI mode makes a
    bigint sum overflow a hard error instead of wrapping."""
    hcols = F.xxhash64(*df.columns)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(hcols), F.lit(0)).alias("h"),
        F.coalesce(F.sum(hcols.cast("decimal(38,0)")),
                   F.lit(0).cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    folded = hashlib.blake2b(
        f"{int(row['h'])}:{int(row['s'])}".encode(), digest_size=8).digest()
    return int(row["n"]), int.from_bytes(folded, "big")


def source_fingerprint(df: DataFrame) -> str:
    """Fingerprint the raw pipeline input.  File-backed sources hash the
    sorted (path, size, mtime) listing — O(#files), no data scan, the
    only viable option at 100 TB.  `file:` URIs stat locally; any other
    scheme (hdfs:, s3a:, ...) goes through the Hadoop FileSystem API
    (FileStatus length + modificationTime), so overwriting a remote
    file in place still invalidates downstream checkpoints.  Only if
    BOTH lookups fail does a path degrade to listing-only (same-named
    replacement would then be missed).  In-memory sources (tests) fall
    back to the row-content checksum."""
    from urllib.parse import unquote, urlparse

    files = sorted(df.inputFiles())
    h = hashlib.sha256()
    if files:
        spark = df.sparkSession
        jvm = hconf = None
        for f in files:
            u = urlparse(f)
            if u.scheme in ("", "file"):
                try:
                    st = os.stat(unquote(u.path) or f)
                    h.update(f"{f}:{st.st_size}:{st.st_mtime_ns}".encode())
                    continue
                except OSError:
                    pass
            else:
                try:
                    if jvm is None:
                        jvm = spark._jvm
                        hconf = spark._jsc.hadoopConfiguration()
                    jpath = jvm.org.apache.hadoop.fs.Path(f)
                    st = jpath.getFileSystem(hconf).getFileStatus(jpath)
                    h.update(
                        f"{f}:{st.getLen()}:{st.getModificationTime()}".encode())
                    continue
                except Exception:
                    pass
            h.update(f.encode())  # degraded: path listing only
        return "src:" + h.hexdigest()[:16]
    n, checksum = _count_and_checksum(df)
    return f"src:mem:{n}:{checksum & 0xFFFFFFFFFFFFFFFF:016x}"


class StageCatalog:
    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.use_iceberg = _iceberg_available(spark)
        self.run_log: list[dict] = []

    def _path(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.workdir, f"{stage}{MANIFEST}")

    def fingerprint(self, stage: str) -> str | None:
        m = self.read_manifest(stage)
        return m and m.get("fingerprint")

    def read_manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def load_if_valid(self, stage: str, config_hash: str,
                      input_fingerprints: list[str]) -> DataFrame | None:
        """Resume path: return the checkpointed DataFrame iff the manifest
        proves it was produced by this config from these inputs."""
        m = self.read_manifest(stage)
        if not m:
            return None
        if m.get("config_hash") != config_hash:
            return None
        if m.get("inputs") != input_fingerprints:
            return None
        if self.use_iceberg:
            return self.spark.read.format("iceberg").load(f"polyminhash.{stage}")
        return self.spark.read.parquet(self._path(stage))

    def write_stage(self, stage: str, df: DataFrame, config_hash: str,
                    input_fingerprints: list[str],
                    extra_metrics: dict | None = None) -> DataFrame:
        """Materialize a stage; returns the re-read DataFrame (so downstream
        plans start from the checkpoint, cutting lineage)."""
        t0 = time.time()
        path = self._path(stage)
        if self.use_iceberg:
            df.writeTo(f"polyminhash.{stage}").createOrReplace()
        else:
            df.write.mode("overwrite").parquet(path)
        out = (self.spark.read.format("iceberg").load(f"polyminhash.{stage}")
               if self.use_iceberg else self.spark.read.parquet(path))
        n, checksum = _count_and_checksum(out)
        wall = time.time() - t0
        n_bytes, n_files = self._dir_stats(path)
        manifest = {
            "stage": stage,
            "config_hash": config_hash,
            "inputs": input_fingerprints,
            "rows": n,
            "checksum": f"{checksum & 0xFFFFFFFFFFFFFFFF:016x}",
            "bytes": n_bytes,
            "wall_sec": round(wall, 3),
            "schema": out.schema.simpleString(),
            "format": "iceberg" if self.use_iceberg else "parquet",
            "fingerprint": (f"{stage}:{config_hash}:{n}:"
                            f"{checksum & 0xFFFFFFFFFFFFFFFF:016x}"),
            "metrics": extra_metrics or {},
        }
        with open(self._manifest_path(stage), "w") as f:
            json.dump(manifest, f, indent=1)
        self.run_log.append(manifest)
        self.append_metrics(stage, config_hash, rows=n, bytes_=n_bytes,
                            n_files=n_files,
                            n_partitions=out.rdd.getNumPartitions(),
                            wall_sec=wall,
                            checksum=manifest["checksum"],
                            extra=extra_metrics)
        return out

    def _dir_stats(self, path: str) -> tuple[int, int]:
        if self.use_iceberg or not os.path.isdir(path):
            return 0, 0
        total, files = 0, 0
        for root, _, names in os.walk(path):
            for name in names:
                try:
                    total += os.path.getsize(os.path.join(root, name))
                    files += 1
                except OSError:
                    pass
        return total, files

    # --- queryable metrics table (O24) ----------------------------------

    def append_metrics(self, stage: str, config_hash: str, *,
                       rows: int | None = None, bytes_: int | None = None,
                       n_files: int | None = None,
                       n_partitions: int | None = None,
                       wall_sec: float | None = None,
                       checksum: str | None = None,
                       extra: dict | None = None) -> None:
        """Append one row to the workdir `_metrics` table (parquet or
        Iceberg) so stage metrics survive the run and are queryable."""
        from pyspark.sql.types import (DoubleType, LongType, MapType,
                                       StringType, StructField, StructType)

        schema = StructType([
            StructField("stage", StringType()),
            StructField("config_hash", StringType()),
            StructField("rows", LongType()),
            StructField("bytes", LongType()),
            StructField("n_files", LongType()),
            StructField("n_partitions", LongType()),
            StructField("wall_sec", DoubleType()),
            StructField("checksum", StringType()),
            StructField("extra", MapType(StringType(), StringType())),
        ])
        row = (stage, config_hash,
               None if rows is None else int(rows),
               None if bytes_ is None else int(bytes_),
               None if n_files is None else int(n_files),
               None if n_partitions is None else int(n_partitions),
               None if wall_sec is None else float(round(wall_sec, 3)),
               checksum,
               {k: str(v) for k, v in (extra or {}).items()})
        df = self.spark.createDataFrame([row], schema).coalesce(1)
        if self.use_iceberg:
            df.writeTo(f"polyminhash.{METRICS_DIR}").append()
        else:
            df.write.mode("append").parquet(
                os.path.join(self.workdir, METRICS_DIR))

    def metrics_table(self) -> DataFrame | None:
        """The persisted per-stage metrics as a DataFrame."""
        if self.use_iceberg:
            return self.spark.read.format("iceberg") \
                .load(f"polyminhash.{METRICS_DIR}")
        p = os.path.join(self.workdir, METRICS_DIR)
        if not os.path.isdir(p):
            return None
        return self.spark.read.parquet(p)
