"""Stage catalog: checkpointed, resumable stage outputs with lineage
manifests — SURVEY.md O20 analog + north_rule "every stage checkpoints
... with per-partition lineage and metrics so runs resume mid-pipeline".

Uses Iceberg (`format('iceberg')`) when a catalog is configured on the
session; otherwise partitioned parquet + a JSON manifest per stage with
the same contract: (stage, config_hash, input fingerprints, row count,
wall time, schema).  A checkpoint is reused on resume ONLY when stage
name, config hash, and input fingerprints all match — the reference's
files-as-IPC stage boundary (src/main.cpp:173-251) done with lineage
instead of trust.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_polyminhash_manifest.json"


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        return bool(spark.conf.get("spark.sql.catalog.polyminhash", None))
    except Exception:
        return False


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
        n = out.count()
        wall = time.time() - t0
        manifest = {
            "stage": stage,
            "config_hash": config_hash,
            "inputs": input_fingerprints,
            "rows": n,
            "wall_sec": round(wall, 3),
            "schema": out.schema.simpleString(),
            "format": "iceberg" if self.use_iceberg else "parquet",
            "fingerprint": f"{stage}:{config_hash}:{n}",
            "metrics": extra_metrics or {},
        }
        with open(self._manifest_path(stage), "w") as f:
            json.dump(manifest, f, indent=1)
        self.run_log.append(manifest)
        return out
