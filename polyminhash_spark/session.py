"""SparkSession builder with the engine's scale-oriented defaults.

Local mode is the test harness; the same conf set is what we'd ship in
spark-submit --conf for a 1000-executor cluster: AQE on (runtime
re-plan + skew-join splitting), Arrow on (vectorized pandas UDF
transfer), explicit shuffle partitioning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app_name: str = "polyminhash",
                  master: str | None = None,
                  shuffle_partitions: int | None = None,
                  extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(os.environ.get(
        "POLYMINHASH_SHUFFLE_PARTITIONS", str(max(int(cpus) if cpus.isdigit() else 32, 8))))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE re-plans joins from RUNTIME sizes; raising the adaptive
        # threshold lets the narrow candidate-pair side broadcast into
        # the wide signature table (the verify stage was observed
        # flip-flopping between broadcast [~7s] and shuffle [~30s] of
        # the 128-slot minhash arrays).  Runtime-sized => a genuinely
        # large pair side still shuffles; 64m fits 4-8 GB executors.
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
        # the r5 prefilter/semi-filter broadcasts sit DOWNSTREAM of the
        # heavy bucket/survivor aggregates, so the broadcast build
        # legitimately waits minutes at low parallelism on multi-million
        # -file inputs — the 300 s default killed the 5.2M 8-core run
        # (and was this morning's undiagnosable 32c crash).  The
        # timeout guards against deadlocked tiny builds, not against
        # long upstream compute; 2 h keeps the guard without the trap.
        .config("spark.sql.broadcastTimeout", "7200")
        # finer scan splits (default 128m): the signature stage's AUTO
        # repartition skip (config.sig_repartition) relies on the
        # parquet scan itself yielding >= 2x cores partitions so the
        # CPU-bound Python kernel parallelizes WITHOUT a full-content
        # repartition shuffle (the pipeline's largest byte mass —
        # BENCH/BASELINE.md r5).  Splits are byte-balanced, bounded by
        # this value; corpus row groups are 4096 rows (~1-2 MB
        # compressed), so 4m splits pack 2-3 groups per task.  The
        # extra task-launch overhead on small scans is microseconds
        # against a deleted gigabyte-scale exchange on large ones.
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # shuffle codec stays lz4 (Spark default) — MEASURED, not assumed:
        # zstd loses 22-29% at 2.6M/32c and 15% at 2.6M/8c (its CPU cost
        # lands on the same cores the kernels need; the tmpfs shuffle
        # store makes lz4's lower ratio free) and is noise-level at 1M;
        # BENCH/BASELINE.md "shuffle codec" section has the runs
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("POLYMINHASH_DRIVER_MEM", "8g"))
    )
    # shuffle spill dir: tmpfs when available — local-mode shuffle files
    # on a virtio disk serialize concurrent writers (observed: the
    # shuffle-heavy candidate stage ran SLOWER at 32 cores than 8);
    # on a real cluster this is the executors' local NVMe
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        b = b.config("spark.local.dir",
                     os.environ.get("POLYMINHASH_LOCAL_DIR", "/dev/shm/spark-local"))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
