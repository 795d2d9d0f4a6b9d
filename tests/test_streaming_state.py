"""Stateful streaming operator test: applyInPandasWithState per-repo
dedup stats across multiple micro-batches."""

import pyspark.sql.functions as F

from polyminhash_spark.config import default_config
from polyminhash_spark.streaming.dedup_stream import streaming_repo_dedup_stats

SCHEMA = "repo string, path string, commit string, lang string, content string"


def test_stateful_repo_dedup_stats_across_batches(spark, tmp_path):
    cfg = default_config()
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # batch 1: repo A two distinct files; repo B one file
    b1 = [("A", "p1", "c" * 40, "py", "content one " * 5),
          ("A", "p2", "d" * 40, "py", "content two " * 5),
          ("B", "p3", "e" * 40, "py", "content three " * 5)]
    # batch 2: repo A repeats "content one" (cross-batch dup) + new file
    b2 = [("A", "p4", "f" * 40, "py", "content one " * 5),
          ("A", "p5", "g" * 40, "py", "content four " * 5),
          ("B", "p6", "h" * 40, "py", "content three " * 5)]  # dup in B
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(str(in_dir / "b1"))

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(in_dir) + "/*"))
    stats = streaming_repo_dedup_stats(stream, cfg)
    q = (stats.writeStream.format("memory").queryName("repostats")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(str(in_dir / "b2"))
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM repostats").collect()
    # final state per repo = row with max total_rows
    final = {}
    for r in rows:
        if r.repo not in final or r.total_rows > final[r.repo].total_rows:
            final[r.repo] = r
    a, b = final["A"], final["B"]
    assert a.total_rows == 4 and a.unique_contents == 3 and a.dup_rows == 1
    assert b.total_rows == 2 and b.unique_contents == 1 and b.dup_rows == 1
    assert not a.state_overflow and not b.state_overflow


def test_windowed_dup_rate_with_watermark(spark, tmp_path):
    """Event-time windowed dup-rate: windows aggregate per repo, and a
    row arriving later than the watermark past max event time is
    DISCARDED (its window's counts never change)."""
    from datetime import datetime

    from polyminhash_spark.streaming.dedup_stream import streaming_dup_rate_windows

    cfg = default_config()
    ts_schema = ("event_ts timestamp, repo string, path string, "
                 "commit string, lang string, content string")
    in_dir = tmp_path / "win_in"
    in_dir.mkdir()

    def t(minute, second=0):
        return datetime(2024, 1, 1, 10, minute, second)

    b1 = [(t(0, 10), "A", "p1", "c" * 40, "py", "x " * 5),
          (t(0, 20), "A", "p2", "d" * 40, "py", "x " * 5),   # dup content
          (t(5, 0), "A", "p3", "e" * 40, "py", "fresh " * 5)]  # advances watermark to 10:03
    b2 = [(t(0, 30), "A", "p4", "f" * 40, "py", "late " * 5),  # LATE: < 10:03 watermark
          (t(6, 0), "A", "p5", "g" * 40, "py", "new " * 5)]
    spark.createDataFrame(b1, ts_schema).coalesce(1).write.parquet(str(in_dir / "b1"))

    stream = (spark.readStream.schema(ts_schema)
              .option("maxFilesPerTrigger", "1").parquet(str(in_dir) + "/*"))
    out = streaming_dup_rate_windows(stream, cfg, window="1 minute",
                                     watermark="2 minutes")
    q = (out.writeStream.format("memory").queryName("winstats")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "win_ckpt"))
         .start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, ts_schema).coalesce(1).write.parquet(str(in_dir / "b2"))
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM winstats").collect()
    # final state per window = last emitted row
    by_win = {}
    for r in rows:
        by_win[(r.win_start.minute, r.repo)] = r
    w0 = by_win[(0, "A")]
    assert w0.n_rows == 2                  # late p4 row was dropped
    assert w0.n_distinct_approx == 1       # p1/p2 identical content
    assert by_win[(5, "A")].n_rows == 1
    assert by_win[(6, "A")].n_rows == 1    # on-time batch-2 row counted
