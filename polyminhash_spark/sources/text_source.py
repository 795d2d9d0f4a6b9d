"""Text-file record source — the reference's native input format
(reference src/parse_geodata.cpp:9-66: tab-separated "<id>\\t<WKT>"
lines; :130-249: plain one-record-per-line files with line-number ids),
mapped into the pipeline's input_hint schema so a reference user's
.wkt/.tsv workflow ingests without a pre-conversion step.

Spark shape: `spark.read.text` is a splittable distributed scan (the
reference hand-rolls byte-range splitting in splitFile; Spark's text
source gives the same block parallelism for free).  The id-bearing
form is a pure JVM split on the FIRST delimiter (payloads may contain
the delimiter).  The plain form needs stable per-record ids where the
reference uses line numbers: zipWithIndex supplies a deterministic
global index (one extra lightweight count job — ingest-time only,
never in the query path).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_text_records(spark: SparkSession, path: str, delimiter: str = "\t",
                      with_id: bool = True) -> DataFrame:
    """Text file(s) -> input_hint-shaped DataFrame
    (repo, path, commit, lang, content).

    * with_id=True: each line is "<record_id><delimiter><payload>"
      (reference WKT-with-id, parse_geodata.cpp:22-31); the split is
      on the FIRST delimiter only.  Lines with no delimiter are kept
      with the whole line as payload and a line-hash id, mirroring the
      reference's tolerant parse.
    * with_id=False: plain one-record-per-line; ids are the stable
      zipWithIndex line index (the reference's line-number ids).

    repo = source file name, path = "rec/<id>", commit = NULL (the
    normalize() id encoding handles NULL injectively)."""
    lines = spark.read.text(path).select(
        F.input_file_name().alias("src_file"), F.col("value"))
    if with_id:
        d = delimiter
        rec = lines.select(
            "src_file",
            F.when(F.instr("value", d) > 0,
                   F.substring_index("value", d, 1))
             .otherwise(F.lower(F.hex(F.xxhash64("value")))).alias("rec_id"),
            F.when(F.instr("value", d) > 0,
                   F.expr(f"substring(value, instr(value, '{d}') + {len(d)})"))
             .otherwise(F.col("value")).alias("content"),
        )
    else:
        rdd = lines.rdd.zipWithIndex()
        rec = rdd.map(lambda t: (t[0][0], str(t[1]), t[0][1])).toDF(
            ["src_file", "rec_id", "content"])
    return rec.select(
        F.element_at(F.split("src_file", "/"), -1).alias("repo"),
        F.concat(F.lit("rec/"), F.col("rec_id")).alias("path"),
        F.lit(None).cast("string").alias("commit"),
        F.lit(None).cast("string").alias("lang"),
        "content",
    ).filter(F.length("content") > 0)
