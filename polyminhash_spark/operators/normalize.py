"""Normalize + id derivation — SURVEY.md O4/O5/O7.

All JVM-side (regexp_replace / sha2 / filters) so Catalyst keeps the
whole stage in codegen and pushes the validity predicates into the
scan.  The normalization is the analog of the reference's centroid
centering applied identically on both sides of every comparison
(reference src/geoutil.cpp:259-274, src/query.cpp:264-272,
src/main.cpp:152-160); it must stay in lock-step with
kernels.normalize_text (used by the oracle path).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from polyminhash_spark.config import DedupConfig

_BOM = "\ufeff"


def _len_prefixed(col: str) -> F.Column:
    """Injective field encoding: '<len>:<value>', NULL -> '-'."""
    c = F.col(col)
    return F.coalesce(
        F.concat(F.length(c).cast("string"), F.lit(":"), c), F.lit("-"))


def record_id(repo: str = "repo", path: str = "path",
              commit: str = "commit") -> F.Column:
    """binary(16) record id from the injective (repo, path, commit)
    encoding \u2014 see normalize() docstring."""
    key = F.concat(_len_prefixed(repo), _len_prefixed(path),
                   _len_prefixed(commit))
    return F.unhex(F.substring(F.sha2(key, 256), 1, 32))


def normalize(df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(repo, path, commit, lang, content) ->
    (id, repo, path, commit, lang, content_sha, norm_content, n_chars).

    * id = first 128 bits of sha256 over a LENGTH-PREFIXED encoding of
      (repo, path, commit) — "<len>:<field>" per field, NULL encoded as
      "-" (no digit prefix, so it cannot collide with any real field) —
      as binary(16).  Length-prefixing makes the encoding injective:
      ('a b','c') and ('a','b c') hash differently, unlike a plain
      space-join.  The analog of the reference's parsed string id
      (src/parse_geodata.cpp:22-31).  Binary, not hex string: the id
      is the shuffle key of every downstream stage (bands, pairs,
      verify joins, connected components), and 16 opaque bytes shuffle
      and compare ~4x cheaper than a 64-char string.  128 bits keeps
      collisions negligible at 10^12 rows (~2^-56 birthday bound).
    * content_sha = sha256(content) BEFORE normalization — the per-row
      invariant the north_rule requires to hold input<->output.
    * validity filter — the analog of the reference's type/validity
      drop at parse time (src/parse_geodata.cpp:39-57).
    """
    return (
        df.filter(F.col("content").isNotNull()
                  & (F.length("content") >= cfg.min_content_len))
        .select(
            record_id().alias("id"),
            "repo", "path", "commit", "lang",
            F.sha2(F.col("content").cast("binary"), 256).alias("content_sha"),
            # r6 (guide §1.2 per-task work): literal replace chain +
            # leading-BOM strip instead of two regexp_replace passes —
            # the regex engine walked every content byte through an NFA
            # twice; replace() is a plain substring scan.  Equivalent by
            # construction: '\r\n|\r' matches left-to-right with \r\n
            # consumed before a lone \r, exactly what the two-step
            # literal replace over the ORIGINAL string produces, and
            # '^BOM' removes at most one leading BOM.  This is the same
            # chain kernels.normalize_text (the oracle side) always used.
            F.replace(
                F.replace(
                    F.when(F.col("content").startswith(_BOM),
                           F.expr("substring(content, 2)"))
                     .otherwise(F.col("content")),
                    F.lit("\r\n"), F.lit("\n")),
                F.lit("\r"), F.lit("\n"),
            ).alias("norm_content"),
            F.length("content").alias("n_chars"),
        )
        .withColumn("norm_sha", F.sha2(F.col("norm_content").cast("binary"), 256))
    )


def exact_groups(normalized: DataFrame) -> DataFrame:
    """Exact-duplicate pre-grouping: (id, rep_id) where rep_id is the
    MIN id among rows with identical norm_sha.

    This is the engine's first skew defense (north_rule): identical
    files — overwhelmingly the hottest LSH buckets in a source-code
    corpus (vendored files, generated code) — are collapsed to one
    representative BEFORE MinHash, so no LSH bucket ever contains two
    copies of the same content.

    Physical shape (r6, guide §2.3/§2.4): ONE window aggregate over
    unhex(norm_sha) instead of groupBy(norm_sha) + join back.  The old
    shape shuffled the rows into the aggregate AND (whenever the rep
    side outgrew a broadcast — always, above ~800k reps) shuffled both
    sides again for the join; the window computes min(id) per group in
    the single exchange.  Keying on the 32-byte binary digest instead
    of the 64-char hex string (injective, sha2 output is fixed-case
    hex) halves the key bytes crossing that exchange.  Memory-safe on
    mega-groups: WindowExec buffers one group at a time in a spillable
    row array — no collect_list-style single-row blowup."""
    key = F.unhex(F.col("norm_sha")).alias("k")
    w = Window.partitionBy("k")
    return (normalized.select("id", key)
            .withColumn("rep_id", F.min("id").over(w))
            .select("id", "rep_id"))
