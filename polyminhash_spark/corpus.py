"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Generates rows of exactly the BASELINE.json `input_hint` shape —
(repo, path, commit, lang, content) — plus a ground-truth sidecar
(true_group_id, mutation_kind) for oracle tests.  The reference's
input model is (id, payload) lines with a replicated query set
(reference src/parse_geodata.cpp:9-66, src/main.cpp:146); in the dedup
graft the query set IS the data set (self-join), so one corpus serves
both sides.

Everything is a pure function of (params, seed): python stdlib
Random(seed) only, no time, no os entropy.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass

LANGS = ["python", "java", "c", "js", "md"]

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega count total index "
    "buffer stream window batch shard record offset cursor token bucket "
    "merge split reduce probe build scan flush spill salt skew hash band"
).split()

_STMT_TEMPLATES = {
    "python": [
        "def {f}({a}, {b}):",
        "    {v} = {a} + {b} * {n}",
        "    if {v} > {n}:",
        "        return {v} - {n}",
        "    for {i} in range({n}):",
        "        {v} += {i} ^ {n}",
        "    return {v}",
        "{v} = [{n}, {n2}, {n3}]",
        "class {C}:",
        "    {v}: int = {n}",
    ],
    "java": [
        "public int {f}(int {a}, int {b}) {{",
        "    int {v} = {a} + {b} * {n};",
        "    if ({v} > {n}) return {v} - {n};",
        "    for (int {i} = 0; {i} < {n}; {i}++) {v} += {i} ^ {n};",
        "    return {v};",
        "}}",
        "private static final int {C} = {n};",
    ],
    "c": [
        "int {f}(int {a}, int {b}) {{",
        "    int {v} = {a} + {b} * {n};",
        "    if ({v} > {n}) return {v} - {n};",
        "    for (int {i} = 0; {i} < {n}; {i}++) {v} += {i} ^ {n};",
        "    return {v};",
        "}}",
        "#define {C} {n}",
    ],
    "js": [
        "function {f}({a}, {b}) {{",
        "  let {v} = {a} + {b} * {n};",
        "  if ({v} > {n}) return {v} - {n};",
        "  for (let {i} = 0; {i} < {n}; {i}++) {v} += {i} ^ {n};",
        "  return {v};",
        "}}",
        "const {C} = {n};",
    ],
    "md": [
        "# {f} {a}",
        "The {v} of {a} and {b} is {n}.",
        "- item {n}: {v} {a}",
        "```\n{v} = {n}\n```",
        "See section {n2} about {b} and {C}.",
    ],
}

LICENSE_HEADER = (
    "/*\n * Copyright (c) 2024 Example Corp.\n * Licensed under the Apache "
    "License, Version 2.0 (the \"License\");\n * you may not use this file "
    "except in compliance with the License.\n * You may obtain a copy of the "
    "License at http://www.apache.org/licenses/LICENSE-2.0\n */\n"
)


@dataclass(frozen=True)
class CorpusParams:
    n_files: int = 1000
    dup_frac: float = 0.2          # fraction of files that are members of dup groups
    avg_lines: int = 30
    seed: int = 42
    n_repos: int = 20
    hot_repo_frac: float = 0.0     # skew knob: fraction of rows forced into repo 0
    license_header_frac: float = 0.0  # skew knob: shared hot shingle block
    token_edit_rate: float = 0.03  # per-line mutation prob for "near" dups


def _ident(rng: random.Random) -> str:
    return rng.choice(_WORDS) + str(rng.randrange(100))


def _base_content(rng: random.Random, lang: str, n_lines: int) -> str:
    tpls = _STMT_TEMPLATES[lang]
    lines = []
    for _ in range(n_lines):
        t = rng.choice(tpls)
        lines.append(
            t.format(
                f=_ident(rng), a=_ident(rng), b=_ident(rng), v=_ident(rng),
                i="i" + str(rng.randrange(10)), C=_ident(rng).upper(),
                n=rng.randrange(1000), n2=rng.randrange(1000),
                n3=rng.randrange(1000),
            )
        )
    return "\n".join(lines) + "\n"


def _mutate(rng: random.Random, content: str, kind: str, edit_rate: float) -> str:
    lines = content.split("\n")
    if kind == "identical":
        return content
    if kind == "whitespace":
        out = []
        for ln in lines:
            if ln and rng.random() < 0.15:
                ln = ln + " " * rng.randrange(1, 3)
            out.append(ln)
            if rng.random() < 0.05:
                out.append("")
        return "\n".join(out)
    if kind == "comment":
        out = list(lines)
        for _ in range(max(1, len(lines) // 15)):
            pos = rng.randrange(len(out))
            out.insert(pos, f"# note {rng.randrange(10000)}")
        return "\n".join(out)
    if kind == "token_edit":
        out = []
        for ln in lines:
            if ln and rng.random() < edit_rate:
                ln = ln.replace(str(rng.randrange(10)), str(rng.randrange(10, 100)), 1)
            out.append(ln)
        return "\n".join(out)
    if kind == "crlf":
        return content.replace("\n", "\r\n")
    raise ValueError(kind)


def _corpus_stream(params: CorpusParams):
    """Yield (row, truth) pairs one file at a time — the streaming core
    of generate_corpus, so multi-million-file corpora never hold all
    rows in Python lists (the r4 pure-list generator died by silent
    SIGKILL above ~2.6M files).  The RNG call order is IDENTICAL to
    the r4 list-building code, so every (params, seed) reproduces the
    exact same corpus bytes."""
    rng = random.Random(params.seed)
    mut_kinds = ["identical", "whitespace", "comment", "token_edit", "crlf"]

    n_dup_members = int(params.n_files * params.dup_frac)
    state = {"file_no": 0}

    def commit_of(i: int) -> str:
        return hashlib.sha1(f"commit-{params.seed}-{i}".encode()).hexdigest()

    def build(content: str, lang: str, gid: int, kind: str) -> tuple[dict, dict]:
        file_no = state["file_no"]
        if params.hot_repo_frac > 0 and rng.random() < params.hot_repo_frac:
            repo = "org0/repo0"
        else:
            repo = f"org{file_no % 7}/repo{rng.randrange(params.n_repos)}"
        if params.license_header_frac > 0 and rng.random() < params.license_header_frac:
            content = LICENSE_HEADER + content
        path = f"src/{lang}/file_{file_no:06d}.{lang[:2]}"
        row = {
            "repo": repo, "path": path, "commit": commit_of(file_no),
            "lang": lang, "content": content,
        }
        truth = {
            "repo": repo, "path": path, "commit": commit_of(file_no),
            "true_group_id": gid, "mutation_kind": kind,
        }
        state["file_no"] += 1
        return row, truth

    # duplicate groups of size 2-5
    emitted_dups = 0
    group_id = 0
    while emitted_dups < n_dup_members:
        lang = rng.choice(LANGS)
        size = min(rng.randrange(2, 6), n_dup_members - emitted_dups + 1)
        if size < 2:
            size = 2
        base = _base_content(rng, lang, max(8, int(rng.gauss(params.avg_lines, 6))))
        yield build(base, lang, group_id, "base")
        for _ in range(size - 1):
            kind = rng.choice(mut_kinds)
            yield build(_mutate(rng, base, kind, params.token_edit_rate),
                        lang, group_id, kind)
        emitted_dups += size
        group_id += 1

    # singletons
    while state["file_no"] < params.n_files:
        lang = rng.choice(LANGS)
        yield build(
            _base_content(rng, lang, max(8, int(rng.gauss(params.avg_lines, 6)))),
            lang, -1, "singleton")


def generate_corpus(params: CorpusParams) -> tuple[list[dict], list[dict]]:
    """Returns (rows, truth).  rows: input_hint-shaped dicts.  truth: one
    dict per row with (repo, path, commit, true_group_id, mutation_kind);
    true_group_id == -1 for singletons.  Materializes _corpus_stream —
    fine for test-sized corpora; use write_corpus_parquet for millions
    of files (bounded memory)."""
    rows: list[dict] = []
    truth: list[dict] = []
    for row, t in _corpus_stream(params):
        rows.append(row)
        truth.append(t)
    return rows, truth


def corpus_spark_df(spark, params: CorpusParams):
    """rows as a Spark DataFrame with the input_hint schema."""
    rows, _ = generate_corpus(params)
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([
        StructField("repo", StringType()), StructField("path", StringType()),
        StructField("commit", StringType()), StructField("lang", StringType()),
        StructField("content", StringType()),
    ])
    return spark.createDataFrame(rows, schema)


def write_corpus_parquet(path: str, params: CorpusParams,
                         chunk_rows: int = 131_072) -> None:
    """Write the corpus as parquet without Spark (pyarrow) — used by the
    bench harness so generation cost stays out of the timed window.

    Streams _corpus_stream through a ParquetWriter in chunk_rows
    batches, so peak memory is one chunk (~100-200 MB of content)
    regardless of n_files — the r4 version built every row in a Python
    list first and was SIGKILLed above ~2.6M files, which forced the
    5.2M scaling corpus to be stitched from two seeds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = ("repo", "path", "commit", "lang", "content")
    schema = pa.schema([(k, pa.string()) for k in cols])
    writer = None
    buf: dict[str, list] = {k: [] for k in cols}
    n = 0
    try:
        for row, _ in _corpus_stream(params):
            for k in cols:
                buf[k].append(row[k])
            n += 1
            if n >= chunk_rows:
                if writer is None:
                    writer = pq.ParquetWriter(path, schema)
                # small row groups keep the file splittable: Spark
                # parallelizes a parquet scan at row-group granularity,
                # and a single giant row group serializes the whole
                # normalize stage onto one task
                writer.write_table(pa.table(buf, schema=schema),
                                   row_group_size=4096)
                buf = {k: [] for k in cols}
                n = 0
        if n or writer is None:
            if writer is None:
                writer = pq.ParquetWriter(path, schema)
            writer.write_table(pa.table(buf, schema=schema),
                               row_group_size=4096)
    finally:
        if writer is not None:
            writer.close()
