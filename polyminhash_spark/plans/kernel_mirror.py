"""DuckDB mirror of the PRODUCTION numpy-kernel dedup pipeline.

The SQL-mirror queries (plans/sql_mirror.py) certify a *parallel*
md5-based formulation of each operator; the two `pipeline_*` driver
queries previously ran the real numpy-kernel pipeline with only a
rows-only check.  This module closes that gap: it renders the ACTUAL
kernel arithmetic — UTF-8 rolling FNV-polynomial shingle hashes with
the murmur fmix64 finalizer (kernels.char_shingles / mix64), the
(x ^ seed) * odd permutation MinHash (kernels.minhash), the per-band
fold (kernels.band_keys), the 64-bit SimHash majority vote, the tiered
verify cuts, exact set-Jaccard, connected components, and the
exact-group expansion — as DuckDB SQL, bit-for-bit.

Feasibility rests on three facts:
* uint64 wraparound multiply fits DuckDB via 32-bit limbs:
  a*b mod 2^64 = a_lo*b_lo + ((a_lo*b_hi + a_hi*b_lo) mod 2^32)<<32,
  every intermediate < 2^65 (INT128-safe; the naive 64x64 product
  overflows INT128);
* the driver corpus is ASCII, so ord(substr(t, i, 1)) == the UTF-8
  byte the kernel hashes (checked: 0 non-ASCII rows at every sf);
* each hash-chain step is its own nested-subquery projection — lateral
  column aliases would expand textually (~128 copies of the input per
  fmix) and blow up binding time.

The Spark side of the comparison is run_pipeline() itself — the real
production code (mapInArrow numpy kernels, candidate_pairs, tiered
verify UDF, connected components) — at SQL-tractable signature widths:
`mirror_config()` runs the classic `perm` kernel (reference-fidelity
path, SURVEY.md O12) at num_perm=8; `mirror_config_oph()` runs the
DEFAULT one-permutation kernel at num_perm=64, where the per-bucket
min is an order-free GROUP BY (the lexsort in kernels.oph_minhash just
implements min-per-bucket) and optimal densification mirrors exactly
because its probe sequence is doc-independent (see _oph_mh_ctes).
"""

from __future__ import annotations

import numpy as np

M64 = 1 << 64
B32 = 1 << 32
FNV = 0x100000001B3
GOLDEN = 0x9E3779B97F4A7C15
MIX1 = 0xFF51AFD7ED558CCD
MIX2 = 0xC4CEB9FE1A85EC53


def mirror_config():
    """The production DedupConfig at SQL-tractable signature width."""
    from polyminhash_spark.config import DedupConfig

    return DedupConfig(num_perm=8, bands=4, rows_per_band=2,
                       minhash_impl="perm")


def mirror_config_oph():
    """Mirror config for the DEFAULT production kernel (OPH + optimal
    densification).  num_perm=64: with ~300-550 distinct shingles per
    driver doc, P=64 leaves ~0.9% of bins empty, so the densification
    path actually fires on real rows (P=8 would never exercise it)."""
    from polyminhash_spark.config import DedupConfig

    return DedupConfig(num_perm=64, bands=16, rows_per_band=4,
                       minhash_impl="oph")


# --- uint64 arithmetic fragments --------------------------------------------

def _mul64(a: str, b: str) -> str:
    """(a*b) mod 2^64 via 32-bit limbs, hugeint intermediates."""
    A, B = f"cast({a} as hugeint)", f"cast({b} as hugeint)"
    return ("cast((("
            f"({A} % {B32}) * ({B} % {B32}) + "
            f"((({A} % {B32}) * ({B} // {B32}) + "
            f"({A} // {B32}) * ({B} % {B32})) % {B32}) * {B32}"
            f") % {M64}) as ubigint)")


def _mulconst(a: str, c: int, add: str = "0") -> str:
    """(a*c + add) mod 2^64 with a compile-time constant c."""
    c_lo, c_hi = c % B32, c // B32
    A = f"cast({a} as hugeint)"
    return ("cast((("
            f"({A} % {B32}) * {c_lo} + "
            f"((({A} % {B32}) * {c_hi} + ({A} // {B32}) * {c_lo}) % {B32}) * {B32} + "
            f"cast({add} as hugeint)"
            f") % {M64}) as ubigint)")


def _fmix_steps(x: str, out: str, pfx: str) -> list[tuple[str, str]]:
    """murmur fmix64 as a chain of (alias, expr) nested-subquery steps."""
    return [
        (f"{pfx}1", f"xor({x}, {x} >> 33)"),
        (f"{pfx}2", _mulconst(f"{pfx}1", MIX1)),
        (f"{pfx}3", f"xor({pfx}2, {pfx}2 >> 33)"),
        (f"{pfx}4", _mulconst(f"{pfx}3", MIX2)),
        (out, f"xor({pfx}4, {pfx}4 >> 33)"),
    ]


def _chain(inner: str, steps: list[tuple[str, str]]) -> str:
    """Nest one subquery per step: SELECT *, expr AS alias FROM (...)."""
    sql = inner
    for name, expr in steps:
        sql = f"SELECT *, {expr} AS {name} FROM ({sql})"
    return sql


def _oph_mh_ctes(P: int, seeds) -> list[str]:
    """The OPH kernel (kernels.oph_minhash) as SQL: bucket = g mod P,
    slot = min over the bucket of fmix64(g ^ bin_seed); every empty bin
    borrows from the first FILLED bin its doc-independent probe
    sequence hits (probe[t, bin] = fmix64(bin_seed ^ (t*GOLDEN)) mod P
    — computable as a (bin, t) table because it does not depend on the
    document; that doc-independence is exactly what makes optimal
    densification unbiased), value = fmix64(donor_slot ^ bin_seed);
    if no probe hits within 8*P steps (astronomically rare), the donor
    is the lowest-index filled bin — the kernel's exact fallback."""
    bin_rows = ", ".join(
        f"({b}, cast('{int(seeds[b])}' as ubigint))" for b in range(P))
    binseeds = f"binseeds(b, s) AS (VALUES {bin_rows})"

    slots_inner = ("SELECT g2.id, bs.b, xor(g2.g, bs.s) AS x FROM "
                   f"(SELECT id, g, cast(g % {P} as bigint) AS gb "
                   "FROM ghash) g2 JOIN binseeds bs ON bs.b = g2.gb")
    filled = ("filled AS (SELECT id, b, min(v) AS slot FROM ("
              + _chain(slots_inner, _fmix_steps("x", "v", "sv"))
              + ") GROUP BY id, b)")

    emptyb = ("emptyb AS (SELECT d.id, bs.b FROM "
              "(SELECT DISTINCT id FROM ghash) d CROSS JOIN binseeds bs "
              "LEFT JOIN filled f ON f.id = d.id AND f.b = bs.b "
              "WHERE f.slot IS NULL)")

    probe_inner = (
        "SELECT bs.b, "
        f"xor(bs.s, cast((cast(r.range as hugeint) * {GOLDEN}) % {M64} "
        "as ubigint)) AS x, r.range AS t "
        f"FROM binseeds bs CROSS JOIN range(0, {8 * P}) r")
    probes = ("probes AS (SELECT b, t, cast(pv % " + str(P) + " as bigint) "
              "AS pb FROM ("
              + _chain(probe_inner, _fmix_steps("x", "pv", "pp")) + "))")

    donor_t = ("donor_t AS (SELECT eb.id, eb.b AS bin, min(p.t) AS t0 "
               "FROM emptyb eb JOIN probes p ON p.b = eb.b "
               "JOIN filled f ON f.id = eb.id AND f.b = p.pb "
               "GROUP BY eb.id, eb.b)")
    donor = ("donor AS (SELECT dt.id, dt.bin, f.slot AS dslot "
             "FROM donor_t dt JOIN probes p ON p.b = dt.bin AND p.t = dt.t0 "
             "JOIN filled f ON f.id = dt.id AND f.b = p.pb)")
    fallb = ("fallb AS (SELECT eb.id, eb.b AS bin, f.slot AS dslot "
             "FROM emptyb eb "
             "LEFT JOIN donor_t dt ON dt.id = eb.id AND dt.bin = eb.b "
             "JOIN (SELECT id, min(b) AS fb FROM filled GROUP BY id) mf "
             "ON mf.id = eb.id "
             "JOIN filled f ON f.id = eb.id AND f.b = mf.fb "
             "WHERE dt.t0 IS NULL)")

    dense_inner = ("SELECT dd.id, dd.bin, xor(dd.dslot, bs.s) AS x FROM "
                   "(SELECT * FROM donor UNION ALL SELECT * FROM fallb) dd "
                   "JOIN binseeds bs ON bs.b = dd.bin")
    densified = ("densified AS (SELECT id, bin, dv AS slot FROM ("
                 + _chain(dense_inner, _fmix_steps("x", "dv", "dz")) + "))")

    mh = ("mh AS (SELECT id, b AS p, slot FROM filled "
          "UNION ALL SELECT id, bin AS p, slot FROM densified)")
    return [binseeds, filled, emptyb, probes, donor_t, donor, fallb,
            densified, mh]


# --- the pipeline CTE chain --------------------------------------------------

def _prefix_ctes(cfg) -> str:
    from polyminhash_spark import kernels as K

    k = cfg.shingle_k
    P = cfg.num_perm
    R = cfg.rows_per_band
    seeds = K.mixed_seeds(cfg.perm_seeds())
    muls = (seeds << np.uint64(1)) | np.uint64(1)

    def lp(c: str) -> str:
        return (f"coalesce(concat(cast(length({c}) as varchar), ':', {c}), "
                "'-')")

    corpus = (
        "corpus AS (SELECT source AS repo, "
        "concat('doc/', cast(doc_id as varchar)) AS path, "
        "substr(sha256(cast(doc_id as varchar)), 1, 40) AS commit, "
        "lang, text AS content FROM documents)")
    norm = (
        "norm AS (SELECT "
        f"substr(sha256(concat({lp('repo')}, {lp('path')}, {lp('commit')})), 1, 32) AS id, "
        "repo, path, commit, lang, sha256(content) AS content_sha, "
        "regexp_replace(regexp_replace(content, concat('^', chr(65279)), ''), "
        "concat(chr(13), chr(10), '|', chr(13)), chr(10), 'g') AS norm_content, "
        "length(content) AS n_chars, "
        "sha256(regexp_replace(regexp_replace(content, concat('^', chr(65279)), ''), "
        "concat(chr(13), chr(10), '|', chr(13)), chr(10), 'g')) AS norm_sha "
        "FROM corpus WHERE content IS NOT NULL AND length(content) >= 1)")
    reps = ("reps AS (SELECT norm_sha, min(id) AS rep_id FROM norm "
            "GROUP BY norm_sha)")
    rep_map = ("rep_map AS (SELECT n.id, r.rep_id FROM norm n "
               "JOIN reps r USING (norm_sha))")
    rdocs = ("rdocs AS (SELECT r.rep_id AS id, n.norm_content AS t "
             "FROM reps r JOIN norm n ON n.id = r.rep_id)")

    # k-gram rolling hash, n >= k branch: h = fold(h*FNV + byte), fmix
    bytes_cols = ", ".join(
        f"cast(ord(substr(t, i + {j}, 1)) as ubigint) AS b{j}"
        for j in range(k))
    win_inner = (f"SELECT id, {bytes_cols} FROM (SELECT id, t, "
                 f"unnest(range(1, length(t) - {k} + 2)) AS i FROM rdocs "
                 f"WHERE length(t) >= {k})")
    steps: list[tuple[str, str]] = []
    prev = "b0"
    for j in range(1, k):
        steps.append((f"h{j}", _mulconst(prev, FNV, f"b{j}")))
        prev = f"h{j}"
    steps += _fmix_steps(prev, "g", "f")
    wins = "wins AS (SELECT id, g FROM (" + _chain(win_inner, steps) + "))"

    # n < k branch: bytes_hash — GOLDEN-seeded fold over ALL bytes, fmix
    short_inner = (
        "SELECT id, cast(list_reduce("
        f"list_prepend(cast({GOLDEN} as hugeint), "
        "list_transform(range(1, length(t)+1), "
        "j -> cast(ord(substr(t, j, 1)) as hugeint))), "
        f"(h, b) -> (h * {FNV} + b) % {M64}) as ubigint) AS hraw "
        f"FROM rdocs WHERE length(t) < {k}")
    shorts = ("shorts AS (SELECT id, g FROM ("
              + _chain(short_inner, _fmix_steps("hraw", "g", "f")) + "))")
    ghash = ("ghash AS (SELECT DISTINCT id, g FROM "
             "(SELECT * FROM wins UNION ALL SELECT * FROM shorts))")
    sizes = "sizes AS (SELECT id, count(*) AS n FROM ghash GROUP BY id)"

    if cfg.minhash_impl == "perm":
        perm_rows = ", ".join(
            f"({p}, cast('{int(seeds[p])}' as ubigint), "
            f"cast('{int(muls[p])}' as ubigint))" for p in range(P))
        mh_ctes = [
            f"perms(p, s, mm) AS (VALUES {perm_rows})",
            ("mh AS (SELECT id, p, min(" + _mul64("x", "mm") + ") AS slot "
             "FROM (SELECT id, p, mm, xor(g, s) AS x "
             "FROM ghash CROSS JOIN perms) GROUP BY id, p)"),
        ]
    else:
        mh_ctes = _oph_mh_ctes(P, seeds)

    # 64-bit SimHash: majority bit over the distinct shingle hashes
    sim_terms = " + ".join(
        f"(CASE WHEN 2 * sum(cast((g >> {j}) & 1 as bigint)) >= count(*) "
        f"THEN cast('{1 << j}' as ubigint) ELSE cast(0 as ubigint) END)"
        for j in range(64))
    sim = f"sim AS (SELECT id, {sim_terms} AS sh FROM ghash GROUP BY id)"

    # band keys: fold r slots, h = fmix(h*FNV ^ slot), h0 = GOLDEN
    pivots = ", ".join(
        f"max(CASE WHEN p % {R} = {r} THEN slot END) AS s{r}"
        for r in range(R))
    bpivot_inner = (f"SELECT id, p // {R} AS band, {pivots} "
                    "FROM mh GROUP BY id, band")
    gf = (GOLDEN * FNV) % M64
    bsteps: list[tuple[str, str]] = [("t0", f"xor(cast({gf} as ubigint), s0)")]
    bsteps += _fmix_steps("t0", "k0", "m0")
    prev = "k0"
    for r in range(1, R):
        bsteps.append((f"t{r}", f"xor({_mulconst(prev, FNV)}, s{r})"))
        bsteps += _fmix_steps(f"t{r}", f"k{r}", f"m{r}")
        prev = f"k{r}"
    bk = ("bk AS (SELECT id, band, " + prev + " AS band_key FROM ("
          + _chain(bpivot_inner, bsteps) + "))")

    # candidates + tier-0 (shared-band count)
    cands = (
        "cands AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS nsb "
        "FROM bk a JOIN bk b ON a.band = b.band AND a.band_key = b.band_key "
        "AND a.id < b.id GROUP BY a.id, b.id)")
    t0 = (f"tier0 AS (SELECT id_a, id_b FROM cands "
          f"WHERE nsb >= {cfg.min_band_matches})")

    # tier-1 est (low-32 slot equality — operators/verify attaches the
    # minhash32 truncation) + tier-2 SimHash hamming
    est = (
        "est AS (SELECT t.id_a, t.id_b, "
        f"sum(CASE WHEN (a.slot % {B32}) = (b.slot % {B32}) "
        "THEN 1 ELSE 0 END) AS neq FROM tier0 t "
        "JOIN mh a ON a.id = t.id_a JOIN mh b ON b.id = t.id_b AND b.p = a.p "
        "GROUP BY t.id_a, t.id_b)")
    surv = (
        "survivors AS (SELECT e.id_a, e.id_b FROM est e "
        "JOIN sim sa ON sa.id = e.id_a JOIN sim sb ON sb.id = e.id_b "
        f"WHERE (cast(e.neq as double) / {P}) >= {cfg.prefilter_estimate} "
        f"AND bit_count(xor(sa.sh, sb.sh)) <= {cfg.simhash_hamming_max})")

    # tier-3 exact set-Jaccard over the kernel shingle-hash sets
    inter = (
        "inter AS (SELECT s.id_a, s.id_b, count(*) AS inter_n "
        "FROM survivors s JOIN ghash x ON x.id = s.id_a "
        "JOIN ghash y ON y.id = s.id_b AND y.g = x.g GROUP BY s.id_a, s.id_b)")
    verified = (
        "verified AS (SELECT s.id_a, s.id_b, "
        "cast(coalesce(i.inter_n, 0) as double) / "
        "(za.n + zb.n - coalesce(i.inter_n, 0)) AS jac "
        "FROM survivors s LEFT JOIN inter i "
        "ON i.id_a = s.id_a AND i.id_b = s.id_b "
        "JOIN sizes za ON za.id = s.id_a JOIN sizes zb ON zb.id = s.id_b)")

    return ", ".join(
        [corpus, norm, reps, rep_map, rdocs, wins, shorts, ghash, sizes]
        + mh_ctes
        + [sim, bk, cands, t0, est, surv, inter, verified])


_MATERIALIZE = ("norm", "reps", "rep_map", "ghash", "sizes", "filled",
                "emptyb", "probes", "mh", "sim", "bk", "cands", "tier0",
                "est", "survivors", "verified")


def _materialize_hints(sql: str) -> str:
    """DuckDB inlines single-definition CTEs and RE-EXECUTES them per
    reference — the pipeline chain references ghash/filled/mh several
    times each, which measured 5x slower end-to-end than materializing.
    AS MATERIALIZED pins each expensive CTE to one evaluation.  (The
    recursive `reach` CTE is deliberately not touched.)"""
    for name in _MATERIALIZE:
        sql = sql.replace(f"{name} AS (", f"{name} AS MATERIALIZED (", 1)
    return sql


def pipeline_clusters_duck(impl: str = "perm") -> str:
    """Full-pipeline cluster assignment: dup edges (jaccard >= threshold)
    over exact-group representatives -> connected components (label =
    min member id, recursive CTE) -> expansion to all rows, with the
    dedup_output column contract."""
    cfg = mirror_config_oph() if impl == "oph" else mirror_config()
    sql = (
        "WITH RECURSIVE " + _prefix_ctes(cfg) + ", "
        f"dup AS (SELECT id_a, id_b FROM verified WHERE jac >= {cfg.jaccard_threshold}), "
        "edges AS (SELECT id_a AS u, id_b AS v FROM dup "
        "UNION ALL SELECT id_b, id_a FROM dup), "
        "reach(node, label) AS ("
        "SELECT rep_id, rep_id FROM reps "
        "UNION "
        "SELECT e.u, r.label FROM reach r JOIN edges e ON e.v = r.node), "
        "complabel AS (SELECT node, min(label) AS cluster_id FROM reach "
        "GROUP BY node) "
        "SELECT n.id, n.repo, n.path, n.commit, n.lang, n.content_sha, "
        "cast(n.n_chars as bigint) AS n_chars, c.cluster_id "
        "FROM norm n JOIN rep_map m ON m.id = n.id "
        "JOIN complabel c ON c.node = m.rep_id")
    return _materialize_hints(sql)


def pipeline_neighbors_duck(impl: str = "perm") -> str:
    """Full-pipeline top-k neighbors: symmetrized verified pairs,
    distance = 1 - jaccard ascending, ties by neighbor id, rank <= k."""
    cfg = mirror_config_oph() if impl == "oph" else mirror_config()
    sql = (
        "WITH " + _prefix_ctes(cfg) + ", "
        "sym AS (SELECT id_a AS query_id, id_b AS neighbor_id, "
        "1 - jac AS distance FROM verified "
        "UNION ALL SELECT id_b, id_a, 1 - jac FROM verified), "
        "ranked AS (SELECT query_id, neighbor_id, distance, "
        "ROW_NUMBER() OVER (PARTITION BY query_id "
        "ORDER BY distance ASC, neighbor_id ASC) AS rank FROM sym) "
        "SELECT query_id, neighbor_id, distance, cast(rank as bigint) AS rank "
        f"FROM ranked WHERE rank <= {cfg.top_k}")
    return _materialize_hints(sql)
