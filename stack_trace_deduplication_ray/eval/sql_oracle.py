"""DuckDB-SQL generator for the flagship text-dedup oracle.

Builds ONE pure-SQL statement (no UDFs, no multi-statement tricks)
that reproduces ``pipelines.text.minhash_dedup_clusters`` —
exact + MinHash-LSH + winnowed-substring candidate generation,
exact-Jaccard / shared-L-gram verification, connected components,
min-id cluster naming — bit-for-bit on the driver's ``documents``
view, so the flagship clustering family is hash-checkable against an
independent engine instead of rows-only.

The repo's 64-bit hash kernels (functions/hashing.py: FNV-prime
polynomial window hashes finalized with splitmix64; MinHash
``min(a*x+b mod 2^64)``; banded LSH keys) are re-derived in SQL from
their published definitions:

- wraparound u64 *constant* multiplies (splitmix64 finalizer, band
  Horner) run in HUGEINT with hi/lo 32-bit splitting so no product
  exceeds INT128;
- the hot path — 128 permutations x every distinct shingle, ~13M rows
  at fixture scale — stays in native BIGINT via 16/32-bit limb
  splitting (HUGEINT modular arithmetic measured ~25x slower), with
  the per-(doc, perm) minimum taken through the order-preserving
  signed key ``(v_hi - 2^31)*2^32 + v_lo``;
- XOR / logical shifts use UBIGINT (exact two's-complement bit ops);
- connected components is a recursive min-label propagation CTE;
- the MinHash permutation parameters are emitted as a VALUES literal
  from the same seeded generator the pipeline uses (they are config
  constants, like the thresholds).

SCALE NOTE: this oracle is a CORRECTNESS artifact for the driver's
sf0.01 check (~3 s). It enumerates all band-bucket pairs unsalted,
which is exactly the engine's semantics while every bucket stays
under ``bucket_cap`` (asserted empirically at fixture scale: max
bucket size 4); the engine's salted/bridged path is equivalence-
tested separately (tests/test_candidates.py salted==unsalted).
"""

from __future__ import annotations

from fractions import Fraction

from stack_trace_deduplication_ray.config import DedupConfig

_M64 = "18446744073709551616"  # 2^64
_M32 = "4294967296"            # 2^32
_FNV = "1099511628211"         # 0x100000001B3, functions/hashing.py
_GAMMA = 0x9E3779B97F4A7C15
_SM_M1 = 0xBF58476D1CE4E5B9
_SM_M2 = 0x94D049BB133111EB


def _mulmod(v: str, m: int) -> str:
    """(v * m) % 2^64 for a 64-bit constant m, v a HUGEINT expression
    in [0, 2^64): hi/lo split keeps every product below INT128."""
    m_hi, m_lo = m >> 32, m & 0xFFFFFFFF
    return (
        f"((({v}) % {_M32}) * {m_lo} + "
        f"(((({v}) % {_M32}) * {m_hi} + (({v}) // {_M32}) * {m_lo})"
        f" % {_M32}) * {_M32}) % {_M64}"
    )


def _xshift(v: str, s: int) -> str:
    """v XOR (v >> s) via UBIGINT bit ops, result back as HUGEINT."""
    return (
        f"CAST(xor(CAST(({v}) AS UBIGINT), "
        f"CAST(({v}) AS UBIGINT) >> {s}) AS HUGEINT)"
    )


def _xor64(a: str, b: str) -> str:
    return (
        f"CAST(xor(CAST(({a}) AS UBIGINT), CAST(({b}) AS UBIGINT))"
        f" AS HUGEINT)"
    )


def _splitmix_steps() -> list[str]:
    """splitmix64 as a chain of single-column CTE steps over `c`."""
    return [
        f"(c + {_GAMMA}) % {_M64}",
        _xshift("c", 30),
        _mulmod("c", _SM_M1),
        _xshift("c", 27),
        _mulmod("c", _SM_M2),
        _xshift("c", 31),
    ]


def _gram_chain(name: str, k: int) -> str:
    """CTE chain emitting `{name}`(rep, pos, g): the splitmix64-
    finalized FNV polynomial hash of every in-row k-byte window of the
    normalized distinct texts (== hashing.window_hashes within rows).
    """
    leads = ",\n    ".join(
        f"lead(byte, {j}) OVER (PARTITION BY rep ORDER BY pos) AS b{j}"
        for j in range(1, k)
    )
    horner = "CAST(b0 AS HUGEINT)"
    for j in range(1, k):
        horner = f"(({horner}) * {_FNV} + b{j}) % {_M64}"
    out = (
        f"{name}_w AS (\n  SELECT rep, pos, byte AS b0,\n    {leads}\n"
        f"  FROM bytes\n),\n"
        f"{name}_h AS (\n  SELECT rep, pos, {horner} AS c\n"
        f"  FROM {name}_w WHERE b{k - 1} IS NOT NULL\n),\n"
    )
    prev = f"{name}_h"
    for i, expr in enumerate(_splitmix_steps()):
        last = i == 5
        cur = name if last else f"{name}_s{i}"
        col = "g" if last else "c"
        mat = " MATERIALIZED" if last else ""
        out += (
            f"{cur} AS{mat} (\n  SELECT rep, pos, {expr} AS {col}"
            f" FROM {prev}\n),\n"
        )
        prev = cur
    return out


def _perm_values(cfg: DedupConfig) -> str:
    """The pipeline's seeded MinHash (a, b) parameters as a VALUES
    literal, each split into 32-bit limbs for native-BIGINT math."""
    from stack_trace_deduplication_ray.functions import hashing as H

    a, b = H.minhash_params(cfg.num_perm, cfg.minhash_seed)
    rows = ",\n    ".join(
        f"({p}, {int(a[p]) >> 32}, {int(a[p]) & 0xFFFFFFFF}, "
        f"{int(b[p]) >> 32}, {int(b[p]) & 0xFFFFFFFF})"
        for p in range(cfg.num_perm)
    )
    return f"perms(p, a_hi, a_lo, b_hi, b_lo) AS (\n  VALUES\n    {rows}\n),\n"


# MinHash hot path: (a*x + b) mod 2^64 per (distinct shingle, perm) in
# pure BIGINT 16/32-bit limb arithmetic; min via the signed order key.
_SIG_CTES = """
shingles AS MATERIALIZED (
  SELECT DISTINCT rep,
         CAST(g // 4294967296 AS BIGINT) AS x_hi,
         CAST(g % 4294967296 AS BIGINT) AS x_lo
  FROM g5
),
pv1 AS (
  SELECT s.rep, pm.p,
         pm.a_hi, pm.a_lo, pm.b_hi, pm.b_lo, s.x_hi, s.x_lo,
         s.x_lo & 65535 AS xl16, s.x_lo >> 16 AS xh16,
         pm.a_lo * (s.x_lo & 65535) AS m0,
         pm.a_lo * (s.x_lo >> 16) AS m1
  FROM shingles s, perms pm
),
pv2 AS (
  SELECT rep, p, b_hi, b_lo,
         ((m1 & 65535) << 16) + m0 AS t,
         (m1 >> 16) AS m1hi,
         (((a_hi * xl16 + ((a_hi * xh16) & 65535) * 65536) & 4294967295)
          + ((a_lo * (x_hi & 65535)
              + ((a_lo * (x_hi >> 16)) & 65535) * 65536) & 4294967295)
         ) AS cross_sum
  FROM pv1
),
pv3 AS (
  SELECT rep, p,
         (t & 4294967295) + b_lo AS s_lo,
         (m1hi + (t >> 32) + cross_sum) & 4294967295 AS prod_hi,
         b_hi
  FROM pv2
),
sigk AS (
  SELECT rep, p,
         min( (((prod_hi + b_hi + (s_lo >> 32)) & 4294967295)
               - 2147483648) * 4294967296
              + (s_lo & 4294967295) ) AS sk
  FROM pv3 GROUP BY rep, p
),
sig AS MATERIALIZED (
  SELECT rep, p,
         CAST(((sk >> 32) + 2147483648) & 4294967295 AS HUGEINT)
           * 4294967296 + (sk & 4294967295) AS v
  FROM sigk
),
"""


def _band_chain(cfg: DedupConfig) -> str:
    """bandkeys(rep, band, bk) == hashing.band_keys: FNV Horner over
    each band's rows, band index mixed in, splitmix64 finalized."""
    rpb = cfg.rows_per_band
    vcols = ", ".join(
        f"max(CASE WHEN p % {rpb} = {j} THEN v END) AS v{j}"
        for j in range(rpb)
    )
    horner = "CAST(0 AS HUGEINT)"
    for j in range(rpb):
        horner = f"(({horner}) * {_FNV} + v{j}) % {_M64}"
    mix = _xor64("h", f"(band * {_GAMMA}) % {_M64}")
    out = (
        f"bandrows AS (\n  SELECT rep, p // {rpb} AS band, {vcols}\n"
        f"  FROM sig GROUP BY rep, p // {rpb}\n),\n"
        f"bandh AS (\n  SELECT rep, band, {horner} AS h FROM bandrows\n),\n"
        f"bandx AS (\n  SELECT rep, band, {mix} AS c FROM bandh\n),\n"
    )
    prev = "bandx"
    for i, expr in enumerate(_splitmix_steps()):
        last = i == 5
        cur = "bandkeys" if last else f"bands_s{i}"
        col = "bk" if last else "c"
        mat = " MATERIALIZED" if last else ""
        out += (
            f"{cur} AS{mat} (\n  SELECT rep, band, {expr} AS {col}"
            f" FROM {prev}\n),\n"
        )
        prev = cur
    return out


def _winnow_ctes(cfg: DedupConfig) -> str:
    """fps(rep, fp) == stages.expand.winnow_fingerprints: per-row
    min of every full `window`-length run of L-gram hashes; rows with
    fewer than `window` hashes keep the run minimum."""
    w = cfg.winnow_window
    return f"""
g32n AS (
  SELECT rep, pos, g,
         count(*) OVER (PARTITION BY rep) AS cnt,
         min(g) OVER (PARTITION BY rep ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
           AS wmin,
         min(g) OVER (PARTITION BY rep) AS allmin,
         row_number() OVER (PARTITION BY rep ORDER BY pos) AS rn
  FROM g32
),
fps AS MATERIALIZED (
  SELECT DISTINCT rep, wmin AS fp FROM g32n
  WHERE cnt >= {w} AND rn <= cnt - {w - 1}
  UNION
  SELECT DISTINCT rep, allmin AS fp FROM g32n WHERE cnt < {w}
),
"""


# NFC + whitespace-collapse normalization (signatures.py
# normalize_captions with lowercase off), distinct texts keyed by
# their minimum doc_id — the engine's exact-collapse representative.
def _norm_expr(lowercase: bool) -> str:
    """SQL for signatures.normalize_captions: NFC -> optional lower
    -> whitespace collapse (same operation order as the Python)."""
    inner = "lower(nfc_normalize(text))" if lowercase else "nfc_normalize(text)"
    return f"trim(regexp_replace({inner}, '\\s+', ' ', 'g'))"


def _base_ctes(lowercase: bool = False) -> str:
    return f"""
hexmap AS (
  SELECT lower(lpad(to_hex(v), 2, '0')) AS hx, v AS val
  FROM generate_series(0, 255) t(v)
),
norm AS MATERIALIZED (
  SELECT min(doc_id) AS rep, t AS txt, octet_length(encode(t)) AS blen
  FROM (
    SELECT doc_id,
           {_norm_expr(lowercase)} AS t
    FROM documents
  )
  GROUP BY t
),
bytes AS MATERIALIZED (
  SELECT n.rep, i.pos, m.val AS byte
  FROM norm n
  JOIN generate_series(1, 65536) i(pos) ON i.pos <= n.blen
  JOIN hexmap m
    ON substr(lower(hex(encode(n.txt))), 2*i.pos-1, 2) = m.hx
),
"""


_BASE_CTES = _base_ctes(False)


def _final_ctes(
    cfg: DedupConfig, lowercase: bool = False, id_alias: str = "doc_id"
) -> str:
    """Candidates -> verify -> union edges -> recursive CC -> min-id
    clusters, relabeled back onto every doc_id. Stage-aware: emits
    the MinHash and/or substring edge CTEs per ``cfg.stages`` (the
    exact stage is the norm CTE's distinct-text collapse, always on)."""
    use_mh = "minhash" in cfg.stages
    use_ss = "substring" in cfg.stages
    assert use_mh or use_ss, "need at least one candidate stage"
    frac = Fraction(cfg.jaccard_threshold).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator
    mh = f"""
cand_mh AS MATERIALIZED (
  SELECT DISTINCT a.rep AS ra, b.rep AS rb
  FROM bandkeys a JOIN bandkeys b ON a.bk = b.bk AND a.rep < b.rep
),
shc AS (SELECT rep, count(*) AS c FROM shingles GROUP BY rep),
mh_edges AS (
  SELECT p.ra, p.rb
  FROM cand_mh p
  JOIN shc ca ON ca.rep = p.ra
  JOIN shc cb ON cb.rep = p.rb
  JOIN (
    SELECT c.ra, c.rb, count(*) AS inter
    FROM cand_mh c
    JOIN shingles sa ON sa.rep = c.ra
    JOIN shingles sb ON sb.rep = c.rb AND sb.x_hi = sa.x_hi
                                      AND sb.x_lo = sa.x_lo
    GROUP BY c.ra, c.rb
  ) i ON i.ra = p.ra AND i.rb = p.rb
  -- exact Jaccard >= {cfg.jaccard_threshold} in integer arithmetic:
  -- inter/(ca+cb-inter) >= {num}/{den}; for the small denominators
  -- Jaccard ratios take, the rational predicate coincides with the
  -- engine's float comparison (nearest-double rounding at the only
  -- boundary point is identical in both engines)
  WHERE {den} * i.inter >= {num} * (ca.c + cb.c - i.inter)
),"""
    ss = """
cand_ss AS MATERIALIZED (
  SELECT DISTINCT a.rep AS ra, b.rep AS rb
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.rep < b.rep
),
ss_edges AS (
  SELECT DISTINCT c.ra, c.rb
  FROM cand_ss c
  JOIN g32 ga ON ga.rep = c.ra
  JOIN g32 gb ON gb.rep = c.rb AND gb.g = ga.g
),"""
    if use_mh and use_ss:
        union = "SELECT ra, rb FROM mh_edges UNION SELECT ra, rb FROM ss_edges"
    elif use_mh:
        union = "SELECT DISTINCT ra, rb FROM mh_edges"
    else:
        union = "SELECT ra, rb FROM ss_edges"
    return (
        (mh if use_mh else "")
        + (ss if use_ss else "")
        + f"""
alledges AS MATERIALIZED (
  {union}
),
edges_u AS MATERIALIZED (
  SELECT ra AS s, rb AS d FROM alledges
  UNION SELECT rb AS s, ra AS d FROM alledges
),
walk(id, lbl) AS (
  SELECT rep, rep FROM norm
  UNION
  SELECT e.d, w.lbl FROM walk w JOIN edges_u e ON e.s = w.id
  WHERE w.lbl < e.d
),
lbl AS (SELECT id, min(lbl) AS cluster FROM walk GROUP BY id),
docrep AS (
  SELECT d.doc_id, n.rep
  FROM (
    SELECT doc_id,
           {_norm_expr(lowercase)} AS t
    FROM documents
  ) d JOIN norm n ON n.txt = d.t
)
SELECT d.doc_id AS {id_alias}, CAST(l.cluster AS BIGINT) AS cluster_id
FROM docrep d JOIN lbl l ON l.id = d.rep
"""
    )


def _dedup_clusters_sql(
    cfg: DedupConfig,
    source_cte: str = "",
    id_alias: str = "doc_id",
) -> str:
    """Assemble the full clusters oracle for any ``cfg.stages`` subset
    of (exact, minhash, substring) over a ``documents(doc_id, text)``
    relation — the driver's view by default, or a prepended
    ``source_cte`` named `documents` that shadows it (CTE names take
    precedence over views in DuckDB)."""
    use_mh = "minhash" in cfg.stages
    use_ss = "substring" in cfg.stages
    s = "WITH RECURSIVE " + source_cte + _base_ctes(cfg.lowercase)
    if use_mh:
        s += _gram_chain("g5", cfg.shingle_k)
    if use_ss:
        s += _gram_chain("g32", cfg.substring_min_len) + _winnow_ctes(cfg)
    if use_mh:
        s += _perm_values(cfg) + _SIG_CTES + _band_chain(cfg)
    return s + _final_ctes(cfg, cfg.lowercase, id_alias)


def minhash_dedup_clusters_sql(cfg: DedupConfig | None = None) -> str:
    """The complete oracle statement for
    pipelines.text.minhash_dedup_clusters (config defaults to the
    pipeline's TEXT_DEDUP_CONFIG)."""
    if cfg is None:
        from stack_trace_deduplication_ray.pipelines.text import (
            TEXT_DEDUP_CONFIG,
        )

        cfg = TEXT_DEDUP_CONFIG
    assert not cfg.lowercase, "oracle encodes the no-lowercase text path"
    return _dedup_clusters_sql(cfg)


def cluster_size_histogram_sql(cfg: DedupConfig | None = None) -> str:
    """Oracle for pipelines.text.cluster_size_histogram: the clusters
    statement wrapped in size-then-histogram GROUP BYs."""
    return (
        "SELECT c AS cluster_size,"
        " CAST(count(*) AS BIGINT) AS n_clusters FROM ("
        "SELECT cluster_id, CAST(count(*) AS BIGINT) AS c FROM ("
        + minhash_dedup_clusters_sql(cfg)
        + ") GROUP BY cluster_id) GROUP BY c"
    )


# MethodNameUnifier (sources/reports.py unify_method_name, reference
# ea/sim/main/data/parsers/base.py:21-32) as three chained RE2
# replaces; `\\10` parses as group 1 + literal '0' (RE2 rewrites use
# single-digit group refs).
_UNIFY_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(n, "
    "'(\\$)((?:0(?:x|\\.)[abcdef\\d]+|\\d+)(?:/(?:0(?:x|\\.)[abcdef\\d]+|\\d+))*)',"
    " '\\10', 'gi'), "
    "'(Generated\\w{0,50}Accessor)(\\d+)', '\\10', 'g'), "
    "'(\\$Proxy)(\\d+)', '\\10', 'g')"
)


def report_dedup_clusters_sql(fixture_dir: str) -> str:
    """Oracle for pipelines.text.report_dedup_clusters: raw V1/V0
    JSON report files parsed IN SQL (read_json_auto + list_transform
    + the MethodNameUnifier regex chain), caption = ' -> '-joined
    unified frames, then the exact+minhash clusters statement on the
    lowercase text path. The fixture dir must exist when the oracle
    runs — __ray_entry__.oracle_sql() writes it."""
    cfg = DedupConfig(stages=("exact", "minhash"))
    src = f"""documents AS MATERIALIZED (
  SELECT CAST(id AS BIGINT) AS doc_id,
         array_to_string(
           list_transform(
             CASE WHEN elements IS NOT NULL
                  THEN list_transform(elements, e -> e.name)
                  ELSE frames END,
             n -> {_UNIFY_SQL}
           ),
           ' -> '
         ) AS text
  FROM read_json_auto('{fixture_dir}/*.json', union_by_name=true)
),
"""
    return _dedup_clusters_sql(cfg, source_cte=src, id_alias="report_id")


# Per-doc variant of the normalization CTEs: no distinct-text
# collapse — `rep` IS the doc_id (pipelines that emit per-document
# pairs, e.g. substring_candidate_pairs, run their expansion on every
# row, so identical texts each carry their own fingerprints).
_BASE_CTES_PER_DOC = """
hexmap AS (
  SELECT lower(lpad(to_hex(v), 2, '0')) AS hx, v AS val
  FROM generate_series(0, 255) t(v)
),
norm AS MATERIALIZED (
  SELECT doc_id AS rep,
         trim(regexp_replace(nfc_normalize(text), '\\s+', ' ', 'g')) AS txt,
         octet_length(encode(
           trim(regexp_replace(nfc_normalize(text), '\\s+', ' ', 'g'))
         )) AS blen
  FROM documents
),
bytes AS MATERIALIZED (
  SELECT n.rep, i.pos, m.val AS byte
  FROM norm n
  JOIN generate_series(1, 65536) i(pos) ON i.pos <= n.blen
  JOIN hexmap m
    ON substr(lower(hex(encode(n.txt))), 2*i.pos-1, 2) = m.hx
),
"""


def substring_candidate_pairs_sql(cfg: DedupConfig | None = None) -> str:
    """Oracle for pipelines.text.substring_candidate_pairs: pairs of
    docs sharing a winnowed fingerprint (candidate generation) AND a
    common L-gram of the normalized text (verification), src < dst.

    Unlike substring_pairs_exact's closed-form L+window-1 contract,
    this reproduces the WINNOWING itself, so the guarantee gap in
    [L, L+window-2] is irrelevant: the oracle computes the identical
    fingerprint buckets the engine buckets on."""
    if cfg is None:
        from stack_trace_deduplication_ray.pipelines.text import (
            TEXT_DEDUP_CONFIG,
        )

        cfg = TEXT_DEDUP_CONFIG
    assert not cfg.lowercase
    return (
        "WITH "
        + _BASE_CTES_PER_DOC
        + _gram_chain("g32", cfg.substring_min_len)
        + _winnow_ctes(cfg)
        + """
cand_ss AS MATERIALIZED (
  SELECT DISTINCT a.rep AS ra, b.rep AS rb
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.rep < b.rep
)
SELECT DISTINCT CAST(c.ra AS BIGINT) AS src, CAST(c.rb AS BIGINT) AS dst
FROM cand_ss c
JOIN g32 ga ON ga.rep = c.ra
JOIN g32 gb ON gb.rep = c.rb AND gb.g = ga.g
"""
    )


def simhash_text_clusters_sql(cfg: DedupConfig | None = None) -> str:
    """Oracle for pipelines.text.simhash_text_clusters: per-doc token
    SimHash (Charikar bit votes over poly+splitmix token hashes),
    16-bit chunk-probed candidate buckets, in-bucket Hamming <= radius
    test, connected components, min-id clusters.

    Token hashes use hashing.hash_strings_poly — FNV Horner over the
    token's utf-8 bytes — computed here as byte * B^(len-pos) power
    sums in split-BIGINT limbs (the FNV powers come from a 1-row
    recursive doubling CTE bounded by the corpus' max token length).
    """
    if cfg is None:
        from stack_trace_deduplication_ray.config import DedupConfig as DC

        cfg = DC()
    chunks = cfg.simhash_chunks
    width = 64 // chunks
    mask = (1 << width) - 1
    radius = cfg.hamming_radius
    sm = _splitmix_steps()

    # splitmix chains over (rep, tid, c) / (rep, ci, c) tuples
    def chain(prefix: str, keycols: str, final_col: str, first_src: str):
        out = ""
        prev = first_src
        for i, expr in enumerate(sm):
            last = i == 5
            cur = prefix if last else f"{prefix}_s{i}"
            col = final_col if last else "c"
            mat = " MATERIALIZED" if last else ""
            out += (
                f"{cur} AS{mat} (\n  SELECT {keycols}, {expr} AS {col}"
                f" FROM {prev}\n),\n"
            )
            prev = cur
        return out

    return (
        "WITH RECURSIVE "
        + """
toks AS MATERIALIZED (
  SELECT doc_id AS rep, u.tok, u.tid
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             string_split(
               trim(regexp_replace(nfc_normalize(text), '\\s+', ' ', 'g')),
               ' '),
             (x, i) -> {'tok': x, 'tid': i})) AS u
    FROM documents
  )
  WHERE u.tok != ''
),
hexmap AS (
  SELECT lower(lpad(to_hex(v), 2, '0')) AS hx, v AS val
  FROM generate_series(0, 255) t(v)
),
tokbytes AS MATERIALIZED (
  SELECT t.rep, t.tid, i.pos, octet_length(encode(t.tok)) AS tlen,
         m.val AS byte
  FROM toks t
  JOIN generate_series(1, 4096) i(pos)
    ON i.pos <= octet_length(encode(t.tok))
  JOIN hexmap m
    ON substr(lower(hex(encode(t.tok))), 2*i.pos-1, 2) = m.hx
),
pw(e, v) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT e + 1, """ + _mulmod("v", 0x100000001B3) + """
  FROM pw
  WHERE e + 1 < (SELECT max(octet_length(encode(tok))) FROM toks)
),
pws AS MATERIALIZED (
  SELECT e, CAST(v // 4294967296 AS BIGINT) AS p_hi,
         CAST(v % 4294967296 AS BIGINT) AS p_lo
  FROM pw
),
-- Horner as a power sum: h = sum_j byte_j * B^(len-pos_j) mod 2^64,
-- accumulated in 32-bit limbs (byte * p_xx <= 2^40; limb sums stay
-- far below 2^63)
tokh AS MATERIALIZED (
  SELECT b.rep, b.tid,
         CAST(((sum(b.byte * p.p_hi) + (sum(b.byte * p.p_lo) >> 32))
               & 4294967295) AS HUGEINT) * 4294967296
           + (sum(b.byte * p.p_lo) & 4294967295) AS c
  FROM tokbytes b JOIN pws p ON p.e = b.tlen - b.pos
  GROUP BY b.rep, b.tid
),
"""
        + chain("th", "rep, tid", "g", "tokh")
        + f"""
bitvals(b, v) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT b + 1, v * 2 FROM bitvals WHERE b + 1 < 64
),
votes AS (
  SELECT t.rep, bv.b,
         sum(CASE WHEN (CAST(t.g AS UBIGINT) >> bv.b) & 1 = 1
                  THEN 1 ELSE -1 END) AS s,
         max(bv.v) AS bval
  FROM th t, bitvals bv
  GROUP BY t.rep, bv.b
),
simhash AS MATERIALIZED (
  SELECT n.rep,
         coalesce(v.sh, CAST(0 AS HUGEINT)) AS sh
  FROM (SELECT DISTINCT doc_id AS rep FROM documents) n
  LEFT JOIN (
    SELECT rep, coalesce(sum(bval) FILTER (s > 0), 0) AS sh
    FROM votes GROUP BY rep
  ) v ON v.rep = n.rep
),
chunkv AS (
  SELECT s.rep, ci.c AS ci,
         {_xor64(f"CAST((CAST(s.sh AS UBIGINT) >> (ci.c * {width}))"
                 f" & {mask} AS HUGEINT)",
                 f"(ci.c * {_GAMMA}) % {_M64}")} AS c
  FROM simhash s, generate_series(0, {chunks - 1}) ci(c)
),
"""
        + chain("ckeys", "rep, ci", "ck", "chunkv")
        + f"""
pairs AS MATERIALIZED (
  SELECT DISTINCT a.rep AS ra, b.rep AS rb
  FROM ckeys a
  JOIN ckeys b ON a.ck = b.ck AND a.rep < b.rep
  JOIN simhash sa ON sa.rep = a.rep
  JOIN simhash sb ON sb.rep = b.rep
  WHERE bit_count(xor(CAST(sa.sh AS UBIGINT), CAST(sb.sh AS UBIGINT)))
        <= {radius}
),
edges_u AS MATERIALIZED (
  SELECT ra AS s, rb AS d FROM pairs
  UNION SELECT rb AS s, ra AS d FROM pairs
),
walk(id, lbl) AS (
  SELECT DISTINCT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, w.lbl FROM walk w JOIN edges_u e ON e.s = w.id
  WHERE w.lbl < e.d
)
SELECT CAST(id AS BIGINT) AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
FROM walk GROUP BY id
"""
    )


def _srp_bucket_ctes(n_tables: int = 16, seed: int = 99,
                     quant_bits: int = 20) -> str:
    """CTEs reproducing pipelines.similarity.HyperplaneLSH exactly:
    quantized int64 embeddings, ±1 plane signs from splitmix64
    parity, integer dot signs, per-(vector, table) bucket values —
    ending at `buckets`(vec_id, bucket). Also emits `comps`
    (unnested double components) for downstream cosine scoring."""
    sm = _splitmix_steps()
    chain = ""
    prev = "pidx"
    for i, expr in enumerate(sm):
        last = i == 5
        cur = "planes" if last else f"pl_s{i}"
        col = "g" if last else "c"
        chain += (
            f"{cur} AS (\n  SELECT t, b, d, {expr} AS {col}"
            f" FROM {prev}\n),\n"
        )
        prev = cur
    return f"""
nvec AS (SELECT count(*) AS n FROM embeddings),
params AS (
  -- n_bits auto-sizing: max(4, ceil(log2(max(2, n/64))))
  SELECT greatest(4, CAST(ceil(log2(greatest(2.0, n / 64.0))) AS BIGINT))
    AS nbits
  FROM nvec
),
comps AS MATERIALIZED (
  SELECT vec_id, u.d - 1 AS d, CAST(u.x AS DOUBLE) AS x
  FROM (
    SELECT vec_id,
           unnest(list_transform(embedding,
                                 (v, i) -> {{'x': v, 'd': i}})) AS u
    FROM embeddings
  )
),
quant AS MATERIALIZED (
  SELECT vec_id, d, CAST(floor(x * {1 << quant_bits}) AS BIGINT) AS q
  FROM comps
),
dims AS (SELECT DISTINCT d FROM comps),
pidx AS (
  SELECT t.t, b.b, dims.d,
         {_xor64(f"CAST(t.t AS HUGEINT) * {1 << 40}"
                 f" + CAST(b.b AS HUGEINT) * {1 << 20}"
                 f" + dims.d", str(seed))} AS c
  FROM generate_series(0, {n_tables - 1}) t(t),
       generate_series(0, 63) b(b),
       dims
  WHERE b.b < (SELECT nbits FROM params)
),
{chain}
signs AS MATERIALIZED (
  SELECT t, b, d,
         CAST(CAST(g AS UBIGINT) & 1 AS BIGINT) * 2 - 1 AS sgn
  FROM planes
),
dots AS (
  SELECT q.vec_id, s.t, s.b, sum(q.q * s.sgn) AS dot
  FROM quant q JOIN signs s ON s.d = q.d
  GROUP BY q.vec_id, s.t, s.b
),
bitvals2(b, v) AS (
  SELECT 0, CAST(1 AS BIGINT)
  UNION ALL
  SELECT b + 1, v * 2 FROM bitvals2 WHERE b + 1 < 63
),
buckets AS MATERIALIZED (
  SELECT d.vec_id,
         coalesce(sum(bv.v) FILTER (d.dot > 0), 0)
           + d.t * 4294967296 AS bucket
  FROM dots d JOIN bitvals2 bv ON bv.b = d.b
  GROUP BY d.vec_id, d.t
),
"""


def _lsh_common_ctes(n_tables: int = 16, seed: int = 99,
                     quant_bits: int = 20) -> str:
    """_srp_bucket_ctes + the undirected candidate pair set and exact
    cosine scores (lsh_near_pairs / embedding_dedup_clusters tail)."""
    return _srp_bucket_ctes(n_tables, seed, quant_bits) + """
cand AS MATERIALIZED (
  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
  FROM buckets a JOIN buckets b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
scored AS MATERIALIZED (
  SELECT c.src, c.dst,
         sum((ca.x / na.nrm) * (cb.x / nb.nrm)) AS cos
  FROM cand c
  JOIN comps ca ON ca.vec_id = c.src
  JOIN comps cb ON cb.vec_id = c.dst AND cb.d = ca.d
  JOIN (SELECT vec_id, greatest(sqrt(sum(x * x)), 1e-12) AS nrm
        FROM comps GROUP BY vec_id) na ON na.vec_id = c.src
  JOIN (SELECT vec_id, greatest(sqrt(sum(x * x)), 1e-12) AS nrm
        FROM comps GROUP BY vec_id) nb ON nb.vec_id = c.dst
  GROUP BY c.src, c.dst
),
"""


def lsh_near_pairs_sql(threshold: float = 0.4) -> str:
    """Oracle for pipelines.similarity.lsh_near_pairs: SRP-LSH bucket
    candidates, exact cosine >= threshold, (src, dst, cos r4).

    The bucket bits are exact integer signs (quantized embeddings x
    ±1 planes), so the candidate set is engine-independent; only the
    reported cosine involves floats, rounded to 4 decimals on both
    sides (the bucket_cap=2000 truncation path cannot trigger at
    fixture scale: every bucket is far under the cap)."""
    return (
        "WITH RECURSIVE "
        + _lsh_common_ctes()
        + f"""
fin AS (SELECT 1)
SELECT src, dst, round(cos, 4) AS cos
FROM scored WHERE cos >= {threshold}
"""
    )


def embedding_dedup_clusters_sql(threshold: float = 0.4) -> str:
    """Oracle for pipelines.similarity.embedding_dedup_clusters: the
    LSH pair table filtered at cosine >= threshold feeds recursive
    connected components; every vector labels itself with its
    component's min vec_id."""
    return (
        "WITH RECURSIVE "
        + _lsh_common_ctes()
        + f"""
edges_u AS MATERIALIZED (
  SELECT src AS s, dst AS d FROM scored WHERE cos >= {threshold}
  UNION
  SELECT dst AS s, src AS d FROM scored WHERE cos >= {threshold}
),
walk(id, lbl) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.d, w.lbl FROM walk w JOIN edges_u e ON e.s = w.id
  WHERE w.lbl < e.d
)
SELECT CAST(id AS BIGINT) AS vec_id, CAST(min(lbl) AS BIGINT) AS cluster_id
FROM walk GROUP BY id
"""
    )


def _splitmix_expr_chain(name: str, keycols: str, src: str,
                         final_col: str) -> str:
    """Generic splitmix64 CTE chain over column `c` of `src`,
    emitting `{name}` with `{final_col}`."""
    out = ""
    prev = src
    for i, expr in enumerate(_splitmix_steps()):
        last = i == 5
        cur = name if last else f"{name}_s{i}"
        col = final_col if last else "c"
        out += (
            f"{cur} AS (\n  SELECT {keycols}, {expr} AS {col}"
            f" FROM {prev}\n),\n"
        )
        prev = cur
    return out


def _rerank_metrics_sql(mock: bool, top_n: int = 50, k: int = 10,
                        n_tables: int = 16) -> str:
    """Oracle for pipelines.rerank.retrieve_rerank_metrics /
    mock_rerank_metrics: SRP-LSH directed retrieval (collision-count
    index scores, per-query top-N cut), re-scoring (exact cosine r4,
    or the P10 seeded hash score r6), per-query top-k ranking on the
    ROUNDED score with candidate-id tie-break (deterministic on both
    engines even when rounded scores tie), and the
    Accuracy@{1,3,5,10} / MRR@10 battery.

    n_queries counts queries with >= 1 retrieved candidate, exactly
    as the pipeline's evaluator sees them (queries the index returns
    nothing for never reach the sink)."""
    if mock:
        # P10 seeded hash score (rerank._mock_predictions):
        # s = round(splitmix64(splitmix64(qid ^ 0x5C03E)
        #                      ^ splitmix64(cid ^ 0xCAFE)) / 2^64, 6)
        score_ctes = (
            "mq0 AS (\n  SELECT qid, cid, "
            + _xor64("CAST(qid AS HUGEINT)", str(0x5C03E))
            + " AS c FROM topn\n),\n"
            + _splitmix_expr_chain("mq", "qid, cid", "mq0", "hq")
            + "mc0 AS (\n  SELECT qid, cid, hq, "
            + _xor64("CAST(cid AS HUGEINT)", str(0xCAFE))
            + " AS c FROM mq\n),\n"
            + _splitmix_expr_chain("mc", "qid, cid, hq", "mc0", "hc")
            + "mf0 AS (\n  SELECT qid, cid, "
            + _xor64("hq", "hc")
            + " AS c FROM mc\n),\n"
            + _splitmix_expr_chain("mf", "qid, cid", "mf0", "hfin")
            + """
scores AS MATERIALIZED (
  SELECT qid, cid,
         round(CAST(hfin AS DOUBLE) / 18446744073709551616.0, 6) AS s
  FROM mf
),
"""
        )
    else:
        score_ctes = """
scores AS MATERIALIZED (
  SELECT t.qid, t.cid,
         round(sum((ca.x / na.nrm) * (cb.x / nb.nrm)), 4) AS s
  FROM topn t
  JOIN comps ca ON ca.vec_id = t.qid
  JOIN comps cb ON cb.vec_id = t.cid AND cb.d = ca.d
  JOIN (SELECT vec_id, greatest(sqrt(sum(x * x)), 1e-12) AS nrm
        FROM comps GROUP BY vec_id) na ON na.vec_id = t.qid
  JOIN (SELECT vec_id, greatest(sqrt(sum(x * x)), 1e-12) AS nrm
        FROM comps GROUP BY vec_id) nb ON nb.vec_id = t.cid
  GROUP BY t.qid, t.cid
),
"""
    return (
        "WITH RECURSIVE "
        + _srp_bucket_ctes(n_tables=n_tables)
        + f"""
dpairs AS MATERIALIZED (
  SELECT a.vec_id AS qid, b.vec_id AS cid, count(*) AS cnt
  FROM buckets a JOIN buckets b
    ON a.bucket = b.bucket AND a.vec_id != b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
topn AS MATERIALIZED (
  SELECT qid, cid FROM (
    SELECT qid, cid, row_number() OVER (
      PARTITION BY qid ORDER BY cnt DESC, cid ASC
    ) AS rn FROM dpairs
  ) WHERE rn <= {top_n}
),
"""
        + score_ctes
        + f"""
ranked AS (
  SELECT qid, cid, s, row_number() OVER (
    PARTITION BY qid ORDER BY s DESC, cid ASC
  ) AS pos
  FROM scores
),
cut AS (SELECT qid, cid, pos FROM ranked WHERE pos <= {k}),
lab AS (
  SELECT t.qid, t.pos,
         CASE WHEN lq.label = lc.label THEN 1 ELSE 0 END AS m
  FROM cut t
  JOIN embeddings lq ON lq.vec_id = t.qid
  JOIN embeddings lc ON lc.vec_id = t.cid
),
firsts AS (
  SELECT qid, min(pos) FILTER (m = 1) AS fp
  FROM lab GROUP BY qid
),
agg AS (
  SELECT count(*) AS n,
         sum(CASE WHEN fp <= 1 THEN 1 ELSE 0 END) AS h1,
         sum(CASE WHEN fp <= 3 THEN 1 ELSE 0 END) AS h3,
         sum(CASE WHEN fp <= 5 THEN 1 ELSE 0 END) AS h5,
         sum(CASE WHEN fp <= 10 THEN 1 ELSE 0 END) AS h10,
         sum(CASE WHEN fp IS NOT NULL THEN 1.0 / fp ELSE 0 END) AS rr
  FROM firsts
)
SELECT n AS n_queries,
       round(h1 * 1.0 / n, 4) AS acc1,
       round(h3 * 1.0 / n, 4) AS acc3,
       round(h5 * 1.0 / n, 4) AS acc5,
       round(h10 * 1.0 / n, 4) AS acc10,
       round(rr / n, 4) AS mrr10
FROM agg
"""
    )


def retrieve_rerank_metrics_sql() -> str:
    return _rerank_metrics_sql(mock=False)


def mock_rerank_metrics_sql() -> str:
    return _rerank_metrics_sql(mock=True)


def ann_recall_sql(threshold: float = 0.4, n_queries: int = 64,
                   sample_seed: int = 17) -> str:
    """Oracle for pipelines.similarity.ann_recall: candidate recall of
    the SRP-LSH pair table over the seeded hash-sampled probe set —
    probes are vec_ids with splitmix64(id ^ seed) % (n // n_queries)
    == 0, the exact side is every cosine >= threshold pair touching a
    probe, and recall = |LSH ∩ exact| / |exact| (1.0 when the exact
    set is empty). Deterministic end to end now that the LSH buckets
    are exact integer arithmetic."""
    return (
        "WITH RECURSIVE "
        + _lsh_common_ctes()
        + f"""
smod AS (
  SELECT greatest(1, CAST(n // {n_queries} AS BIGINT)) AS m FROM nvec
),
pr0 AS (
  SELECT vec_id, {_xor64("CAST(vec_id AS HUGEINT)", str(sample_seed))} AS c
  FROM embeddings
),
"""
        + _splitmix_expr_chain("prh", "vec_id", "pr0", "hv")
        + f"""
probes AS MATERIALIZED (
  SELECT vec_id FROM prh
  WHERE CAST(hv AS UBIGINT) % (SELECT m FROM smod) = 0
),
exact AS MATERIALIZED (
  SELECT DISTINCT least(e.vec_id, p.vec_id) AS src,
                  greatest(e.vec_id, p.vec_id) AS dst
  FROM probes p
  JOIN (
    SELECT c2.vec_id AS vec_id, p2.vec_id AS pid,
           sum((c2.x / n2.nrm) * (cp.x / np_.nrm)) AS cos
    FROM probes p2
    JOIN comps cp ON cp.vec_id = p2.vec_id
    JOIN comps c2 ON c2.d = cp.d AND c2.vec_id != p2.vec_id
    JOIN (SELECT vec_id, greatest(sqrt(sum(x * x)), 1e-12) AS nrm
          FROM comps GROUP BY vec_id) n2 ON n2.vec_id = c2.vec_id
    JOIN (SELECT vec_id, greatest(sqrt(sum(x * x)), 1e-12) AS nrm
          FROM comps GROUP BY vec_id) np_ ON np_.vec_id = p2.vec_id
    GROUP BY c2.vec_id, p2.vec_id
  ) e ON e.pid = p.vec_id AND e.cos >= {threshold}
),
lsh_touch AS (
  SELECT s.src, s.dst FROM scored s
  WHERE s.cos >= {threshold}
    AND (s.src IN (SELECT vec_id FROM probes)
         OR s.dst IN (SELECT vec_id FROM probes))
),
hits AS (
  SELECT count(*) AS h FROM exact e
  WHERE EXISTS (SELECT 1 FROM lsh_touch l
                WHERE l.src = e.src AND l.dst = e.dst)
),
counts AS (
  SELECT (SELECT count(*) FROM probes) AS nq,
         (SELECT count(*) FROM exact) AS ne,
         (SELECT h FROM hits) AS nh
)
SELECT nq AS n_queries, ne AS n_exact, nh AS n_hit,
       CASE WHEN ne > 0 THEN round(nh * 1.0 / ne, 4) ELSE 1.0 END
         AS recall
FROM counts
"""
    )
