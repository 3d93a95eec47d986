"""shared DuckDB oracle CTE fragments and builders (split from registry.py, round 7; behavior
identical -- see registry.py for the assembly order)."""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from .q_cdc import *  # noqa: F401,F403


# --- DuckDB oracles --------------------------------------------------------

# shared by events_view_click_range (batch interval join) and
# events_join_stream (its streaming twin -- same result by contract)
_VIEW_CLICK_RANGE_SQL = """
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
)
SELECT v.event_id AS view_event_id, c.event_id AS click_event_id,
       v.user_id, c.ts_ms - v.ts_ms AS gap_ms
FROM ev v JOIN ev c
  ON v.user_id = c.user_id
 AND c.ts_ms >= v.ts_ms AND c.ts_ms < v.ts_ms + 600000
WHERE v.event_type = 'view' AND c.event_type = 'click'"""

# shared by cdc_apply_changes (batch), cdc_snapshot_stream (complete-
# mode streaming), and cdc_snapshot_incremental (foreachBatch
# maintenance) -- three execution strategies, one result by contract
_SNAPSHOT_DIFF_SQL = """
WITH changes AS (
  SELECT user_id,
         CASE event_type WHEN 'click' THEN 'INSERT'
                         WHEN 'view' THEN 'UPDATE'
                         ELSE 'DELETE' END AS op,
         epoch_ms(ts) AS ts_ms, event_id, value, ts
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase') AND user_id IS NOT NULL
),
snap_of AS (
  SELECT user_id, op AS last_op, ts_ms AS last_ts_ms,
         event_id AS last_event_id, round(value, 4) AS last_value, n_changes,
         cutoff
  FROM (
    SELECT c.*, s.cutoff,
           row_number() OVER (PARTITION BY s.cutoff, c.user_id
                              ORDER BY c.ts_ms DESC, c.event_id DESC) AS rn,
           count(*) OVER (PARTITION BY s.cutoff, c.user_id) AS n_changes
    FROM changes c
    JOIN (SELECT TIMESTAMP '2024-01-16' AS cutoff
          UNION ALL SELECT TIMESTAMP '2099-01-01') s
      ON c.ts < s.cutoff
  ) WHERE rn = 1 AND op <> 'DELETE'
),
old_s AS (SELECT * FROM snap_of WHERE cutoff = TIMESTAMP '2024-01-16'),
new_s AS (SELECT * FROM snap_of WHERE cutoff = TIMESTAMP '2099-01-01')
SELECT coalesce(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'INSERT'
            WHEN n.user_id IS NULL THEN 'DELETE'
            ELSE 'UPDATE' END AS change,
       o.last_event_id AS old_last_event_id,
       n.last_event_id AS new_last_event_id,
       o.n_changes AS old_n_changes,
       n.n_changes AS new_n_changes
FROM old_s o
FULL OUTER JOIN new_s n ON o.user_id = n.user_id
WHERE o.user_id IS NULL OR n.user_id IS NULL
   OR (o.last_op, o.last_ts_ms, o.last_event_id, o.last_value, o.n_changes)
      <> (n.last_op, n.last_ts_ms, n.last_event_id, n.last_value, n.n_changes)"""

_APPLY_CHANGES_SQL = """
WITH changes AS (
  SELECT user_id,
         CASE event_type WHEN 'click' THEN 'INSERT'
                         WHEN 'view' THEN 'UPDATE'
                         ELSE 'DELETE' END AS op,
         epoch_ms(ts) AS ts_ms, event_id, value
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase') AND user_id IS NOT NULL
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id ORDER BY ts_ms DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_changes
  FROM changes
)
SELECT user_id, op AS last_op, ts_ms AS last_ts_ms, event_id AS last_event_id,
       round(value, 4) AS last_value, n_changes
FROM ranked WHERE rn = 1 AND op <> 'DELETE'"""

_TOKEN_RE_SQL = r"\S+"
_BPE_RE_SQL = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_EN_RE = r"\b(the|a|and|of|to|in|is)\b"
_FR_RE = r"\b(le|la|et|les|des|un|une)\b"
_DE_RE = r"\b(der|die|und|das|ist|ein|nicht)\b"

_SHINGLE_CTE = rf"""
doc_words AS (
  SELECT doc_id, regexp_extract_all(text, '{_TOKEN_RE_SQL}') AS w FROM documents
),
doc_shingles AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             CASE WHEN len(w) >= 3 THEN generate_series(1, len(w) - 2) ELSE [] END,
             i -> array_to_string(w[i:i+2], ' '))) AS shingle
    FROM doc_words
  )
),
shingle_hashes AS (
  SELECT doc_id, shingle,
         ('0x' || substr(md5(shingle), 1, 12))::BIGINT % {MINHASH_PRIME} AS h
  FROM doc_shingles
)
"""


# twin of similarity.kmeans_assignments (k=8, n_iter=2, stride=37):
# both Lloyd's iterations unrolled; every score / centroid coordinate
# rounded to 1e-6 before comparison, ties to the lowest centroid id.
# Shared by the embedding_kmeans and embedding_semdedup oracles.
_KMEANS_CTE = """ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
c0 AS (
  SELECT vec_id // 37 AS centroid_id, ord, round(v, 6) AS cv
  FROM ex WHERE vec_id % 37 = 0 AND vec_id < 37 * 8
),
cn0 AS (SELECT centroid_id, sum(cv * cv) AS n2 FROM c0 GROUP BY 1),
s0 AS (
  SELECT e.vec_id, c.centroid_id,
         round(sum(e.v * c.cv) - 0.5 * any_value(cn.n2), 6) AS score
  FROM ex e JOIN c0 c ON e.ord = c.ord
  JOIN cn0 cn ON cn.centroid_id = c.centroid_id
  GROUP BY 1, 2
),
a0 AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
    FROM s0) WHERE rn = 1
),
c1 AS (
  SELECT a.centroid_id, e.ord, round(avg(e.v), 6) AS cv
  FROM ex e JOIN a0 a ON a.vec_id = e.vec_id
  GROUP BY 1, 2
),
cn1 AS (SELECT centroid_id, sum(cv * cv) AS n2 FROM c1 GROUP BY 1),
s1 AS (
  SELECT e.vec_id, c.centroid_id,
         round(sum(e.v * c.cv) - 0.5 * any_value(cn.n2), 6) AS score
  FROM ex e JOIN c1 c ON e.ord = c.ord
  JOIN cn1 cn ON cn.centroid_id = c.centroid_id
  GROUP BY 1, 2
),
a1 AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
    FROM s1) WHERE rn = 1
)"""


def _pq_kmeans_cte(p: str, lo: int, hi: int, k: int = 8, stride: int = 37) -> str:
    """One subspace's unrolled 2-iteration k-means chain (the
    _KMEANS_CTE recipe verbatim, prefixed and re-based onto the ord
    slice [lo, hi]) -- twin of similarity.pq_codes' per-subspace
    kmeans_assignments call."""
    return f"""{p}ex AS (
  SELECT vec_id, ord - {lo - 1} AS ord, v FROM ex WHERE ord BETWEEN {lo} AND {hi}
),
{p}c0 AS (
  SELECT vec_id // {stride} AS centroid_id, ord, round(v, 6) AS cv
  FROM {p}ex WHERE vec_id % {stride} = 0 AND vec_id < {stride} * {k}
),
{p}cn0 AS (SELECT centroid_id, sum(cv * cv) AS n2 FROM {p}c0 GROUP BY 1),
{p}s0 AS (
  SELECT e.vec_id, c.centroid_id,
         round(sum(e.v * c.cv) - 0.5 * any_value(cn.n2), 6) AS score
  FROM {p}ex e JOIN {p}c0 c ON e.ord = c.ord
  JOIN {p}cn0 cn ON cn.centroid_id = c.centroid_id
  GROUP BY 1, 2
),
{p}a0 AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
    FROM {p}s0) WHERE rn = 1
),
{p}c1 AS (
  SELECT a.centroid_id, e.ord, round(avg(e.v), 6) AS cv
  FROM {p}ex e JOIN {p}a0 a ON a.vec_id = e.vec_id
  GROUP BY 1, 2
),
{p}cn1 AS (SELECT centroid_id, sum(cv * cv) AS n2 FROM {p}c1 GROUP BY 1),
{p}s1 AS (
  SELECT e.vec_id, c.centroid_id,
         round(sum(e.v * c.cv) - 0.5 * any_value(cn.n2), 6) AS score
  FROM {p}ex e JOIN {p}c1 c ON e.ord = c.ord
  JOIN {p}cn1 cn ON cn.centroid_id = c.centroid_id
  GROUP BY 1, 2
),
{p}a1 AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
    FROM {p}s1) WHERE rn = 1
)"""


def _pq_codes_sql(m: int = 4, sub: int = 16) -> str:
    ctes = ",\n".join(
        _pq_kmeans_cte(f"p{s}", s * sub + 1, (s + 1) * sub) for s in range(m)
    )
    sel = "\nUNION ALL\n".join(
        f"SELECT vec_id, {s} AS subspace, centroid_id AS code FROM p{s}a1"
        for s in range(m)
    )
    return f"""WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
{ctes}
{sel}"""


def _pq_adc_sql(m: int = 4, sub: int = 16, n_queries: int = 32, topk: int = 5) -> str:
    """Twin of similarity.pq_adc_topk: per-subspace codebooks (the c1
    frames the codes index) joined to the code table and the sliced
    query vectors; one grouped sum per (query, vector), rounded, then
    rank<=topk with the vec_id tie-break."""
    ctes = ",\n".join(
        _pq_kmeans_cte(f"p{s}", s * sub + 1, (s + 1) * sub) for s in range(m)
    )
    codes = "\nUNION ALL\n".join(
        f"SELECT vec_id, {s} AS subspace, centroid_id AS code FROM p{s}a1"
        for s in range(m)
    )
    cents = "\nUNION ALL\n".join(
        f"SELECT {s} AS subspace, centroid_id AS code, ord, cv FROM p{s}c1"
        for s in range(m)
    )
    return f"""WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
{ctes},
codes AS ({codes}),
cents AS ({cents}),
q AS (
  SELECT vec_id AS query_id, (ord - 1) // {sub} AS subspace,
         (ord - 1) % {sub} + 1 AS ord, v AS qv
  FROM ex WHERE vec_id < {n_queries}
),
scores AS (
  SELECT q.query_id, k.vec_id, round(sum(q.qv * c.cv), 6) AS score
  FROM codes k
  JOIN cents c ON c.subspace = k.subspace AND c.code = k.code
  JOIN q ON q.subspace = k.subspace AND q.ord = c.ord
  WHERE k.vec_id <> q.query_id
  GROUP BY 1, 2
)
SELECT query_id, vec_id AS neighbor_id, score, rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM scores
) WHERE rank <= {topk}"""


def _ivf_pq_sql(
    m: int = 4,
    sub: int = 16,
    n_queries: int = 32,
    topk: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    stride: int = 37,
) -> str:
    """Twin of similarity.ivf_pq_topk: the ann_cosine_topk_ivf routing
    CTEs (assignment + probes + cand) feeding the _pq_adc_sql scorer,
    restricted to the candidate pairs -- the two verified halves
    composed exactly like the Spark plan."""
    ctes = ",\n".join(
        _pq_kmeans_cte(f"p{s}", s * sub + 1, (s + 1) * sub) for s in range(m)
    )
    codes = "\nUNION ALL\n".join(
        f"SELECT vec_id, {s} AS subspace, centroid_id AS code FROM p{s}a1"
        for s in range(m)
    )
    cents = "\nUNION ALL\n".join(
        f"SELECT {s} AS subspace, centroid_id AS code, ord, cv FROM p{s}c1"
        for s in range(m)
    )
    return f"""WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS norm FROM ex GROUP BY vec_id),
cdots AS (
  SELECT e.vec_id AS vec_id, ce.vec_id AS centroid_id, sum(e.v * ce.v) AS dot
  FROM ex e JOIN ex ce ON e.ord = ce.ord
  WHERE ce.vec_id % {stride} = 0 AND ce.vec_id < {stride} * {n_centroids}
  GROUP BY 1, 2
),
ccos AS (
  SELECT c.vec_id, c.centroid_id,
         round(c.dot / (nv.norm * nc.norm), 6) AS c_cos
  FROM cdots c
  JOIN norms nv ON nv.vec_id = c.vec_id
  JOIN norms nc ON nc.vec_id = c.centroid_id
),
assignment AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY c_cos DESC, centroid_id) AS rn
    FROM ccos) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, centroid_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY c_cos DESC, centroid_id) AS rn
    FROM ccos WHERE vec_id < {n_queries}) WHERE rn <= {n_probe}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assignment a ON a.centroid_id = p.centroid_id
  WHERE a.vec_id <> p.query_id
),
{ctes},
codes AS ({codes}),
cents AS ({cents}),
q AS (
  SELECT vec_id AS query_id, (ord - 1) // {sub} AS subspace,
         (ord - 1) % {sub} + 1 AS ord, v AS qv
  FROM ex WHERE vec_id < {n_queries}
),
scores AS (
  SELECT cd.query_id, k.vec_id, round(sum(q.qv * c.cv), 6) AS score
  FROM cand cd
  JOIN codes k ON k.vec_id = cd.neighbor_id
  JOIN cents c ON c.subspace = k.subspace AND c.code = k.code
  JOIN q ON q.query_id = cd.query_id AND q.subspace = k.subspace
        AND q.ord = c.ord
  GROUP BY 1, 2
)
SELECT query_id, vec_id AS neighbor_id, score, rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM scores
) WHERE rank <= {topk}"""


def _ivf_probe_curve_sql(
    probes=(1, 2, 4, 8),
    n_queries: int = 32,
    k: int = 5,
    n_centroids: int = 16,
    stride: int = 37,
) -> str:
    """Twin of similarity.ivf_probe_curve: one shared IVF index
    (assignment + ranked probes), one per-probe re-rank segment, hits
    against the brute-force truth, recall over the fixed n_queries*k
    denominator."""
    segs = []
    unions = []
    for p in probes:
        segs.append(f"""cand{p} AS (
  SELECT pr.query_id, a.vec_id AS neighbor_id
  FROM (SELECT query_id, centroid_id FROM ranked_probes
        WHERE rn <= {p}) pr
  JOIN assignment a ON a.centroid_id = pr.centroid_id
  WHERE a.vec_id <> pr.query_id
),
dots{p} AS (
  SELECT c.query_id, c.neighbor_id, sum(q.v * e.v) AS dot
  FROM cand{p} c
  JOIN ex q ON q.vec_id = c.query_id
  JOIN ex e ON e.vec_id = c.neighbor_id AND e.ord = q.ord
  GROUP BY 1, 2
),
topk{p} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, row_number() OVER (
        PARTITION BY query_id
        ORDER BY round(dot / (nq.norm * ne.norm), 6) DESC, neighbor_id)
      AS rank
    FROM dots{p}
    JOIN norms nq ON nq.vec_id = query_id
    JOIN norms ne ON ne.vec_id = neighbor_id
  ) WHERE rank <= {k}
)""")
        unions.append(
            f"SELECT {p} AS n_probe, query_id, neighbor_id FROM topk{p}"
        )
    seg_sql = ",\n".join(segs)
    union_sql = "\nUNION ALL\n".join(unions)
    return f"""WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS norm FROM ex GROUP BY vec_id),
cdots AS (
  SELECT e.vec_id AS vec_id, ce.vec_id AS centroid_id, sum(e.v * ce.v) AS dot
  FROM ex e JOIN ex ce ON e.ord = ce.ord
  WHERE ce.vec_id % {stride} = 0 AND ce.vec_id < {stride} * {n_centroids}
  GROUP BY 1, 2
),
ccos AS (
  SELECT c.vec_id, c.centroid_id,
         round(c.dot / (nv.norm * nc.norm), 6) AS c_cos
  FROM cdots c
  JOIN norms nv ON nv.vec_id = c.vec_id
  JOIN norms nc ON nc.vec_id = c.centroid_id
),
assignment AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY c_cos DESC, centroid_id) AS rn
    FROM ccos) WHERE rn = 1
),
ranked_probes AS (
  SELECT vec_id AS query_id, centroid_id, row_number() OVER (
      PARTITION BY vec_id ORDER BY c_cos DESC, centroid_id) AS rn
  FROM ccos WHERE vec_id < {n_queries}
),
tdots AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, sum(q.v * e.v) AS dot
  FROM (SELECT * FROM ex WHERE vec_id < {n_queries}) q
  JOIN ex e ON q.ord = e.ord AND e.vec_id <> q.vec_id
  GROUP BY 1, 2
),
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, row_number() OVER (
        PARTITION BY query_id
        ORDER BY round(dot / (nq.norm * ne.norm), 6) DESC, neighbor_id)
      AS rank
    FROM tdots
    JOIN norms nq ON nq.vec_id = query_id
    JOIN norms ne ON ne.vec_id = neighbor_id
  ) WHERE rank <= {k}
),
{seg_sql},
returned AS ({union_sql})
SELECT r.n_probe, count(*) AS n_returned,
       CAST(coalesce(sum(CASE WHEN t.query_id IS NOT NULL
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS total_hits,
       round(coalesce(sum(CASE WHEN t.query_id IS NOT NULL
                               THEN 1 ELSE 0 END), 0)
             / {n_queries * k}, 6) AS recall
FROM returned r
LEFT JOIN truth t
  ON t.query_id = r.query_id AND t.neighbor_id = r.neighbor_id
GROUP BY r.n_probe"""


def _minhash_aggs() -> str:
    return ",\n    ".join(
        f"min(({a} * h + {b}) % {MINHASH_PRIME}) AS min_{i}"
        for i, (a, b) in enumerate(minhash_params())
    )


def _minhash_sig_sql() -> str:
    return (
        f"WITH {_SHINGLE_CTE}\n"
        f"SELECT doc_id,\n    {_minhash_aggs()}\nFROM shingle_hashes GROUP BY doc_id"
    )


def _lsh_band_union() -> str:
    band_joins = []
    for b in range(4):
        cols = [f"min_{b * 4 + r}" for r in range(4)]
        lkey = " || '_' || ".join(f"CAST(l.{c} AS VARCHAR)" for c in cols)
        rkey = " || '_' || ".join(f"CAST(r.{c} AS VARCHAR)" for c in cols)
        band_joins.append(
            f"SELECT l.doc_id AS doc_a, r.doc_id AS doc_b\n"
            f"FROM sig l JOIN sig r ON ({lkey}) = ({rkey})\n"
            f"WHERE l.doc_id < r.doc_id"
        )
    return "\nUNION ALL\n".join(band_joins)


def _lsh_pairs_sql() -> str:
    return (
        f"WITH {_SHINGLE_CTE},\n"
        f"sig AS (SELECT doc_id,\n    {_minhash_aggs()}\nFROM shingle_hashes GROUP BY doc_id)\n"
        f"SELECT DISTINCT doc_a, doc_b FROM (\n{_lsh_band_union()}\n)"
    )


def _fuzzy_contamination_sql() -> str:
    """Twin of dedup.fuzzy_contamination_pairs (benchmark_max_id=10,
    4x4 banding): corpus-x-benchmark band join, exact shingle Jaccard
    per candidate."""
    band_joins = []
    for b in range(4):
        cols = [f"min_{b * 4 + r}" for r in range(4)]
        lkey = " || '_' || ".join(f"CAST(l.{c} AS VARCHAR)" for c in cols)
        rkey = " || '_' || ".join(f"CAST(r.{c} AS VARCHAR)" for c in cols)
        band_joins.append(
            f"SELECT l.doc_id AS doc_id, r.doc_id AS bench_id\n"
            f"FROM sig l JOIN sig r ON ({lkey}) = ({rkey})\n"
            f"WHERE l.doc_id >= 10 AND r.doc_id < 10"
        )
    cand_union = "\nUNION ALL\n".join(band_joins)
    return (
        f"WITH {_SHINGLE_CTE},\n"
        f"sig AS (SELECT doc_id,\n    {_minhash_aggs()}\nFROM shingle_hashes GROUP BY doc_id),\n"
        f"cand AS (SELECT DISTINCT doc_id, bench_id FROM (\n{cand_union}\n)),\n"
        "inter AS (\n"
        "  SELECT s.doc_id, b.doc_id AS bench_id, count(*) AS n_intersect\n"
        "  FROM shingle_hashes s JOIN shingle_hashes b\n"
        "    ON s.h = b.h AND s.doc_id >= 10 AND b.doc_id < 10\n"
        "  GROUP BY s.doc_id, b.doc_id\n"
        "),\n"
        "sizes AS (SELECT doc_id, count(*) AS n FROM shingle_hashes GROUP BY doc_id)\n"
        "SELECT c.doc_id, c.bench_id,\n"
        "       CAST(coalesce(i.n_intersect, 0) AS BIGINT) AS n_intersect,\n"
        "       CAST(sd.n + sb.n - coalesce(i.n_intersect, 0) AS BIGINT) AS n_union,\n"
        "       coalesce(i.n_intersect, 0) / (sd.n + sb.n - coalesce(i.n_intersect, 0)) AS jaccard\n"
        "FROM cand c\n"
        "LEFT JOIN inter i ON i.doc_id = c.doc_id AND i.bench_id = c.bench_id\n"
        "JOIN sizes sd ON sd.doc_id = c.doc_id\n"
        "JOIN sizes sb ON sb.doc_id = c.bench_id"
    )


def _incremental_dedup_sql() -> str:
    """Twin of dedup.incremental_dedup_matches (new = doc_id % 10 = 0,
    4x4 banding, threshold 0.5): history-x-new band join, exact
    Jaccard, per-new-doc best match, every new doc reported."""
    band_joins = []
    for b in range(4):
        cols = [f"min_{b * 4 + r}" for r in range(4)]
        lkey = " || '_' || ".join(f"CAST(l.{c} AS VARCHAR)" for c in cols)
        rkey = " || '_' || ".join(f"CAST(r.{c} AS VARCHAR)" for c in cols)
        band_joins.append(
            f"SELECT l.doc_id AS hist_id, r.doc_id AS new_id\n"
            f"FROM sig l JOIN sig r ON ({lkey}) = ({rkey})\n"
            f"WHERE l.doc_id % 10 <> 0 AND r.doc_id % 10 = 0"
        )
    cand_union = "\nUNION ALL\n".join(band_joins)
    return (
        f"WITH {_SHINGLE_CTE},\n"
        f"sig AS (SELECT doc_id,\n    {_minhash_aggs()}\nFROM shingle_hashes GROUP BY doc_id),\n"
        f"cand AS (SELECT DISTINCT hist_id, new_id FROM (\n{cand_union}\n)),\n"
        "inter AS (\n"
        "  SELECT s.doc_id AS hist_id, b.doc_id AS new_id, count(*) AS n_intersect\n"
        "  FROM shingle_hashes s JOIN shingle_hashes b\n"
        "    ON s.h = b.h AND s.doc_id % 10 <> 0 AND b.doc_id % 10 = 0\n"
        "  GROUP BY 1, 2\n"
        "),\n"
        "sizes AS (SELECT doc_id, count(*) AS n FROM shingle_hashes GROUP BY doc_id),\n"
        "pairs AS (\n"
        "  SELECT c.new_id, c.hist_id,\n"
        "         CAST(coalesce(i.n_intersect, 0) AS BIGINT) AS n_intersect,\n"
        "         CAST(sh.n + sn.n - coalesce(i.n_intersect, 0) AS BIGINT) AS n_union,\n"
        "         coalesce(i.n_intersect, 0) / (sh.n + sn.n - coalesce(i.n_intersect, 0)) AS jaccard\n"
        "  FROM cand c\n"
        "  LEFT JOIN inter i ON i.hist_id = c.hist_id AND i.new_id = c.new_id\n"
        "  JOIN sizes sh ON sh.doc_id = c.hist_id\n"
        "  JOIN sizes sn ON sn.doc_id = c.new_id\n"
        "),\n"
        "best AS (\n"
        "  SELECT new_id, hist_id AS best_match_id, n_intersect, n_union, jaccard FROM (\n"
        "    SELECT *, row_number() OVER (\n"
        "        PARTITION BY new_id ORDER BY jaccard DESC, hist_id) AS rn\n"
        "    FROM pairs) WHERE rn = 1\n"
        ")\n"
        "SELECT d.doc_id, b.best_match_id,\n"
        "       CAST(coalesce(b.n_intersect, 0) AS BIGINT) AS n_intersect,\n"
        "       CAST(coalesce(b.n_union, 0) AS BIGINT) AS n_union,\n"
        "       coalesce(b.jaccard, 0.0) AS jaccard,\n"
        "       coalesce(b.jaccard, 0.0) >= 0.5 AS is_duplicate\n"
        "FROM documents d LEFT JOIN best b ON b.new_id = d.doc_id\n"
        "WHERE d.doc_id % 10 = 0"
    )


def _corpus_curation_sql() -> str:
    """Twin of registry._q_corpus_curation: repetition filter +
    non-canonical-dup drop + contamination drop, composed from the same
    CTE pieces the individual oracles use."""
    return (
        f"WITH RECURSIVE {_SHINGLE_CTE},\n"
        f"sig AS (SELECT doc_id,\n    {_minhash_aggs()}\nFROM shingle_hashes GROUP BY doc_id),\n"
        f"pairs AS (SELECT DISTINCT doc_a, doc_b FROM (\n{_lsh_band_union()}\n)),\n"
        "sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs\n"
        "        UNION ALL SELECT doc_b, doc_a FROM pairs),\n"
        "walk(node, reach) AS (\n"
        "  SELECT src, dst FROM sym\n"
        "  UNION\n"
        "  SELECT w.node, s.dst FROM walk w JOIN sym s ON s.src = w.reach\n"
        "),\n"
        "losers AS (\n"
        "  SELECT node AS doc_id FROM walk GROUP BY node\n"
        "  HAVING least(node, min(reach)) <> node\n"
        "),\n"
        "rep AS (\n"
        "  SELECT doc_id,\n"
        "         CASE WHEN len(grams) > 0\n"
        "              THEN (len(grams) - len(list_distinct(grams))) / len(grams)\n"
        "              ELSE 0.0 END AS ratio\n"
        "  FROM (SELECT doc_id, CASE WHEN len(w) >= 3 THEN list_transform(\n"
        "          generate_series(1, len(w) - 2), i -> array_to_string(w[i:i+2], ' '))\n"
        "        ELSE [] END AS grams FROM doc_words)\n"
        "),\n"
        "bench AS (SELECT DISTINCT shingle FROM doc_shingles WHERE doc_id < 10),\n"
        "contam AS (\n"
        "  SELECT s.doc_id FROM doc_shingles s LEFT JOIN bench b ON s.shingle = b.shingle\n"
        "  WHERE s.doc_id >= 10\n"
        "  GROUP BY s.doc_id\n"
        "  HAVING sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) / count(*) > 1.0/3.0\n"
        "),\n"
        "survivors AS (\n"
        "  SELECT d.lang, d.n_chars FROM documents d\n"
        "  JOIN rep ON rep.doc_id = d.doc_id AND rep.ratio <= 0.2\n"
        "  ANTI JOIN losers l ON d.doc_id = l.doc_id\n"
        "  ANTI JOIN contam c ON d.doc_id = c.doc_id\n"
        ")\n"
        "SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars\n"
        "FROM survivors GROUP BY lang"
    )


def _dedup_clusters_sql() -> str:
    """Twin of dedup.dedup_clusters: same LSH edge set, components via
    a recursive reachability walk (fixpoint-deduped UNION), label =
    least node id reachable."""
    return (
        f"WITH RECURSIVE {_SHINGLE_CTE},\n"
        f"sig AS (SELECT doc_id,\n    {_minhash_aggs()}\nFROM shingle_hashes GROUP BY doc_id),\n"
        f"pairs AS (SELECT DISTINCT doc_a, doc_b FROM (\n{_lsh_band_union()}\n)),\n"
        "sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs\n"
        "        UNION ALL SELECT doc_b, doc_a FROM pairs),\n"
        "walk(node, reach) AS (\n"
        "  SELECT src, dst FROM sym\n"
        "  UNION\n"
        "  SELECT w.node, s.dst FROM walk w JOIN sym s ON s.src = w.reach\n"
        ")\n"
        "SELECT node AS doc_id, least(node, min(reach)) AS cluster_id\n"
        "FROM walk GROUP BY node"
    )


def _simhash_ctes() -> str:
    """Shared CTEs computing per-doc SimHash fingerprints (DuckDB mirror
    of dedup.simhash_fingerprints, same portable md5-48bit word hash)."""
    sums = ",\n    ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    pack = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return rf"""wh AS (
  SELECT doc_id, ('0x' || substr(md5(w), 1, 12))::BIGINT AS h
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS w FROM documents)
),
sums AS (SELECT doc_id, {sums} FROM wh GROUP BY doc_id),
fps AS (SELECT doc_id, {pack} AS simhash FROM sums)"""


def _simhash_fp_sql() -> str:
    return f"WITH {_simhash_ctes()}\nSELECT doc_id, simhash FROM fps"


def _simhash_pairs_sql(max_hamming: int = 3, bands: int | None = None) -> str:
    # mirror of dedup.simhash_near_pairs: bands = max_hamming + 1 by
    # default so the pigeonhole recall guarantee holds
    if bands is None:
        bands = max_hamming + 1
    joins = "\nUNION ALL\n".join(
        f"SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, l.simhash AS sim_a, r.simhash AS sim_b\n"
        f"FROM fps l JOIN fps r ON ((l.simhash >> {off}) & {(1 << width) - 1}) = ((r.simhash >> {off}) & {(1 << width) - 1})\n"
        f"WHERE l.doc_id < r.doc_id"
        for off, width in simhash_band_slices(SIMHASH_BITS, bands)
    )
    return f"""WITH {_simhash_ctes()}
SELECT DISTINCT doc_a, doc_b, bit_count(xor(sim_a, sim_b)) AS hamming
FROM (
{joins}
)
WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}"""


def _hyperplane_bucket_sql(n_planes: int = 8, table: int = 0) -> str:
    """DuckDB mirror of similarity.hyperplane_bucket over unnested
    embeddings (dimension index `ord` is 1-based, Spark's is 0-based).
    ``table`` selects the same disjoint plane-family slice the Spark
    side uses for LSH OR-construction."""
    def lit_list(p: int) -> str:
        # same literal weights as the Spark plan (similarity.plane_signs)
        return "[" + ",".join(str(s) for s in plane_signs(p)) + "]::DOUBLE[]"

    bits = " || ".join(
        f"(CASE WHEN sum(v * ({lit_list(p)})[ord]) >= 0 THEN '1' ELSE '0' END)"
        for p in range(table * n_planes, (table + 1) * n_planes)
    )
    return f"SELECT vec_id, {bits} AS bucket FROM ex GROUP BY vec_id"


def _hyperplane_candidates_sql(n_planes: int = 4, n_tables: int = 2) -> str:
    """DuckDB mirror of similarity.hyperplane_candidates: DIRECTED
    distinct same-bucket pairs, OR-construction across ``n_tables``
    disjoint plane families.  Expects an ``ex`` CTE in scope
    (vec_id, ord, v unnested embeddings)."""
    unions = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, bucket FROM "
        f"({_hyperplane_bucket_sql(n_planes, table=t)})"
        for t in range(n_tables)
    )
    return (
        f"WITH tb AS ({unions}) "
        "SELECT DISTINCT l.vec_id AS a_id, r.vec_id AS b_id "
        "FROM tb l JOIN tb r ON l.t = r.t AND l.bucket = r.bucket "
        "AND l.vec_id <> r.vec_id"
    )


def _bpe_train_sql(n_merges: int = 8, output: str = "merges") -> str:
    """DuckDB mirror of textstats.bpe_train, the iterated BPE trainer,
    as ``n_merges`` mechanically-unrolled CTE blocks (the pagerank
    oracle discipline: fixed iteration count, integer counts, exact
    tie-breaks).  The greedy left-to-right merge application is the
    window-parity form: within each run of CONSECUTIVE eligible
    positions (only possible when left==right), keep the odd ranks --
    provably the same picks as the Spark side's array fold -- then drop
    every position consumed by the merge on its left and re-number.
    ``output='merges'`` emits the merges table (bpe_train);
    ``output='encode'`` emits the per-word token-count report off the
    final symbols frame (bpe_encode_report)."""
    from ..operators.textstats import TOKEN_RE

    ctes = [
        f"""w AS MATERIALIZED (
  SELECT word, count(*) AS n FROM (
    SELECT unnest(regexp_extract_all(text, '{TOKEN_RE}')) AS word
    FROM documents
  ) GROUP BY word
)""",
        """s0 AS MATERIALIZED (
  SELECT word, n, pos, substring(word, pos, 1) AS sym FROM (
    SELECT word, n, unnest(generate_series(1, length(word))) AS pos
    FROM w
  )
)""",
    ]
    for i in range(1, n_merges + 1):
        p = f"s{i - 1}"
        ctes.append(f"""b{i} AS MATERIALIZED (
  SELECT a.sym AS l, b.sym AS r, sum(a.n) AS c
  FROM {p} a JOIN {p} b ON b.word = a.word AND b.pos = a.pos + 1
  GROUP BY 1, 2 ORDER BY c DESC, l, r LIMIT 1
)""")
        ctes.append(f"""e{i} AS MATERIALIZED (
  SELECT a.word, a.n, a.pos, a.sym, b.sym AS next_sym,
         CASE WHEN a.sym = bb.l AND b.sym = bb.r THEN 1 ELSE 0 END AS elig
  FROM {p} a
  LEFT JOIN {p} b ON b.word = a.word AND b.pos = a.pos + 1
  CROSS JOIN b{i} bb
)""")
        ctes.append(f"""m{i} AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos, elig,
           row_number() OVER (
             PARTITION BY word, elig, grp ORDER BY pos) AS rk
    FROM (
      SELECT *, pos - row_number() OVER (
          PARTITION BY word, elig ORDER BY pos) AS grp
      FROM e{i}
    )
  ) WHERE elig = 1 AND rk % 2 = 1
)""")
        ctes.append(f"""s{i} AS MATERIALIZED (
  SELECT word, n,
         CAST(row_number() OVER (PARTITION BY word ORDER BY pos)
              AS BIGINT) AS pos,
         CASE WHEN merged THEN sym || next_sym ELSE sym END AS sym
  FROM (
    SELECT e.word, e.n, e.pos, e.sym, e.next_sym,
           (m.pos IS NOT NULL) AS merged
    FROM e{i} e
    LEFT JOIN m{i} m ON m.word = e.word AND m.pos = e.pos
    LEFT JOIN m{i} prev ON prev.word = e.word AND prev.pos = e.pos - 1
    WHERE prev.pos IS NULL
  )
)""")
    if output == "encode":
        finals = f"""SELECT word, max(n) AS n_occurrences,
       CAST(length(word) AS BIGINT) AS n_chars,
       count(*) AS n_tokens
FROM s{n_merges} GROUP BY word"""
    else:
        finals = "\nUNION ALL\n".join(
            f"SELECT {i} AS merge_rank, l AS left_sym, r AS right_sym, "
            f"CAST(c AS BIGINT) AS pair_count FROM b{i}"
            for i in range(1, n_merges + 1)
        )
    return "WITH " + ",\n".join(ctes) + "\n" + finals


def _redact_pii_sql() -> str:
    """DuckDB twin of redact_pii over _inject_pii: the injection CASEs
    are stated verbatim, then each pattern counts-then-replaces on the
    running text exactly as the operator does (DuckDB regexp_replace
    needs the explicit 'g' flag; Spark's is global by default)."""
    from ..operators.textstats import EMAIL_RE, IPV4_RE, PHONE_RE, SSN_ISH_RE

    return rf"""
WITH pii AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0 THEN ' user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 4 = 0 THEN ' 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' +1 555 0' || CAST(100 + doc_id % 900 AS VARCHAR) || ' 99' ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN ' 123-45-' || CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END
         AS text
  FROM documents
),
s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_email,
         regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS text
  FROM pii
),
s2 AS (
  SELECT doc_id, n_email,
         CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT) AS n_ipv4,
         regexp_replace(text, '{IPV4_RE}', '<IP>', 'g') AS text
  FROM s1
),
s3 AS (
  SELECT doc_id, n_email, n_ipv4,
         CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phone,
         regexp_replace(text, '{PHONE_RE}', '<PHONE>', 'g') AS text
  FROM s2
),
s4 AS (
  SELECT doc_id, n_email, n_ipv4, n_phone,
         CAST(len(regexp_extract_all(text, '{SSN_ISH_RE}')) AS BIGINT) AS n_id,
         regexp_replace(text, '{SSN_ISH_RE}', '<ID>', 'g') AS text
  FROM s3
)
SELECT doc_id, n_email, n_ipv4, n_phone, n_id,
       n_email + n_ipv4 + n_phone + n_id AS n_pii,
       text AS text_redacted
FROM s4"""


# --- typed-fixture oracle scaffolding --------------------------------------
# DuckDB expressions mirroring fixtures._typed_value_cols verbatim (the
# canonical strings the binary decoder renders).  Kept as a dict so the
# parse oracle's projection and the diff oracle's 11 unpivot branches
# are generated from ONE source of truth.
_TYPED_VALUE_SQL = {
    "t_id": "CAST(eid % 1000000 AS VARCHAR)",
    "t_date": "strftime(ts, '%Y-%m-%d')",
    "t_year": "strftime(ts, '%Y')",
    "t_dt": "strftime(ts, '%Y-%m-%d %H:%M:%S.%g')",
    "t_ts": "strftime(ts, '%Y-%m-%d %H:%M:%S')",
    "t_time": (
        "(CASE WHEN eid % 5 = 0 THEN '-' ELSE '' END)"
        " || lpad(CAST(1 + eid % 99 AS VARCHAR), 2, '0')"
        " || ':' || lpad(CAST(eid % 60 AS VARCHAR), 2, '0')"
        " || ':' || lpad(CAST((eid * 7) % 60 AS VARCHAR), 2, '0')"
    ),
    "t_dec": (
        "(CASE WHEN eid % 3 = 0 THEN '-' ELSE '' END)"
        " || CAST((1 + (eid * 37) % 9999999) // 100 AS VARCHAR)"
        " || '.' || lpad(CAST((1 + (eid * 37) % 9999999) % 100 AS VARCHAR), 2, '0')"
    ),
    "t_text": (
        "CASE WHEN eid % 43 = 6 THEN NULL"
        " ELSE 'text-' || CAST(eid AS VARCHAR) END"
    ),
    "t_char": "'c' || CAST(eid % 100 AS VARCHAR)",
    "t_enum": "CAST(1 + eid % 3 AS VARCHAR)",
    "t_set": "CAST(eid % 8 AS VARCHAR)",
    "t_json": (
        "'{\"k\":' || CAST(eid % 50 AS VARCHAR)"
        " || ',\"s\":\"v-' || CAST(eid % 7 AS VARCHAR) || '\"}'"
    ),
    "t_u8": "CAST(128 + eid % 128 AS VARCHAR)",
    "t_u64": "CAST(9223372036854775808::HUGEINT + eid AS VARCHAR)",
    "t_geo": (
        "'SRID=4326;POINT(' || CAST(eid % 100 AS VARCHAR)"
        " || '.5 ' || CAST(eid % 50 AS VARCHAR) || '.25)'"
    ),
}

_TYPED_DML_CTE = """dml AS (
  SELECT event_id AS eid, ts,
    100 * (event_id // 4) + 4 AS log_position,
    'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0') AS binlog_file
  FROM events
  WHERE event_type IN ('click','view','purchase') AND event_id % 223 <> 0
)"""

_TYPED_PARSE_ORACLE = (
    "WITH "
    + _TYPED_DML_CTE
    + """
SELECT binlog_file,
       row_number() OVER (PARTITION BY binlog_file ORDER BY eid) AS event_no,
       log_position,
    """
    + ",\n    ".join(f"{e} AS {n}" for n, e in _TYPED_VALUE_SQL.items())
    + "\nFROM dml"
)

# avro-side overrides (fixtures.derive_typed_avro_payload): wrong t_dec
# on %31=2 (cents+1), NULL t_dt on %47=7, t_text always present; %13
# rows absent entirely
_TYPED_AVRO_SQL = dict(_TYPED_VALUE_SQL)
_TYPED_AVRO_SQL["t_dec"] = (
    "CASE WHEN eid % 31 = 2 THEN"
    " (CASE WHEN eid % 3 = 0 THEN '-' ELSE '' END)"
    " || CAST((2 + (eid * 37) % 9999999) // 100 AS VARCHAR)"
    " || '.' || lpad(CAST((2 + (eid * 37) % 9999999) % 100 AS VARCHAR), 2, '0')"
    " ELSE " + _TYPED_VALUE_SQL["t_dec"] + " END"
)
_TYPED_AVRO_SQL["t_dt"] = (
    "CASE WHEN eid % 47 = 7 THEN NULL ELSE "
    + _TYPED_VALUE_SQL["t_dt"] + " END"
)
_TYPED_AVRO_SQL["t_text"] = "'text-' || CAST(eid AS VARCHAR)"

_TYPED_DIFF_ORACLE = (
    "WITH "
    + _TYPED_DML_CTE
    + ", bl AS (\n  SELECT binlog_file, log_position AS binlog_position,\n    "
    + ",\n    ".join(f"{e} AS {n}" for n, e in _TYPED_VALUE_SQL.items())
    + "\n  FROM dml\n), av AS (\n"
    + "  SELECT binlog_file, log_position AS binlog_position,\n    "
    + ",\n    ".join(f"{e} AS {n}" for n, e in _TYPED_AVRO_SQL.items())
    + "\n  FROM dml WHERE eid % 13 <> 0\n), unp AS (\n"
    + "\n  UNION ALL\n".join(
        f"""  SELECT b.binlog_file, b.binlog_position, '{n}' AS "column",
         b.{n} AS binlog_value, a.{n} AS avro_value
  FROM bl b JOIN av a USING (binlog_file, binlog_position)"""
        for n in _TYPED_VALUE_SQL
    )
    + """
)
SELECT binlog_file, binlog_position, "column", binlog_value, avro_value,
       CASE WHEN binlog_value IS NULL AND avro_value IS NOT NULL
              THEN 'BINLOG_NULL'
            WHEN binlog_value IS NOT NULL AND avro_value IS NULL
              THEN 'AVRO_NULL'
            ELSE 'MISMATCH' END AS status
FROM unp
WHERE (binlog_value IS NULL) <> (avro_value IS NULL)
   OR (binlog_value IS NOT NULL AND avro_value IS NOT NULL
       AND binlog_value <> avro_value)"""
)



def _bm25_sql(k: int) -> str:
    """BM25 oracle SQL, parameterized by the candidate count so the
    hybrid-retrieval oracle can reuse the identical scorer at a wider
    k (doc_bm25_topk uses k=10)."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ('spark', 'join', 'fast') GROUP BY 1, 2
),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT t.doc_id,
         round(sum(
           ln((CAST(s.n_docs - q.df AS DOUBLE) + 0.5)
              / (CAST(q.df AS DOUBLE) + 0.5) + 1.0)
           * (CAST(t.tf AS DOUBLE) * (1.2 + 1.0))
           / (CAST(t.tf AS DOUBLE)
              + 1.2 * (0.25 + 0.75 * CAST(d.dl AS DOUBLE) / s.avgdl))
         ), 6) AS score
  FROM tf t
  JOIN dfq q USING (term)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats s
  GROUP BY t.doc_id
)
SELECT doc_id, score, rank FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT {k})
)"""

def _brute_cosine_sql(prefix: int | None = None) -> str:
    """Brute-force cosine top-k oracle, optionally over the first
    ``prefix`` dimensions (the Matryoshka truncation eval's tiers);
    prefix=None is the ann_cosine_topk scorer."""
    cut = f" WHERE ord <= {prefix}" if prefix else ""
    return f"""
WITH ex AS (
  SELECT * FROM (
    SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
           unnest(embedding)::DOUBLE AS v
    FROM embeddings
  ){cut}
),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS norm FROM ex GROUP BY vec_id),
q AS (SELECT * FROM ex WHERE vec_id < 32),
dots AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, sum(q.v * e.v) AS dot
  FROM q JOIN ex e ON q.ord = e.ord AND e.vec_id <> q.vec_id
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id,
         round(dot / (nq.norm * ne.norm), 6) AS cos_sim
  FROM dots
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms ne ON ne.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5"""


# --- DDL schema-timeline CTEs (fixtures.generate_ddl_text_lines
# mirror): Query events (event_type outside the DML+XID vocabulary)
# with deterministic statements by event_id % 13; m=3 sub-splits by
# k = event_id % 5 (coprime): k=0 non-DDL noise (BEGIN) the extractor
# must drop, k=1 TRUNCATE (a data reset -- whole-key drift opener,
# membership/types carry), k=2/4 standalone CREATE/DROP INDEX (kind
# INDEX, keyed on the ON target), k=3 multi-name OPTIMIZE TABLE t, t_r
# (kind MAINTENANCE, per-name explode; the _r name canonicalizes to
# the base table wherever an m=9 rename edge exists); m=9 is RENAME
# TABLE t TO t_r and
# m=10 targets the RENAMED name -- the CANONICAL identity (one table,
# one history) resolves t_r back to t whenever a rename edge exists
# for that (schema, table).  m=11 is the gh-ost atomic swap on the
# separate 's' family: TWO pairs (pair_no 0/1, MySQL's left-to-right
# order), both canonicalizing to s_new (edges s_old->s->s_new), the
# second pair carrying the live name.  m=12 is the paren multi-column
# ADD with online-DDL options.  Keep in sync with
# fixtures.ddl_statement_col and the derive_binlog_events arithmetic.
_DDL_STMT_CTE = """qsrc AS (
  SELECT event_id, user_id,
    strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS vts,
    CASE WHEN event_id % 211 = 0 THEN 0
         WHEN event_id % 53 = 0 THEN 100 * ((event_id + 4) // 4) + 4
         ELSE 100 * (event_id // 4) + 4 END AS log_position,
    'db' || CAST(user_id % 2 AS VARCHAR) AS schema_name,
    't' || CAST(user_id % 3 AS VARCHAR) AS table_name,
    's' || CAST(user_id % 3 AS VARCHAR) AS s_name,
    'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0') AS binlog_file,
    event_id % 13 AS m,
    event_id % 5 AS k,
    event_id % 2 AS p2,
    CAST(event_id % 4 AS VARCHAR) AS f4
  FROM events
  WHERE event_type NOT IN ('click', 'view', 'purchase', 'signup')
    AND event_id % 223 <> 0
),
redges AS (
  SELECT DISTINCT schema_name, table_name FROM qsrc WHERE m = 9
),
ddl AS (
  SELECT q.event_id, q.vts, q.log_position, q.binlog_file, q.m, q.k,
    q.f4, q.p2, p.pair_no,
    q.schema_name,
    CASE WHEN q.m = 10 THEN q.table_name || '_r'
         WHEN q.m = 11 AND p.pair_no = 0 THEN q.s_name
         WHEN q.m = 11 THEN q.s_name || '_new'
         WHEN q.m = 3 AND q.k = 3 AND p.pair_no = 1
           THEN q.table_name || '_r'
         ELSE q.table_name END AS written_table,
    CASE WHEN q.m = 10 AND e.table_name IS NOT NULL THEN q.table_name
         WHEN q.m = 10 THEN q.table_name || '_r'
         WHEN q.m = 11 THEN q.s_name || '_new'
         WHEN q.m = 3 AND q.k = 3 AND p.pair_no = 1
              AND e.table_name IS NOT NULL THEN q.table_name
         WHEN q.m = 3 AND q.k = 3 AND p.pair_no = 1
           THEN q.table_name || '_r'
         ELSE q.table_name END AS table_name,
    CASE WHEN q.m = 9 THEN q.table_name || '_r'
         WHEN q.m = 11 AND p.pair_no = 0 THEN q.s_name || '_old'
         WHEN q.m = 11 THEN q.s_name END AS new_table,
    CASE WHEN q.m IN (0, 4, 5, 6, 7, 8, 10, 12) THEN 'ALTER'
         WHEN q.m = 1 THEN 'CREATE'
         WHEN q.m = 2 THEN 'DROP'
         WHEN q.m IN (9, 11) THEN 'RENAME'
         WHEN q.m = 3 AND q.k = 1 THEN 'TRUNCATE'
         WHEN q.m = 3 AND q.k IN (2, 4) THEN 'INDEX'
         WHEN q.m = 3 AND q.k = 3 THEN 'MAINTENANCE' END AS ddl_kind,
    CASE q.m
      WHEN 0 THEN 'ALTER TABLE ' || q.table_name || ' ADD COLUMN c'
                  || q.f4 || ' INT, ALGORITHM=INPLACE, LOCK=NONE'
      WHEN 1 THEN 'CREATE TABLE IF NOT EXISTS ' || q.schema_name || '.'
                  || q.table_name
                  || ' (id INT PRIMARY KEY, order_id BIGINT, quantity INT)'
      WHEN 2 THEN 'DROP TABLE `' || q.schema_name || '`.`'
                  || q.table_name || '`'
      WHEN 4 THEN 'alter table ' || q.table_name || ' drop column c'
                  || q.f4
      WHEN 5 THEN 'ALTER TABLE ' || q.table_name || ' ADD COLUMN a'
                  || q.f4 || ' DECIMAL(10,2), DROP COLUMN c' || q.f4
                  || ', ADD INDEX ix_a' || q.f4 || ' (a' || q.f4 || ')'
      WHEN 6 THEN 'ALTER TABLE ' || q.table_name || ' MODIFY COLUMN c'
                  || q.f4 || CASE WHEN q.p2 = 0 THEN ' BIGINT NOT NULL'
                                  ELSE ' SMALLINT' END
      WHEN 7 THEN 'ALTER TABLE ' || q.table_name || ' CHANGE COLUMN c'
                  || q.f4 || ' r' || q.f4 || ' BIGINT'
      WHEN 8 THEN 'ALTER TABLE `' || q.table_name || '` RENAME COLUMN c'
                  || q.f4 || ' TO n' || q.f4
      WHEN 9 THEN 'RENAME TABLE ' || q.table_name || ' TO '
                  || q.table_name || '_r'
      WHEN 10 THEN 'ALTER TABLE ' || q.table_name
                  || '_r CONVERT TO CHARACTER SET utf8mb4, ADD COLUMN p'
                  || q.f4 || ' INT'
      WHEN 11 THEN 'RENAME TABLE ' || q.s_name || ' TO ' || q.s_name
                  || '_old, ' || q.s_name || '_new TO ' || q.s_name
      WHEN 12 THEN 'ALTER TABLE ' || q.table_name || ' ADD (x' || q.f4
                  || ' INT, y' || q.f4
                  || ' VARCHAR(255)), ALGORITHM=INPLACE, LOCK=NONE'
      WHEN 3 THEN CASE
        WHEN q.k = 1 AND q.p2 = 0 THEN 'TRUNCATE TABLE ' || q.table_name
        WHEN q.k = 1 THEN 'TRUNCATE ' || q.table_name
        WHEN q.k = 2 THEN 'CREATE UNIQUE INDEX ux_c' || q.f4 || ' ON '
                          || q.schema_name || '.' || q.table_name
                          || ' (c' || q.f4 || ')'
        WHEN q.k = 3 THEN 'OPTIMIZE TABLE ' || q.table_name || ', '
                          || q.table_name || '_r'
        WHEN q.k = 4 THEN 'DROP INDEX ix_a' || q.f4 || ' ON '
                          || q.table_name END
    END AS statement
  FROM qsrc q
  LEFT JOIN redges e
    ON e.schema_name = q.schema_name AND e.table_name = q.table_name
  CROSS JOIN (SELECT unnest([0, 1]) AS pair_no) p
  WHERE (q.m <> 3 OR q.k <> 0)
    AND (p.pair_no = 0 OR q.m = 11 OR (q.m = 3 AND q.k = 3))
)"""

# drift windows over the same derivation: ALTER or RENAME opens, next
# CREATE for the (canonical) table closes; zero positions carry no
# coordinate (Q5)
_DDL_WINDOWS_CTE = """qd AS (
  SELECT schema_name, table_name, ddl_kind, m, f4, event_id, pair_no,
    binlog_file || ':' || lpad(CAST(log_position AS VARCHAR), 12, '0')
      AS coord
  FROM ddl WHERE log_position <> 0
),
win AS (
  SELECT DISTINCT schema_name, table_name, coord AS win_from, win_to FROM (
    SELECT *,
      min(CASE WHEN ddl_kind = 'CREATE' THEN coord END) OVER (
        PARTITION BY schema_name, table_name
        ORDER BY coord, event_id, pair_no
        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS win_to
    FROM qd
  ) WHERE ddl_kind IN ('ALTER', 'RENAME', 'TRUNCATE')
)"""

# drift windows annotated with the moved-column set: per opening
# statement, the clause-touched columns (m arithmetic mirror of the
# Spark clause grammar) and whether the set is fully known (false for
# table RENAMEs -- m=9 and the m=11 swap pairs -- and for the m=10
# statement whose CONVERT clause lands on the UNPARSED channel; the
# m=0/m=12 online-DDL option clauses are OPTION_NO_EFFECT, so those
# stay fully known); dup-coordinate openers merge into one window,
# unioning sets and ANDing known flags
_DDL_WINCOLS_CTE = """wc AS (
  SELECT schema_name, table_name, win_from, win_to,
         list_sort(list_distinct(flatten(list(mc)))) AS moved_cols,
         bool_and(known) AS moved_known
  FROM (
    SELECT *,
      CASE m
        WHEN 0 THEN ['c' || f4]
        WHEN 4 THEN ['c' || f4]
        WHEN 5 THEN ['a' || f4, 'c' || f4]
        WHEN 6 THEN ['c' || f4]
        WHEN 7 THEN ['c' || f4, 'r' || f4]
        WHEN 8 THEN ['c' || f4, 'n' || f4]
        WHEN 9 THEN CAST([] AS VARCHAR[])
        WHEN 10 THEN ['p' || f4]
        WHEN 11 THEN CAST([] AS VARCHAR[])
        WHEN 12 THEN ['x' || f4, 'y' || f4]
        WHEN 3 THEN CAST([] AS VARCHAR[])
      END AS mc,
      m NOT IN (3, 9, 10, 11) AS known,
      coord AS win_from,
      min(CASE WHEN ddl_kind = 'CREATE' THEN coord END) OVER (
        PARTITION BY schema_name, table_name
        ORDER BY coord, event_id, pair_no
        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS win_to
    FROM qd
  ) WHERE ddl_kind IN ('ALTER', 'RENAME', 'TRUNCATE')
  GROUP BY 1, 2, 3, 4
)"""




def _pq_distortion_sql(m: int = 4, sub: int = 16) -> str:
    """Twin of similarity.pq_distortion: per-subspace exact-decimal
    squared reconstruction errors against the unrolled-kmeans
    codewords, rolled up per (subspace, code)."""
    ctes = ",\n".join(
        _pq_kmeans_cte(f"p{s}", s * sub + 1, (s + 1) * sub) for s in range(m)
    )
    errs = "\nUNION ALL\n".join(
        f"""SELECT {s} AS subspace, a.centroid_id AS code, e.vec_id,
       sum((CAST(round(e.v, 6) AS DECIMAL(12,6))
              - CAST(c.cv AS DECIMAL(12,6)))
           * (CAST(round(e.v, 6) AS DECIMAL(12,6))
              - CAST(c.cv AS DECIMAL(12,6)))) AS se
FROM p{s}ex e
JOIN p{s}a1 a USING (vec_id)
JOIN p{s}c1 c ON c.centroid_id = a.centroid_id AND c.ord = e.ord
GROUP BY 1, 2, 3"""
        for s in range(m)
    )
    return f"""WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
{ctes},
errs AS (
{errs}
)
SELECT subspace, code, count(*) AS n_vectors,
       CAST(sum(se) AS DOUBLE) / (count(*) * {sub}) AS mse,
       CAST(max(se) AS DOUBLE) AS max_se
FROM errs GROUP BY 1, 2"""

__all__ = [_n for _n in list(globals()) if not _n.startswith('__') and _n != '_shared']
