"""DuckDB oracle SQL, part 2/3 (split from registry.py,
round 7).  ASSEMBLY ORDER IS LOAD-BEARING: later entries compose
earlier ones via f-strings, so registry.oracle_sql() must call
the three add() builders in file order."""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from .oracle_ctes import *  # noqa: F401,F403


def add(sql: dict) -> None:
    sql.update({
        # twin of analytics.late_exclusive_suppliers (Q21 shape) in the
        # LITERAL correlated form -- the Spark side decorrelates it;
        # two independent derivations, one result
        "late_exclusive_suppliers": """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 80 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
ps AS (
  SELECT l_orderkey, l_suppkey, max(late) AS s_late
  FROM li GROUP BY l_orderkey, l_suppkey
)
SELECT p.l_suppkey, count(*) AS numwait
FROM ps p
WHERE p.s_late
  AND EXISTS (
    SELECT 1 FROM ps o
    WHERE o.l_orderkey = p.l_orderkey AND o.l_suppkey <> p.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM ps o
    WHERE o.l_orderkey = p.l_orderkey AND o.l_suppkey <> p.l_suppkey
      AND o.s_late
  )
GROUP BY p.l_suppkey""",
        # twin of analytics.customer_order_distribution (Q13 shape):
        # left join so zero-order customers appear as c_count = 0
        "customer_order_distribution": """
WITH per_cust AS (
  SELECT o_custkey, count(*) AS cnt FROM orders
  WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey
),
counts AS (
  SELECT coalesce(p.cnt, 0) AS c_count
  FROM customer c LEFT JOIN per_cust p ON c.c_custkey = p.o_custkey
)
SELECT c_count, count(*) AS custdist FROM counts GROUP BY c_count""",
        # twin of analytics.late_shipment_orders (Q4 shape, EXISTS as
        # semi join; lateness = shipped > 80 days after order date)
        "late_shipment_orders": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 80 DAY
)
GROUP BY o_orderpriority""",
        # twin of analytics.big_ticket_orders (Q18 shape): HAVING sum
        # of quantity > 180, decimal-exact then double at the boundary
        "big_ticket_orders": """
WITH qty AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS q
  FROM lineitem GROUP BY l_orderkey HAVING q > 180
)
SELECT c_name, c_custkey, o_orderkey,
       epoch_ms(o_orderdate) AS o_orderdate_ms,
       o_totalprice,
       CAST(q AS DOUBLE) AS total_qty
FROM qty
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey""",
        "events_view_click_range": _VIEW_CLICK_RANGE_SQL,
        # the stream-stream join's contract IS batch equivalence: a
        # fully-drained finite replay emits exactly the batch interval
        # join, so the oracle is the same SQL verbatim
        "events_join_stream": _VIEW_CLICK_RANGE_SQL,
        # twin of the LEFT OUTER variant's end-of-replay contract: all
        # inner pairs, plus null-padded rows for matchless views whose
        # window closed at or before the final watermark W = min(side
        # maxes) - 10 s delay (matchless views younger than that are
        # still in state when the replay ends and are absent by
        # design).  The horizon is INCLUSIVE (<=): Spark's state
        # eviction emits the null row when view_ts + window == W --
        # pinned empirically by test_left_join_boundary_horizon
        "events_left_join_stream": """
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
),
v AS (SELECT event_id, user_id, ts_ms FROM ev WHERE event_type = 'view'),
c AS (SELECT event_id, user_id, ts_ms FROM ev WHERE event_type = 'click'),
wm AS (
  SELECT least((SELECT max(ts_ms) FROM v), (SELECT max(ts_ms) FROM c)) - 10000 AS w
),
matched AS (
  SELECT v.event_id AS view_event_id, c.event_id AS click_event_id,
         v.user_id, c.ts_ms - v.ts_ms AS gap_ms
  FROM v JOIN c
    ON v.user_id = c.user_id
   AND c.ts_ms >= v.ts_ms AND c.ts_ms < v.ts_ms + 600000
)
SELECT * FROM matched
UNION ALL
SELECT v.event_id, CAST(NULL AS BIGINT), v.user_id, CAST(NULL AS BIGINT)
FROM v, wm
WHERE v.ts_ms + 600000 <= wm.w
  AND NOT EXISTS (
    SELECT 1 FROM c
    WHERE c.user_id = v.user_id
      AND c.ts_ms >= v.ts_ms AND c.ts_ms < v.ts_ms + 600000
  )""",
        # KMV sketch twin: identical hash -> identical bottom-k ->
        # identical estimate (integer-exact until the final division)
        "events_kmv_distinct_users": """
WITH hashed AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
),
bottom AS (
  SELECT * FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= 64
),
agg AS (
  SELECT event_type, count(*) AS n_kept, max(h) AS kth_hash
  FROM bottom GROUP BY event_type
)
SELECT event_type, n_kept, kth_hash,
       round(CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
                  ELSE 63 * 281474976710656.0 / kth_hash END, 4) AS est_distinct_users
FROM agg""",
        # twin of analytics.kmv_set_ops: same bottom-64 sketches, union
        # merged by sorted-distinct slice, Jaccard = fraction of the
        # union sketch present in BOTH sides, intersection = jac*union;
        # exact side from the distinct (user, type) frame
        "events_kmv_setops": """
WITH hashed AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
),
sketches AS (
  SELECT event_type, list_slice(list_sort(list(h)), 1, 64) AS ks
  FROM hashed GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.ks AS ks_a, b.ks AS ks_b,
         list_slice(list_sort(list_distinct(a.ks || b.ks)), 1, 64) AS u
  FROM sketches a JOIN sketches b ON a.event_type < b.event_type
),
est AS (
  SELECT type_a, type_b,
         len(u) AS n_union_kept,
         list_max(u) AS union_kth,
         len(list_intersect(list_intersect(u, ks_a), ks_b)) AS sketch_common
  FROM pairs
),
scored AS (
  SELECT type_a, type_b,
         CAST(n_union_kept AS BIGINT) AS n_union_kept, union_kth,
         CASE WHEN n_union_kept < 64 THEN CAST(n_union_kept AS DOUBLE)
              ELSE 63 * 281474976710656.0 / union_kth END AS est_union_raw,
         CAST(sketch_common AS BIGINT) AS sketch_common,
         CAST(sketch_common AS DOUBLE) / n_union_kept AS jac_raw
  FROM est
),
ut AS (SELECT DISTINCT user_id, event_type FROM events
       WHERE user_id IS NOT NULL),
inter AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b,
         count(*) AS exact_intersection
  FROM ut x JOIN ut y ON x.user_id = y.user_id
  WHERE x.event_type < y.event_type
  GROUP BY 1, 2
),
counts AS (SELECT event_type, count(*) AS n FROM ut GROUP BY event_type)
SELECT s.type_a, s.type_b, s.n_union_kept, s.union_kth,
       round(s.est_union_raw, 4) AS est_union,
       s.sketch_common,
       round(s.jac_raw, 6) AS jaccard_est,
       round(s.jac_raw * s.est_union_raw, 4) AS est_intersection,
       ca.n AS exact_a, cb.n AS exact_b,
       ca.n + cb.n - coalesce(i.exact_intersection, 0) AS exact_union,
       coalesce(i.exact_intersection, 0) AS exact_intersection
FROM scored s
JOIN counts ca ON ca.event_type = s.type_a
JOIN counts cb ON cb.event_type = s.type_b
LEFT JOIN inter i ON i.type_a = s.type_a AND i.type_b = s.type_b""",
        "events_salted_type_stats": """
SELECT event_type, count(event_id) AS n_events, max(value) AS max_value,
       min(event_id) AS min_id, CAST(sum(event_id) AS BIGINT) AS sum_ids
FROM events GROUP BY event_type""",
        # twin of streaming/running_stats_stream.py: the batch
        # cumulative window equals the per-event emission of the
        # ValueState processor (count/max over (ts, event_id) order)
        "events_running_stats_stream": """
SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
       count(*) OVER cum AS n_events_so_far,
       max(value) OVER cum AS running_max_value
FROM events
WHERE value IS NOT NULL
WINDOW cum AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
        "events_running_windows": """
SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
       count(*) OVER cum AS n_events_so_far,
       max(value) OVER cum AS running_max_value,
       epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER w AS gap_ms,
       min(value) OVER last3 AS min_value_3
FROM events
WINDOW
  w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id),
  cum AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  last3 AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
        # The streaming query's complete-mode result equals the batch
        # tumbling-window aggregation: 10-minute epoch-aligned windows
        # (Spark F.window aligns to the 1970 epoch, == ms floor-division)
        # twin of _q_events_top_type_stream: busiest type per window
        # from the same batch-equal windowed counts; ties to the
        # lexicographically largest type via the (count, type) tuple
        "events_top_type_stream": """
WITH wc AS (
  SELECT (epoch_ms(ts) // 600000) * 600000 AS window_start_ms,
         event_type, count(*) AS n_events
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY window_start_ms
      ORDER BY n_events DESC, event_type DESC) AS rn
  FROM wc
)
SELECT window_start_ms, event_type AS top_event_type, n_events AS top_count
FROM ranked WHERE rn = 1""",
        "events_windowed_stream": """
SELECT (epoch_ms(ts) // 600000) * 600000 AS window_start_ms,
       (epoch_ms(ts) // 600000) * 600000 + 600000 AS window_end_ms,
       event_type,
       count(*) AS n_events,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY 1, 2, 3""",
        "top_parts_per_brand": """
SELECT p_brand, p_partkey, CAST(p_retailprice AS DOUBLE) AS p_retailprice, price_rank
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (
             PARTITION BY p_brand
             ORDER BY CAST(p_retailprice AS DOUBLE) DESC, p_partkey) AS price_rank
  FROM part
) WHERE price_rank <= 3""",
        "events_value_histogram": """
SELECT event_type,
       CAST(floor(value / 10.0) AS BIGINT) AS bucket,
       count(*) AS n,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value
FROM events
GROUP BY 1, 2""",
        "events_trailing_10min": """
SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
       count(*) OVER w AS n_last_10min,
       max(value) OVER w AS max_value_10min
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
             RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)""",
        "part_above_brand_avg": """
WITH ca AS (
  SELECT p_brand,
         round(CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4) AS brand_avg
  FROM part GROUP BY 1
)
SELECT p_partkey, p_brand,
       CAST(p_retailprice AS DOUBLE) AS p_retailprice, brand_avg
FROM part JOIN ca USING (p_brand)
WHERE CAST(p_retailprice AS DOUBLE) > brand_avg""",
        "events_rank_family": """
SELECT event_id, event_type,
       CAST(floor(value) AS BIGINT) AS value_bucket,
       rank() OVER tied AS rnk,
       dense_rank() OVER tied AS dense_rnk,
       round(percent_rank() OVER tied, 6) AS pct_rank,
       round(cume_dist() OVER tied, 6) AS cume,
       ntile(10) OVER uniq AS time_decile
FROM events
WINDOW tied AS (PARTITION BY event_type ORDER BY CAST(floor(value) AS BIGINT)),
       uniq AS (PARTITION BY event_type ORDER BY epoch_ms(ts), event_id)""",
        "orders_cube": """
SELECT year(o_orderdate) AS o_year, o_orderstatus,
       grouping(year(o_orderdate), o_orderstatus) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE(year(o_orderdate), o_orderstatus)""",
        # The duplicated replay collapses back to the original table.
        "events_dedup_stream": """
SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value, props
FROM events""",
        # Twin of similarity.kmeans_assignments (k=8, stride=37,
        # n_iter=2 unrolled): identical init, per-step 1e-6 rounding,
        # argmin euclidean via score = dot - |c|^2/2, lowest-centroid
        # tie-break; empty clusters drop out exactly as in Spark.
        "embedding_kmeans": f"""
WITH {_KMEANS_CTE}
SELECT a1.vec_id, a1.centroid_id, sz.cluster_size
FROM a1 JOIN (
  SELECT centroid_id, count(*) AS cluster_size FROM a1 GROUP BY 1
) sz ON sz.centroid_id = a1.centroid_id""",
        # the GEMM assignment path must land on the SAME clusters --
        # one oracle, two engines (JVM fold vs numpy matmul)
        "embedding_kmeans_gemm": f"""
WITH {_KMEANS_CTE}
SELECT a1.vec_id, a1.centroid_id, sz.cluster_size
FROM a1 JOIN (
  SELECT centroid_id, count(*) AS cluster_size FROM a1 GROUP BY 1
) sz ON sz.centroid_id = a1.centroid_id""",
        # twin of similarity.embedding_coreset: the SAME unrolled
        # k-means CTE (a1 assignment, c1 centroids), cosine to the
        # assigned centroid, per-cluster keep boundary = exact 0.7
        # quantile rounded to 1e-9 -- keep the hard (low-cos) examples
        "embedding_coreset": f"""
WITH {_KMEANS_CTE},
cn AS (SELECT centroid_id, sqrt(sum(cv * cv)) AS cnorm FROM c1 GROUP BY 1),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS norm FROM ex GROUP BY vec_id),
dots AS (
  SELECT e.vec_id, a.centroid_id, sum(e.v * c.cv) AS dot
  FROM ex e
  JOIN a1 a ON a.vec_id = e.vec_id
  JOIN c1 c ON c.centroid_id = a.centroid_id AND c.ord = e.ord
  GROUP BY 1, 2
),
scored AS (
  SELECT d.vec_id, d.centroid_id,
         round(d.dot / (n.norm * cn.cnorm), 6) AS cos_center
  FROM dots d
  JOIN norms n ON n.vec_id = d.vec_id
  JOIN cn ON cn.centroid_id = d.centroid_id
),
bounds AS (
  SELECT centroid_id, round(quantile_cont(cos_center, 0.7), 9) AS b
  FROM scored GROUP BY 1
)
SELECT s.vec_id, s.centroid_id, s.cos_center, s.cos_center <= b.b AS keep
FROM scored s JOIN bounds b ON b.centroid_id = s.centroid_id""",
        # twin of similarity.embedding_prototypes: same unrolled
        # k-means + centroid-cosine scoring, per-cluster top-5 rank
        "embedding_prototypes": f"""
WITH {_KMEANS_CTE},
cn AS (SELECT centroid_id, sqrt(sum(cv * cv)) AS cnorm FROM c1 GROUP BY 1),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS norm FROM ex GROUP BY vec_id),
dots AS (
  SELECT e.vec_id, a.centroid_id, sum(e.v * c.cv) AS dot
  FROM ex e
  JOIN a1 a ON a.vec_id = e.vec_id
  JOIN c1 c ON c.centroid_id = a.centroid_id AND c.ord = e.ord
  GROUP BY 1, 2
),
scored AS (
  SELECT d.vec_id, d.centroid_id,
         round(d.dot / (n.norm * cn.cnorm), 6) AS cos_center
  FROM dots d
  JOIN norms n ON n.vec_id = d.vec_id
  JOIN cn ON cn.centroid_id = d.centroid_id
)
SELECT vec_id, centroid_id, cos_center, CAST(rn AS INT) AS proto_rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY centroid_id ORDER BY cos_center DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= 5""",
        # twin of similarity.semdedup_survivors (k=8, n_iter=2,
        # threshold=0.99): the SAME unrolled k-means CTE, then pairwise
        # cosine within each cluster, losers = higher vec_id of any
        # qualifying pair, survivors by anti-join
        "embedding_semdedup": f"""
WITH {_KMEANS_CTE},
sz AS (SELECT centroid_id, count(*) AS cluster_size FROM a1 GROUP BY 1),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS norm FROM ex GROUP BY vec_id),
cand AS (
  SELECT l.vec_id AS vec_a, r.vec_id AS vec_b
  FROM a1 l JOIN a1 r ON l.centroid_id = r.centroid_id
  WHERE l.vec_id < r.vec_id
),
dots AS (
  SELECT c.vec_a, c.vec_b, sum(ea.v * eb.v) AS dot
  FROM cand c
  JOIN ex ea ON ea.vec_id = c.vec_a
  JOIN ex eb ON eb.vec_id = c.vec_b AND ea.ord = eb.ord
  GROUP BY c.vec_a, c.vec_b
),
losers AS (
  SELECT DISTINCT d.vec_b AS vec_id
  FROM dots d
  JOIN norms na ON na.vec_id = d.vec_a
  JOIN norms nb ON nb.vec_id = d.vec_b
  WHERE round(d.dot / (na.norm * nb.norm), 6) >= 0.99
)
SELECT a1.vec_id, a1.centroid_id, sz.cluster_size
FROM a1
JOIN sz ON sz.centroid_id = a1.centroid_id
ANTI JOIN losers ON losers.vec_id = a1.vec_id""",
        # twin of textstats.dsir_importance_weights (target lang 'en',
        # 256 hashed-unigram buckets, add-1 smoothing; log-ratio
        # rounded to 6 before weighting, exactly like the Spark side)
        "doc_dsir_weights": rf"""
WITH words AS (
  SELECT doc_id, lang, unnest(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS term
  FROM documents
),
wb AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(term), 1, 12))::BIGINT % 256 AS b
  FROM words
),
cc AS (SELECT b, count(*) AS cc FROM wb GROUP BY b),
tc AS (SELECT b, count(*) AS tc FROM wb WHERE lang = 'en' GROUP BY b),
counts AS (
  SELECT cc.b, cc.cc, coalesce(tc.tc, 0) AS tc FROM cc LEFT JOIN tc USING (b)
),
tot AS (SELECT sum(cc)::DOUBLE AS tot_corpus, sum(tc)::DOUBLE AS tot_target FROM counts),
ratio AS (
  SELECT b, round(log10((tc + 1) / (tot_target + 256)) - log10((cc + 1) / (tot_corpus + 256)), 6) AS lr
  FROM counts, tot
),
rat_units AS (SELECT b, CAST(round(lr * 1e6) AS BIGINT) AS lru FROM ratio),
pd AS (SELECT doc_id, b, count(*) AS cnt FROM wb GROUP BY doc_id, b)
SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
       CAST(sum(cnt * lru) AS BIGINT) AS dsir_units
FROM pd JOIN rat_units USING (b) GROUP BY doc_id""",
        # twin of textstats.bigram_logprob_scores (add-1 smoothing,
        # V = distinct unigrams)
        "doc_bigram_logprob": rf"""
WITH doc_words AS (
  SELECT doc_id, regexp_extract_all(text, '{_TOKEN_RE_SQL}') AS w FROM documents
),
bi AS (
  SELECT doc_id, unnest(
    CASE WHEN len(w) >= 2 THEN list_transform(
      generate_series(1, len(w) - 1), i -> array_to_string(w[i:i+1], ' '))
    ELSE [] END) AS bg
  FROM doc_words
),
uni AS (SELECT doc_id, unnest(w) AS term FROM doc_words),
bgc AS (SELECT bg, count(*) AS c12 FROM bi GROUP BY bg),
w1c AS (SELECT term, count(*) AS c1 FROM uni GROUP BY term),
v AS (SELECT count(*)::DOUBLE AS V FROM w1c)
SELECT doc_id, count(*) AS n_bigrams,
       round(avg(log10((c12 + 1) / (c1 + V))), 6) AS mean_bigram_logprob
FROM bi
JOIN bgc USING (bg)
JOIN w1c ON split_part(bg, ' ', 1) = term, v
GROUP BY doc_id""",
        # twin of similarity.quantize_embeddings_int8: same per-dim
        # min/max, floor(+0.5) codes, integer 1e-6-unit error sum
        "embedding_quantize_int8": """
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
stats AS (SELECT ord, min(v) AS mn, max(v) AS mx FROM ex GROUP BY ord),
coded AS (
  SELECT e.vec_id, e.ord, e.v, s.mn, s.mx,
         CASE WHEN s.mx > s.mn THEN
           CAST(least(255, greatest(0,
             floor((e.v - s.mn) / ((s.mx - s.mn) / 255.0) + 0.5))) AS INT)
         ELSE 0 END AS code
  FROM ex e JOIN stats s ON e.ord = s.ord
),
errs AS (
  SELECT vec_id, ord, code,
         CAST(floor(abs(v - (mn + code * ((mx - mn) / 255.0))) * 1e6 + 0.5) AS BIGINT) AS eu
  FROM coded
)
SELECT vec_id,
       array_to_string(list(code ORDER BY ord), ',') AS codes_csv,
       CAST(sum(eu) AS BIGINT) AS err_units
FROM errs GROUP BY vec_id""",
        # twin of textstats.length_bucket_padding (bounds 64/128/256/
        # 512, over-long docs truncate into the top bucket)
        "doc_length_bucket_padding": rf"""
WITH n AS (
  SELECT least(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')), 512) AS n
  FROM documents
),
b AS (
  SELECT CASE WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
              WHEN n <= 256 THEN 256 ELSE 512 END AS bucket_bound, n
  FROM n
)
SELECT bucket_bound, count(*) AS n_docs,
       CAST(sum(n) AS BIGINT) AS real_tokens,
       CAST(count(*) * bucket_bound AS BIGINT) AS padded_tokens,
       CAST(count(*) * bucket_bound - sum(n) AS BIGINT) AS waste_tokens
FROM b GROUP BY bucket_bound""",
        # twin of textstats.top_terms_per_doc: the SQL form of the
        # UDTF's per-row row-set (explode + count + rank, same
        # tie-break) -- whitespace split() == the \S+ token regex
        "doc_top_terms_udtf": rf"""
WITH terms AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS term
  FROM documents
),
counts AS (SELECT doc_id, term, count(*) AS cnt FROM terms GROUP BY doc_id, term),
ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY doc_id ORDER BY cnt DESC, term) AS INT) AS rank
  FROM counts
)
SELECT doc_id, term, cnt, rank FROM ranked WHERE rank <= 3""",
        # twin of analytics.hll_distinct_users: the exact counts are
        # compared value-for-value; the sketch contract is the bound
        # flag (each engine's own HLL must sit within 10% of exact --
        # estimates themselves are algorithm-specific, see docstring)
        # twin of analytics.purchase_attribution: same gap-session
        # construction as events_sessionize, IGNORE-NULLS first/last
        # over the preceding-rows frame
        # twin of dedup.dedup_keep_best: clusters CTE verbatim, winner
        # = (n_chars DESC, doc_id) per cluster, losers anti-joined
        # twin of textstats.hybrid_search_topk: BM25 candidates via the
        # shared parameterized scorer, cosine over survivors only, RRF
        # = 1/(60+r1) + 1/(60+r2) on integer ranks
        "doc_hybrid_search": """
WITH b AS (SELECT * FROM (
""" + _bm25_sql(50) + """
)),
ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS norm FROM ex GROUP BY vec_id),
q AS (SELECT * FROM ex WHERE vec_id = 0),
cand AS (
  SELECT b.doc_id, b.rank AS bm25_rank,
         round(sum(q.v * e.v) / (nq.norm * ne.norm), 6) AS cos_sim
  FROM b
  JOIN ex e ON e.vec_id = b.doc_id
  JOIN q ON q.ord = e.ord
  JOIN norms ne ON ne.vec_id = b.doc_id
  JOIN norms nq ON nq.vec_id = 0
  GROUP BY b.doc_id, b.rank, nq.norm, ne.norm
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS cos_rank
  FROM cand
),
fused AS (
  SELECT doc_id, bm25_rank, cos_rank, cos_sim,
         round(1.0 / (60 + bm25_rank) + 1.0 / (60 + cos_rank), 9) AS rrf_score
  FROM ranked
)
SELECT doc_id, bm25_rank, cos_rank, cos_sim, rrf_score, rank FROM (
  SELECT *, row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
  FROM fused
) WHERE rank <= 10""",
        "dedup_keep_best": """
WITH cl AS (
""" + _dedup_clusters_sql() + """
),
m AS (
  SELECT c.cluster_id, d.doc_id, d.n_chars
  FROM cl c JOIN documents d ON d.doc_id = c.doc_id
),
w AS (
  SELECT cluster_id, doc_id AS keep_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rn
    FROM m) WHERE rn = 1
),
losers AS (
  SELECT m.doc_id FROM m JOIN w ON w.cluster_id = m.cluster_id
  WHERE m.doc_id <> w.keep_id
)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d ANTI JOIN losers l ON l.doc_id = d.doc_id""",
        # twin of analytics.join_key_skew_report over events.user_id
        "events_skew_report": """
WITH kc AS (
  SELECT user_id AS k, count(*) AS cnt FROM events
  WHERE user_id IS NOT NULL GROUP BY 1
),
top AS (SELECT k AS top_key FROM kc ORDER BY cnt DESC, k DESC LIMIT 1),
s AS (
  SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
         max(cnt) AS max_key_rows,
         round(round(quantile_cont(cnt, 0.99), 9), 4) AS p99_key_rows
  FROM kc
)
SELECT 'user_id' AS key_col, n_keys, n_rows, max_key_rows,
       round(CAST(n_rows AS DOUBLE) / n_keys, 4) AS avg_key_rows,
       p99_key_rows,
       round(max_key_rows / (CAST(n_rows AS DOUBLE) / n_keys), 4) AS skew_factor,
       top_key
FROM s, top""",
        "events_attribution": """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_ms
  FROM events
),
s AS (
  SELECT *, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000
                 THEN 1 ELSE 0 END AS is_new
  FROM e
),
sid AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS session_id
  FROM s
),
att AS (
  SELECT *,
    first_value(CASE WHEN event_type <> 'purchase' THEN event_id END IGNORE NULLS)
      OVER prior AS first_touch_id,
    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      OVER prior AS first_touch_type,
    last_value(CASE WHEN event_type <> 'purchase' THEN event_id END IGNORE NULLS)
      OVER prior AS last_touch_id,
    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      OVER prior AS last_touch_type,
    coalesce(sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
      OVER prior, 0) AS n_touches
  FROM sid
  WINDOW prior AS (PARTITION BY user_id, session_id ORDER BY ts_ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, ts_ms, session_id, first_touch_id,
       first_touch_type, last_touch_id, last_touch_type,
       CAST(n_touches AS BIGINT) AS n_touches
FROM att WHERE event_type = 'purchase'""",
        # twin of analytics.hll_sketch_table_union: the union of the
        # daily sketches must answer like one sketch over the whole
        # type -- DuckDB asserts its own estimator's bound (the
        # hll_distinct_users contract) + the day count
        "events_hll_sketch_union": """
SELECT event_type,
       count(DISTINCT date_trunc('day', ts)) AS n_days,
       count(DISTINCT user_id) AS n_exact,
       abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
         / count(DISTINCT user_id) <= 0.1 AS within_bound
FROM events WHERE user_id IS NOT NULL
GROUP BY event_type""",
        "events_hll_distinct_users": """
SELECT event_type,
       count(DISTINCT user_id) AS n_exact,
       abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
         / count(DISTINCT user_id) <= 0.1 AS within_bound
FROM events WHERE user_id IS NOT NULL
GROUP BY event_type""",
        # twin of _q_zorder_layout: the identical bit-interleave chain
        # spelled out by functions.zorder.zorder_key_sql
        # twin of functions/hilbert.py: the same 16-level walk as a
        # linear CTE chain (generated by hilbert_sql_ctes)
        # twin of _q_zorder3_layout: the identical 3-way interleave
        # spelled out by functions.zorder.zorder_key_n_sql
        "lineitem_zorder3_layout": f"""
SELECT l_orderkey, l_linenumber,
       {zorder_key_n_sql(["l_partkey", "l_suppkey", "l_orderkey"])} AS z3_key,
       {zorder_key_n_sql(["l_partkey", "l_suppkey", "l_orderkey"])} >> 42 AS file_id
FROM lineitem""",
        "lineitem_hilbert_layout": hilbert_sql_ctes(
            "l_partkey", "l_suppkey", "lineitem",
            "l_orderkey, l_linenumber, l_partkey, l_suppkey",
        ) + """
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, h_key,
       h_key >> 26 AS file_id
FROM hk""",
        "lineitem_zorder_layout": f"""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       {zorder_key_sql("l_partkey", "l_suppkey")} AS z_key,
       {zorder_key_sql("l_partkey", "l_suppkey")} >> 26 AS file_id
FROM lineitem""",
        # twin of similarity.cluster_profiles: the SQL form of the
        # grouped-map profile (the operator deliberately computes it
        # via applyInPandas -- see its docstring)
        "embedding_cluster_profiles": f"""
WITH {_KMEANS_CTE},
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS norm FROM ex GROUP BY vec_id),
dimvar AS (
  SELECT a.centroid_id, e.ord, var_pop(e.v) AS vp
  FROM ex e JOIN a1 a ON a.vec_id = e.vec_id
  GROUP BY a.centroid_id, e.ord
)
SELECT a.centroid_id,
       count(*) AS n_members,
       round(avg(n.norm), 6) AS mean_norm,
       (SELECT round(sum(vp), 6) FROM dimvar d WHERE d.centroid_id = a.centroid_id) AS var_trace
FROM a1 a JOIN norms n ON n.vec_id = a.vec_id
GROUP BY a.centroid_id""",
        "doc_redact_pii": _redact_pii_sql(),
        # twin of textstats.leakage_safe_splits: clusters CTE is the
        # dedup_clusters oracle verbatim, split hash on the canonical id
        "doc_leakage_safe_splits": """
WITH cl AS (
""" + _dedup_clusters_sql() + """
),
j AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS split_key
  FROM documents d LEFT JOIN cl c ON c.doc_id = d.doc_id
),
b AS (
  SELECT doc_id, split_key,
         ('0x' || substr(md5('split:' || CAST(split_key AS VARCHAR)), 1, 12))::BIGINT % 100 AS bucket
  FROM j
)
SELECT doc_id, split_key, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM b""",
        "doc_split_assignments": """
WITH b AS (
  SELECT doc_id, lang, source,
         ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT doc_id, lang, source, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM b""",
        "cdc_apply_changes": _APPLY_CHANGES_SQL,
        "cdc_snapshot_diff": _SNAPSHOT_DIFF_SQL,
        # twin of snapshot.scd2_history: lead() over ALL changes closes
        # intervals (a DELETE terminates the open version), then the
        # version numbering runs over the surviving INSERT/UPDATE rows
        # only -- same two-window construction, same (ts, event_id)
        # order-as-data tiebreak
        "cdc_scd2_history": """
WITH ch AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         CASE event_type WHEN 'click' THEN 'INSERT'
                         WHEN 'view' THEN 'UPDATE'
                         WHEN 'purchase' THEN 'DELETE' END AS op,
         value
  FROM events
  WHERE event_type IN ('click','view','purchase') AND user_id IS NOT NULL
),
seq AS (
  SELECT *, lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
              AS valid_to_ms
  FROM ch
)
SELECT user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
         AS version,
       op, round(value, 4) AS value,
       ts_ms AS valid_from_ms, valid_to_ms,
       (valid_to_ms IS NULL) AS is_current
FROM seq WHERE op <> 'DELETE'""",
        # twin of snapshot.scd2_lookup: same history CTE, probes are the
        # error events, half-open interval containment; LEFT JOIN keeps
        # stateless probes (pre-first-version or in a deleted gap)
        "cdc_scd2_lookup": """
WITH ch AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         CASE event_type WHEN 'click' THEN 'INSERT'
                         WHEN 'view' THEN 'UPDATE'
                         WHEN 'purchase' THEN 'DELETE' END AS op,
         value
  FROM events
  WHERE event_type IN ('click','view','purchase') AND user_id IS NOT NULL
),
seq AS (
  SELECT *, lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
              AS valid_to_ms
  FROM ch
),
hist AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
           AS version,
         round(value, 4) AS state_value,
         ts_ms AS valid_from_ms, valid_to_ms
  FROM seq WHERE op <> 'DELETE'
),
probes AS (
  SELECT event_id AS probe_event_id, user_id, epoch_ms(ts) AS probe_ts_ms
  FROM events WHERE event_type = 'error' AND user_id IS NOT NULL
)
SELECT p.probe_event_id, p.user_id, p.probe_ts_ms,
       h.version, h.state_value, h.valid_from_ms
FROM probes p
LEFT JOIN hist h
  ON p.user_id = h.user_id
 AND p.probe_ts_ms >= h.valid_from_ms
 AND (h.valid_to_ms IS NULL OR p.probe_ts_ms < h.valid_to_ms)""",
        # twin of analytics.measure_profile: explicit UNION ALL melt
        # (the unpivot), GROUPING SETS over it, decimal-exact sums cast
        # to double (the q1 discipline), grouping() marker mirrored
        "lineitem_measure_profile": """
WITH m AS (
  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
)
SELECT l_returnflag, measure,
       CAST(grouping(l_returnflag) AS INT) AS is_total,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
       round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6)
         AS avg_value
FROM m
GROUP BY GROUPING SETS ((l_returnflag, measure), (measure))""",
        # twin of snapshot.merge_upsert over the same cutoff split:
        # source row present -> ALL its columns win (row-wise CASE,
        # mirroring the struct coalesce -- never per-column coalesce,
        # which would resurrect target values under source NULLs);
        # flagged deletes drop the key, delete-of-absent is a no-op
        "cdc_merge_upsert": """
WITH changes AS (
  SELECT user_id,
         CASE event_type WHEN 'click' THEN 'INSERT'
                         WHEN 'view' THEN 'UPDATE'
                         ELSE 'DELETE' END AS op,
         epoch_ms(ts) AS ts_ms, event_id, value, ts
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase') AND user_id IS NOT NULL
),
old_snap AS (
  SELECT user_id, op AS last_op, ts_ms AS last_ts_ms,
         event_id AS last_event_id, round(value, 4) AS last_value, n_changes
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts_ms DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n_changes
    FROM changes WHERE ts < TIMESTAMP '2024-01-16'
  ) WHERE rn = 1 AND op <> 'DELETE'
),
delta AS (
  SELECT user_id, op AS last_op, ts_ms AS last_ts_ms,
         event_id AS last_event_id, round(value, 4) AS last_value, n_changes
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts_ms DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n_changes
    FROM changes WHERE ts >= TIMESTAMP '2024-01-16'
  ) WHERE rn = 1
)
SELECT coalesce(d.user_id, o.user_id) AS user_id,
       CASE WHEN d.user_id IS NOT NULL THEN d.last_op ELSE o.last_op END AS last_op,
       CASE WHEN d.user_id IS NOT NULL THEN d.last_ts_ms ELSE o.last_ts_ms END AS last_ts_ms,
       CASE WHEN d.user_id IS NOT NULL THEN d.last_event_id ELSE o.last_event_id END AS last_event_id,
       CASE WHEN d.user_id IS NOT NULL THEN d.last_value ELSE o.last_value END AS last_value,
       CASE WHEN d.user_id IS NOT NULL THEN d.n_changes ELSE o.n_changes END AS n_changes
FROM old_snap o
FULL OUTER JOIN delta d ON o.user_id = d.user_id
WHERE NOT coalesce(d.last_op = 'DELETE', FALSE)""",
        # the incremental maintenance contract IS batch equivalence:
        # after draining the chunked replay, the stored snapshot equals
        # apply_changes over all events -- same SQL verbatim
        "cdc_snapshot_incremental": _APPLY_CHANGES_SQL,
        "regional_supplier_volume": """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
  AND c_nationkey = s_nationkey
GROUP BY n_name""",
        "part_profit_by_nation": """
SELECT n_name, year(o_orderdate) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS profit,
       count(*) AS n_items
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%bolt%'
GROUP BY n_name, year(o_orderdate)""",
        "events_funnel": """
WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase') AND user_id IS NOT NULL
),
v AS (
  SELECT user_id, ts_ms, event_id FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS rn
    FROM e WHERE event_type = 'view'
  ) WHERE rn = 1
),
c AS (
  SELECT user_id, ts_ms, event_id FROM (
    SELECT e.user_id, e.ts_ms, e.event_id,
           row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts_ms, e.event_id) AS rn
    FROM e JOIN v USING (user_id)
    WHERE e.event_type = 'click'
      AND (e.ts_ms > v.ts_ms OR (e.ts_ms = v.ts_ms AND e.event_id > v.event_id))
  ) WHERE rn = 1
),
p AS (
  SELECT user_id, ts_ms FROM (
    SELECT e.user_id, e.ts_ms,
           row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts_ms, e.event_id) AS rn
    FROM e JOIN c USING (user_id)
    WHERE e.event_type = 'purchase'
      AND (e.ts_ms > c.ts_ms OR (e.ts_ms = c.ts_ms AND e.event_id > c.event_id))
  ) WHERE rn = 1
)
SELECT v.user_id, v.ts_ms AS view_ts_ms, c.ts_ms AS click_ts_ms, p.ts_ms AS purchase_ts_ms,
       1 + CAST(c.user_id IS NOT NULL AS INT) + CAST(p.user_id IS NOT NULL AS INT) AS stage_reached
FROM v LEFT JOIN c ON v.user_id = c.user_id LEFT JOIN p ON v.user_id = p.user_id""",
        # twin of analytics.cms_type_counts: same md5 depth-salted
        # buckets, cell-wise counters, min-over-depths estimate
        "events_cms_counts": f"""
WITH hashed AS (
  SELECT event_type AS key, d.depth,
         ('0x' || substr(md5(CAST(d.depth AS VARCHAR) || ':' || event_type), 1, 12))::BIGINT % 64 AS bucket
  FROM events
  CROSS JOIN (SELECT unnest(range(4)) AS depth) d
  WHERE event_type IS NOT NULL
),
sketch AS (SELECT depth, bucket, count(*) AS c FROM hashed GROUP BY 1, 2),
truth AS (
  SELECT event_type AS key, count(*) AS true_n FROM events
  WHERE event_type IS NOT NULL GROUP BY 1
),
probes AS (
  SELECT t.key, t.true_n, d.depth,
         ('0x' || substr(md5(CAST(d.depth AS VARCHAR) || ':' || t.key), 1, 12))::BIGINT % 64 AS bucket
  FROM truth t CROSS JOIN (SELECT unnest(range(4)) AS depth) d
)
SELECT p.key, p.true_n, CAST(min(s.c) AS BIGINT) AS est_n,
       CAST(min(s.c) - p.true_n AS BIGINT) AS overcount
FROM probes p JOIN sketch s ON s.depth = p.depth AND s.bucket = p.bucket
GROUP BY p.key, p.true_n""",
        # twin of analytics.retention_cohorts: weekly cohorts, distinct
        # active weeks per user, offset matrix, rate vs offset-0 size
        "events_retention_cohorts": """
WITH e AS (
  SELECT user_id, date_trunc('week', ts) AS wk
  FROM events WHERE user_id IS NOT NULL
),
per_user AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY user_id),
activity AS (
  SELECT DISTINCT e.user_id, p.cohort,
         CAST(date_diff('day', p.cohort, e.wk) / 7 AS INT) AS week_offset
  FROM e JOIN per_user p USING (user_id)
),
matrix AS (
  SELECT cohort, week_offset, count(*) AS n_users
  FROM activity GROUP BY cohort, week_offset
),
sizes AS (SELECT cohort, n_users AS cohort_size FROM matrix WHERE week_offset = 0)
SELECT strftime(m.cohort, '%Y-%m-%d') AS cohort_week, m.week_offset, m.n_users,
       round(CAST(m.n_users AS DOUBLE) / s.cohort_size, 6) AS retention
FROM matrix m JOIN sizes s USING (cohort)""",
        # twin of analytics.event_type_transitions: per-user lead pairs
        # under the same total (ts, event_id) order
        "events_type_transitions": """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events WHERE user_id IS NOT NULL
),
counts AS (
  SELECT from_type, to_type, count(*) AS n_transitions
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
),
marg AS (SELECT from_type, sum(n_transitions) AS t FROM counts GROUP BY 1)
SELECT c.from_type, c.to_type, c.n_transitions,
       round(CAST(c.n_transitions AS DOUBLE) / m.t, 6) AS p_transition
FROM counts c JOIN marg m USING (from_type)""",
        # twin of textstats.pack_sequences: the oracle runs the running
        # sum as one window (fine for DuckDB); the Spark side shards it
        "doc_pack_sequences": rf"""
WITH base AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS h,
         CAST(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS BIGINT) AS n_tokens
  FROM documents
),
off AS (
  SELECT doc_id, h % 8 AS shard, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY h % 8 ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS stream_offset
  FROM base
)
SELECT doc_id, shard, n_tokens, stream_offset,
       stream_offset // 512 AS seq_id,
       stream_offset % 512 AS seq_offset
FROM off""",
        "doc_chunks": rf"""
WITH dw AS (
  SELECT doc_id, regexp_extract_all(text, '{_TOKEN_RE_SQL}') AS w FROM documents
),
st AS (
  SELECT doc_id, w,
         unnest(CASE WHEN len(w) > 0 THEN generate_series(1, len(w), 48)
                ELSE [] END) AS start
  FROM dw
)
SELECT doc_id,
       CAST((start - 1) // 48 AS BIGINT) AS chunk_id,
       CAST(start AS BIGINT) AS start_token,
       CAST(len(w[start:start+63]) AS BIGINT) AS n_chunk_tokens,
       array_to_string(w[start:start+63], ' ') AS chunk_text
FROM st""",
        # twin of textstats.mixture_sample: identical double-arithmetic
        # order ((frac*total)*ws)/n_tokens, identical floor()ed 48-bit
        # keep threshold (a bare cast rounds in DuckDB but truncates in
        # Spark -- floor first removes the difference)
        "corpus_mixture_sample": rf"""
WITH toks AS (
  SELECT lang, source, len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS n FROM documents
),
grp AS (
  SELECT lang, source, CAST(sum(n) AS BIGINT) AS n_tokens FROM toks GROUP BY lang, source
),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS t FROM grp),
w AS (
  SELECT lang, source, n_tokens,
         pow(n_tokens / (SELECT t FROM tot), 0.7) AS pw
  FROM grp
),
z AS (SELECT sum(pw) AS z FROM w),
rates AS (
  SELECT lang, source,
         least(CAST(1.0 AS DOUBLE),
               CAST(0.5 AS DOUBLE) * (SELECT t FROM tot)
               * round(pw / (SELECT z FROM z), 6) / n_tokens) AS p
  FROM w
)
SELECT d.doc_id, d.lang, d.source, d.n_chars, round(r.p, 6) AS keep_rate
FROM documents d JOIN rates r USING (lang, source)
WHERE ('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 12))::BIGINT
      < CAST(floor(r.p * 281474976710656.0) AS BIGINT)""",
        "q1_pricing_summary": """
SELECT *, sum_qty / count_order AS avg_qty, sum_base_price / count_order AS avg_price
FROM (
  SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
         count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
  GROUP BY l_returnflag, l_linestatus
)""",
        "top_revenue_orders": """
WITH rev AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY l_orderkey
)
SELECT o_orderkey, o_custkey, o_orderstatus, revenue, rank FROM (
  SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, rev.revenue,
         row_number() OVER (ORDER BY revenue DESC, o_orderkey) AS rank
  FROM rev JOIN orders o ON rev.l_orderkey = o.o_orderkey
) WHERE rank <= 10""",
        "high_value_customers": """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice >= 100000.0)""",
        "user_set_ops": """
SELECT user_id, 'purchase_and_click' AS cohort FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
  INTERSECT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
)
UNION ALL
SELECT user_id, 'purchase_no_click' FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
  EXCEPT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
)""",
        "revenue_rollup": """
SELECT o_orderstatus, o_orderpriority,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
       count(*) AS n_orders
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
        # Twin of sample_video_frames over the same text-bytes blobs:
        # n_chunks = max(len//1024, 1); every 10th chunk, first 8.
        "media_video_frames": """
WITH v AS (
  SELECT doc_id AS media_id, text,
         greatest(length(text) // 1024, 1) AS n_chunks
  FROM documents
),
frames AS (
  SELECT media_id, text,
         unnest(generate_series(0, n_chunks - 1, 10)) AS chunk_idx
  FROM v
),
capped AS (
  SELECT media_id, chunk_idx, text,
         row_number() OVER (PARTITION BY media_id ORDER BY chunk_idx) AS rn
  FROM frames
)
SELECT media_id,
       CAST(chunk_idx AS INT) AS frame_index,
       sha256(substring(text, chunk_idx * 1024 + 1, 1024)) AS frame_sha256
FROM capped WHERE rn <= 8""",
        # twin of analytics.time_rollup (single-pass hierarchical
        # rollup; level from which buckets are non-null, no
        # grouping_id dialect)
        "events_time_rollup": """
WITH e AS (
  SELECT date_trunc('day', ts) AS d, date_trunc('hour', ts) AS h,
         date_trunc('minute', ts) AS m, value
  FROM events
)
SELECT CASE WHEN m IS NOT NULL THEN 'minute'
            WHEN h IS NOT NULL THEN 'hour'
            WHEN d IS NOT NULL THEN 'day'
            ELSE 'total' END AS level,
       strftime(d, '%Y-%m-%d %H:%M:%S') AS day,
       strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
       strftime(m, '%Y-%m-%d %H:%M:%S') AS minute,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
FROM e GROUP BY ROLLUP(d, h, m)""",
        # twin of analytics.gap_fill_locf (dense per-user day grid,
        # arg-max-by-event-id in-bucket pick, IGNORE NULLS carry)
        "events_gap_fill": """
WITH pb AS (
  SELECT user_id, date_trunc('day', ts) AS b, count(*) AS n_events,
         arg_max(value, event_id) AS v
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT user_id, min(b) AS lo, max(b) AS hi FROM pb GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS b
  FROM bounds
)
SELECT g.user_id AS user_id,
       strftime(g.b, '%Y-%m-%d %H:%M:%S') AS bucket,
       pb.v IS NOT NULL AS observed,
       coalesce(pb.n_events, 0) AS n_events,
       last_value(pb.v IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.b
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
FROM grid g LEFT JOIN pb ON g.user_id = pb.user_id AND g.b = pb.b""",
        # twin of the RIFF-AVI path: frame slicing + header dims
        # restated over the ASCII text (sha256 of each 64-byte slice;
        # dims are the doc-derived ints the avih parser reads back)
        "media_video_frames_riff": """
WITH v AS (
  SELECT doc_id AS media_id, text,
         least(greatest(length(text) // 64, 1), 8) AS n_frames,
         64 + doc_id % 192 AS width, 48 + doc_id % 100 AS height
  FROM documents
), fr AS (
  SELECT media_id, text, n_frames, width, height,
         unnest(generate_series(0, n_frames - 1)) AS frame_index
  FROM v
)
SELECT media_id, CAST(frame_index AS INT) AS frame_index,
       sha256(substring(text, CAST(frame_index * 64 + 1 AS INT), 64)) AS frame_sha256,
       CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       CAST(n_frames AS INT) AS n_frames, 'riff-avi' AS decoder
FROM fr""",
        # Byte-exact blob twin: rebuild the IHDR-valid synthetic PNG
        # (signature + IHDR with doc_id-derived dims + text payload)
        # and recompute sha256/n_bytes over the SAME bytes the Spark
        # side hashes; width/height are the values the IHDR parser
        # reads back
        "media_image_features": """
WITH blob AS (
  SELECT doc_id,
         unhex('89504E470D0A1A0A0000000D49484452')
         || unhex(lpad(to_hex(64 + doc_id % 192), 8, '0'))
         || unhex(lpad(to_hex(64 + (doc_id * 7) % 192), 8, '0'))
         || unhex('080200000000000000')
         || encode(text) AS content,
         64 + doc_id % 192 AS width,
         64 + (doc_id * 7) % 192 AS height
  FROM documents
)
SELECT doc_id AS media_id, sha256(lower(hex(content))) AS sha256_hex,
       octet_length(content) AS n_bytes,
       CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       'ihdr' AS decoder
FROM blob""",
        # Derivation twin of the WAV synth in _q_media_audio_features:
        # recomputes expected decode outputs from doc_id without decoding
        "media_audio_features": """
SELECT doc_id AS media_id,
       CAST(1 + doc_id % 2 AS INT) AS channels,
       CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS INT) AS sample_rate,
       400 + (doc_id % 50) * 8 AS n_samples,
       CAST(400 + (doc_id % 50) * 8 AS DOUBLE)
         / (CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END) AS duration_s,
       CAST(1000 + (doc_id % 20) * 500 AS DOUBLE) / 32768 AS rms,
       'wave' AS decoder
FROM documents""",
        "customer_nation_revenue": """
WITH per_order AS (
  SELECT l_orderkey,
         sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS order_rev
  FROM lineitem GROUP BY l_orderkey
)
SELECT n_name, CAST(sum(order_rev) AS DOUBLE) AS revenue, count(*) AS n_orders
FROM per_order
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name""",
        # twin of analytics.discounted_revenue (Q6 shape: filtered scan
        # + one global decimal-exact sum)
        "discounted_revenue": """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24""",
        # twin of analytics.promo_revenue_share (Q14 shape: conditional
        # numerator rides the same pass as the denominator)
        "promo_revenue_share": """
WITH f AS (
  SELECT CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) AS rev,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
    AND l_shipdate <  TIMESTAMP '1997-10-01'
)
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev END) AS DOUBLE)
                   / CAST(sum(rev) AS DOUBLE), 6) AS promo_revenue_pct
FROM f""",
        # twin of analytics.late_line_priority_mix (Q12 shape: join +
        # CASE conditional aggregation; lateness bucket plays shipmode)
        "late_line_priority_mix": """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN '61-90'
            WHEN date_diff('day', o_orderdate, l_shipdate) <= 120 THEN '91-120'
            ELSE '120+' END AS late_bucket,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE date_diff('day', o_orderdate, l_shipdate) > 60
GROUP BY 1""",
    })

    # shingle-saturation diagnostic: same df frame as the pair oracles
    sql["corpus_shingle_saturation"] = f"""
WITH {_SHINGLE_CTE.strip()},
dfreq AS (SELECT h, count(*) AS df FROM shingle_hashes GROUP BY h)
SELECT CAST(sum(df) AS BIGINT) AS n_shingle_rows,
       count(*) AS vocab_size,
       round(CAST(sum(df) AS DOUBLE) / count(*), 6) AS mean_df,
       round(quantile_cont(df, 0.5), 6) AS p50_df,
       round(quantile_cont(df, 0.9), 6) AS p90_df,
       round(quantile_cont(df, 0.99), 6) AS p99_df,
       max(df) AS max_df,
       round(CAST(sum(CASE WHEN df > 10 THEN df ELSE 0 END) AS DOUBLE)
             / sum(df), 6) AS hot_mass_share
FROM dfreq"""

    # content drift: PSI over the reference half's top-200 words
    sql["corpus_vocab_drift"] = f"""
WITH words AS (
  SELECT doc_id % 2 = 0 AS ref,
         unnest(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS word
  FROM documents
),
counts AS (
  SELECT word,
         sum(CASE WHEN ref THEN 1 ELSE 0 END) AS n_ref,
         sum(CASE WHEN NOT ref THEN 1 ELSE 0 END) AS n_cur
  FROM words GROUP BY word
),
vocab AS (SELECT * FROM counts ORDER BY n_ref DESC, word LIMIT 200),
tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM vocab),
shares AS (
  SELECT word,
         (n_ref + 1) / (tr + 200.0) AS ref_share,
         (n_cur + 1) / (tc + 200.0) AS cur_share
  FROM vocab, tot
),
scored AS (
  SELECT word, round(ref_share, 9) AS ref_share,
         round(cur_share, 9) AS cur_share,
         round((cur_share - ref_share) * ln(cur_share / ref_share), 9)
           AS psi_contribution
  FROM shares
),
total AS (
  SELECT round(CAST(sum(CAST(psi_contribution AS DECIMAL(18,9))) AS DOUBLE),
               9) AS psi_total
  FROM scored
)
SELECT s.word, s.ref_share, s.cur_share, s.psi_contribution, t.psi_total
FROM scored s, total t
ORDER BY psi_contribution DESC, word LIMIT 20"""

    # epoch-shuffle manifest: identical md5 arithmetic, per-(epoch,
    # shard) dense positions under the same (key, doc_id) order
    sql["corpus_epoch_manifest"] = """
WITH tagged AS (
  SELECT e.epoch, d.doc_id,
         ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':e'
                             || CAST(e.epoch AS VARCHAR)), 1, 12))::BIGINT
           AS k
  FROM documents d, (SELECT unnest([0, 1]) AS epoch) e
)
SELECT epoch, CAST(k % 8 AS INTEGER) AS shard,
       CAST(row_number() OVER (
           PARTITION BY epoch, k % 8 ORDER BY k, doc_id) AS BIGINT)
         AS position,
       doc_id
FROM tagged"""

    # margin-based bitext mining: brute cross-segment cosine, decimal
    # kNN sums, one double division -- mirrors bitext_margin_pairs
    sql["embedding_bitext_margin"] = """
WITH ex AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings WHERE label IN (0, 1)
),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS norm FROM ex GROUP BY vec_id),
dots AS (
  SELECT s.vec_id AS src_id, d.vec_id AS dst_id, sum(s.v * d.v) AS dot
  FROM ex s JOIN ex d ON s.ord = d.ord AND s.label = 0 AND d.label = 1
  GROUP BY 1, 2
),
pairs AS (
  SELECT src_id, dst_id,
         round(dot / (ns.norm * nd.norm), 6) AS cos_sim
  FROM dots
  JOIN norms ns ON ns.vec_id = src_id
  JOIN norms nd ON nd.vec_id = dst_id
),
fwd AS (
  SELECT src_id, dst_id, cos_sim FROM (
    SELECT *, row_number() OVER (
        PARTITION BY src_id ORDER BY cos_sim DESC, dst_id) AS r
    FROM pairs) WHERE r <= 4
),
bwd AS (
  SELECT src_id, dst_id, cos_sim FROM (
    SELECT *, row_number() OVER (
        PARTITION BY dst_id ORDER BY cos_sim DESC, src_id) AS r
    FROM pairs) WHERE r <= 4
),
sx AS (
  SELECT src_id, sum(CAST(cos_sim AS DECIMAL(18,6))) AS sxv,
         count(*) AS cx FROM fwd GROUP BY src_id
),
sy AS (
  SELECT dst_id, sum(CAST(cos_sim AS DECIMAL(18,6))) AS syv,
         count(*) AS cy FROM bwd GROUP BY dst_id
),
pool AS (SELECT * FROM fwd UNION SELECT * FROM bwd),
scored AS (
  SELECT p.src_id, p.dst_id, p.cos_sim,
         round(p.cos_sim /
               ((CAST(sx.sxv AS DOUBLE) / sx.cx
                 + CAST(sy.syv AS DOUBLE) / sy.cy) / 2), 6) AS margin
  FROM pool p JOIN sx ON sx.src_id = p.src_id JOIN sy ON sy.dst_id = p.dst_id
)
SELECT src_id, dst_id, cos_sim, margin FROM (
  SELECT *, row_number() OVER (
      PARTITION BY src_id ORDER BY margin DESC, dst_id) AS r
  FROM scored
) WHERE r = 1 AND margin >= 1.0"""

    # kNN label audit: brute all-pairs cosine, deterministic majority
    # (votes desc, label asc) -- mirrors knn_label_audit
    sql["embedding_knn_label_audit"] = """
WITH ex AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS norm FROM ex GROUP BY vec_id),
labels AS (SELECT DISTINCT vec_id, label FROM ex),
dots AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id, sum(a.v * b.v) AS dot
  FROM ex a JOIN ex b ON a.ord = b.ord AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
),
topk AS (
  SELECT * FROM (
    SELECT a_id, b_id,
           round(dot / (na.norm * nb.norm), 6) AS cos_sim,
           row_number() OVER (
             PARTITION BY a_id
             ORDER BY round(dot / (na.norm * nb.norm), 6) DESC, b_id) AS r
    FROM dots
    JOIN norms na ON na.vec_id = a_id
    JOIN norms nb ON nb.vec_id = b_id
  ) WHERE r <= 5
),
votes AS (
  SELECT t.a_id, la.label AS a_label, lb.label AS b_label,
         count(*) AS n_votes
  FROM topk t
  JOIN labels la ON la.vec_id = t.a_id
  JOIN labels lb ON lb.vec_id = t.b_id
  GROUP BY 1, 2, 3
),
best AS (
  SELECT *, row_number() OVER (
      PARTITION BY a_id ORDER BY n_votes DESC, b_label ASC) AS r
  FROM votes
),
agree AS (
  SELECT a_id, coalesce(sum(CASE WHEN b_label = a_label
                                 THEN n_votes END), 0) AS n_agree
  FROM votes GROUP BY a_id
)
SELECT b.a_id AS vec_id, b.a_label AS label, b.b_label AS knn_label,
       b.n_votes, CAST(a.n_agree AS BIGINT) AS n_agree,
       b.b_label <> b.a_label AS mislabeled
FROM best b JOIN agree a ON a.a_id = b.a_id
WHERE b.r = 1"""

    # doc-to-doc tf-idf cosine: same df cap, idf smoothing, 9/12-dp
    # rounding ladder, decimal accumulation, one double division
    sql["doc_tfidf_neighbors"] = r"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS word
  FROM documents
),
tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY 1, 2),
df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM words),
w AS (
  SELECT t.doc_id, t.word,
         round(t.tf * round(ln((nd.n_docs + 1) / (d.df + 1.0)) + 1, 9), 9)
           AS w
  FROM tf t JOIN df d ON d.word = t.word CROSS JOIN nd
  WHERE d.df <= nd.n_docs * 0.8
),
norms AS (
  SELECT doc_id,
         sum(CAST(round(w * w, 12) AS DECIMAL(38,12))) AS n2
  FROM w GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         sum(CAST(round(a.w * b.w, 12) AS DECIMAL(38,12))) AS dot
  FROM w a JOIN w b ON a.word = b.word AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT d.doc_a, d.doc_b,
         round(CAST(d.dot AS DOUBLE)
               / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 6)
           AS cos_sim
  FROM dots d
  JOIN norms na ON na.doc_id = d.doc_a
  JOIN norms nb ON nb.doc_id = d.doc_b
)
SELECT doc_a, doc_b, cos_sim, rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY doc_a ORDER BY cos_sim DESC, doc_b) AS rank
  FROM scored
) WHERE rank <= 5"""

    # iterated BPE trainer: 8 mechanically-unrolled merge rounds
    # (window-parity greedy application -- see _bpe_train_sql)
    sql["corpus_bpe_vocab"] = _bpe_train_sql(8)
    sql["corpus_bpe_encode"] = _bpe_train_sql(8, output="encode")

    # kNN label audit, BUCKETED tier: identical vote tail, candidates
    # restricted to LSH same-bucket pairs (4 planes x 2 OR-tables --
    # the same literal plane weights as the Spark plan)
    sql["embedding_knn_audit_bucketed"] = f"""
WITH ex AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
norms AS (
  SELECT vec_id,
         CASE WHEN sqrt(sum(v * v)) = 0 THEN 1.0
              ELSE sqrt(sum(v * v)) END AS norm
  FROM ex GROUP BY vec_id
),
labels AS (SELECT DISTINCT vec_id, label FROM ex),
cand AS ({_hyperplane_candidates_sql(4, 2)}),
dots AS (
  SELECT c.a_id, c.b_id, sum(a.v * b.v) AS dot
  FROM cand c
  JOIN ex a ON a.vec_id = c.a_id
  JOIN ex b ON b.vec_id = c.b_id AND b.ord = a.ord
  GROUP BY 1, 2
),
topk AS (
  SELECT * FROM (
    SELECT d.a_id, d.b_id,
           row_number() OVER (
             PARTITION BY d.a_id
             ORDER BY round(d.dot / (na.norm * nb.norm), 6) DESC,
                      d.b_id) AS r
    FROM dots d
    JOIN norms na ON na.vec_id = d.a_id
    JOIN norms nb ON nb.vec_id = d.b_id
  ) WHERE r <= 5
),
votes AS (
  SELECT t.a_id, la.label AS a_label, lb.label AS b_label,
         count(*) AS n_votes
  FROM topk t
  JOIN labels la ON la.vec_id = t.a_id
  JOIN labels lb ON lb.vec_id = t.b_id
  GROUP BY 1, 2, 3
),
best AS (
  SELECT *, row_number() OVER (
      PARTITION BY a_id ORDER BY n_votes DESC, b_label ASC) AS r
  FROM votes
),
agree AS (
  SELECT a_id, coalesce(sum(CASE WHEN b_label = a_label
                                 THEN n_votes END), 0) AS n_agree
  FROM votes GROUP BY a_id
)
SELECT b.a_id AS vec_id, b.a_label AS label, b.b_label AS knn_label,
       b.n_votes, CAST(a.n_agree AS BIGINT) AS n_agree,
       b.b_label <> b.a_label AS mislabeled
FROM best b JOIN agree a ON a.a_id = b.a_id
WHERE b.r = 1"""

    # bitext margin mining, BUCKETED tier: candidate pairs from shared
    # hyperplane buckets restricted to (src label 0, dst label 1), the
    # same fwd/bwd shortlist + union-pool margin tail as the exact form
    sql["embedding_bitext_margin_bucketed"] = f"""
WITH ex AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
norms AS (
  SELECT vec_id,
         CASE WHEN sqrt(sum(v * v)) = 0 THEN 1.0
              ELSE sqrt(sum(v * v)) END AS norm
  FROM ex GROUP BY vec_id
),
labels AS (SELECT DISTINCT vec_id, label FROM ex),
cand0 AS ({_hyperplane_candidates_sql(4, 2)}),
cand AS (
  SELECT c.a_id AS src_id, c.b_id AS dst_id
  FROM cand0 c
  JOIN labels la ON la.vec_id = c.a_id AND la.label = 0
  JOIN labels lb ON lb.vec_id = c.b_id AND lb.label = 1
),
dots AS (
  SELECT c.src_id, c.dst_id, sum(a.v * b.v) AS dot
  FROM cand c
  JOIN ex a ON a.vec_id = c.src_id
  JOIN ex b ON b.vec_id = c.dst_id AND b.ord = a.ord
  GROUP BY 1, 2
),
pairs AS (
  SELECT src_id, dst_id,
         round(dot / (ns.norm * nd.norm), 6) AS cos_sim
  FROM dots
  JOIN norms ns ON ns.vec_id = src_id
  JOIN norms nd ON nd.vec_id = dst_id
),
fwd AS (
  SELECT src_id, dst_id, cos_sim FROM (
    SELECT *, row_number() OVER (
        PARTITION BY src_id ORDER BY cos_sim DESC, dst_id) AS r
    FROM pairs) WHERE r <= 4
),
bwd AS (
  SELECT src_id, dst_id, cos_sim FROM (
    SELECT *, row_number() OVER (
        PARTITION BY dst_id ORDER BY cos_sim DESC, src_id) AS r
    FROM pairs) WHERE r <= 4
),
sx AS (
  SELECT src_id, sum(CAST(cos_sim AS DECIMAL(18,6))) AS sxv,
         count(*) AS cx FROM fwd GROUP BY src_id
),
sy AS (
  SELECT dst_id, sum(CAST(cos_sim AS DECIMAL(18,6))) AS syv,
         count(*) AS cy FROM bwd GROUP BY dst_id
),
pool AS (SELECT * FROM fwd UNION SELECT * FROM bwd),
scored AS (
  SELECT p.src_id, p.dst_id, p.cos_sim,
         round(p.cos_sim /
               ((CAST(sx.sxv AS DOUBLE) / sx.cx
                 + CAST(sy.syv AS DOUBLE) / sy.cy) / 2), 6) AS margin
  FROM pool p JOIN sx ON sx.src_id = p.src_id JOIN sy ON sy.dst_id = p.dst_id
)
SELECT src_id, dst_id, cos_sim, margin FROM (
  SELECT *, row_number() OVER (
      PARTITION BY src_id ORDER BY margin DESC, dst_id) AS r
  FROM scored
) WHERE r = 1 AND margin >= 1.0"""

    # streaming content-drift monitor == the batch gate by construction
    sql["corpus_vocab_drift_stream"] = sql["corpus_vocab_drift"]

    # per-source contamination rollup over the verified per-doc oracle
    sql["corpus_contamination_by_source"] = f"""
WITH scored AS ({sql["doc_contamination"]})
SELECT d.source, count(*) AS n_docs,
       CAST(sum(CASE WHEN s.contamination >= 0.5 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
       round(CAST(sum(CAST(s.contamination AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS mean_contamination
FROM scored s JOIN documents d ON d.doc_id = s.doc_id
GROUP BY d.source"""
    # IVF list balance over the verified k-means assignment
    sql["ann_ivf_list_balance"] = f"""
WITH asg AS ({sql["embedding_kmeans"]}),
per AS (SELECT centroid_id, count(*) AS n_vectors FROM asg GROUP BY 1),
tot AS (SELECT sum(n_vectors) AS t, count(*) AS c FROM per)
SELECT per.centroid_id, per.n_vectors,
       round(per.n_vectors / CAST(tot.t AS DOUBLE), 6) AS share,
       round(per.n_vectors * tot.c / CAST(tot.t AS DOUBLE), 6)
         AS load_factor
FROM per CROSS JOIN tot"""

    # twin of textstats.encoding_anomalies over the planted-corruption
    # view (q_corpus._corrupted_text_view)
    sql["doc_encoding_anomalies"] = """
WITH corrupted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 3 THEN chr(195) || chr(169) || 'ber ' || text
              WHEN doc_id % 29 = 7 THEN text || ' ' || chr(65533)
              WHEN doc_id % 37 = 5 THEN text || chr(7)
              ELSE text END AS text
  FROM documents
),
counted AS (
  SELECT doc_id,
         length(text) - length(regexp_replace(text, chr(65533), '', 'g'))
           AS n_replacement,
         length(text) - length(regexp_replace(text,
           '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')) AS n_control,
         length(text) - length(regexp_replace(text,
           '[' || chr(195) || chr(194) || ']|' || chr(226) || chr(8364),
           '', 'g')) AS n_mojibake_marks,
         length(regexp_replace(text, '[^\\x20-\\x7E]', '', 'g'))
           / CAST(length(text) AS DOUBLE) AS ascii_ratio
  FROM corrupted
)
SELECT doc_id, n_replacement, n_control, n_mojibake_marks, ascii_ratio,
       CASE WHEN n_replacement > 0 THEN 'REPLACEMENT'
            WHEN n_control > 0 THEN 'CONTROL'
            WHEN n_mojibake_marks > 0 THEN 'MOJIBAKE'
            ELSE 'CLEAN' END AS verdict
FROM counted"""

    # twin of textstats.code_switch_profile over the planted
    # code-switch view (q_corpus._q_code_switch)
    _fr_run = ("le la les et des un une le la les " * 4).strip()
    sql["doc_code_switch"] = f"""
WITH mixed AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 2 THEN text || ' {_fr_run}'
              ELSE text END AS text
  FROM documents
),
words AS (
  SELECT doc_id, (u.p - 1) // 20 AS seg, u.w AS word
  FROM mixed,
       UNNEST(list_transform(string_split(text, ' '),
                             (x, i) -> {{'w': x, 'p': i}})) AS t(u)
),
segs AS (
  SELECT doc_id, seg,
         sum(CASE WHEN word IN ('the','a','and','of','to','in','is')
                  THEN 1 ELSE 0 END) AS en_hits,
         sum(CASE WHEN word IN ('le','la','et','les','des','un','une')
                  THEN 1 ELSE 0 END) AS fr_hits
  FROM words GROUP BY doc_id, seg
),
tagged AS (
  SELECT doc_id, seg,
         CASE WHEN en_hits = 0 AND fr_hits = 0 THEN 'unknown'
              WHEN en_hits >= fr_hits THEN 'en'
              ELSE 'fr' END AS lang
  FROM segs
),
flagged AS (
  SELECT doc_id, lang,
         CASE WHEN lang <> 'unknown'
               AND last_value(CASE WHEN lang <> 'unknown' THEN lang END
                              IGNORE NULLS) OVER (
                 PARTITION BY doc_id ORDER BY seg
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 IS NOT NULL
               AND lang <> last_value(CASE WHEN lang <> 'unknown' THEN lang
                                      END IGNORE NULLS) OVER (
                 PARTITION BY doc_id ORDER BY seg
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS is_switch
  FROM tagged
),
per_doc AS (
  SELECT doc_id, count(*) AS n_segments,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
         CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
         CAST(sum(CASE WHEN lang = 'unknown' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unknown,
         CAST(sum(is_switch) AS BIGINT) AS n_switches
  FROM flagged GROUP BY doc_id
)
SELECT doc_id, n_segments, n_en, n_fr, n_unknown, n_switches,
       CASE WHEN n_en = 0 AND n_fr = 0 THEN 'unknown'
            WHEN n_en >= n_fr THEN 'en'
            ELSE 'fr' END AS dominant_lang,
       n_switches > 0 AS code_switched
FROM per_doc"""

    # twin of similarity.pca_power_top1: the three power iterations
    # unrolled with the identical EXACT-DECIMAL contract -- inputs
    # quantized to DECIMAL(12,6) once, every cross-row sum an exact
    # decimal aggregate (order-independent), rounding in decimal
    # (HALF_UP matches the JVM), one double division / sqrt per
    # quantity on identical operands.  Every CTE is MATERIALIZED:
    # DuckDB default-inlines CTE references, and the iteration chain
    # references each predecessor several times, so inlining re-expands
    # the whole prefix per reference -- exponential blow-up (the
    # un-materialized form ran >500 s; materialized, <1 s at sf0.01).
    def _pca_iter(t: int) -> str:
        return f"""
muv{t} AS MATERIALIZED (
  SELECT sum(m.mud * v.vald) AS muv
  FROM pmu m JOIN pv{t} v USING (ord)
),
ps{t} AS MATERIALIZED (
  SELECT e.vec_id,
         CAST(round(sum(e.vd * v.vald) - (SELECT muv FROM muv{t}), 6)
              AS DECIMAL(12,6)) AS sd
  FROM pex e JOIN pv{t} v USING (ord)
  GROUP BY e.vec_id
),
pms{t} AS MATERIALIZED (
  SELECT round(CAST(sum(sd) AS DOUBLE) / (SELECT n FROM pn), 6) AS ms
  FROM ps{t}
),
pw{t} AS MATERIALIZED (
  SELECT e.ord, CAST(sum(e.vd * s.sd) AS DOUBLE) AS wsum
  FROM pex e JOIN ps{t} s USING (vec_id)
  GROUP BY e.ord
),
pwc{t} AS MATERIALIZED (
  SELECT w.ord,
         CAST(round(w.wsum / (SELECT n FROM pn)
               - CAST(m.mud AS DOUBLE) * (SELECT ms FROM pms{t}), 6)
              AS DECIMAL(12,6)) AS wd
  FROM pw{t} w JOIN pmu m USING (ord)
),
pnm{t} AS MATERIALIZED (
  SELECT round(sqrt(CAST(sum(wd * wd) AS DOUBLE)), 9) AS nm FROM pwc{t}
),
pv{t + 1} AS MATERIALIZED (
  SELECT ord,
         CAST(round(CAST(wd AS DOUBLE) / (SELECT nm FROM pnm{t}), 6)
              AS DECIMAL(12,6)) AS vald
  FROM pwc{t}
)"""

    sql["embedding_pca_power"] = (
        """
WITH pex AS MATERIALIZED (
  SELECT vec_id, ord,
         CAST(round(v, 6) AS DECIMAL(12,6)) AS vd
  FROM (
    SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
           unnest(embedding)::DOUBLE AS v
    FROM embeddings)
),
pn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
pmu AS MATERIALIZED (
  SELECT ord,
         CAST(round(CAST(sum(vd) AS DOUBLE) / (SELECT n FROM pn), 6)
              AS DECIMAL(12,6)) AS mud
  FROM pex GROUP BY ord
),
pv0 AS MATERIALIZED (
  SELECT ord, CAST(0.125 AS DECIMAL(12,6)) AS vald FROM pmu
),"""
        + ",".join(_pca_iter(t) for t in range(3))
        + """,
muvf AS MATERIALIZED (
  SELECT sum(m.mud * v.vald) AS muv
  FROM pmu m JOIN pv3 v USING (ord)
),
psf AS MATERIALIZED (
  SELECT e.vec_id,
         CAST(round(sum(e.vd * v.vald) - (SELECT muv FROM muvf), 6)
              AS DECIMAL(12,6)) AS sd
  FROM pex e JOIN pv3 v USING (ord)
  GROUP BY e.vec_id
),
plam AS (
  SELECT round(CAST(sum(sd * sd) AS DOUBLE) / (SELECT n FROM pn), 6)
    AS eigenvalue
  FROM psf
),
pdist AS MATERIALIZED (
  SELECT e.vec_id, sum((e.vd - m.mud) * (e.vd - m.mud)) AS d
  FROM pex e JOIN pmu m USING (ord)
  GROUP BY e.vec_id
),
ptv AS (
  SELECT round(CAST(sum(d) AS DOUBLE) / (SELECT n FROM pn), 6)
    AS total_variance
  FROM pdist
)
SELECT v.ord, CAST(v.vald AS DOUBLE) AS loading, l.eigenvalue,
       t.total_variance,
       l.eigenvalue / t.total_variance AS explained_share
FROM pv3 v, plam l, ptv t"""
    )

    # twin of similarity.embedding_dim_stats (integer-scaled moments,
    # fixed double algebra -- the decimal n*q - s^2 form overflows
    # precision 38 and engines truncate differently)
    sql["embedding_dim_stats"] = """
WITH ex AS (
  SELECT ord,
         CAST(CAST(round(v, 6) AS DECIMAL(12,6)) * 1000000 AS BIGINT) AS vi
  FROM (
    SELECT generate_subscripts(embedding, 1) AS ord,
           unnest(embedding)::DOUBLE AS v
    FROM embeddings)
),
agg AS (
  SELECT ord, count(*) AS n, sum(vi) AS s,
         sum(CAST(vi * vi AS DECIMAL(38,0))) AS q,
         min(vi) / 1000000.0 AS min_v, max(vi) / 1000000.0 AS max_v
  FROM ex GROUP BY ord
)
SELECT ord, n,
       CAST(s AS DOUBLE) / n / 1e6 AS mean,
       sqrt(CAST(q AS DOUBLE) / n / 1e12
            - (CAST(s AS DOUBLE) / n / 1e6) * (CAST(s AS DOUBLE) / n / 1e6))
         AS std,
       min_v, max_v,
       sqrt(CAST(q AS DOUBLE) / n / 1e12
            - (CAST(s AS DOUBLE) / n / 1e6) * (CAST(s AS DOUBLE) / n / 1e6))
         < 1e-6 AS is_dead
FROM agg"""

    # twin of multimodal.audio_perceptual_pairs over the synthesized
    # windowed-PCM fixture: the hash recomputed from amplitude
    # ARITHMETIC (never bytes) -- constant windows make rms == A
    # IEEE-exactly, so the contour comparison is engine-identical
    sql["media_audio_perceptual_dup"] = """
WITH ids AS (
  SELECT doc_id AS d, doc_id AS media_id, 1 AS div FROM documents
  UNION ALL
  SELECT doc_id, doc_id + 900000, 2 FROM documents WHERE doc_id % 17 = 4
),
win AS (
  SELECT media_id,
         ww.w,
         CAST((500 + 400 * ((((d + 1) * (ww.w + 3)) % 97
                             + ((d + 11) * (ww.w + 5)) % 89) % 8))
              // div AS DOUBLE) AS a
  FROM ids, (SELECT unnest(range(0, 16)) AS w) ww
),
med AS (
  SELECT media_id, quantile_cont(a, 0.5) AS m FROM win GROUP BY media_id
),
h AS (
  SELECT win.media_id,
         CAST(sum(CASE WHEN win.a > med.m THEN 1 << win.w ELSE 0 END)
              AS BIGINT) AS phash
  FROM win JOIN med USING (media_id)
  GROUP BY win.media_id
)
SELECT a.media_id AS media_id_a, b.media_id AS media_id_b, a.phash
FROM h a JOIN h b ON a.phash = b.phash AND a.media_id < b.media_id"""

    # twin of dedup.survivorship_conflicts (composes the shared
    # recursive cluster fragment -- same graph both policies read)
    sql["dedup_survivorship_conflicts"] = """
WITH cl AS (
""" + _dedup_clusters_sql() + """
),
m AS (
  SELECT c.cluster_id, d.doc_id, d.n_chars
  FROM cl c JOIN documents d ON d.doc_id = c.doc_id
),
best AS (
  SELECT cluster_id, doc_id AS best_id, n_chars AS best_chars FROM (
    SELECT *, row_number() OVER (
        PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rn
    FROM m) WHERE rn = 1
),
agg AS (
  SELECT cluster_id, count(*) AS n_members,
         max(CASE WHEN doc_id = cluster_id THEN n_chars END)
           AS canonical_chars
  FROM m GROUP BY cluster_id
)
SELECT a.cluster_id, a.cluster_id AS canonical_id, b.best_id,
       a.n_members, a.canonical_chars, b.best_chars
FROM agg a JOIN best b USING (cluster_id)
WHERE b.best_id <> a.cluster_id"""

    # twin of similarity.pq_distortion (exact-decimal squared errors
    # against the per-subspace unrolled-kmeans codewords)
    sql["embedding_pq_distortion"] = _pq_distortion_sql()
