"""DuckDB oracle SQL, part 3/3 (split from registry.py,
round 7).  ASSEMBLY ORDER IS LOAD-BEARING: later entries compose
earlier ones via f-strings, so registry.oracle_sql() must call
the three add() builders in file order."""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from .oracle_ctes import *  # noqa: F401,F403


def add(sql: dict) -> None:
    sql.update({
        # twin of analytics.volume_shipping (Q7 shape: nation-pair
        # disjunctive residual after broadcast dimension joins)
        "volume_shipping": """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY 1, 2, 3""",
        # twin of analytics.nation_market_share (Q8 shape: share of one
        # supplier nation within one customer region, per order year)
        "nation_market_share": """
WITH j AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) AS rev,
         sn.n_name = 'NATION_3' AS is_target
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
)
SELECT o_year,
       round(CAST(sum(CASE WHEN is_target THEN rev END) AS DOUBLE)
             / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share
FROM j GROUP BY o_year""",
        # twin of analytics.returned_item_losses (Q10 shape: returned
        # slice aggregated per customer, dimensions after, top-20 by
        # (revenue desc, custkey))
        "returned_item_losses": """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1998-01-01'
    AND o_orderdate <  TIMESTAMP '1999-01-01'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, revenue, n_name, c_acctbal
FROM per_cust
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20""",
        # twin of analytics.important_parts (Q11 shape: per-part value
        # vs a broadcast scalar -- 1.5x the average part, so the cut
        # survives catalog growth)
        "important_parts": """
WITH li AS (
  SELECT l_partkey,
         CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) AS rev
  FROM lineitem
), per_part AS (
  SELECT l_partkey, sum(rev) AS vd FROM li GROUP BY l_partkey
)
SELECT p_partkey, p_name, CAST(vd AS DOUBLE) AS part_value
FROM per_part
JOIN part ON l_partkey = p_partkey
WHERE CAST(vd AS DOUBLE) >
      (SELECT CAST(sum(vd) AS DOUBLE) / count(*) FROM per_part) * 1.5""",
        # twin of analytics.top_revenue_supplier (Q15 shape: argmax via
        # 1-row max broadcast back onto the per-supplier aggregate)
        "top_revenue_supplier": """
WITH per_supp AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT max(r) FROM per_supp)""",
        # twin of analytics.min_cost_supplier_per_part (Q2 shape:
        # groupBy+join-back argmin; unit cost = decimal sums divided
        # once, rounded to 4, so the equality key is exact)
        "min_cost_supplier_per_part": """
WITH rs AS (
  SELECT n_nationkey, n_name FROM nation
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), s AS (
  SELECT s_suppkey, s_name, n_name FROM supplier
  JOIN rs ON s_nationkey = n_nationkey
), ps AS (
  SELECT l_partkey, l_suppkey,
         (CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) * 10000)
           // CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT) AS unit_cost_e4
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM s)
  GROUP BY l_partkey, l_suppkey
), mn AS (
  SELECT l_partkey AS pk, min(unit_cost_e4) AS m FROM ps GROUP BY l_partkey
)
SELECT ps.l_partkey AS p_partkey, s.s_suppkey, s.s_name, s.n_name, ps.unit_cost_e4
FROM ps
JOIN mn ON ps.l_partkey = mn.pk AND ps.unit_cost_e4 = mn.m
JOIN s  ON ps.l_suppkey = s.s_suppkey
ORDER BY unit_cost_e4 ASC, p_partkey ASC, s_suppkey ASC
LIMIT 100""",
        # twin of analytics.excess_quantity_suppliers (Q20 shape:
        # part-name semi chain -> per-supplier qty vs a global-share
        # scalar)
        "excess_quantity_suppliers": """
WITH li AS (
  SELECT l_suppkey, CAST(l_quantity AS DECIMAL(12,2)) AS q
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
), per_supp AS (
  SELECT l_suppkey, sum(q) AS sq FROM li GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(sq AS DOUBLE) AS ship_qty
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE CAST(sq AS DOUBLE) > (SELECT CAST(sum(q) AS DOUBLE) FROM li) * 0.002""",
        # twin of analytics.idle_rich_customers (Q22 shape: broadcast
        # scalar average + left-anti dormancy test, per nation)
        "idle_rich_customers": """
SELECT c_nationkey, count(*) AS numcust,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE), 4) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey""",
        # twin of analytics.shipping_priority (Q3 shape: segment dim
        # semi-join, per-order revenue below the join, top-10)
        "shipping_priority": """
WITH rev AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
  FROM lineitem
  WHERE l_shipdate > TIMESTAMP '1998-06-01'
  GROUP BY l_orderkey
)
SELECT l_orderkey, revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
FROM rev
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE o_orderdate < TIMESTAMP '1998-06-01'
  AND c_mktsegment = 'BUILDING'
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10""",
        # twin of analytics.supplier_part_counts (Q16 shape: distinct
        # shipping pairs play partsupp, negative balance plays the
        # complaint flag, NOT IN decorrelated to an anti join)
        "supplier_part_counts": """
WITH rel AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
)
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM rel
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
GROUP BY p_brand, p_type, p_size""",
        # twin of analytics.small_quantity_revenue (Q17 shape:
        # correlated per-part average decorrelated to groupBy +
        # join-back; integral-double quantities keep the cut exact)
        "small_quantity_revenue": """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23')
), cut AS (
  SELECT l_partkey AS pk, avg(l_quantity) * 0.2 AS c FROM li GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 4)
         AS avg_yearly
FROM li JOIN cut ON l_partkey = pk AND l_quantity < c""",
        # twin of analytics.brand_bracket_revenue (Q19 shape: one
        # partkey equi-join, the bracket disjunction as residual)
        "brand_bracket_revenue": """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity > 1  AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity > 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
       AND l_quantity > 20 AND l_quantity <= 30)""",
        # twin of textstats.source_reputation (domain-level curation
        # signal; ratio-of-sums so the double is order-independent)
        "corpus_source_reputation": rf"""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         sum(len(regexp_extract_all(text, '{_EN_RE}'))) AS s,
         sum(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}'))) AS w,
         sum(len(regexp_extract_all(text, '[.,!?;:]'))) AS p,
         sum(length(text)) AS l
  FROM documents GROUP BY source
)
SELECT source, n_docs,
       round(CAST(s AS DOUBLE) / w, 6) AS stop_rate,
       round(CAST(p AS DOUBLE) / l, 6) AS punct_rate,
       round(CAST(s AS DOUBLE) / w, 6) >= 0.065 AS reputable
FROM per""",
        # twin of textstats.filter_by_source_reputation (the per-source
        # verdict broadcast back onto the corpus)
        "doc_source_filter": rf"""
WITH per AS (
  SELECT source,
         sum(len(regexp_extract_all(text, '{_EN_RE}'))) AS s,
         sum(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}'))) AS w
  FROM documents GROUP BY source
), rep AS (
  SELECT source, round(CAST(s AS DOUBLE) / w, 6) AS stop_rate FROM per
  WHERE round(CAST(s AS DOUBLE) / w, 6) >= 0.065
)
SELECT doc_id, documents.source AS source, stop_rate
FROM documents JOIN rep ON documents.source = rep.source""",
        # twin of analytics.burst_minutes (integer-exact moments over
        # the minute counts, one division each, IEEE sqrt)
        "events_burst_minutes": """
WITH pm AS (
  SELECT date_trunc('minute', ts) AS m, count(*) AS n_events
  FROM events GROUP BY 1
), st AS (
  SELECT count(*) AS k, sum(n_events) AS s,
         sum(n_events * n_events) AS ss
  FROM pm
), mo AS (
  SELECT CAST(s AS DOUBLE) / k AS mean,
         sqrt(CAST(ss AS DOUBLE) / k
              - (CAST(s AS DOUBLE) / k) * (CAST(s AS DOUBLE) / k)) AS std
  FROM st
)
SELECT strftime(m, '%Y-%m-%d %H:%M:%S') AS minute, n_events,
       round(CASE WHEN std > 0 THEN (n_events - mean) / std
                  ELSE 0.0 END, 6) AS zscore,
       round(CASE WHEN std > 0 THEN (n_events - mean) / std
                  ELSE 0.0 END, 6) > 3.0 AS is_burst
FROM pm, mo""",
        # twin of analytics.value_anomalies (exact-sum moments: mean
        # and variance from decimal sums divided once; IEEE sqrt is
        # correctly rounded, so z-scores match bit-for-bit)
        "events_value_anomalies": """
WITH stats AS (
  SELECT event_type, count(*) AS n,
         sum(CAST(value AS DECIMAL(18,6))) AS s,
         sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS ss
  FROM events GROUP BY event_type
), m AS (
  SELECT event_type,
         CAST(s AS DOUBLE) / n AS mean,
         sqrt(CAST(ss AS DOUBLE) / n
              - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS std
  FROM stats
)
SELECT event_id, e.event_type AS event_type, value,
       round(CASE WHEN std > 0 THEN (value - mean) / std
                  ELSE 0.0 END, 6) AS zscore,
       abs(round(CASE WHEN std > 0 THEN (value - mean) / std
                      ELSE 0.0 END, 6)) > 3.0 AS is_anomaly
FROM events e JOIN m ON e.event_type = m.event_type""",
        # twin of analytics.hdr_quantiles: identical integer bucket
        # arithmetic (centi-units, bin()-digit octaves, shifts), so the
        # sketch, the picked buckets, and the midpoint estimates match
        # bit-for-bit; the exact side is the R-7 percentile both
        # engines compute identically (property-tested)
        # twin of _q_events_hdr_stream: the sketch contract alone --
        # identical bucket arithmetic, complete-mode state == batch hist
        # twin of analytics.winsorized_values: 1e-9-pre-rounded R-7
        # bounds published at 6 dp, clip against the ROUNDED bounds
        # twin of analytics.bootstrap_mean_price: same md5-48 uniform,
        # same literal Poisson(1) CDF thresholds, exact decimal sums
        "lineitem_bootstrap_mean": """
WITH reps AS (
  SELECT l_orderkey, l_linenumber, l_extendedprice, i AS replicate
  FROM lineitem, (SELECT unnest(range(1, 33)) AS i) t
),
uni AS (
  SELECT replicate, l_extendedprice AS p,
         ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
                             CAST(l_linenumber AS VARCHAR) || '_' ||
                             CAST(replicate AS VARCHAR)), 1, 12))::BIGINT
           / 281474976710656.0 AS u
  FROM reps
),
weighted AS (
  SELECT replicate, CASE WHEN u < 0.36787944117144233 THEN 0 WHEN u < 0.7357588823428847 THEN 1 WHEN u < 0.9196986029286058 THEN 2 WHEN u < 0.9810118431238462 THEN 3 WHEN u < 0.9963401531726563 THEN 4 WHEN u < 0.9994058151824183 THEN 5 ELSE 6 END AS w, p FROM uni
),
boot AS (
  SELECT replicate, CAST(sum(w) AS BIGINT) AS n_eff,
         round(CAST(sum(w * p) AS DOUBLE) / sum(w), 6) AS mean_price
  FROM weighted GROUP BY replicate
),
point AS (
  SELECT 0 AS replicate, count(*) AS n_eff,
         round(CAST(sum(l_extendedprice) AS DOUBLE) / count(*), 6) AS mean_price
  FROM lineitem
)
SELECT * FROM point UNION ALL SELECT * FROM boot""",
        "events_winsorized": """
WITH b AS (
  SELECT event_type,
         round(round(quantile_cont(value, 0.01), 9), 6) AS lo_bound,
         round(round(quantile_cont(value, 0.99), 9), 6) AS hi_bound
  FROM events WHERE value IS NOT NULL GROUP BY 1
)
SELECT event_id, e.event_type AS event_type, value, lo_bound, hi_bound,
       least(greatest(value, lo_bound), hi_bound) AS value_winsorized,
       (value < lo_bound OR value > hi_bound) AS was_clipped
FROM events e JOIN b ON b.event_type = e.event_type
WHERE value IS NOT NULL""",
        # twin of analytics.ab_test_welch: same md5-parity arm split,
        # same exact conditional sums, same double op order
        "events_ab_test": """
WITH base AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT % 2 AS arm,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events WHERE value IS NOT NULL
),
agg AS (
  SELECT event_type,
         count(*) FILTER (WHERE arm = 0) AS n_a,
         sum(v)   FILTER (WHERE arm = 0) AS s_a,
         sum(v*v) FILTER (WHERE arm = 0) AS ss_a,
         count(*) FILTER (WHERE arm = 1) AS n_b,
         sum(v)   FILTER (WHERE arm = 1) AS s_b,
         sum(v*v) FILTER (WHERE arm = 1) AS ss_b
  FROM base GROUP BY event_type
),
m AS (
  SELECT event_type, n_a, n_b,
         CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
         CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
         (CAST(ss_a AS DOUBLE) / CAST(n_a AS DOUBLE)
            - (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
              * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)))
           * (CAST(n_a AS DOUBLE) / (CAST(n_a AS DOUBLE) - 1.0)) AS var_a,
         (CAST(ss_b AS DOUBLE) / CAST(n_b AS DOUBLE)
            - (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
              * (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
           * (CAST(n_b AS DOUBLE) / (CAST(n_b AS DOUBLE) - 1.0)) AS var_b
  FROM agg WHERE n_a > 1 AND n_b > 1
),
k AS (
  SELECT event_type, n_a, n_b, mean_a, mean_b,
         var_a / CAST(n_a AS DOUBLE) AS sa,
         var_b / CAST(n_b AS DOUBLE) AS sb
  FROM m
)
SELECT event_type, n_a, n_b,
       round(mean_a, 6) AS mean_a,
       round(mean_b, 6) AS mean_b,
       round(mean_a - mean_b, 6) AS mean_diff,
       round(CASE WHEN sa + sb > 0
                  THEN (mean_a - mean_b) / sqrt(sa + sb) ELSE 0.0 END, 6) AS t_stat,
       round(CASE WHEN sa > 0 OR sb > 0
                  THEN ((sa + sb) * (sa + sb))
                       / (sa * sa / (CAST(n_a AS DOUBLE) - 1.0)
                          + sb * sb / (CAST(n_b AS DOUBLE) - 1.0))
                  ELSE 0.0 END, 6) AS df
FROM k""",
        # twin of analytics.value_trend_ols: exact sufficient
        # statistics, double combination in the same op order
        "events_value_trend": """
WITH base AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS x,
         CAST(value AS DECIMAL(18,6)) AS y
  FROM events WHERE value IS NOT NULL
),
agg AS (
  SELECT event_type, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy,
         sum(CAST(x AS DECIMAL(10,0)) * y) AS sxy
  FROM base GROUP BY event_type
),
k AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
         CAST(sy AS DOUBLE) AS syd,
         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny
  FROM agg
)
SELECT event_type, n,
       round(CASE WHEN den > 0 THEN num / den ELSE 0.0 END, 6) AS slope_per_hour,
       round((syd - (CASE WHEN den > 0 THEN num / den ELSE 0.0 END) * sxd) / nd,
             6) AS intercept,
       round(CASE WHEN den > 0 AND deny > 0
                  THEN (num / (sqrt(den) * sqrt(deny)))
                       * (num / (sqrt(den) * sqrt(deny)))
                  ELSE 0.0 END, 6) AS r2
FROM k""",
        # twin of analytics.cusum_changepoints: running deviation sum
        # over the minute-count frame, arg-max via a rank window
        "events_cusum_changepoints": """
WITH pm AS (
  SELECT event_type, date_trunc('minute', ts) AS m, count(*) AS c
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean,
         count(*) AS n_minutes
  FROM pm GROUP BY event_type
),
walked AS (
  SELECT pm.event_type AS event_type, m,
         round(sum(CAST(c AS DOUBLE) - mean)
                 OVER (PARTITION BY pm.event_type ORDER BY m
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               6) AS cusum
  FROM pm JOIN st ON st.event_type = pm.event_type
),
ranked AS (
  SELECT event_type, m, cusum,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(cusum) DESC, m ASC) AS rn
  FROM walked
)
SELECT r.event_type AS event_type,
       strftime(m, '%Y-%m-%d %H:%M:%S') AS change_minute,
       cusum AS cusum_at_peak, n_minutes
FROM ranked r JOIN st ON st.event_type = r.event_type
WHERE rn = 1""",
        # twin of analytics.basket_brand_pairs
        "lineitem_basket_pairs": """
WITH ob AS (
  SELECT DISTINCT l_orderkey AS o, p_brand AS b
  FROM lineitem JOIN part ON p_partkey = l_partkey
),
pairs AS (
  SELECT a.b AS brand_a, bb.b AS brand_b, count(*) AS n_orders_both
  FROM ob a JOIN ob bb ON a.o = bb.o AND a.b < bb.b
  GROUP BY 1, 2 HAVING count(*) >= 2
),
marg AS (SELECT b, count(*) AS nb FROM ob GROUP BY b),
no AS (SELECT count(DISTINCT o) AS n_orders FROM ob)
SELECT brand_a, brand_b, n_orders_both,
       round(CAST(n_orders_both AS DOUBLE) * CAST(n_orders AS DOUBLE)
               / (CAST(ma.nb AS DOUBLE) * CAST(mb.nb AS DOUBLE)), 6) AS lift
FROM pairs JOIN marg ma ON ma.b = brand_a
           JOIN marg mb ON mb.b = brand_b
           CROSS JOIN no""",
        # twin of similarity.hard_negative_pairs: the brute-force topk
        # CTEs (k=10), then the same rank-1 positive and first
        # margin-gapped negative picks
        "ann_hard_negatives": """
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
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
),
topk AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
    FROM scored
  ) WHERE rank <= 10
),
pos AS (
  SELECT query_id, neighbor_id AS positive_id, cos_sim AS pos_sim
  FROM topk WHERE rank = 1
),
neg AS (
  SELECT t.query_id AS query_id, t.neighbor_id, t.cos_sim, t.rank
  FROM topk t JOIN pos p ON p.query_id = t.query_id
  WHERE t.cos_sim < p.pos_sim - 0.02
),
first_neg AS (
  SELECT query_id, neighbor_id AS hard_negative_id, cos_sim AS neg_sim
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rank) AS rn
    FROM neg
  ) WHERE rn = 1
)
SELECT p.query_id AS query_id, positive_id, pos_sim, hard_negative_id, neg_sim
FROM pos p JOIN first_neg n ON n.query_id = p.query_id""",
        # twin of curation.erasure_audit over the md5-sampled requests
        "gdpr_erasure_audit": """
WITH req AS (
  SELECT DISTINCT user_id AS subject FROM events
  WHERE ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT % 101 = 0
)
SELECT 'events' AS table_name,
       count(*) AS n_rows_total,
       count(*) FILTER (WHERE user_id IN (SELECT subject FROM req))
         AS n_rows_purged,
       count(DISTINCT CASE WHEN user_id IN (SELECT subject FROM req)
                           THEN user_id END) AS n_subjects_purged
FROM events
UNION ALL
SELECT 'orders' AS table_name,
       count(*) AS n_rows_total,
       count(*) FILTER (WHERE o_custkey IN (SELECT subject FROM req))
         AS n_rows_purged,
       count(DISTINCT CASE WHEN o_custkey IN (SELECT subject FROM req)
                           THEN o_custkey END) AS n_subjects_purged
FROM orders""",
        # twin of snapshot.ivm_refresh_typestats: the view recomputed
        # from the FULL feed -- incremental == recompute is the claim
        "cdc_ivm_refresh": """
WITH changes AS (
  SELECT user_id,
         CASE event_type WHEN 'click' THEN 'INSERT'
                         WHEN 'view' THEN 'UPDATE'
                         ELSE 'DELETE' END AS op,
         epoch_ms(ts) AS ts_ms, event_id, value
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase') AND user_id IS NOT NULL
),
snap AS (
  SELECT user_id, op AS last_op, round(value, 4) AS last_value
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts_ms DESC, event_id DESC) AS rn
    FROM changes
  ) WHERE rn = 1 AND op <> 'DELETE'
)
SELECT last_op, count(*) AS n_users,
       round(CAST(sum(CAST(last_value AS DECIMAL(18,4))) AS DOUBLE), 4)
         AS sum_last_value
FROM snap GROUP BY last_op""",
        # twin of analytics.customer_360
        "customer_360_profile": """
WITH o AS (
  SELECT o_custkey AS k, count(*) AS n_orders,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY 1
),
ev AS (
  SELECT user_id AS k, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_events
  FROM events WHERE user_id IS NOT NULL
),
e AS (SELECT k, n_events, event_type AS last_event_type FROM ev WHERE rn = 1)
SELECT coalesce(o.k, e.k) AS entity_id,
       coalesce(n_orders, 0) AS n_orders,
       round(CAST(coalesce(spend, CAST(0 AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS total_spend,
       coalesce(n_events, 0) AS n_events,
       last_event_type,
       CASE WHEN o.k IS NULL THEN 'prospect'
            WHEN e.k IS NULL THEN 'dormant_buyer'
            ELSE 'active_buyer' END AS segment
FROM o FULL OUTER JOIN e ON o.k = e.k""",
        # twin of analytics.chi_square_independence
        "events_chi_square": """
WITH cells AS (
  SELECT event_type, hour(ts) AS h, count(*) AS o
  FROM events GROUP BY 1, 2
),
rowt AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY 1),
colt AS (SELECT h, sum(o) AS ct FROM cells GROUP BY 1),
tot AS (SELECT sum(o) AS n FROM cells),
grid AS (
  SELECT r.event_type, c.h, rt, ct, n, coalesce(cells.o, 0) AS o
  FROM rowt r CROSS JOIN colt c
  LEFT JOIN cells ON cells.event_type = r.event_type AND cells.h = c.h
  CROSS JOIN tot
),
contrib AS (
  SELECT event_type, h, n,
         CAST(round((CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)), 9)
              AS DECIMAL(38,12)) AS cc
  FROM grid
),
agg AS (
  SELECT sum(cc) AS chi2d, count(DISTINCT event_type) AS r,
         count(DISTINCT h) AS c, max(n) AS nn
  FROM contrib
)
SELECT r AS n_rows, c AS n_cols, (r - 1) * (c - 1) AS dof,
       round(CAST(chi2d AS DOUBLE), 6) AS chi2,
       round(sqrt(CAST(chi2d AS DOUBLE)
                  / (CAST(nn AS DOUBLE) * CAST(least(r - 1, c - 1) AS DOUBLE))), 6)
         AS cramers_v
FROM agg""",
        # twin of analytics.psi_drift_report
        "events_psi_drift": """
WITH base AS (SELECT ts, value FROM events WHERE value IS NOT NULL),
edges AS (
  SELECT [round(round(quantile_cont(value, 0.1), 9), 6), round(round(quantile_cont(value, 0.2), 9), 6), round(round(quantile_cont(value, 0.3), 9), 6), round(round(quantile_cont(value, 0.4), 9), 6), round(round(quantile_cont(value, 0.5), 9), 6), round(round(quantile_cont(value, 0.6), 9), 6), round(round(quantile_cont(value, 0.7), 9), 6), round(round(quantile_cont(value, 0.8), 9), 6), round(round(quantile_cont(value, 0.9), 9), 6)] AS e
  FROM base WHERE ts < TIMESTAMP '2024-01-16'
),
bucketed AS (
  SELECT (ts >= TIMESTAMP '2024-01-16') AS cur,
         len(list_filter(e, b -> b < value)) AS bucket
  FROM base CROSS JOIN edges
),
counts AS (
  SELECT bucket,
         count(*) FILTER (WHERE NOT cur) AS n_ref,
         count(*) FILTER (WHERE cur) AS n_cur
  FROM bucketed GROUP BY 1
),
tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM counts),
per AS (
  SELECT bucket, n_ref, n_cur,
         CAST(round(((CAST(n_ref AS DOUBLE) + 0.5) / (CAST(tr AS DOUBLE) + 5.0)
                     - (CAST(n_cur AS DOUBLE) + 0.5) / (CAST(tc AS DOUBLE) + 5.0))
                    * ln(((CAST(n_ref AS DOUBLE) + 0.5) / (CAST(tr AS DOUBLE) + 5.0))
                         / ((CAST(n_cur AS DOUBLE) + 0.5) / (CAST(tc AS DOUBLE) + 5.0))),
                    9) AS DECIMAL(38,12)) AS contrib
  FROM counts CROSS JOIN tot
),
tt AS (SELECT round(CAST(sum(contrib) AS DOUBLE), 6) AS psi_total FROM per)
SELECT bucket, n_ref, n_cur,
       round(CAST(contrib AS DOUBLE), 6) AS psi_contrib, psi_total
FROM per CROSS JOIN tt""",
        # twin of analytics.ks_drift_report (HDR bucket arithmetic
        # shared with events_hdr_quantiles)
        "events_ks_drift": """
WITH base AS (
  SELECT event_type, (ts >= TIMESTAMP '2024-01-16') AS cur,
         CAST(floor(value * 100) AS BIGINT) AS u
  FROM events WHERE value IS NOT NULL
),
ix AS (
  SELECT event_type, cur,
         CASE WHEN u < 16 THEN u
              ELSE (length(bin(u)) - 5) * 16 + (u >> (length(bin(u)) - 5))
         END AS idx
  FROM base
),
hist AS (
  SELECT event_type, idx,
         count(*) FILTER (WHERE NOT cur) AS np,
         count(*) FILTER (WHERE cur) AS nc
  FROM ix GROUP BY 1, 2
),
walked AS (
  SELECT event_type,
         sum(np) OVER (PARTITION BY event_type) AS n_pre,
         sum(nc) OVER (PARTITION BY event_type) AS n_post,
         round(abs(CAST(sum(np) OVER (PARTITION BY event_type ORDER BY idx
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                     / CAST(sum(np) OVER (PARTITION BY event_type) AS DOUBLE)
                   - CAST(sum(nc) OVER (PARTITION BY event_type ORDER BY idx
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                     / CAST(sum(nc) OVER (PARTITION BY event_type) AS DOUBLE)),
               9) AS d
  FROM hist
)
SELECT event_type, CAST(n_pre AS BIGINT) AS n_pre,
       CAST(n_post AS BIGINT) AS n_post, round(max(d), 6) AS ks_stat
FROM walked GROUP BY event_type, n_pre, n_post""",
        # twin of analytics.mad_anomalies
        "events_mad_anomalies": """
WITH base AS (
  SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT event_type,
         round(round(quantile_cont(value, 0.5), 9), 6) AS m
  FROM base GROUP BY 1
),
mad AS (
  SELECT b.event_type,
         round(round(quantile_cont(abs(value - m), 0.5), 9), 6) AS d
  FROM base b JOIN med ON med.event_type = b.event_type GROUP BY 1
),
scored AS (
  SELECT event_id, b.event_type AS event_type, value,
         round(CASE WHEN d > 0 THEN 0.6745 * (value - m) / d
                    ELSE 0.0 END, 6) AS mod_z
  FROM base b
  JOIN med ON med.event_type = b.event_type
  JOIN mad ON mad.event_type = b.event_type
)
SELECT event_id, event_type, value, mod_z, abs(mod_z) > 3.5 AS is_anomaly
FROM scored""",
        # twin of multimodal.arrow_blob_digest (same derived media frame)
        "media_arrow_digest": """
SELECT doc_id AS media_id,
       octet_length(encode(CASE WHEN doc_id % 490 < 10 THEN 'shared-blob'
                                ELSE text END)) AS n_bytes,
       md5(CASE WHEN doc_id % 490 < 10 THEN 'shared-blob' ELSE text END)
         AS digest
FROM documents""",
        # twin of analytics.twap_daily
        "events_twap_daily": """
WITH base AS (
  SELECT user_id, CAST(ts AS DATE) AS day, epoch_ms(ts) AS ms, event_id,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
),
held AS (
  SELECT user_id, day, v,
         CAST(coalesce(lead(ms) OVER (PARTITION BY user_id, day
                                      ORDER BY ms, event_id),
                       epoch_ms(CAST(day + 1 AS TIMESTAMP))) - ms
              AS DECIMAL(18,0)) AS w
  FROM base
)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day, count(*) AS n_samples,
       round(CAST(sum(w * v) AS DOUBLE) / CAST(sum(w) AS DOUBLE), 6) AS twap
FROM held GROUP BY user_id, day""",
        # twin of analytics.event_path_trigrams
        "events_path_trigrams": """
WITH tri AS (
  SELECT event_type AS step_1,
         lead(event_type, 1) OVER w AS step_2,
         lead(event_type, 2) OVER w AS step_3
  FROM events WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
)
SELECT step_1, step_2, step_3, count(*) AS n
FROM tri WHERE step_3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, step_1, step_2, step_3
LIMIT 20""",
        # twin of analytics.hll_rolling_distinct (hll-family contract:
        # exact rolling count + deterministically-true error bound)
        "events_hll_rolling": """
WITH uh AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h
  FROM events WHERE user_id IS NOT NULL
),
hours AS (SELECT DISTINCT h FROM uh),
vis AS (
  SELECT user_id, h + i * INTERVAL 1 HOUR AS th
  FROM uh, (SELECT unnest([0, 1, 2]) AS i) t
),
exact AS (
  SELECT th, count(DISTINCT user_id) AS n_exact_rolling FROM vis GROUP BY th
),
merged AS (
  SELECT h + i * INTERVAL 1 HOUR AS th, count(*) AS n_hours_merged
  FROM hours, (SELECT unnest([0, 1, 2]) AS i) t
  GROUP BY 1
),
appx AS (
  SELECT th, approx_count_distinct(user_id) AS a FROM vis GROUP BY th
)
SELECT strftime(m.th, '%Y-%m-%d %H:00:00') AS hour,
       CAST(n_hours_merged AS BIGINT) AS n_hours_merged,
       n_exact_rolling,
       abs(a - n_exact_rolling) / CAST(n_exact_rolling AS DOUBLE) <= 0.15
         AS within_bound
FROM merged m
JOIN exact e ON e.th = m.th
JOIN appx x ON x.th = m.th""",
        # twin of analytics.join_plan_report (events x orders on user)
        "events_join_plan": """
WITH lc AS (SELECT user_id AS k, count(*) AS nl FROM events GROUP BY 1),
rc AS (SELECT o_custkey AS k, count(*) AS nr FROM orders GROUP BY 1),
pk AS (SELECT lc.k AS k, nl * nr AS prod FROM lc JOIN rc ON rc.k = lc.k),
st AS (
  SELECT CAST(sum(prod) AS BIGINT) AS est_join_rows,
         count(*) AS n_join_keys,
         max({'p': prod, 'k': k}) AS top
  FROM pk
),
sides AS (
  SELECT CAST((SELECT sum(nl) FROM lc) AS BIGINT) AS n_left,
         (SELECT count(*) FROM lc) AS n_left_keys,
         CAST((SELECT sum(nr) FROM rc) AS BIGINT) AS n_right,
         (SELECT count(*) FROM rc) AS n_right_keys
)
SELECT n_left, n_right, n_left_keys, n_right_keys, est_join_rows,
       n_join_keys,
       CAST(top.k AS BIGINT) AS top_key,
       CAST(top.p AS BIGINT) AS top_key_rows,
       round(CAST(top.p AS DOUBLE)
             / (CAST(est_join_rows AS DOUBLE) / CAST(n_join_keys AS DOUBLE)),
             6) AS skew_factor,
       CASE WHEN least(n_left, n_right) <= 1000 THEN 'broadcast'
            WHEN CAST(top.p AS DOUBLE)
                 / (CAST(est_join_rows AS DOUBLE) / CAST(n_join_keys AS DOUBLE))
                 > 8.0 THEN 'salted_shuffle'
            ELSE 'shuffle' END AS strategy
FROM st, sides""",
        # twin of analytics.rolling_monthly_active_customers
        "orders_rolling_mau": """
WITH cm AS (
  SELECT DISTINCT o_custkey AS c, date_trunc('month', o_orderdate) AS m
  FROM orders
),
monthly AS (SELECT m, count(*) AS n_active FROM cm GROUP BY m),
visible AS (
  SELECT c, m + i * INTERVAL 1 MONTH AS m
  FROM cm, (SELECT unnest([0, 1, 2]) AS i) t
),
rolling AS (SELECT m, count(DISTINCT c) AS n_active_rolling FROM visible GROUP BY m)
SELECT strftime(mo.m, '%Y-%m') AS month, mo.n_active, r.n_active_rolling
FROM monthly mo JOIN rolling r ON r.m = mo.m""",
        "events_hdr_stream": """
WITH base AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS u
  FROM events WHERE value IS NOT NULL
),
ix AS (
  SELECT event_type,
         CASE WHEN u < 16 THEN u
              ELSE (length(bin(u)) - 5) * 16 + (u >> (length(bin(u)) - 5))
         END AS idx
  FROM base
),
hist AS (SELECT event_type, idx, count(*) AS n FROM ix GROUP BY 1, 2),
cum AS (
  SELECT event_type, idx,
         sum(n) OVER (PARTITION BY event_type ORDER BY idx) AS c
  FROM hist
),
ranks AS (
  SELECT event_type, q, CAST(ceil(q * total) AS BIGINT) AS r
  FROM (SELECT event_type, sum(n) AS total FROM hist GROUP BY 1)
  CROSS JOIN (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q)
),
picked AS (
  SELECT c.event_type, r.q, min(c.idx) AS pick
  FROM cum c JOIN ranks r ON c.event_type = r.event_type AND c.c >= r.r
  GROUP BY 1, 2
)
SELECT event_type, q,
       round((CASE WHEN pick < 16 THEN pick
               ELSE (16 + (pick - 16) % 16) << ((pick - 16) // 16) END
          + (CASE WHEN pick < 16 THEN 1
                  ELSE 1 << ((pick - 16) // 16) END) / 2.0) / 100.0, 6)
         AS est_value
FROM picked""",
        "events_hdr_quantiles": """
WITH base AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS u
  FROM events WHERE value IS NOT NULL
),
ix AS (
  SELECT event_type,
         CASE WHEN u < 16 THEN u
              ELSE (length(bin(u)) - 5) * 16 + (u >> (length(bin(u)) - 5))
         END AS idx
  FROM base
),
hist AS (SELECT event_type, idx, count(*) AS n FROM ix GROUP BY 1, 2),
cum AS (
  SELECT event_type, idx,
         sum(n) OVER (PARTITION BY event_type ORDER BY idx) AS c
  FROM hist
),
ranks AS (
  SELECT event_type, q, CAST(ceil(q * total) AS BIGINT) AS r
  FROM (SELECT event_type, sum(n) AS total FROM hist GROUP BY 1)
  CROSS JOIN (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q)
),
picked AS (
  SELECT c.event_type, r.q, min(c.idx) AS pick
  FROM cum c JOIN ranks r ON c.event_type = r.event_type AND c.c >= r.r
  GROUP BY 1, 2
),
est AS (
  SELECT event_type, q,
         (CASE WHEN pick < 16 THEN pick
               ELSE (16 + (pick - 16) % 16) << ((pick - 16) // 16) END
          + (CASE WHEN pick < 16 THEN 1
                  ELSE 1 << ((pick - 16) // 16) END) / 2.0) / 100.0 AS est_raw
  FROM picked
),
exact AS (
  -- ulp absorption: pre-round the R-7 percentile at 1e-9 before the
  -- published 6-dp round (quantile_cont's lerp order may differ from
  -- Spark's percentile by an ulp; the pre-round makes both identical)
  SELECT event_type,
         unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q,
         round(unnest(quantile_cont(value, [0.5, 0.9, 0.99])), 9) AS exact_raw
  FROM events WHERE value IS NOT NULL GROUP BY event_type
)
SELECT e.event_type, e.q,
       round(est_raw, 6) AS est_value,
       round(exact_raw, 6) AS exact_value,
       round(CASE WHEN exact_raw > 0 THEN abs(est_raw - exact_raw) / exact_raw
                  ELSE 0.0 END, 6) AS rel_err
FROM est e JOIN exact x ON e.event_type = x.event_type AND e.q = x.q""",
        # twin of textstats.doc_slugs (the Arrow scalar-UDF surface;
        # the transformation itself is SQL-expressible BY DESIGN so the
        # oracle certifies the plumbing, same policy as the UDTF tier)
        "doc_arrow_slugs": """
SELECT doc_id,
       trim(regexp_replace(lower(substr(text, 1, 60)),
                           '[^a-z0-9]+', '-', 'g'), '-') AS slug
FROM documents""",
        # twin of textstats.gopher_quality_flags (Gopher rule battery;
        # integer counts + single rounded divisions keep every flag
        # bit-deterministic across engines)
        "doc_gopher_quality": rf"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks,
         len(regexp_extract_all(text, '[.,!?;:]'))
           + len(regexp_extract_all(text, '[#@]')) AS n_symbols,
         len(regexp_extract_all(text, '{_EN_RE}')) AS n_stop
  FROM documents
), s AS (
  SELECT doc_id, len(toks) AS n_words,
         list_sum(list_transform(toks, x -> length(x))) AS word_chars,
         len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
         n_symbols, n_stop
  FROM t
), r AS (
  SELECT doc_id, n_words,
         round(CAST(word_chars AS DOUBLE) / n_words, 6) AS mean_word_len,
         round(CAST(n_symbols AS DOUBLE) / n_words, 6) AS symbol_word_ratio,
         round(CAST(n_alpha AS DOUBLE) / n_words, 6) AS alpha_word_frac,
         n_stop AS n_stop_hits
  FROM s
)
SELECT doc_id, n_words, mean_word_len, symbol_word_ratio, alpha_word_frac,
       n_stop_hits,
       n_words BETWEEN 25 AND 100000 AS ok_word_count,
       mean_word_len BETWEEN 4.0 AND 10.0 AS ok_word_len,
       symbol_word_ratio <= 0.1 AS ok_symbol_ratio,
       alpha_word_frac >= 0.8 AS ok_alpha_words,
       n_stop_hits >= 2 AS ok_stopwords,
       (n_words BETWEEN 25 AND 100000) AND (mean_word_len BETWEEN 4.0 AND 10.0)
         AND symbol_word_ratio <= 0.1 AND alpha_word_frac >= 0.8
         AND n_stop_hits >= 2 AS passes_gopher
FROM r""",
        # twin of analytics.misra_gries_heavy_hitters: the sketch
        # changes the cost, not the result, so the oracle is the exact
        # strict-share HAVING
        # null keys are OUT OF SCOPE on both sides by contract (see the
        # operator docstring): the sketch drops them and phase 2's
        # null-never-equi-joins semi-join can't resurrect them, so the
        # oracle's N and groups both restrict to non-null langs
        "corpus_heavy_langs": """
WITH n AS (SELECT count(*) AS total FROM documents WHERE lang IS NOT NULL)
SELECT lang AS key, count(*) AS cnt,
       round(CAST(count(*) AS DOUBLE) / (SELECT total FROM n), 6) AS share
FROM documents WHERE lang IS NOT NULL GROUP BY lang
HAVING CAST(count(*) AS DOUBLE) > (SELECT total FROM n) * 0.25""",
        # twin of streaming/enrich_stream.py: a stream-static join
        # emits each stream row exactly once, so the drained sink
        # equals this batch left join verbatim
        "events_enrich_stream": """
WITH prof AS (
  SELECT user_id, count(*) AS user_n_events,
         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS user_n_purchases,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS user_total_value
  FROM events GROUP BY user_id
)
SELECT event_id, e.user_id AS user_id, event_type, value,
       user_n_events, user_n_purchases, user_total_value,
       coalesce(user_n_purchases, 0) >= 5 AS is_power_user
FROM events e LEFT JOIN prof ON e.user_id = prof.user_id""",
        # twin of textstats.type_token_ratio (same \\S+ tokenizer over
        # the lower-cased text; list_distinct plays array_distinct)
        "doc_type_token_ratio": r"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '\S+')) AS n_tokens,
         len(list_distinct(regexp_extract_all(lower(text), '\S+'))) AS n_types
  FROM documents
)
SELECT doc_id, n_tokens, n_types,
       CASE WHEN n_tokens > 0
            THEN round(CAST(n_types AS DOUBLE) / n_tokens, 6)
            ELSE 0.0 END AS ttr
FROM t""",
        # twin of streaming/session_stream.py via the lag-gap-island
        # formulation AT MICROSECOND precision (events.ts carries
        # micros; Spark merges sessions on the full timestamp, so the
        # island rule must too).  Boundary pinned by
        # test_session_window_gap_boundary: an event at EXACTLY
        # prev + gap still merges; only a strictly larger gap splits.
        # Sessionize over DISTINCT (user, us) then join rows back: the
        # lag-gap-island over raw rows is TIE-ORDER-SENSITIVE when a
        # session boundary lands on a duplicated timestamp (an
        # unflagged duplicate sorted before the flagged row attaches to
        # the PREVIOUS session -- DuckDB's parallel sort made the
        # oracle nondeterministic on a duplicate-heavy sf1 corpus;
        # Spark's session_window has no such sensitivity).  Distinct
        # timestamps have no ties, so the island assignment is unique.
        "events_session_stream": """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, value FROM events
), d AS (
  SELECT DISTINCT user_id, us FROM e
), flagged AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   > 1800000000 THEN 1
              WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL THEN 1
              ELSE 0 END AS new_s
  FROM d
), sess AS (
  SELECT user_id, us,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT e.user_id,
       min(e.us) // 1000 AS session_start_ms,
       (max(e.us) + 1800000000) // 1000 AS session_end_ms,
       count(*) AS n_events,
       min(e.value) AS min_value,
       max(e.value) AS max_value
FROM e JOIN sess s ON s.user_id = e.user_id AND s.us = e.us
GROUP BY e.user_id, s.sid""",
        # twin of the S2 binary path: the same fixture derivation the
        # text oracle uses, adjusted for what REAL binlog bytes carry
        # (XID events have no schema/table, Query events have schema
        # only; gtid is SID:GNO with the fixture SID, GNO=line_no+1).
        "cdc_parse_binlog_binary": """
WITH bb AS (
  SELECT
    CASE event_type
      WHEN 'click' THEN 'WriteRowsEventV2'
      WHEN 'view' THEN 'UpdateRowsEventV2'
      WHEN 'purchase' THEN 'DeleteRowsEventV2'
      WHEN 'signup' THEN 'XID'
      ELSE 'Query' END AS event_type,
    strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS "timestamp",
    CASE WHEN event_id % 7 = 0 THEN NULL
         ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') END AS immediate_commmit_timestamp,
    CASE WHEN event_id % 211 = 0 THEN 0
         WHEN event_id % 53 = 0 THEN 100 * ((event_id + 4) // 4) + 4
         ELSE 100 * (event_id // 4) + 4 END AS log_position,
    'db' || CAST(user_id % 2 AS VARCHAR) AS schema_d,
    't' || CAST(user_id % 3 AS VARCHAR) AS table_d,
    CASE WHEN event_id % 223 = 0 THEN ''
         ELSE 'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0') END AS binlog_file,
    event_id AS line_no
  FROM events
)
SELECT event_type, "timestamp", immediate_commmit_timestamp, log_position,
       CASE WHEN event_type = 'XID' THEN NULL ELSE schema_d END AS "schema",
       CASE WHEN event_type LIKE '%RowsEventV2' THEN table_d ELSE NULL END AS "table",
       '0f8e1a24-3b5c-4d6e-8f90-a1b2c3d4e5f6:' || CAST(line_no + 1 AS VARCHAR) AS gtid_next,
       binlog_file,
       row_number() OVER (PARTITION BY binlog_file ORDER BY line_no) AS line_no
FROM bb WHERE binlog_file <> ''""",
        # twin of the row-image tier: same derivation restricted to DML
        # (only rows events carry images), payload from the fixture
        # arithmetic; UPDATE contributes a before row (quantity+5,
        # order_timestamp-1000) AND an after row.
        "cdc_parse_binlog_rows": """
WITH dml AS (
  SELECT event_id AS eid, user_id, ts,
    CASE event_type WHEN 'click' THEN 'WriteRowsEventV2'
                    WHEN 'view' THEN 'UpdateRowsEventV2'
                    ELSE 'DeleteRowsEventV2' END AS event_type,
    strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_s,
    CASE WHEN event_id % 7 = 0 THEN NULL
         ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') END AS ict,
    CASE WHEN event_id % 211 = 0 THEN 0
         WHEN event_id % 53 = 0 THEN 100 * ((event_id + 4) // 4) + 4
         ELSE 100 * (event_id // 4) + 4 END AS log_position,
    'db' || CAST(user_id % 2 AS VARCHAR) AS schema_d,
    't' || CAST(user_id % 3 AS VARCHAR) AS table_d,
    'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0') AS binlog_file
  FROM events
  WHERE event_type IN ('click','view','purchase') AND event_id % 223 <> 0
), pay AS (
  SELECT *,
    row_number() OVER (PARTITION BY binlog_file ORDER BY eid) AS event_no,
    eid % 100000 AS order_id,
    CASE WHEN eid % 43 = 6 THEN NULL
         ELSE 'cust-' || CAST(user_id % 1000 AS VARCHAR) END AS customer_name,
    'prod-' || CAST(eid % 97 AS VARCHAR) AS product_name,
    1 + eid % 10 AS quantity,
    epoch_ms(ts) AS order_timestamp,
    '0f8e1a24-3b5c-4d6e-8f90-a1b2c3d4e5f6:' || CAST(eid + 1 AS VARCHAR) AS gtid_next
  FROM dml
)
SELECT binlog_file, event_no, 1 AS row_no,
       CASE WHEN event_type = 'WriteRowsEventV2' THEN 'after'
            ELSE 'before' END AS image,
       event_type, ts_s AS "timestamp", ict AS immediate_commmit_timestamp,
       log_position, schema_d AS "schema", table_d AS "table", gtid_next,
       order_id, customer_name, product_name,
       CASE WHEN event_type = 'UpdateRowsEventV2' THEN quantity + 5
            ELSE quantity END AS quantity,
       CASE WHEN event_type = 'UpdateRowsEventV2' THEN order_timestamp - 1000
            ELSE order_timestamp END AS order_timestamp
FROM pay
UNION ALL
SELECT binlog_file, event_no, 2 AS row_no, 'after' AS image,
       event_type, ts_s, ict, log_position, schema_d, table_d, gtid_next,
       order_id, customer_name, product_name, quantity, order_timestamp
FROM pay WHERE event_type = 'UpdateRowsEventV2'""",
        # twin of payload_diff: effective image per surviving key (the
        # plain payload values for every DML type -- only UPDATE's
        # BEFORE image differs and it is not the effective state),
        # prepare semantics mirrored (zero-pos drop, last-write-wins by
        # eid), avro divergences planted per fixtures.py, unpivoted to
        # (key, column) findings with only disagreements surviving.
        "cdc_payload_diff": """
WITH dml AS (
  SELECT event_id AS eid, user_id, ts, event_type,
    CASE WHEN event_id % 211 = 0 THEN 0
         WHEN event_id % 53 = 0 THEN 100 * ((event_id + 4) // 4) + 4
         ELSE 100 * (event_id // 4) + 4 END AS log_position,
    'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0') AS binlog_file
  FROM events
  WHERE event_type IN ('click','view','purchase') AND event_id % 223 <> 0
), bl AS (
  SELECT binlog_file, log_position AS binlog_position,
    CAST(eid % 100000 AS VARCHAR) AS order_id,
    CASE WHEN eid % 43 = 6 THEN NULL
         ELSE 'cust-' || CAST(user_id % 1000 AS VARCHAR) END AS customer_name,
    'prod-' || CAST(eid % 97 AS VARCHAR) AS product_name,
    CAST(1 + eid % 10 AS VARCHAR) AS quantity,
    CAST(epoch_ms(ts) AS VARCHAR) AS order_timestamp
  FROM dml WHERE log_position <> 0
  QUALIFY row_number() OVER (
    PARTITION BY binlog_file, log_position ORDER BY eid DESC) = 1
), av AS (
  SELECT
    'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0') AS binlog_file,
    CASE WHEN event_id % 17 = 5 THEN 100 * (event_id // 4) + 4 + 7
         ELSE 100 * (event_id // 4) + 4 END AS binlog_position,
    CAST(event_id % 100000 AS VARCHAR) AS order_id,
    'cust-' || CAST(user_id % 1000 AS VARCHAR) AS customer_name,
    CASE WHEN event_id % 37 = 3 THEN 'prod-X'
         ELSE 'prod-' || CAST(event_id % 97 AS VARCHAR) END AS product_name,
    CASE WHEN event_id % 31 = 2 THEN CAST(1 + event_id % 10 + 1 AS VARCHAR)
         ELSE CAST(1 + event_id % 10 AS VARCHAR) END AS quantity,
    CASE WHEN event_id % 47 = 7 THEN NULL
         ELSE CAST(epoch_ms(ts) AS VARCHAR) END AS order_timestamp
  FROM events
  WHERE event_type IN ('click','view','purchase')
    AND event_id % 13 <> 0 AND event_id % 29 <> 1
), unp AS (
  SELECT b.binlog_file, b.binlog_position, 'order_id' AS "column",
         b.order_id AS binlog_value, a.order_id AS avro_value
  FROM bl b JOIN av a USING (binlog_file, binlog_position)
  UNION ALL
  SELECT b.binlog_file, b.binlog_position, 'customer_name',
         b.customer_name, a.customer_name
  FROM bl b JOIN av a USING (binlog_file, binlog_position)
  UNION ALL
  SELECT b.binlog_file, b.binlog_position, 'product_name',
         b.product_name, a.product_name
  FROM bl b JOIN av a USING (binlog_file, binlog_position)
  UNION ALL
  SELECT b.binlog_file, b.binlog_position, 'quantity',
         b.quantity, a.quantity
  FROM bl b JOIN av a USING (binlog_file, binlog_position)
  UNION ALL
  SELECT b.binlog_file, b.binlog_position, 'order_timestamp',
         b.order_timestamp, a.order_timestamp
  FROM bl b JOIN av a USING (binlog_file, binlog_position)
)
SELECT binlog_file, binlog_position, "column", binlog_value, avro_value,
       CASE WHEN binlog_value IS NULL AND avro_value IS NOT NULL
              THEN 'BINLOG_NULL'
            WHEN binlog_value IS NOT NULL AND avro_value IS NULL
              THEN 'AVRO_NULL'
            WHEN binlog_value <> avro_value THEN 'MISMATCH' END AS status
FROM unp
WHERE status IS NOT NULL""",
    })
    # rollup twin: GROUP BY over the diff oracle (same CTE chain), with
    # the same "/"-joined composite key for the exact distinct count
    sql["cdc_payload_summary"] = (
        "WITH diff AS (" + sql["cdc_payload_diff"] + """)
SELECT "column", status, count(*) AS n_findings,
       count(DISTINCT binlog_file || '/' || CAST(binlog_position AS VARCHAR))
         AS n_keys
FROM diff GROUP BY "column", status"""
    )
    # DDL-guarded payload diff: findings outside drift windows pass
    # through verbatim; every MATCHED key inside a window collapses to
    # one DDL_BOUNDARY row (false agreements quarantine too, so the
    # drift set comes from the matched-key join, not the findings)
    sql["cdc_payload_diff_guarded"] = (
        "WITH diff AS (" + sql["cdc_payload_diff"] + f"""),
{_DDL_STMT_CTE.strip()},
{_DDL_WINDOWS_CTE.strip()},
dmlk AS (
  SELECT binlog_file, binlog_position, user_id FROM (
    SELECT 'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0')
             AS binlog_file,
      CASE WHEN event_id % 211 = 0 THEN 0
           WHEN event_id % 53 = 0 THEN 100 * ((event_id + 4) // 4) + 4
           ELSE 100 * (event_id // 4) + 4 END AS binlog_position,
      event_id, user_id
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
      AND event_id % 223 <> 0
  ) WHERE binlog_position <> 0
  QUALIFY row_number() OVER (
    PARTITION BY binlog_file, binlog_position ORDER BY event_id DESC) = 1
),
avk AS (
  SELECT DISTINCT
    'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0')
      AS binlog_file,
    CASE WHEN event_id % 17 = 5 THEN 100 * (event_id // 4) + 4 + 7
         ELSE 100 * (event_id // 4) + 4 END AS binlog_position
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase')
    AND event_id % 13 <> 0 AND event_id % 29 <> 1
),
drift AS (
  SELECT DISTINCT k.binlog_file, k.binlog_position
  FROM (
    SELECT d.binlog_file, d.binlog_position,
           'db' || CAST(d.user_id % 2 AS VARCHAR) AS schema_name,
           't' || CAST(d.user_id % 3 AS VARCHAR) AS table_name,
           d.binlog_file || ':'
             || lpad(CAST(d.binlog_position AS VARCHAR), 12, '0') AS coord
    FROM dmlk d JOIN avk a USING (binlog_file, binlog_position)
  ) k
  JOIN win w ON w.schema_name = k.schema_name
            AND w.table_name = k.table_name
  WHERE k.coord >= w.win_from
    AND (w.win_to IS NULL OR k.coord < w.win_to)
)
SELECT d.binlog_file, d.binlog_position, d."column",
       d.binlog_value, d.avro_value, d.status
FROM diff d LEFT JOIN drift x USING (binlog_file, binlog_position)
WHERE x.binlog_file IS NULL
UNION ALL
SELECT binlog_file, binlog_position, '*' AS "column",
       CAST(NULL AS VARCHAR) AS binlog_value,
       CAST(NULL AS VARCHAR) AS avro_value,
       'DDL_BOUNDARY' AS status
FROM drift"""
    )

    # COLUMN-granular quarantine: findings on columns the window's
    # opening ALTER moved suppress to per-(key, column) DDL_BOUNDARY
    # rows; stable-column findings inside the window KEEP reporting;
    # unknown-moved-set windows (RENAME / PARTIAL_PARSE openers) stay
    # whole-key conservative
    sql["cdc_payload_diff_column_guarded"] = (
        "WITH diff AS (" + sql["cdc_payload_diff"] + f"""),
{_DDL_STMT_CTE.strip()},
{_DDL_WINDOWS_CTE.strip()},
{_DDL_WINCOLS_CTE.strip()},
dmlk AS (
  SELECT binlog_file, binlog_position, user_id FROM (
    SELECT 'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0')
             AS binlog_file,
      CASE WHEN event_id % 211 = 0 THEN 0
           WHEN event_id % 53 = 0 THEN 100 * ((event_id + 4) // 4) + 4
           ELSE 100 * (event_id // 4) + 4 END AS binlog_position,
      event_id, user_id
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
      AND event_id % 223 <> 0
  ) WHERE binlog_position <> 0
  QUALIFY row_number() OVER (
    PARTITION BY binlog_file, binlog_position ORDER BY event_id DESC) = 1
),
avk AS (
  SELECT DISTINCT
    'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0')
      AS binlog_file,
    CASE WHEN event_id % 17 = 5 THEN 100 * (event_id // 4) + 4 + 7
         ELSE 100 * (event_id // 4) + 4 END AS binlog_position
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase')
    AND event_id % 13 <> 0 AND event_id % 29 <> 1
),
kc AS (
  SELECT d.binlog_file, d.binlog_position,
         'db' || CAST(d.user_id % 2 AS VARCHAR) AS schema_name,
         't' || CAST(d.user_id % 3 AS VARCHAR) AS table_name,
         d.binlog_file || ':'
           || lpad(CAST(d.binlog_position AS VARCHAR), 12, '0') AS coord
  FROM dmlk d JOIN avk a USING (binlog_file, binlog_position)
),
kwin AS (
  SELECT kc.binlog_file, kc.binlog_position,
         bool_and(w.moved_known) AS known,
         list_sort(list_distinct(flatten(list(w.moved_cols)))) AS moved
  FROM kc JOIN wc w
    ON w.schema_name = kc.schema_name AND w.table_name = kc.table_name
   AND kc.coord >= w.win_from
   AND (w.win_to IS NULL OR kc.coord < w.win_to)
  GROUP BY 1, 2
)
SELECT d.binlog_file, d.binlog_position, d."column",
       d.binlog_value, d.avro_value, d.status
FROM diff d LEFT JOIN kwin k USING (binlog_file, binlog_position)
WHERE k.binlog_file IS NULL
   OR (k.known AND NOT list_contains(k.moved, d."column"))
UNION ALL
SELECT binlog_file, binlog_position, unnest(moved) AS "column",
       CAST(NULL AS VARCHAR) AS binlog_value,
       CAST(NULL AS VARCHAR) AS avro_value,
       'DDL_BOUNDARY' AS status
FROM kwin WHERE known
UNION ALL
SELECT binlog_file, binlog_position, '*' AS "column",
       CAST(NULL AS VARCHAR) AS binlog_value,
       CAST(NULL AS VARCHAR) AS avro_value,
       'DDL_BOUNDARY' AS status
FROM kwin WHERE NOT known"""
    )

    # streaming twin: the guard composes at read time over the
    # maintained statement log + findings/meta logs, so read-LATEST
    # equals the batch column guard verbatim
    sql["cdc_payload_diff_guarded_stream"] = sql[
        "cdc_payload_diff_column_guarded"
    ]

    # quarantine impact rollup: per drift window, the matched keys it
    # swallows; zero-traffic windows kept by the left join
    sql["cdc_ddl_guard_impact"] = f"""
WITH {_DDL_STMT_CTE.strip()},
{_DDL_WINDOWS_CTE.strip()},
dmlk AS (
  SELECT binlog_file, binlog_position, user_id FROM (
    SELECT 'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0')
             AS binlog_file,
      CASE WHEN event_id % 211 = 0 THEN 0
           WHEN event_id % 53 = 0 THEN 100 * ((event_id + 4) // 4) + 4
           ELSE 100 * (event_id // 4) + 4 END AS binlog_position,
      event_id, user_id
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
      AND event_id % 223 <> 0
  ) WHERE binlog_position <> 0
  QUALIFY row_number() OVER (
    PARTITION BY binlog_file, binlog_position ORDER BY event_id DESC) = 1
),
avk AS (
  SELECT DISTINCT
    'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0')
      AS binlog_file,
    CASE WHEN event_id % 17 = 5 THEN 100 * (event_id // 4) + 4 + 7
         ELSE 100 * (event_id // 4) + 4 END AS binlog_position
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase')
    AND event_id % 13 <> 0 AND event_id % 29 <> 1
),
kcoord AS (
  SELECT d.binlog_file, d.binlog_position,
         'db' || CAST(d.user_id % 2 AS VARCHAR) AS schema_name,
         't' || CAST(d.user_id % 3 AS VARCHAR) AS table_name,
         d.binlog_file || ':'
           || lpad(CAST(d.binlog_position AS VARCHAR), 12, '0') AS coord
  FROM dmlk d JOIN avk a USING (binlog_file, binlog_position)
)
SELECT w.schema_name, w.table_name, w.win_from, w.win_to,
       count(k.binlog_file) AS n_quarantined
FROM win w
LEFT JOIN kcoord k
  ON k.schema_name = w.schema_name AND k.table_name = w.table_name
 AND k.coord >= w.win_from
 AND (w.win_to IS NULL OR k.coord < w.win_to)
GROUP BY 1, 2, 3, 4"""

    # perceptual media tier: the oracle derives the aHash from the
    # pixel ARITHMETIC (never touching bytes) while Spark encodes real
    # BMPs/PNGs/JPEGs and decodes them back -- encode->decode->hash vs
    # pure SQL.  Integer-exact bit rule: 64*cell_sum > total  <=>
    # cell mean > global mean for 16x16 images with 2x2 cells.  The
    # doc_id%41==5 JPEG family is 64x64 BLOCK-CONSTANT (8x8 blocks of
    # value v): the BMP's 8x8-pixel aHash cells are exactly the
    # blocks, and the JPEG DC tier reconstructs the same raster, so
    # both reduce to the one rule 64*v > sum(v) over 64 blocks.
    _AHASH_CTES = """med AS (
  SELECT doc_id AS media_id, doc_id AS d, 0 AS shift FROM documents
  UNION ALL
  SELECT doc_id + 500000, doc_id, 32 FROM documents WHERE doc_id % 25 = 0
  UNION ALL
  SELECT doc_id + 700000, doc_id, 0 FROM documents WHERE doc_id % 31 = 3
),
px AS (
  SELECT m.media_id, r.r AS r, c.c AS c,
         ((1 + m.d % 191) * (16 * r.r + c.c + 3 + m.d // 191)
          + (m.d % 7 + 2) * r.r * r.r + (m.d % 11 + 1) * c.c * c.c) % 192
           + m.shift AS p
  FROM med m, range(16) r(r), range(16) c(c)
),
tot AS (SELECT media_id, sum(p) AS total FROM px GROUP BY 1),
cells AS (
  SELECT media_id, (r // 2) * 8 + (c // 2) AS cell, sum(p) AS s4
  FROM px GROUP BY 1, 2
),
bits AS (
  SELECT c.media_id, c.cell,
         CASE WHEN 64 * c.s4 > t.total THEN 1 ELSE 0 END AS b
  FROM cells c JOIN tot t USING (media_id)
),
jmed AS (
  SELECT doc_id + 800000 AS media_id, doc_id AS d
  FROM documents WHERE doc_id % 41 = 5
  UNION ALL
  SELECT doc_id + 900000, doc_id FROM documents WHERE doc_id % 41 = 5
),
jpx AS (
  SELECT m.media_id, r.r * 8 + c.c AS cell,
         ((1 + m.d % 191) * (8 * r.r + c.c + 3 + m.d // 191)
          + (m.d % 7 + 2) * r.r * r.r + (m.d % 11 + 1) * c.c * c.c) % 192
           AS v
  FROM jmed m, range(8) r(r), range(8) c(c)
),
jtot AS (SELECT media_id, sum(v) AS total FROM jpx GROUP BY 1),
jbits AS (
  SELECT x.media_id, x.cell,
         CASE WHEN 64 * x.v > t.total THEN 1 ELSE 0 END AS b
  FROM jpx x JOIN jtot t USING (media_id)
),
allbits AS (
  SELECT * FROM bits UNION ALL SELECT * FROM jbits
),
ah AS (
  SELECT media_id,
    CAST(sum(CASE WHEN cell < 16 THEN b << (cell % 16) END) AS INTEGER) AS b0,
    CAST(sum(CASE WHEN cell >= 16 AND cell < 32 THEN b << (cell % 16) END)
      AS INTEGER) AS b1,
    CAST(sum(CASE WHEN cell >= 32 AND cell < 48 THEN b << (cell % 16) END)
      AS INTEGER) AS b2,
    CAST(sum(CASE WHEN cell >= 48 THEN b << (cell % 16) END) AS INTEGER) AS b3
  FROM allbits GROUP BY 1
)"""
    sql["media_ahash"] = f"""
WITH {_AHASH_CTES}
SELECT media_id,
       CASE WHEN media_id >= 800000 THEN 64 ELSE 16 END AS width,
       CASE WHEN media_id >= 800000 THEN 64 ELSE 16 END AS height,
       b0, b1, b2, b3,
       CASE WHEN media_id >= 900000 THEN 'jpeg-dc'
            WHEN media_id >= 800000 THEN 'bmp'
            WHEN media_id >= 700000 THEN 'png' ELSE 'bmp' END AS decoder
FROM ah"""
    sql["media_perceptual_dup"] = f"""
WITH {_AHASH_CTES},
bl AS (
  SELECT media_id, 0 AS band, b0 AS v FROM ah
  UNION ALL SELECT media_id, 1, b1 FROM ah
  UNION ALL SELECT media_id, 2, b2 FROM ah
  UNION ALL SELECT media_id, 3, b3 FROM ah
),
cand AS (
  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
  FROM bl a JOIN bl b
    ON a.band = b.band AND a.v = b.v AND a.media_id < b.media_id
)
SELECT * FROM (
  SELECT c.id_a, c.id_b,
    CAST(bit_count(xor(CAST(x.b0 AS BIGINT), CAST(y.b0 AS BIGINT)))
       + bit_count(xor(CAST(x.b1 AS BIGINT), CAST(y.b1 AS BIGINT)))
       + bit_count(xor(CAST(x.b2 AS BIGINT), CAST(y.b2 AS BIGINT)))
       + bit_count(xor(CAST(x.b3 AS BIGINT), CAST(y.b3 AS BIGINT)))
      AS INTEGER) AS hamming
  FROM cand c
  JOIN ah x ON x.media_id = c.id_a
  JOIN ah y ON y.media_id = c.id_b
) WHERE hamming <= 3"""

    # video perceptual tier: per-(video, frame) aHash from the pixel
    # arithmetic, frame-set Jaccard over rare hashes -- mirroring
    # video_perceptual_pairs' candidate rule exactly
    sql["video_perceptual_dup"] = """
WITH vmed AS (
  SELECT doc_id AS media_id, doc_id AS d, 0 AS shift,
         3 + doc_id % 3 AS n_frames
  FROM documents
  UNION ALL
  SELECT doc_id + 600000, doc_id, 32, 2 + doc_id % 3
  FROM documents WHERE doc_id % 20 = 0
),
vpx AS (
  SELECT m.media_id, f.f AS f, r.r AS r, c.c AS c,
    ((1 + m.d % 191) * (16 * r.r + c.c + 3 + 5 * f.f + m.d // 191)
     + (m.d % 7 + 2) * r.r * r.r + (m.d % 11 + 1) * c.c * c.c) % 192
      + m.shift AS p
  FROM vmed m, range(8) f(f), range(16) r(r), range(16) c(c)
  WHERE f.f < m.n_frames
),
vtot AS (SELECT media_id, f, sum(p) AS total FROM vpx GROUP BY 1, 2),
vcells AS (
  SELECT media_id, f, (r // 2) * 8 + (c // 2) AS cell, sum(p) AS s4
  FROM vpx GROUP BY 1, 2, 3
),
vbands AS (
  SELECT c.media_id, c.f, CAST(c.cell // 16 AS INTEGER) AS band,
         CAST(sum(CASE WHEN 64 * c.s4 > t.total
                       THEN 1 << (c.cell % 16) ELSE 0 END) AS INTEGER) AS v
  FROM vcells c JOIN vtot t USING (media_id, f)
  GROUP BY 1, 2, 3
),
vh AS (
  SELECT DISTINCT media_id,
    CAST(max(CASE WHEN band = 0 THEN v END) AS VARCHAR) || ':' ||
    CAST(max(CASE WHEN band = 1 THEN v END) AS VARCHAR) || ':' ||
    CAST(max(CASE WHEN band = 2 THEN v END) AS VARCHAR) || ':' ||
    CAST(max(CASE WHEN band = 3 THEN v END) AS VARCHAR) AS h
  FROM vbands GROUP BY media_id, f
),
vsizes AS (SELECT media_id, count(*) AS n FROM vh GROUP BY 1),
vdf AS (SELECT h, count(*) AS df FROM vh GROUP BY 1),
vrare AS (SELECT vh.media_id, vh.h FROM vh JOIN vdf USING (h) WHERE df <= 10),
vpairs AS (
  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
  FROM vrare a JOIN vrare b ON a.h = b.h AND a.media_id < b.media_id
),
vinter AS (
  SELECT p.id_a, p.id_b, count(*) AS n_common
  FROM vpairs p
  JOIN vh x ON x.media_id = p.id_a
  JOIN vh y ON y.media_id = p.id_b AND y.h = x.h
  GROUP BY 1, 2
)
SELECT * FROM (
  SELECT i.id_a, i.id_b, i.n_common,
         round(i.n_common / (sa.n + sb.n - i.n_common), 6) AS jaccard
  FROM vinter i
  JOIN vsizes sa ON sa.media_id = i.id_a
  JOIN vsizes sb ON sb.media_id = i.id_b
) WHERE jaccard >= 0.5"""

    # streaming twin runs the same logical plan -> same oracle
    sql["cdc_snapshot_stream"] = sql["cdc_apply_changes"]
    sql["cdc_ivm_stream"] = sql["cdc_ivm_refresh"]
    sql["events_psi_stream"] = sql["events_psi_drift"]
    sql["events_anomaly_stream"] = sql["events_value_anomalies"]
    # SCD2 audit composed over the verified history SQL
    sql["cdc_scd2_audit"] = f"""
WITH hist AS ({sql["cdc_scd2_history"]}),
seq AS (
  SELECT user_id, version, op, valid_from_ms, valid_to_ms,
         lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY version)
           AS nxt_from
  FROM hist
),
per_key AS (
  SELECT user_id, count(*) AS nv,
         sum(CASE WHEN nxt_from IS NOT NULL AND valid_to_ms IS NOT NULL
                       AND nxt_from < valid_to_ms THEN 1 ELSE 0 END) AS no,
         sum(CASE WHEN nxt_from IS NOT NULL AND valid_to_ms IS NOT NULL
                       AND nxt_from > valid_to_ms THEN 1 ELSE 0 END) AS ng,
         sum(CASE WHEN valid_to_ms IS NULL THEN 1 ELSE 0 END) AS nopen,
         sum(CASE WHEN valid_to_ms IS NOT NULL
                       AND valid_to_ms <= valid_from_ms THEN 1 ELSE 0 END) AS ne
  FROM seq GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(nv) AS BIGINT) AS n_versions,
       CAST(sum(no) AS BIGINT) AS n_overlaps,
       CAST(sum(ng) AS BIGINT) AS n_gaps,
       CAST(sum(CASE WHEN nopen > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_multi_open,
       CAST(sum(ne) AS BIGINT) AS n_empty_intervals,
       (sum(no) = 0 AND sum(CASE WHEN nopen > 1 THEN 1 ELSE 0 END) = 0
        AND sum(ne) = 0) AS consistent
FROM per_key"""
    # twin of analytics.conversion_ab_test
    sql["events_conversion_ab"] = """
WITH users AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT % 2
           AS arm
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
agg AS (
  SELECT count(*) FILTER (WHERE arm = 0) AS n_a,
         count(*) FILTER (WHERE arm = 1) AS n_b,
         CAST(sum(conv) FILTER (WHERE arm = 0) AS BIGINT) AS conv_a,
         CAST(sum(conv) FILTER (WHERE arm = 1) AS BIGINT) AS conv_b
  FROM users
),
k AS (
  SELECT n_a, n_b, conv_a, conv_b,
         CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
         CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
         CAST(conv_a + conv_b AS DOUBLE)
           / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pool
  FROM agg
),
s AS (
  SELECT *, sqrt(pool * (1.0 - pool)
                 * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
            AS se
  FROM k
)
SELECT n_a, n_b, conv_a, conv_b,
       round(pa, 6) AS rate_a, round(pb, 6) AS rate_b,
       round(CASE WHEN se > 0 THEN (pa - pb) / se ELSE 0.0 END, 6) AS z_stat
FROM s"""
    # twin of analytics.benford_audit (same literal Benford shares)
    sql["orders_benford_audit"] = """
WITH counts AS (
  SELECT CAST(substr(CAST(CAST(abs(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
                     1, 1) AS INTEGER) AS digit,
         count(*) AS n
  FROM orders WHERE o_totalprice > 0 GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM counts),
per AS (
  SELECT digit, n,
         round(CAST(n AS DOUBLE) / t, 6) AS share,
         round([0.3010299956639812, 0.17609125905568124, 0.12493873660829993, 0.09691001300805642, 0.07918124604762482, 0.06694678963061322, 0.05799194697768673, 0.05115252244738129, 0.04575749056067514][digit], 6) AS expected,
         CAST(round((CAST(n AS DOUBLE) - [0.3010299956639812, 0.17609125905568124, 0.12493873660829993, 0.09691001300805642, 0.07918124604762482, 0.06694678963061322, 0.05799194697768673, 0.05115252244738129, 0.04575749056067514][digit] * t)
                    * (CAST(n AS DOUBLE) - [0.3010299956639812, 0.17609125905568124, 0.12493873660829993, 0.09691001300805642, 0.07918124604762482, 0.06694678963061322, 0.05799194697768673, 0.05115252244738129, 0.04575749056067514][digit] * t)
                    / ([0.3010299956639812, 0.17609125905568124, 0.12493873660829993, 0.09691001300805642, 0.07918124604762482, 0.06694678963061322, 0.05799194697768673, 0.05115252244738129, 0.04575749056067514][digit] * t), 9) AS DECIMAL(38,12)) AS cell
  FROM counts, tot
),
c AS (SELECT round(CAST(sum(cell) AS DOUBLE), 6) AS chi2_total FROM per)
SELECT digit, n, share, expected, chi2_total FROM per, c"""
    # twin of analytics.abc_classes: plain global window -- the bucketed
    # two-phase Spark plan lands on identical values because decimal
    # addition is exact under any grouping
    sql["customer_abc_classes"] = """
WITH per AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
),
tot AS (SELECT sum(rev) AS t FROM per),
walked AS (
  SELECT o_custkey, round(CAST(rev AS DOUBLE), 2) AS revenue,
         round(CAST(sum(rev) OVER (ORDER BY rev DESC, o_custkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS DOUBLE)
               / CAST(t AS DOUBLE), 6) AS cum_share
  FROM per, tot
)
SELECT o_custkey, revenue, cum_share,
       CASE WHEN cum_share <= 0.80 THEN 'A'
            WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc_class
FROM walked"""
    # twin of analytics.multitouch_attribution
    sql["events_attribution_multitouch"] = """
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
         lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_ms(ts), event_id) AS prev_ms
  FROM events WHERE user_id IS NOT NULL
),
sess AS (
  SELECT *, sum(CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000
                     THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS session_id
  FROM base
),
tagged AS (
  SELECT *, coalesce(sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id, session_id
                             ORDER BY ts_ms, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS n_prior
  FROM sess
),
purchases AS (
  SELECT user_id, session_id, ts_ms AS p_ms, event_id AS p_id, n_prior AS n
  FROM tagged WHERE event_type = 'purchase' AND n_prior > 0
),
touches AS (
  SELECT user_id, session_id, ts_ms AS t_ms, event_id AS t_id,
         event_type AS touch_type
  FROM tagged WHERE event_type <> 'purchase'
),
pairs AS (
  SELECT touch_type,
         CAST(round(1.0 / CAST(n AS DOUBLE), 9) AS DECIMAL(38,12)) AS credit
  FROM touches t JOIN purchases p USING (user_id, session_id)
  WHERE t.t_ms < p.p_ms OR (t.t_ms = p.p_ms AND t.t_id < p.p_id)
)
SELECT touch_type, count(*) AS n_credited_touches,
       round(CAST(sum(credit) AS DOUBLE), 6) AS credit
FROM pairs GROUP BY touch_type"""
    # time-decay twin: same CTEs with the weight window
    sql["events_attribution_decay"] = sql[
        "events_attribution_multitouch"
    ].replace(
        """pairs AS (
  SELECT touch_type,
         CAST(round(1.0 / CAST(n AS DOUBLE), 9) AS DECIMAL(38,12)) AS credit
  FROM touches t JOIN purchases p USING (user_id, session_id)
  WHERE t.t_ms < p.p_ms OR (t.t_ms = p.p_ms AND t.t_id < p.p_id)
)""",
        """weighted AS (
  SELECT touch_type, user_id, session_id, p_id,
         CAST(round(pow(2.0, -CAST(p_ms - t_ms AS DOUBLE) / 600000.0), 9)
              AS DECIMAL(38,12)) AS w
  FROM touches t JOIN purchases p USING (user_id, session_id)
  WHERE t.t_ms < p.p_ms OR (t.t_ms = p.p_ms AND t.t_id < p.p_id)
),
pairs AS (
  SELECT touch_type,
         CAST(round(CAST(w AS DOUBLE)
                    / CAST(sum(w) OVER (PARTITION BY user_id, session_id, p_id)
                           AS DOUBLE), 9)
              AS DECIMAL(38,12)) AS credit
  FROM weighted
)""",
    )
    # U-shaped twin: same CTEs with the position window
    sql["events_attribution_position"] = sql[
        "events_attribution_multitouch"
    ].replace(
        """pairs AS (
  SELECT touch_type,
         CAST(round(1.0 / CAST(n AS DOUBLE), 9) AS DECIMAL(38,12)) AS credit
  FROM touches t JOIN purchases p USING (user_id, session_id)
  WHERE t.t_ms < p.p_ms OR (t.t_ms = p.p_ms AND t.t_id < p.p_id)
)""",
        """ranked AS (
  SELECT touch_type, n,
         row_number() OVER (PARTITION BY user_id, session_id, p_id
                            ORDER BY t_ms, t_id) AS pos
  FROM touches t JOIN purchases p USING (user_id, session_id)
  WHERE t.t_ms < p.p_ms OR (t.t_ms = p.p_ms AND t.t_id < p.p_id)
),
pairs AS (
  SELECT touch_type,
         CAST(round(CASE WHEN n = 1 THEN 1.0
                         WHEN n = 2 THEN 0.5
                         WHEN pos = 1 THEN 0.4
                         WHEN pos = n THEN 0.4
                         ELSE 0.2 / (CAST(n AS DOUBLE) - 2.0) END, 9)
              AS DECIMAL(38,12)) AS credit
  FROM ranked
)""",
    )
    # twin of similarity.embedding_label_drift
    sql["embedding_label_drift"] = """
WITH ex AS (
  SELECT label, generate_subscripts(embedding, 1) AS ord,
         CAST(unnest(embedding) AS DECIMAL(18,9)) AS v
  FROM embeddings
),
per_dim AS (
  SELECT label, ord, sum(v) AS s, count(*) AS n FROM ex GROUP BY 1, 2
),
lbl AS (
  SELECT label, ord, CAST(s AS DOUBLE) / n AS m, n FROM per_dim
),
corpus AS (
  SELECT ord, CAST(sum(s) AS DOUBLE) / sum(n) AS cm FROM per_dim GROUP BY 1
),
agg AS (
  SELECT label, max(n) AS n_vectors,
         sum(CAST(round(m * cm, 12) AS DECIMAL(38,12))) AS dot,
         sum(CAST(round(m * m, 12) AS DECIMAL(38,12))) AS a2,
         sum(CAST(round(cm * cm, 12) AS DECIMAL(38,12))) AS b2
  FROM lbl JOIN corpus USING (ord) GROUP BY label
)
SELECT label, CAST(n_vectors AS BIGINT) AS n_vectors,
       round(CAST(dot AS DOUBLE)
             / (sqrt(CAST(a2 AS DOUBLE)) * sqrt(CAST(b2 AS DOUBLE))), 6)
         AS cos_to_corpus
FROM agg"""
    # VARIANT ingestion: same contract columns off the derivation CTE
    sql["cdc_binlog_variant"] = oracle.cdc_binlog_events().replace(
        "SELECT * FROM binlog_events_cdc",
        '''SELECT event_type, "timestamp", log_position, "schema", "table",
       gtid_next, binlog_file, line_no,
       event_type LIKE '%RowsEventV2' AS is_dml
FROM binlog_events_cdc''',
    )
    # template dedup: identical normalization chain in DuckDB
    sql["dedup_template"] = """
SELECT md5(trim(regexp_replace(regexp_replace(text, '[0-9]+', '0', 'g'),
                               '\\s+', ' ', 'g'))) AS template_hash,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_copies,
       count(DISTINCT md5(text)) AS n_distinct_texts
FROM documents GROUP BY 1"""
    # undirected recursive closure composed over the verified pair
    # oracle -- the pair-expansion recursion is kept HERE (test-scale
    # DuckDB) while the Spark side runs the linear label fixpoint
    sql["dedup_transitive_closure"] = f"""
WITH RECURSIVE base(doc_a, doc_b) AS ({sql["minhash_lsh_pairs"]}),
sym(a, b) AS (
  SELECT doc_a, doc_b FROM base UNION SELECT doc_b, doc_a FROM base
),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b WHERE r.a <> s.b
),
lab AS (
  SELECT a AS doc_id, min(b) AS reach_min
  FROM (SELECT a, b FROM reach UNION ALL SELECT a, a FROM sym) GROUP BY a
),
node_comp AS (
  SELECT doc_id, least(doc_id, reach_min) AS cluster_id FROM lab
),
ok AS (
  SELECT cluster_id FROM (
    SELECT cluster_id, count(*) AS n_docs FROM node_comp GROUP BY 1
  ) WHERE n_docs <= 10000
)
-- the Spark side runs closure_pairs(cap=10000): components above the
-- cap route to the overflow channel on BOTH sides, so the contract
-- cannot silently diverge when a boilerplate family outgrows the cap
SELECT DISTINCT r.a AS doc_a, r.b AS doc_b
FROM reach r
JOIN node_comp nc ON nc.doc_id = r.a
JOIN ok ON ok.cluster_id = nc.cluster_id
WHERE r.a < r.b"""
    # component labeling + size report over the same reach relation;
    # the overflow channel = components above the cap (2 at test scale)
    sql["dedup_closure_overflow"] = f"""
WITH RECURSIVE base(doc_a, doc_b) AS ({sql["minhash_lsh_pairs"]}),
sym(a, b) AS (
  SELECT doc_a, doc_b FROM base UNION SELECT doc_b, doc_a FROM base
),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b WHERE r.a <> s.b
),
lab AS (
  SELECT a AS doc_id, min(b) AS reach_min
  FROM (SELECT a, b FROM reach UNION ALL SELECT a, a FROM sym) GROUP BY a
),
comp AS (
  SELECT least(doc_id, reach_min) AS cluster_id, count(*) AS n_docs
  FROM lab GROUP BY 1
)
SELECT cluster_id, n_docs, (n_docs * (n_docs - 1)) // 2 AS n_pairs_suppressed
FROM comp WHERE n_docs > 2"""
    # funnel velocity composed over the verified funnel oracle
    sql["events_funnel_timing"] = f"""
WITH staged AS ({sql["events_funnel"]}),
vc AS (
  SELECT count(*) AS n_eligible, count(click_ts_ms) AS n_converted,
         round(CAST(count(click_ts_ms) AS DOUBLE) / count(*), 6)
           AS conversion_rate,
         round(round(quantile_cont(click_ts_ms - view_ts_ms, 0.5), 9), 6)
           AS median_gap_ms
  FROM staged WHERE view_ts_ms IS NOT NULL
),
cp AS (
  SELECT count(*) AS n_eligible, count(purchase_ts_ms) AS n_converted,
         round(CAST(count(purchase_ts_ms) AS DOUBLE) / count(*), 6)
           AS conversion_rate,
         round(round(quantile_cont(purchase_ts_ms - click_ts_ms, 0.5), 9), 6)
           AS median_gap_ms
  FROM staged WHERE click_ts_ms IS NOT NULL
)
SELECT 'view_to_click' AS step, * FROM vc
UNION ALL
SELECT 'click_to_purchase' AS step, * FROM cp"""
    # duplication-scale histogram over the verified cluster oracle
    sql["dedup_cluster_sizes"] = f"""
WITH clusters AS ({sql["dedup_clusters"]}),
sizes AS (
  SELECT cluster_id, count(*) AS cluster_size FROM clusters GROUP BY 1
)
SELECT cluster_size, count(*) AS n_clusters,
       CAST(count(*) * cluster_size AS BIGINT) AS n_docs
FROM sizes GROUP BY cluster_size"""
    # label consensus composed over the verified cluster oracle
    sql["dedup_label_consensus"] = f"""
WITH clusters AS ({sql["dedup_clusters"]}),
member AS (
  SELECT c.doc_id, c.cluster_id, d.lang
  FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
),
votes AS (
  SELECT cluster_id, lang, count(*) AS v FROM member GROUP BY 1, 2
),
consensus AS (
  SELECT cluster_id, lang AS consensus_lang FROM (
    SELECT *, row_number() OVER (PARTITION BY cluster_id
                                 ORDER BY v DESC, lang ASC) AS rn
    FROM votes
  ) WHERE rn = 1
)
SELECT m.doc_id, m.cluster_id, m.lang, consensus_lang,
       m.lang = consensus_lang AS agrees
FROM member m JOIN consensus USING (cluster_id)"""
    # estimator calibration composed from the signature + pair oracles
    sql["dedup_minhash_error"] = f"""
WITH {_SHINGLE_CTE},
pairs AS (SELECT doc_a, doc_b FROM ({sql["minhash_lsh_pairs"]})),
sigs AS (SELECT * FROM ({sql["minhash_signatures"]})),
est AS (
  SELECT doc_a, doc_b,
         round((CASE WHEN a.min_0 = b.min_0 THEN 1 ELSE 0 END + CASE WHEN a.min_1 = b.min_1 THEN 1 ELSE 0 END + CASE WHEN a.min_2 = b.min_2 THEN 1 ELSE 0 END + CASE WHEN a.min_3 = b.min_3 THEN 1 ELSE 0 END + CASE WHEN a.min_4 = b.min_4 THEN 1 ELSE 0 END + CASE WHEN a.min_5 = b.min_5 THEN 1 ELSE 0 END + CASE WHEN a.min_6 = b.min_6 THEN 1 ELSE 0 END + CASE WHEN a.min_7 = b.min_7 THEN 1 ELSE 0 END + CASE WHEN a.min_8 = b.min_8 THEN 1 ELSE 0 END + CASE WHEN a.min_9 = b.min_9 THEN 1 ELSE 0 END + CASE WHEN a.min_10 = b.min_10 THEN 1 ELSE 0 END + CASE WHEN a.min_11 = b.min_11 THEN 1 ELSE 0 END + CASE WHEN a.min_12 = b.min_12 THEN 1 ELSE 0 END + CASE WHEN a.min_13 = b.min_13 THEN 1 ELSE 0 END + CASE WHEN a.min_14 = b.min_14 THEN 1 ELSE 0 END + CASE WHEN a.min_15 = b.min_15 THEN 1 ELSE 0 END) / 16.0, 6) AS est_jaccard
  FROM pairs JOIN sigs a ON a.doc_id = doc_a JOIN sigs b ON b.doc_id = doc_b
),
sizes AS (SELECT doc_id, count(*) AS n FROM shingle_hashes GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS i
  FROM pairs p
  JOIN shingle_hashes sa ON sa.doc_id = p.doc_a
  JOIN shingle_hashes sb ON sb.doc_id = p.doc_b AND sb.h = sa.h
  GROUP BY 1, 2
),
exact AS (
  SELECT p.doc_a, p.doc_b,
         round(CAST(coalesce(i.i, 0) AS DOUBLE)
               / CAST(na.n + nb.n - coalesce(i.i, 0) AS DOUBLE), 6)
           AS exact_jaccard
  FROM pairs p
  LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
  JOIN sizes na ON na.doc_id = p.doc_a
  JOIN sizes nb ON nb.doc_id = p.doc_b
)
SELECT e.doc_a AS doc_a, e.doc_b AS doc_b, est_jaccard, exact_jaccard,
       round(abs(est_jaccard - exact_jaccard), 6) AS abs_err
FROM est e JOIN exact x ON x.doc_a = e.doc_a AND x.doc_b = e.doc_b"""
    # redundancy composed over the verified cluster oracle
    sql["corpus_source_redundancy"] = f"""
SELECT d.source AS source, count(*) AS n_docs,
       CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clustered,
       round(CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS redundancy
FROM documents d
LEFT JOIN (SELECT DISTINCT doc_id FROM ({sql["dedup_clusters"]})) c
  ON c.doc_id = d.doc_id
GROUP BY d.source"""
    # confusion matrix composed over the verified lang_id oracle
    sql["lang_id_confusion"] = f"""
WITH scored AS (SELECT lang, lang_guess,
                       CASE WHEN lang = lang_guess THEN 1 ELSE 0 END AS ok
                FROM ({sql["lang_id"]})),
cells AS (
  SELECT lang, lang_guess, count(*) AS n, sum(ok) AS nok
  FROM scored GROUP BY 1, 2
),
per_true AS (SELECT lang, sum(n) AS nt, sum(nok) AS tok FROM cells GROUP BY 1),
total AS (
  SELECT round(CAST(sum(nok) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6)
           AS accuracy
  FROM cells
)
SELECT c.lang AS lang, lang_guess, n,
       round(CAST(tok AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS recall,
       accuracy
FROM cells c JOIN per_true p ON p.lang = c.lang CROSS JOIN total"""
    # dedup impact: losers = cluster members that are not the
    # canonical (min-id) member, volume rollup per source
    sql["dedup_impact_report"] = f"""
WITH losers AS (
  SELECT doc_id FROM ({sql["dedup_clusters"]}) WHERE doc_id <> cluster_id
)
SELECT d.source, count(*) AS n_docs,
       CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN d.n_chars ELSE 0 END)
            AS BIGINT) AS chars_removed,
       round(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS pct_docs_removed
FROM documents d LEFT JOIN losers l ON l.doc_id = d.doc_id
GROUP BY d.source"""
    # bot scoring: gap moments as exact integer/decimal sums, CV and
    # rate in mirrored double op order (value_anomalies discipline)
    sql["events_bot_scores"] = """
WITH gapped AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms,
         epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap
  FROM events
),
per AS (
  SELECT user_id, count(*) AS n_events,
         CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
         max(ts_ms) - min(ts_ms) AS span_ms,
         count(gap) AS ng,
         CAST(sum(CAST(gap AS DECIMAL(18,0))) AS DOUBLE) AS gs,
         CAST(sum(CAST(gap * gap AS DECIMAL(38,0))) AS DOUBLE) AS gss
  FROM gapped GROUP BY user_id
),
scored AS (
  SELECT user_id, n_events, n_types, span_ms,
         round(CAST(n_events * 60000 AS DOUBLE)
               / greatest(span_ms, 60000), 6) AS rate_per_min,
         round(CASE WHEN ng > 0 THEN gs / ng ELSE 0.0 END, 6)
           AS mean_gap_ms,
         round(CASE WHEN ng > 0 AND gs / ng > 0
               THEN sqrt(greatest(gss / ng - (gs / ng) * (gs / ng), 0.0))
                    / (gs / ng)
               ELSE 0.0 END, 6) AS gap_cv
  FROM per
)
SELECT *,
       (rate_per_min >= 20.0
        OR (n_events - 1 >= 5 AND gap_cv <= 0.2 AND mean_gap_ms > 0))
         AS bot_flag
FROM scored"""
    # embedding dup clusters: recursive reachability walk (the
    # dedup_clusters oracle recipe) over the embedding near-dup pair
    # SQL re-based onto the planted-copy corpus (the synthetic
    # embeddings are near-orthogonal -- zero natural near-dups)
    sql["embedding_dup_clusters"] = f"""
WITH RECURSIVE corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 25 = 0
),
ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM corpus
),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS norm FROM ex GROUP BY vec_id),
buckets AS ({_hyperplane_bucket_sql()}),
cand AS (
  SELECT l.vec_id AS vec_a, r.vec_id AS vec_b
  FROM buckets l JOIN buckets r ON l.bucket = r.bucket
  WHERE l.vec_id < r.vec_id
),
dots AS (
  SELECT c.vec_a, c.vec_b, sum(ea.v * eb.v) AS dot
  FROM cand c
  JOIN ex ea ON ea.vec_id = c.vec_a
  JOIN ex eb ON eb.vec_id = c.vec_b AND ea.ord = eb.ord
  GROUP BY c.vec_a, c.vec_b
),
pairs AS (
  SELECT vec_a AS doc_a, vec_b AS doc_b
  FROM dots
  JOIN norms na ON na.vec_id = vec_a
  JOIN norms nb ON nb.vec_id = vec_b
  WHERE round(dot / (na.norm * nb.norm), 6) >= 0.99
),
sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
walk(node, reach) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT w.node, s.dst FROM walk w JOIN sym s ON s.src = w.reach
)
SELECT node AS vec_id, least(node, min(reach)) AS cluster_id
FROM walk GROUP BY node"""
    # magic-byte census over the planted-signature media frame
    sql["media_type_census"] = """
WITH media AS (
  SELECT doc_id AS media_id,
         unhex(CASE doc_id % 7
                 WHEN 0 THEN '89504E470D0A1A0A'
                 WHEN 1 THEN 'FFD8FFE000104A46'
                 WHEN 2 THEN '524946460C00000057415645'
                 WHEN 3 THEN '524946460C00000041564920'
                 WHEN 4 THEN '255044462D312E37'
                 WHEN 5 THEN '1F8B0800'
                 ELSE '' END || hex(encode(text))) AS content
  FROM documents
),
sniffed AS (
  SELECT CASE
           WHEN starts_with(hx, '52494646')
                AND substr(hx, 17, 8) = '57415645' THEN 'wav'
           WHEN starts_with(hx, '52494646')
                AND substr(hx, 17, 8) = '41564920' THEN 'avi'
           WHEN starts_with(hx, '52494646') THEN 'riff-other'
           WHEN starts_with(hx, '89504E47') THEN 'png'
           WHEN starts_with(hx, 'FFD8FF') THEN 'jpeg'
           WHEN starts_with(hx, '25504446') THEN 'pdf'
           WHEN starts_with(hx, '1F8B') THEN 'gzip'
           ELSE 'unknown' END AS media_type,
         octet_length(content) AS n
  FROM (SELECT substr(hex(content), 1, 24) AS hx, content FROM media)
)
SELECT media_type, count(*) AS n_blobs,
       CAST(sum(n) AS BIGINT) AS total_bytes,
       CAST(min(n) AS BIGINT) AS min_bytes,
       CAST(max(n) AS BIGINT) AS max_bytes
FROM sniffed GROUP BY media_type"""
    # blob-level near-dup: fixed-width byte-chunk jaccard over the hex
    # form, candidates from rare chunks only, intersection
    # candidate-bounded -- mirror of multimodal.media_near_dup_pairs
    sql["media_near_dup"] = """
WITH media AS (
  SELECT doc_id AS media_id,
         hex(encode(CASE WHEN doc_id % 101 < 3
             THEN repeat('HEADER-BLOCK ', 20) || text
             ELSE text END)) AS hx
  FROM documents
),
chunks AS (
  SELECT DISTINCT media_id,
         ('0x' || substr(md5(ch), 1, 12))::BIGINT AS h
  FROM (
    SELECT media_id,
           unnest(list_transform(
             generate_series(0, CAST(greatest(1,
               ceil(len(hx) / 16.0)) AS BIGINT) - 1),
             i -> substr(hx, CAST(i * 16 + 1 AS INT), 16))) AS ch
    FROM media
  )
),
sizes AS (SELECT media_id, count(*) AS n FROM chunks GROUP BY 1),
dfreq AS (SELECT h, count(*) AS df FROM chunks GROUP BY 1),
rare AS (SELECT c.media_id, c.h FROM chunks c
         JOIN dfreq d ON d.h = c.h WHERE d.df <= 10),
pairs AS (
  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
  FROM rare a JOIN rare b ON a.h = b.h
  WHERE a.media_id < b.media_id
),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS n_common
  FROM pairs p
  JOIN chunks ca ON ca.media_id = p.id_a
  JOIN chunks cb ON cb.media_id = p.id_b AND cb.h = ca.h
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.n_common,
       round(i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE), 6)
         AS jaccard
FROM inter i
JOIN sizes sa ON sa.media_id = i.id_a
JOIN sizes sb ON sb.media_id = i.id_b
WHERE round(i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE), 6)
      >= 0.2"""
    # threshold calibration curve over the verified jaccard pair frame
    sql["dedup_threshold_curve"] = f"""
WITH pairs AS ({sql["ngram_jaccard_pairs"]}),
per AS (
  SELECT floor(jaccard * 10) / 10.0 AS bucket, count(*) AS n_pairs
  FROM pairs GROUP BY 1
)
SELECT bucket, n_pairs,
       CAST(sum(n_pairs) OVER (
         ORDER BY bucket DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_at_or_above
FROM per"""
    # streaming funnel: the per-user fold merges across micro-batches,
    # so the drained complete-mode state equals the batch funnel
    sql["events_funnel_stream"] = sql["events_funnel"]
    # production incremental folds: reading LATEST state equals the
    # batch operator over the whole replay -- same oracles verbatim
    sql["cdc_transactions_incremental"] = sql["cdc_transactions"]
    sql["events_funnel_incremental"] = sql["events_funnel"]
    # ensemble quality blend: the three verified signal oracles, each
    # decile-normalized against its own 9 exact-percentile boundaries
    # (rounded 1e-9), 10 = best per signal (repetition inverts)
    _qlist = "[" + ", ".join(str(q / 10.0) for q in range(1, 10)) + "]"
    sql["doc_quality_blend"] = f"""
WITH lp AS (SELECT doc_id, mean_logprob FROM ({sql["doc_unigram_logprob"]})),
rep AS (SELECT doc_id, repetition_ratio FROM ({sql["doc_repetition"]})),
ttr AS (SELECT doc_id, ttr FROM ({sql["doc_type_token_ratio"]})),
blp AS (SELECT list_transform(quantile_cont(mean_logprob, {_qlist}),
                              b -> round(b, 9)) AS bs FROM lp),
brep AS (SELECT list_transform(quantile_cont(repetition_ratio, {_qlist}),
                               b -> round(b, 9)) AS bs FROM rep),
bttr AS (SELECT list_transform(quantile_cont(ttr, {_qlist}),
                               b -> round(b, 9)) AS bs FROM ttr),
deciled AS (
  SELECT l.doc_id,
         1 + len(list_filter(blp.bs, b -> b < l.mean_logprob)) AS lp_decile,
         1 + len(list_filter(brep.bs, b -> b < r.repetition_ratio))
           AS rep_decile,
         1 + len(list_filter(bttr.bs, b -> b < t.ttr)) AS ttr_decile
  FROM lp l
  JOIN rep r ON r.doc_id = l.doc_id
  JOIN ttr t ON t.doc_id = l.doc_id
  CROSS JOIN blp CROSS JOIN brep CROSS JOIN bttr
)
SELECT doc_id, lp_decile, rep_decile, ttr_decile,
       round((lp_decile + 11 - rep_decile + ttr_decile) / 3.0, 6)
         AS blend_score
FROM deciled"""
    # per-source data card: composed from the verified token_count /
    # doc_contamination / dedup_clusters oracles so the datasheet can
    # never disagree with the operators it summarizes
    sql["corpus_data_card"] = f"""
WITH toks AS ({sql["token_count"]}),
cont AS ({sql["doc_contamination"]}),
members AS (SELECT DISTINCT doc_id FROM ({sql["dedup_clusters"]})),
per_doc AS (
  SELECT d.source, d.lang, d.n_chars, t.n_bpe_tokens, c.contamination,
         CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END AS dup
  FROM documents d
  JOIN toks t ON t.doc_id = d.doc_id
  JOIN cont c ON c.doc_id = d.doc_id
  LEFT JOIN members m ON m.doc_id = d.doc_id
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_bpe_tokens) AS BIGINT) AS total_tokens,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       round(CAST(sum(CAST(contamination AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS mean_contamination,
       CAST(sum(CASE WHEN contamination >= 0.5 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
       CAST(sum(dup) AS BIGINT) AS n_near_dup,
       round(CAST(sum(dup) AS DOUBLE) / count(*), 6) AS dup_rate
FROM per_doc GROUP BY source"""
    # agreement audit composed from the method oracles so each pair
    # set stays literally the verified SQL (ann_recall_report pattern)
    sql["dedup_method_agreement"] = f"""
WITH tagged AS (
  SELECT 'minhash' AS m, doc_a, doc_b FROM ({sql["minhash_lsh_pairs"]})
  UNION ALL
  SELECT 'simhash' AS m, doc_a, doc_b FROM ({sql["simhash_near_pairs"]})
  UNION ALL
  SELECT 'ngram' AS m, doc_a, doc_b FROM ({sql["ngram_jaccard_pairs"]}) WHERE jaccard >= 0.5
),
flags AS (
  SELECT doc_a, doc_b,
         max(CASE WHEN m = 'minhash' THEN 1 ELSE 0 END) AS m_mh,
         max(CASE WHEN m = 'simhash' THEN 1 ELSE 0 END) AS m_sh,
         max(CASE WHEN m = 'ngram' THEN 1 ELSE 0 END) AS m_ng
  FROM tagged GROUP BY 1, 2
),
combos AS (
  SELECT 'minhash' AS method_a, 'ngram' AS method_b,
         sum(m_mh) AS n_a, sum(m_ng) AS n_b, sum(m_mh * m_ng) AS n_both
  FROM flags
  UNION ALL
  SELECT 'minhash', 'simhash', sum(m_mh), sum(m_sh), sum(m_mh * m_sh)
  FROM flags
  UNION ALL
  SELECT 'ngram', 'simhash', sum(m_ng), sum(m_sh), sum(m_ng * m_sh)
  FROM flags
)
SELECT method_a, method_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(n_both AS BIGINT) AS n_both,
       round(CAST(n_both AS DOUBLE) / CAST(n_a + n_b - n_both AS DOUBLE), 6)
         AS agreement
FROM combos"""
    # stateless stream-static payload diff appends exactly the batch
    # findings -> same oracle
    sql["cdc_payload_diff_stream"] = sql["cdc_payload_diff"]
    # streaming S2 decode is stateless per file -> appended rows equal
    # the batch decode exactly
    # session-gap quantiles: identical per-user lag frame
    sql["events_session_gaps"] = """
WITH e AS (
  SELECT user_id, epoch_ms(ts) AS ms, event_id FROM events
  WHERE user_id IS NOT NULL
),
g AS (
  SELECT user_id,
         ms - lag(ms) OVER (
           PARTITION BY user_id ORDER BY ms, event_id) AS gap
  FROM e
)
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       count(*) AS n_gaps,
       round(round(quantile_cont(gap, 0.5), 9), 6) AS p50_ms,
       round(round(quantile_cont(gap, 0.9), 9), 6) AS p90_ms,
       round(round(quantile_cont(gap, 0.95), 9), 6) AS p95_ms,
       max(gap) AS max_ms,
       CAST(ceil(round(quantile_cont(gap, 0.95), 9)) AS BIGINT)
         AS suggested_timeout_ms
FROM g WHERE gap IS NOT NULL"""
    # watermark planning: naive global running max in the oracle, the
    # bucketed two-phase form in Spark -- same numbers by construction
    sql["events_watermark_plan"] = """
WITH e AS (SELECT event_id, epoch_ms(ts) AS ms FROM events),
r AS (
  SELECT ms, max(ms) OVER (
    ORDER BY event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rmax
  FROM e
),
l AS (SELECT rmax - ms AS late FROM r)
SELECT count(*) AS n_events,
       CAST(sum(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       round(sum(CASE WHEN late > 0 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS late_frac,
       round(round(quantile_cont(late, 0.5), 9), 6) AS p50_ms,
       round(round(quantile_cont(late, 0.9), 9), 6) AS p90_ms,
       round(round(quantile_cont(late, 0.99), 9), 6) AS p99_ms,
       max(late) AS max_ms,
       CAST(ceil(round(quantile_cont(late, 0.99), 9)) AS BIGINT)
         AS suggested_delay_ms
FROM l"""
    sql["cdc_parse_binlog_stream"] = sql["cdc_parse_binlog_binary"]
    # the r8 byte-offset binary tail drains the same fixture to the
    # same contract rows -- three binary readers, one oracle
    sql["cdc_parse_stream_binlogbin"] = sql["cdc_parse_binlog_binary"]
    # FULL OUTER payload findings stream: matched tier = the batch
    # payload diff verbatim; the BINLOG_ONLY / AVRO_ONLY tiers obey
    # the strict post-watermark horizon ts + window < W (pinned by
    # test_payload_findings_stream_horizons), W = least of the two
    # sides' max event times (delay 0), window_ms = 5000.  Event time
    # on both replay sides is the source event's epoch millis, so
    # ts_ms = epoch_ms(ts) per surviving row.
    sql["cdc_payload_findings_stream"] = """
WITH dml AS (
  SELECT event_id AS eid, user_id, ts, event_type,
    CASE WHEN event_id % 211 = 0 THEN 0
         WHEN event_id % 53 = 0 THEN 100 * ((event_id + 4) // 4) + 4
         ELSE 100 * (event_id // 4) + 4 END AS log_position,
    'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0') AS binlog_file
  FROM events
  WHERE event_type IN ('click','view','purchase') AND event_id % 223 <> 0
), bl AS (
  SELECT binlog_file, log_position AS binlog_position,
    CAST(eid % 100000 AS VARCHAR) AS order_id,
    CASE WHEN eid % 43 = 6 THEN NULL
         ELSE 'cust-' || CAST(user_id % 1000 AS VARCHAR) END AS customer_name,
    'prod-' || CAST(eid % 97 AS VARCHAR) AS product_name,
    CAST(1 + eid % 10 AS VARCHAR) AS quantity,
    CAST(epoch_ms(ts) AS VARCHAR) AS order_timestamp,
    epoch_ms(ts) AS ts_ms
  FROM dml WHERE log_position <> 0
  QUALIFY row_number() OVER (
    PARTITION BY binlog_file, log_position ORDER BY eid DESC) = 1
), av AS (
  SELECT
    'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0') AS binlog_file,
    CASE WHEN event_id % 17 = 5 THEN 100 * (event_id // 4) + 4 + 7
         ELSE 100 * (event_id // 4) + 4 END AS binlog_position,
    CAST(event_id % 100000 AS VARCHAR) AS order_id,
    'cust-' || CAST(user_id % 1000 AS VARCHAR) AS customer_name,
    CASE WHEN event_id % 37 = 3 THEN 'prod-X'
         ELSE 'prod-' || CAST(event_id % 97 AS VARCHAR) END AS product_name,
    CASE WHEN event_id % 31 = 2 THEN CAST(1 + event_id % 10 + 1 AS VARCHAR)
         ELSE CAST(1 + event_id % 10 AS VARCHAR) END AS quantity,
    CASE WHEN event_id % 47 = 7 THEN NULL
         ELSE CAST(epoch_ms(ts) AS VARCHAR) END AS order_timestamp,
    epoch_ms(ts) AS ts_ms
  FROM events
  WHERE event_type IN ('click','view','purchase')
    AND event_id % 13 <> 0 AND event_id % 29 <> 1
), wm AS (
  SELECT least((SELECT max(ts_ms) FROM bl),
               (SELECT max(ts_ms) FROM av)) AS w
), unp AS (
  SELECT b.binlog_file, b.binlog_position, 'order_id' AS "column",
         b.order_id AS binlog_value, a.order_id AS avro_value
  FROM bl b JOIN av a USING (binlog_file, binlog_position)
  UNION ALL
  SELECT b.binlog_file, b.binlog_position, 'customer_name',
         b.customer_name, a.customer_name
  FROM bl b JOIN av a USING (binlog_file, binlog_position)
  UNION ALL
  SELECT b.binlog_file, b.binlog_position, 'product_name',
         b.product_name, a.product_name
  FROM bl b JOIN av a USING (binlog_file, binlog_position)
  UNION ALL
  SELECT b.binlog_file, b.binlog_position, 'quantity',
         b.quantity, a.quantity
  FROM bl b JOIN av a USING (binlog_file, binlog_position)
  UNION ALL
  SELECT b.binlog_file, b.binlog_position, 'order_timestamp',
         b.order_timestamp, a.order_timestamp
  FROM bl b JOIN av a USING (binlog_file, binlog_position)
)
SELECT binlog_file, binlog_position, "column", binlog_value, avro_value,
       CASE WHEN binlog_value IS NULL AND avro_value IS NOT NULL
              THEN 'BINLOG_NULL'
            WHEN binlog_value IS NOT NULL AND avro_value IS NULL
              THEN 'AVRO_NULL'
            WHEN binlog_value <> avro_value THEN 'MISMATCH' END AS status
FROM unp
WHERE (binlog_value IS NULL) <> (avro_value IS NULL)
   OR binlog_value <> avro_value
UNION ALL
SELECT b.binlog_file, b.binlog_position, CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'BINLOG_ONLY'
FROM bl b, wm
WHERE b.ts_ms + 5000 < wm.w
  AND NOT EXISTS (SELECT 1 FROM av a
                  WHERE a.binlog_file = b.binlog_file
                    AND a.binlog_position = b.binlog_position)
UNION ALL
SELECT a.binlog_file, a.binlog_position, CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'AVRO_ONLY'
FROM av a, wm
WHERE a.ts_ms + 5000 < wm.w
  AND NOT EXISTS (SELECT 1 FROM bl b
                  WHERE b.binlog_file = a.binlog_file
                    AND b.binlog_position = a.binlog_position)"""
    # Matryoshka eval: per-prefix brute-force tiers from the shared
    # parameterized scorer, graded like ann_recall_report
    tiers = "\nUNION ALL\n".join(
        f"SELECT {d} AS prefix_dim, query_id, neighbor_id FROM ({_brute_cosine_sql(d)})"
        for d in (8, 16, 32)
    )
    sql["ann_matryoshka_recall"] = f"""
WITH truth AS (SELECT query_id, neighbor_id FROM ({_brute_cosine_sql()})),
tagged AS (
{tiers}
)
SELECT t.prefix_dim, count(*) AS n_returned,
       CAST(sum(CASE WHEN tr.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS total_hits,
       round(sum(CASE WHEN tr.query_id IS NOT NULL THEN 1 ELSE 0 END)
             / 160.0, 6) AS recall
FROM tagged t
LEFT JOIN truth tr
  ON tr.query_id = t.query_id AND tr.neighbor_id = t.neighbor_id
GROUP BY t.prefix_dim"""
    # recall eval: composed from the method oracles above so the
    # ground truth and every index tier stay literally the same SQL
    sql["ann_recall_report"] = f"""
WITH truth AS (SELECT query_id, neighbor_id FROM ({sql["ann_cosine_topk"]})),
tagged AS (
  SELECT 'lsh' AS method, query_id, neighbor_id
  FROM ({sql["ann_cosine_topk_lsh"]})
  UNION ALL
  SELECT 'hamming' AS method, query_id, neighbor_id
  FROM ({sql["ann_hamming_topk"]})
  UNION ALL
  SELECT 'ivf' AS method, query_id, neighbor_id
  FROM ({sql["ann_cosine_topk_ivf"]})
)
SELECT t.method, count(*) AS n_returned,
       CAST(sum(CASE WHEN tr.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS total_hits,
       round(sum(CASE WHEN tr.query_id IS NOT NULL THEN 1 ELSE 0 END)
             / 160.0, 6) AS recall
FROM tagged t
LEFT JOIN truth tr
  ON tr.query_id = t.query_id AND tr.neighbor_id = t.neighbor_id
GROUP BY t.method"""

    # range-sort planner: 15 exact R-7 boundaries (quantile_cont),
    # 6-dp rounded; partition = #boundaries strictly below the price
    sql["lineitem_range_sort_plan"] = """
WITH b AS (
  SELECT list_transform(
           quantile_cont(l_extendedprice,
             [x / 16.0 FOR x IN range(1, 16)]),
           x -> round(x, 6)) AS bs,
         count(*) AS total
  FROM lineitem
),
tagged AS (
  SELECT len(list_filter(b.bs, x -> l.l_extendedprice > x)) AS partition,
         l.l_extendedprice AS price, b.total
  FROM lineitem l, b
)
SELECT partition, count(*) AS n_rows,
       min(price) AS min_price, max(price) AS max_price,
       round(count(*) / (any_value(total) / 16.0), 6) AS balance_ratio
FROM tagged GROUP BY partition"""

    # layout grading: per-file footer stats + range-predicate pruning
    # over the identical interleave chain
    sql["lineitem_zorder_skipping"] = f"""
WITH keyed AS (
  SELECT l_partkey,
         ({zorder_key_sql("l_partkey", "l_suppkey")}) >> 14 AS file_id
  FROM lineitem
)
SELECT file_id, count(*) AS n_rows,
       min(l_partkey) AS min_partkey, max(l_partkey) AS max_partkey,
       max(l_partkey) < 100 OR min(l_partkey) > 200 AS skippable
FROM keyed GROUP BY file_id"""

    # twin of analytics.k_anonymity_report: equivalence-class sizes
    # over the QI tuple + l-diversity on the order-priority column
    sql["customer_k_anonymity"] = """
WITH j AS (
  SELECT c_custkey, c_nationkey AS nationkey, c_mktsegment AS mktsegment,
         CAST(floor(c_acctbal / 1000.0) AS INTEGER) AS bal_bracket,
         o_orderpriority
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
)
SELECT nationkey, mktsegment, bal_bracket,
       count(DISTINCT c_custkey) AS k,
       count(DISTINCT o_orderpriority) AS l_diversity,
       CASE WHEN count(DISTINCT c_custkey) < 5 THEN 'HIGH'
            WHEN count(DISTINCT c_custkey) < 20 THEN 'MEDIUM'
            ELSE 'LOW' END AS risk_band
FROM j GROUP BY 1, 2, 3"""

    # twin of analytics.seasonal_profile: decimal-exact monthly sums,
    # 12-row centered-MA trend, exact-sum seasonal index
    sql["orders_seasonal_profile"] = """
WITH per_month AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders GROUP BY 1
),
trended AS (
  SELECT month, CAST(rev AS DOUBLE) AS revenue,
         CASE WHEN count(*) OVER w = 12
              THEN CAST(sum(rev) OVER w AS DOUBLE) / 12.0 END AS trend
  FROM per_month
  WINDOW w AS (ORDER BY month ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)
),
ratios AS (
  SELECT month, revenue, trend,
         round(revenue / trend, 6) AS ratio,
         substr(month, 6, 2) AS month_of_year
  FROM trended
),
idx AS (
  SELECT month_of_year,
         CAST(sum(CAST(ratio AS DECIMAL(18,6))) AS DOUBLE)
           / count(ratio) AS seasonal_index
  FROM ratios GROUP BY 1
)
SELECT r.month, r.revenue, r.trend, r.ratio, r.month_of_year,
       i.seasonal_index,
       round(r.revenue / i.seasonal_index, 4) AS deseasonalized
FROM ratios r JOIN idx i USING (month_of_year)"""

    # twin of analytics.user_lifecycle: per-user lag over distinct
    # active days, growth-accounting rollup per day
    sql["events_user_lifecycle"] = """
WITH user_days AS (
  SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
  FROM events WHERE user_id IS NOT NULL
),
tagged AS (
  SELECT day,
         CASE WHEN lag(day) OVER (PARTITION BY user_id ORDER BY day) IS NULL
                THEN 'new'
              WHEN date_diff('day',
                     CAST(lag(day) OVER (PARTITION BY user_id ORDER BY day) AS DATE),
                     CAST(day AS DATE)) <= 7 THEN 'returning'
              ELSE 'resurrected' END AS status
  FROM user_days
)
SELECT day, count(*) AS n_active,
       CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN status = 'returning' THEN 1 ELSE 0 END) AS BIGINT) AS n_returning,
       CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
FROM tagged GROUP BY day"""
    sql["events_lifecycle_incremental"] = sql["events_user_lifecycle"]


    # twin of analytics.supplier_similarity (df cap 200, top-5 peers
    # per supplier -- absolute thresholds are not scale-stable)
    sql["supplier_similarity"] = """
WITH sp AS (
  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
),
capped AS (
  SELECT * FROM sp WHERE p IN (
    SELECT p FROM sp GROUP BY p HAVING count(*) <= 200)
),
sizes AS (SELECT s, count(*) AS n_parts FROM capped GROUP BY s),
inter AS (
  SELECT a.s AS supp_a, b.s AS supp_b, count(*) AS n_shared
  FROM capped a JOIN capped b ON a.p = b.p AND a.s < b.s
  GROUP BY 1, 2
),
scored AS (
  SELECT supp_a, supp_b, n_shared, sa.n_parts AS n_a, sb.n_parts AS n_b,
         n_shared / CAST(sa.n_parts + sb.n_parts - n_shared AS DOUBLE)
           AS jaccard
  FROM inter
  JOIN sizes sa ON sa.s = supp_a
  JOIN sizes sb ON sb.s = supp_b
),
mirrored AS (
  SELECT supp_a, supp_b, n_shared, n_a, n_b, jaccard FROM scored
  UNION ALL
  SELECT supp_b AS supp_a, supp_a AS supp_b, n_shared,
         n_b AS n_a, n_a AS n_b, jaccard FROM scored
)
SELECT * FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY supp_a ORDER BY jaccard DESC, supp_b) AS INTEGER)
    AS rank
  FROM mirrored
) WHERE rank <= 5"""

    # twin of analytics.hourly_autocorr: exact-integer Pearson terms
    sql["events_hourly_autocorr"] = """
WITH hours AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS hour, count(*) AS c
  FROM events GROUP BY 1, 2
),
lags AS (SELECT unnest([1, 2, 3, 6, 12, 24]) AS lag),
pairs AS (
  SELECT cur.event_type, l.lag, cur.c AS cx, prev.c AS cy
  FROM hours cur
  CROSS JOIN lags l
  JOIN hours prev
    ON prev.event_type = cur.event_type
   AND prev.hour = cur.hour - l.lag
),
agg AS (
  SELECT event_type, lag, count(*) AS n_pairs,
         sum(cx) AS sx, sum(cy) AS sy,
         sum(cx * cx) AS qx, sum(cy * cy) AS qy,
         sum(cx * cy) AS a
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, lag, n_pairs,
       CASE WHEN CAST(n_pairs AS DOUBLE) * CAST(qx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND CAST(n_pairs AS DOUBLE) * CAST(qy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
            THEN (CAST(n_pairs AS DOUBLE) * CAST(a AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(qx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n_pairs AS DOUBLE) * CAST(qy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END AS r
FROM agg"""

    # twin of analytics.forecast_baseline_report
    sql["events_forecast_baseline"] = """
WITH hours AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS hour, count(*) AS c
  FROM events GROUP BY 1, 2
),
joined AS (
  SELECT cur.event_type, cur.c AS c_now, d.c AS c_day, p.c AS c_prev
  FROM hours cur
  JOIN hours d ON d.event_type = cur.event_type AND d.hour = cur.hour - 24
  JOIN hours p ON p.event_type = cur.event_type AND p.hour = cur.hour - 1
),
agg AS (
  SELECT event_type, count(*) AS n_hours,
         sum(abs(c_now - c_day)) AS es, sum(abs(c_now - c_prev)) AS en
  FROM joined GROUP BY 1
)
SELECT event_type, n_hours,
       es / CAST(n_hours AS DOUBLE) AS mae_seasonal,
       en / CAST(n_hours AS DOUBLE) AS mae_naive,
       CASE WHEN en > 0 THEN es / CAST(en AS DOUBLE) END AS mase
FROM agg"""

    # twin of analytics.top_movers (k=10, fixed 2024-01-16 split)
    sql["events_top_movers"] = """
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_first,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_second
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
scored AS (
  SELECT user_id, n_first, n_second,
         round(ln((n_second + 1) / CAST(n_first + 1 AS DOUBLE)), 6)
           AS log_ratio
  FROM per_user
),
r AS (
  SELECT 'RISER' AS direction,
         CAST(row_number() OVER (ORDER BY log_ratio DESC, user_id) AS INTEGER)
           AS rank,
         user_id, n_first, n_second, log_ratio
  FROM scored
),
f AS (
  SELECT 'FALLER' AS direction,
         CAST(row_number() OVER (ORDER BY log_ratio ASC, user_id) AS INTEGER)
           AS rank,
         user_id, n_first, n_second, log_ratio
  FROM scored
)
SELECT * FROM r WHERE rank <= 10
UNION ALL
SELECT * FROM f WHERE rank <= 10"""

    # twin of analytics.cohort_ltv
    sql["customer_cohort_ltv"] = """
WITH mk AS (
  SELECT o_custkey, o_totalprice,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m
  FROM orders
),
first_m AS (SELECT o_custkey, min(m) AS ck FROM mk GROUP BY o_custkey),
tri AS (
  SELECT f.ck, mk.m - f.ck AS age_months,
         count(DISTINCT mk.o_custkey) AS n_buyers,
         sum(CAST(mk.o_totalprice AS DECIMAL(12,2))) AS rev
  FROM mk JOIN first_m f USING (o_custkey)
  GROUP BY 1, 2
),
sizes AS (SELECT ck, n_buyers AS sz FROM tri WHERE age_months = 0),
cum AS (
  SELECT ck, age_months, n_buyers, rev,
         sum(rev) OVER (PARTITION BY ck ORDER BY age_months
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_rev
  FROM tri
)
SELECT CAST(ck // 12 AS VARCHAR) || '-' ||
         lpad(CAST(ck % 12 + 1 AS VARCHAR), 2, '0') AS cohort_month,
       age_months, n_buyers,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(cum_rev AS DOUBLE) AS cum_revenue,
       CAST(cum_rev AS DOUBLE) / s.sz AS cum_ltv_per_member
FROM cum JOIN sizes s USING (ck)"""

    # twin of analytics.fulfillment_sla_profile (sla 90 days)
    sql["orders_fulfillment_sla"] = """
WITH j AS (
  SELECT o_orderpriority AS priority,
         date_diff('day', CAST(o_orderdate AS DATE),
                   CAST(l_shipdate AS DATE)) AS d
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT priority, count(*) AS n_lines,
       sum(d) / CAST(count(*) AS DOUBLE) AS mean_delay_days,
       round(quantile_cont(d, 0.5), 6) AS p50,
       round(quantile_cont(d, 0.9), 6) AS p90,
       round(quantile_cont(d, 0.99), 6) AS p99,
       sum(CASE WHEN d > 90 THEN 1 ELSE 0 END)
         / CAST(count(*) AS DOUBLE) AS pct_over_sla
FROM j GROUP BY priority"""

    # twin of analytics.engagement_ratios (exact trailing distincts)
    sql["events_engagement_ratios"] = """
WITH user_days AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS d
  FROM events WHERE user_id IS NOT NULL
),
active AS (SELECT DISTINCT d FROM user_days),
contrib AS (
  SELECT u.user_id, u.d + o.o AS wd, o.o
  FROM user_days u, (SELECT unnest(range(0, 30)) AS o) o
),
per_day AS (
  SELECT c.wd,
         count(DISTINCT CASE WHEN c.o = 0 THEN c.user_id END) AS dau,
         count(DISTINCT CASE WHEN c.o <= 6 THEN c.user_id END) AS wau,
         count(DISTINCT c.user_id) AS mau
  FROM contrib c JOIN active a ON a.d = c.wd
  GROUP BY c.wd
)
SELECT strftime(epoch_ms(wd * 86400000), '%Y-%m-%d') AS day,
       dau, wau, mau, dau / CAST(mau AS DOUBLE) AS stickiness
FROM per_day"""

    # twin of analytics.returns_control_chart
    sql["orders_returns_control"] = """
WITH weekly AS (
  SELECT strftime(date_trunc('week', l_shipdate), '%Y-%m-%d') AS week,
         count(*) AS n_lines,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returned
  FROM lineitem GROUP BY 1
),
pooled AS (
  SELECT sum(n_returned) / CAST(sum(n_lines) AS DOUBLE) AS p_bar
  FROM weekly
)
SELECT week, n_lines, n_returned,
       n_returned / CAST(n_lines AS DOUBLE) AS rate,
       p.p_bar,
       p.p_bar + 3 * sqrt(p.p_bar * (1 - p.p_bar) / n_lines) AS ucl,
       greatest(p.p_bar - 3 * sqrt(p.p_bar * (1 - p.p_bar) / n_lines), 0.0)
         AS lcl,
       (n_returned / CAST(n_lines AS DOUBLE)
          > p.p_bar + 3 * sqrt(p.p_bar * (1 - p.p_bar) / n_lines))
       OR (n_returned / CAST(n_lines AS DOUBLE)
          < greatest(p.p_bar - 3 * sqrt(p.p_bar * (1 - p.p_bar) / n_lines),
                     0.0)) AS out_of_control
FROM weekly CROSS JOIN pooled p"""

    # twin of analytics.sourcing_concentration
    sql["part_sourcing_hhi"] = """
WITH per_supp AS (
  SELECT l_partkey // 100 AS bracket, l_suppkey,
         sum(CAST(l_quantity AS DECIMAL(12,2))) AS q
  FROM lineitem GROUP BY 1, 2
),
agg AS (
  SELECT bracket, count(*) AS n_suppliers, sum(q) AS tot,
         sum(CAST(q * q AS DECIMAL(38,4))) AS sq
  FROM per_supp GROUP BY bracket
)
SELECT bracket, n_suppliers,
       CAST(tot AS DOUBLE) AS total_qty,
       CAST(sq AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))
         AS hhi,
       CASE WHEN CAST(sq AS DOUBLE)
                 / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)) < 0.15
              THEN 'COMPETITIVE'
            WHEN CAST(sq AS DOUBLE)
                 / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)) < 0.25
              THEN 'MODERATE'
            ELSE 'CONCENTRATED' END AS band
FROM agg"""

    # twin of analytics.slo_burn_rates (budget 0.05)
    sql["events_slo_burn"] = """
WITH hours AS (
  SELECT epoch_ms(ts) // 3600000 AS h, count(*) AS n,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS e
  FROM events GROUP BY 1
),
contrib AS (
  SELECT n, e, o.o, h + o.o AS wh
  FROM hours, (SELECT unnest(range(0, 6)) AS o) o
),
win AS (
  SELECT c.wh,
         CAST(sum(CASE WHEN c.o = 0 THEN c.n END) AS BIGINT) AS n_1h,
         CAST(sum(CASE WHEN c.o = 0 THEN c.e END) AS BIGINT) AS err_1h,
         CAST(sum(c.n) AS BIGINT) AS n_6h,
         CAST(sum(c.e) AS BIGINT) AS err_6h
  FROM contrib c JOIN hours a ON a.h = c.wh
  GROUP BY c.wh
)
SELECT wh * 3600000 AS hour_ms, n_1h, err_1h,
       err_1h / CAST(n_1h AS DOUBLE) / 0.05 AS burn_1h,
       n_6h, err_6h,
       err_6h / CAST(n_6h AS DOUBLE) / 0.05 AS burn_6h,
       (err_1h / CAST(n_1h AS DOUBLE) / 0.05 > 2.0)
         AND (err_6h / CAST(n_6h AS DOUBLE) / 0.05 > 1.0) AS page
FROM win"""
