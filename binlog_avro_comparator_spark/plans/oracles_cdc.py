"""DuckDB oracle SQL, part 1/3 (split from registry.py,
round 7).  ASSEMBLY ORDER IS LOAD-BEARING: later entries compose
earlier ones via f-strings, so registry.oracle_sql() must call
the three add() builders in file order."""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from .oracle_ctes import *  # noqa: F401,F403

# effective column-membership fold over the ddl CTE (m-arithmetic
# mirror of ddl.schema_column_matrix): shared by cdc_schema_columns
# and the cdc_schema_vs_lake agreement report.  m=1 CREATE declares
# (id, order_id, quantity) -- order_id/quantity deliberately overlap
# the avro payload's field names; m=3 (TRUNCATE/INDEX/MAINTENANCE)
# contributes versions but never touches membership
_COLS_FOLD_CTES = """vd AS (
  SELECT *, row_number() OVER (PARTITION BY schema_name, table_name
      ORDER BY vts, binlog_file, log_position, event_id, pair_no) AS version
  FROM ddl
),
fx AS (
  SELECT schema_name, table_name, version, 'c' || f4 AS col, TRUE AS e
  FROM vd WHERE m = 0
  UNION ALL
  SELECT schema_name, table_name, version, 'a' || f4, TRUE
  FROM vd WHERE m = 5
  UNION ALL
  SELECT schema_name, table_name, version, 'c' || f4, FALSE
  FROM vd WHERE m IN (4, 5, 7, 8)
  UNION ALL
  SELECT schema_name, table_name, version, 'r' || f4, TRUE
  FROM vd WHERE m = 7
  UNION ALL
  SELECT schema_name, table_name, version, 'n' || f4, TRUE
  FROM vd WHERE m = 8
  UNION ALL
  SELECT schema_name, table_name, version, 'p' || f4, TRUE
  FROM vd WHERE m = 10
  UNION ALL
  SELECT schema_name, table_name, version, 'x' || f4, TRUE
  FROM vd WHERE m = 12
  UNION ALL
  SELECT schema_name, table_name, version, 'y' || f4, TRUE
  FROM vd WHERE m = 12
),
uni AS (
  SELECT DISTINCT schema_name, table_name, col FROM (
    SELECT schema_name, table_name, col FROM fx
    UNION ALL
    SELECT schema_name, table_name, c.col
    FROM (SELECT DISTINCT schema_name, table_name FROM vd WHERE m = 1) t
    CROSS JOIN (SELECT unnest(['id', 'order_id', 'quantity']) AS col) c
  )
),
grid AS (
  SELECT v.schema_name, v.table_name, v.version, u.col,
    CASE WHEN v.m = 1 THEN (u.col IN ('id', 'order_id', 'quantity'))
         WHEN v.m = 2 THEN FALSE
         ELSE f.e END AS effect
  FROM vd v
  JOIN uni u USING (schema_name, table_name)
  LEFT JOIN fx f ON f.schema_name = v.schema_name
    AND f.table_name = v.table_name AND f.version = v.version
    AND f.col = u.col
),
pres AS (
  SELECT *, last_value(effect IGNORE NULLS) OVER (
    PARTITION BY schema_name, table_name, col ORDER BY version
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS present
  FROM grid
)"""


def add(sql: dict) -> None:
    sql.update({
        # extended-type row-image tier: derivation mirrored from
        # fixtures._typed_value_cols via _TYPED_VALUE_SQL
        "cdc_parse_binlog_typed": _TYPED_PARSE_ORACLE,
        "cdc_payload_diff_typed": _TYPED_DIFF_ORACLE,
        # ops tier: GTID gaps = GNOs the prepared feed never carried
        # (Query drops, zero positions, empty files, dedup losers)
        # transaction reassembly: per-GTID rollup with commit markers
        "cdc_transactions": "WITH " + oracle.CDC_CTES.strip() + """
SELECT gtid_next AS gtid, count(*) AS n_events,
       CAST(sum(CASE WHEN event_type IN ('WriteRowsEventV2',
                'UpdateRowsEventV2', 'DeleteRowsEventV2')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_dml,
       CAST(count(DISTINCT CASE WHEN "table" IS NOT NULL
                 AND "table" <> '' THEN "table" END) AS BIGINT)
         AS n_tables,
       min(log_position) AS first_position,
       max(log_position) AS last_position,
       max(CASE WHEN event_type = 'XID' THEN 1 ELSE 0 END) = 1
         AS committed
FROM binlog_events_cdc
WHERE gtid_next IS NOT NULL AND gtid_next <> ''
GROUP BY gtid_next""",
        # per-table reconciliation scorecard: the summary counters
        # broken out by (schema, table); matched counts avro-row
        # granularity, BINLOG_ONLY counts DML only (like cdc_summary)
        "cdc_table_scorecard": "WITH " + oracle.CDC_CTES.strip() + """
, per AS (
  SELECT database AS schema_name, "table" AS table_name,
         1 AS m, CASE WHEN ts_mismatch THEN 1 ELSE 0 END AS tsm,
         CASE WHEN gtid_mismatch THEN 1 ELSE 0 END AS gm,
         CASE WHEN change_type_mismatch THEN 1 ELSE 0 END AS cm,
         0 AS ao, 0 AS bo
  FROM matched_flagged
  UNION ALL
  SELECT database, "table", 0, 0, 0, 0, 1, 0 FROM avro_only_cdc
  UNION ALL
  SELECT "schema", "table", 0, 0, 0, 0, 0, 1 FROM binlog_only_cdc
)
SELECT schema_name, table_name,
       CAST(sum(m) AS BIGINT) AS n_matched,
       CAST(sum(tsm) AS BIGINT) AS n_ts_mismatch,
       CAST(sum(gm) AS BIGINT) AS n_gtid_mismatch,
       CAST(sum(cm) AS BIGINT) AS n_change_type_mismatch,
       CAST(sum(ao) AS BIGINT) AS n_avro_only,
       CAST(sum(bo) AS BIGINT) AS n_binlog_only,
       (sum(tsm) = 0 AND sum(cm) = 0 AND sum(ao) = 0 AND sum(bo) = 0)
         AS consistent
FROM per GROUP BY schema_name, table_name""",
        # per-minute reconciliation health: row presence per bucket;
        # BINLOG_ONLY rows bucket by the binlog-side effective ms
        "cdc_match_timeline": "WITH " + oracle.CDC_CTES.strip() + """
, per AS (
  SELECT source_timestamp AS eff_ms,
         1 AS m, CASE WHEN ts_mismatch THEN 1 ELSE 0 END AS tsm,
         0 AS ao, 0 AS bo
  FROM matched_flagged
  UNION ALL
  SELECT source_timestamp, 0, 0, 1, 0 FROM avro_only_cdc
  UNION ALL
  SELECT CASE
           WHEN immediate_commmit_timestamp IS NOT NULL
                AND immediate_commmit_timestamp <> ''
             THEN epoch_ms(try_strptime(immediate_commmit_timestamp,
                                        '%Y-%m-%dT%H:%M:%S.%fZ'))
           WHEN "timestamp" IS NOT NULL AND "timestamp" <> ''
             THEN epoch_ms(try_strptime("timestamp",
                                        '%Y-%m-%dT%H:%M:%SZ'))
           ELSE -62135596800000 END,
         0, 0, 0, 1
  FROM binlog_only_cdc
)
SELECT CAST(floor(eff_ms / 60000) * 60000 AS BIGINT) AS bucket_ms,
       CAST(sum(m) AS BIGINT) AS n_matched,
       CAST(sum(tsm) AS BIGINT) AS n_ts_mismatch,
       CAST(sum(ao) AS BIGINT) AS n_avro_only,
       CAST(sum(bo) AS BIGINT) AS n_binlog_only,
       round(sum(m) / CAST(sum(m) + sum(ao) + sum(bo) AS DOUBLE), 6)
         AS match_rate
FROM per GROUP BY 1""",
        # transaction-completeness: per-GTID landed-row rollup; the
        # inner GROUP BY collapses duplicate avro matches per key so
        # n_landed cannot double-count
        "cdc_gtid_coverage": "WITH " + oracle.CDC_CTES.strip() + """
, per_key AS (
  SELECT b.gtid_next AS gtid, b.binlog_file, b.log_position,
         max(CASE WHEN a.binlog_file IS NOT NULL THEN 1 ELSE 0 END)
           AS landed
  FROM binlog_prepared b
  LEFT JOIN avro_prepared a
    ON a.binlog_file = b.binlog_file
   AND a.binlog_position = b.log_position
  WHERE b.event_type LIKE '%RowsEventV2'
    AND b.gtid_next IS NOT NULL AND b.gtid_next <> ''
  GROUP BY 1, 2, 3
)
SELECT gtid, count(*) AS n_rows,
       CAST(sum(landed) AS BIGINT) AS n_landed,
       CASE WHEN sum(landed) = count(*) THEN 'FULL'
            WHEN sum(landed) = 0 THEN 'MISSING'
            ELSE 'PARTIAL' END AS status
FROM per_key GROUP BY gtid""",
        # near-miss recovery: anti-residue rows within 16 bytes in the
        # same file; GTID equality upgrades POSITIONAL to RECOVERABLE
        "cdc_near_miss_keys": "WITH " + oracle.CDC_CTES.strip() + """
SELECT DISTINCT a.binlog_file,
       a.binlog_position AS avro_position,
       b.log_position AS binlog_position,
       a.binlog_position - b.log_position AS delta,
       (a.gtid IS NOT NULL AND a.gtid <> '' AND a.gtid = b.gtid_next)
         AS gtid_match,
       CASE WHEN a.gtid IS NOT NULL AND a.gtid <> ''
                 AND a.gtid = b.gtid_next
            THEN 'RECOVERABLE' ELSE 'POSITIONAL' END AS status
FROM avro_only_cdc a
JOIN binlog_only_cdc b
  ON b.binlog_file = a.binlog_file
 AND abs(a.binlog_position - b.log_position) <= 16""",
        # feed silence: islands over the distinct active minutes
        "events_feed_gaps": """
WITH m AS (
  SELECT DISTINCT CAST(floor(epoch_ms(ts) / 60000) * 60000 AS BIGINT) AS m
  FROM events
),
l AS (SELECT m, lag(m) OVER (ORDER BY m) AS prev FROM m)
SELECT prev + 60000 AS gap_start_ms, m - 60000 AS gap_end_ms,
       CAST((m - prev) / 60000 - 1 AS BIGINT) AS n_minutes
FROM l WHERE prev IS NOT NULL AND m - prev > 60000""",
        # the applied complement of the gaps: islands compression
        "cdc_gtid_set": "WITH " + oracle.CDC_CTES.strip() + """
, g AS (
  SELECT DISTINCT split_part(gtid_next, ':', 1) AS sid,
         CAST(split_part(gtid_next, ':', 2) AS BIGINT) AS gno
  FROM binlog_prepared WHERE contains(gtid_next, ':')
)
SELECT sid, min(gno) AS interval_start, max(gno) AS interval_end,
       count(*) AS n_gnos
FROM (SELECT sid, gno,
             gno - row_number() OVER (PARTITION BY sid ORDER BY gno)
               AS island
      FROM g)
GROUP BY sid, island""",
        "cdc_gtid_gaps": "WITH " + oracle.CDC_CTES.strip() + """
, g AS (
  SELECT DISTINCT split_part(gtid_next, ':', 1) AS sid,
         CAST(split_part(gtid_next, ':', 2) AS BIGINT) AS gno
  FROM binlog_prepared WHERE contains(gtid_next, ':')
)
SELECT sid, prev + 1 AS gap_start, gno - 1 AS gap_end,
       gno - prev - 1 AS n_missing
FROM (SELECT sid, gno,
             lag(gno) OVER (PARTITION BY sid ORDER BY gno) AS prev
      FROM g)
WHERE prev IS NOT NULL AND gno > prev + 1""",
        # ops tier: per-file position-monotonicity audit on the RAW
        # feed; zeroed positions are the planted inversions
        "cdc_order_audit": "WITH " + oracle.CDC_CTES.strip() + """
, base AS (SELECT * FROM binlog_events_cdc WHERE binlog_file <> ''),
inv AS (
  SELECT binlog_file, log_position,
         max(log_position) OVER (
           PARTITION BY binlog_file ORDER BY line_no
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_max
  FROM base)
SELECT binlog_file, count(*) AS n_events,
       CAST(coalesce(sum(CASE WHEN log_position < run_max
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_inversions,
       min(log_position) AS min_pos, max(log_position) AS max_pos
FROM inv GROUP BY binlog_file""",
        # ops tier: per-minute replication-lag trend over matched pairs
        "cdc_lag_timeline": "WITH " + oracle.CDC_CTES.strip() + """
SELECT CAST(floor(source_timestamp / 60000) * 60000 AS BIGINT) AS bucket_ms,
       count(*) AS n,
       round(quantile_cont(ts_delta_ms, 0.5), 6) AS p50_ms,
       round(quantile_cont(ts_delta_ms, 0.99), 6) AS p99_ms
FROM matched WHERE ts_delta_ms IS NOT NULL
GROUP BY 1""",
        # debug channel: clean fixtures refuse nothing -- one all-zero
        # row per binlog segment file
        "cdc_binlog_skip_stats": """
SELECT DISTINCT
  'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0') AS binlog_file,
  CAST(0 AS BIGINT) AS crc_failed,
  CAST(0 AS BIGINT) AS compressed_tx_skipped
FROM events
WHERE event_id % 223 <> 0""",
        # rotation chain: the fixture writes a correct chain, so the
        # audit reads all-OK + one ACTIVE_TAIL; file set mirrors the
        # skip-stats derivation (events partition to 4 segments, the
        # EMPTY_FILE_MOD rows carry no file)
        "cdc_rotate_chain": """
WITH files AS (
  SELECT DISTINCT
    'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0') AS binlog_file
  FROM events WHERE event_id % 223 <> 0
),
chain AS (
  SELECT binlog_file,
         lead(binlog_file) OVER (ORDER BY binlog_file) AS expected_next
  FROM files
)
SELECT binlog_file, expected_next AS rotate_next, expected_next,
       CASE WHEN expected_next IS NULL THEN 'ACTIVE_TAIL' ELSE 'OK' END
         AS status
FROM chain""",
        "cdc_binlog_events": oracle.cdc_binlog_events(),
        "cdc_avro_rows": oracle.cdc_avro_rows(),
        "cdc_avro_native_scan": oracle.cdc_avro_native_scan(),
        "cdc_avro_evolved_scan": oracle.cdc_avro_evolved_scan(),
        # logical-type lake scan: values re-derived from events with
        # the same arithmetic the fixture encoder used; the Spark side
        # went through real avro decimal/date/time/timestamp bytes
        "cdc_avro_logical_scan": """
SELECT event_id AS id,
       concat(CASE WHEN event_id % 4 = 0 THEN '-' ELSE '' END,
              CAST((1 + (event_id * 53) % 99999999) // 100 AS VARCHAR),
              '.',
              lpad(CAST((1 + (event_id * 53) % 99999999) % 100 AS VARCHAR),
                   2, '0')) AS amount,
       epoch_us(ts) AS created_ts_us,
       strftime(ts, '%Y-%m-%d') AS created_date,
       strftime(ts, '%H:%M:%S') AS time_of_day,
       concat('00000000-0000-4000-8000-',
              lpad(CAST(event_id AS VARCHAR), 12, '0')) AS uid
FROM events""",
        "cdc_resume_bookmarks": oracle.cdc_resume_bookmarks(),
        # JVM engine reads the same fixture files -> same oracle
        "cdc_avro_native_scan_jvm": oracle.cdc_avro_native_scan(),
        "cdc_binlog_prepared": oracle.cdc_binlog_prepared(),
        "cdc_matches": oracle.cdc_matches(),
        "cdc_latency_stats": oracle.cdc_latency_stats(),
        "cdc_replica_checksums": oracle.cdc_replica_checksums(),
        "cdc_avro_only": oracle.cdc_avro_only(),
        "cdc_binlog_only": oracle.cdc_binlog_only(),
        "cdc_findings": oracle.cdc_findings(),
        "cdc_findings_stream": oracle.cdc_findings_stream(),
        "cdc_summary": oracle.cdc_summary(),
        # Roundtrip oracle: the parse pipeline must reproduce the
        # derivation table directly (line_no becomes the per-file event
        # ordinal, since text regenerates events in line_no order).
        "cdc_parse_binlog_text": "WITH "
        + oracle.CDC_CTES.strip().rstrip()
        + """
SELECT event_type, "timestamp", immediate_commmit_timestamp, log_position,
       "schema", "table", gtid_next, binlog_file,
       row_number() OVER (PARTITION BY binlog_file ORDER BY line_no) AS line_no
FROM binlog_events_cdc WHERE binlog_file <> ''""",
        # identical contract through the Python DataSource (same text,
        # same parser, same expected table)
        "cdc_parse_binlog_text_pyds": "WITH "
        + oracle.CDC_CTES.strip().rstrip()
        + """
SELECT event_type, "timestamp", immediate_commmit_timestamp, log_position,
       "schema", "table", gtid_next, binlog_file,
       row_number() OVER (PARTITION BY binlog_file ORDER BY line_no) AS line_no
FROM binlog_events_cdc WHERE binlog_file <> ''""",
        "dedup_exact": (
            "SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,"
            " count(*) AS n_copies FROM documents GROUP BY md5(text)"
        ),
        "token_count": rf"""
SELECT doc_id, length(text) AS text_len,
       len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS n_bpe_tokens,
       n_chars
FROM documents""",
        # twin of textstats.token_allocation
        "corpus_token_allocation": rf"""
WITH caps AS (
  SELECT source,
         CAST(sum(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}'))) AS BIGINT)
           AS cap
  FROM documents GROUP BY source
),
ranked AS (
  SELECT source, cap,
         row_number() OVER (ORDER BY cap, source) AS i,
         coalesce(sum(cap) OVER (ORDER BY cap, source
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS cum
  FROM caps
),
tot AS (SELECT sum(cap) AS t, count(*) AS k FROM caps),
j AS (
  SELECT *, floor(0.5 * CAST(t AS DOUBLE)) AS target,
         (floor(0.5 * CAST(t AS DOUBLE)) - CAST(cum AS DOUBLE))
           / CAST(k - i + 1 AS DOUBLE) AS cand
  FROM ranked, tot
),
lvl AS (
  SELECT round(min({{'i': i, 'cand': cand}}).cand, 6) AS water_level
  FROM j WHERE CAST(cap AS DOUBLE) >= cand
)
SELECT source, cap AS n_tokens_cap,
       round(least(CAST(cap AS DOUBLE), water_level), 6) AS allocation,
       water_level,
       CAST(cap AS DOUBLE) <= water_level AS is_capped
FROM j, lvl""",
        # twin of analytics.median_of_means
        "lineitem_median_of_means": """
WITH per AS (
  SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':'
                             || CAST(l_linenumber AS VARCHAR)), 1, 12))::BIGINT
           % 32 AS b,
         count(*) AS n, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS s
  FROM lineitem GROUP BY 1
),
means AS (SELECT b, n, s, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m FROM per)
SELECT CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_buckets,
       round(CAST(sum(s) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6) AS mean,
       round(round(quantile_cont(m, 0.5), 9), 6) AS median_of_means
FROM means""",
        # twin of analytics.rfm_scores
        "customer_rfm_scores": """
WITH per AS (
  SELECT o_custkey, max(o_orderdate) AS last_d, count(*) AS frequency,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS m
  FROM orders GROUP BY 1
),
anchor AS (SELECT max(last_d) AS a FROM per),
base AS (
  SELECT o_custkey, datediff('day', last_d, a) AS recency_days, frequency,
         round(CAST(m AS DOUBLE), 2) AS monetary
  FROM per, anchor
),
b AS (
  SELECT
    [round(round(quantile_cont(recency_days, 0.2), 9), 6),
     round(round(quantile_cont(recency_days, 0.4), 9), 6),
     round(round(quantile_cont(recency_days, 0.6), 9), 6),
     round(round(quantile_cont(recency_days, 0.8), 9), 6)] AS br,
    [round(round(quantile_cont(frequency, 0.2), 9), 6),
     round(round(quantile_cont(frequency, 0.4), 9), 6),
     round(round(quantile_cont(frequency, 0.6), 9), 6),
     round(round(quantile_cont(frequency, 0.8), 9), 6)] AS bf,
    [round(round(quantile_cont(monetary, 0.2), 9), 6),
     round(round(quantile_cont(monetary, 0.4), 9), 6),
     round(round(quantile_cont(monetary, 0.6), 9), 6),
     round(round(quantile_cont(monetary, 0.8), 9), 6)] AS bm
  FROM base
),
scored AS (
  SELECT o_custkey, recency_days, frequency, monetary,
         5 - len(list_filter(br, x -> x < recency_days)) AS r_score,
         1 + len(list_filter(bf, x -> x < frequency)) AS f_score,
         1 + len(list_filter(bm, x -> x < monetary)) AS m_score
  FROM base, b
)
SELECT o_custkey, recency_days, frequency, monetary,
       CAST(r_score AS INTEGER) AS r_score,
       CAST(f_score AS INTEGER) AS f_score,
       CAST(m_score AS INTEGER) AS m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS segment
FROM scored""",
        # twin of textstats.zipf_fit
        "corpus_zipf_fit": rf"""
WITH words AS (
  SELECT unnest(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS w
  FROM documents
),
freq AS (SELECT w, count(*) AS f FROM words GROUP BY w),
top AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, w ASC) AS rnk
  FROM freq ORDER BY f DESC, w ASC LIMIT 500
),
xy AS (
  SELECT CAST(round(ln(CAST(rnk AS DOUBLE)), 9) AS DECIMAL(12,9)) AS x,
         CAST(round(ln(CAST(f AS DOUBLE)), 9) AS DECIMAL(12,9)) AS y
  FROM top
),
agg AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM xy
),
k AS (
  SELECT n,
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
SELECT n AS v_size,
       round(CASE WHEN den > 0 THEN num / den ELSE 0.0 END, 6) AS slope,
       round((syd - (CASE WHEN den > 0 THEN num / den ELSE 0.0 END) * sxd)
             / nd, 6) AS intercept,
       round(CASE WHEN den > 0 AND deny > 0
                  THEN (num / (sqrt(den) * sqrt(deny)))
                       * (num / (sqrt(den) * sqrt(deny)))
                  ELSE 0.0 END, 6) AS r2
FROM k""",
        "text_quality": rf"""
SELECT doc_id, length(text) AS text_len,
       len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS n_words,
       len(regexp_extract_all(text, '{_EN_RE}')) AS n_stopwords,
       len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
       length(text) / len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS chars_per_word,
       len(regexp_extract_all(text, '{_EN_RE}')) / len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS stopword_ratio,
       len(regexp_extract_all(text, '[.,!?;:]')) / length(text) AS punct_ratio
FROM documents""",
        "lang_id": rf"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_EN_RE}')) AS en_hits,
       len(regexp_extract_all(text, '{_FR_RE}')) AS fr_hits,
       len(regexp_extract_all(text, '{_DE_RE}')) AS de_hits,
       CASE
         WHEN len(regexp_extract_all(text, '{_EN_RE}')) = 0
          AND len(regexp_extract_all(text, '{_FR_RE}')) = 0
          AND len(regexp_extract_all(text, '{_DE_RE}')) = 0 THEN 'unknown'
         WHEN len(regexp_extract_all(text, '{_EN_RE}')) >= len(regexp_extract_all(text, '{_FR_RE}'))
          AND len(regexp_extract_all(text, '{_EN_RE}')) >= len(regexp_extract_all(text, '{_DE_RE}')) THEN 'en'
         WHEN len(regexp_extract_all(text, '{_FR_RE}')) >= len(regexp_extract_all(text, '{_DE_RE}')) THEN 'fr'
         ELSE 'de' END AS lang_guess,
       lang
FROM documents""",
        "doc_fingerprint": rf"""
SELECT doc_id, len(w) AS n_words,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(w, x -> ('0x' || substr(md5(x), 1, 12))::BIGINT)),
         (acc, h) -> (acc * 31 + h) % 1000000007) AS fingerprint
FROM (SELECT doc_id, regexp_extract_all(text, '{_TOKEN_RE_SQL}') AS w FROM documents)""",
        "tfidf_top_terms": rf"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY doc_id, term),
dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, df,
         round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
  FROM tf JOIN dfc USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf, rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= 3""",
        "distinct_users_per_type": """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
       round(avg(value), 4) AS avg_value
FROM events GROUP BY event_type""",
        "minhash_signatures": _minhash_sig_sql(),
        "minhash_lsh_pairs": _lsh_pairs_sql(),
        # the maintained-index fold's read-union contract: the same
        # candidate-pair set as the batch LSH join, verbatim
        "corpus_lsh_incremental": _lsh_pairs_sql(),
        "doc_levenshtein_pairs": _lsh_pairs_sql().replace(
            "SELECT DISTINCT doc_a, doc_b FROM (",
            ",\ncand AS (SELECT DISTINCT doc_a, doc_b FROM (",
        )
        + """
)
SELECT doc_a, doc_b,
       levenshtein(substr(ta.text, 1, 100), substr(tb.text, 1, 100))
         AS edit_distance
FROM cand
JOIN documents ta ON cand.doc_a = ta.doc_id
JOIN documents tb ON cand.doc_b = tb.doc_id
WHERE levenshtein(substr(ta.text, 1, 100), substr(tb.text, 1, 100)) <= 30""",
        "dedup_clusters": _dedup_clusters_sql(),
        "corpus_curation_pipeline": _corpus_curation_sql(),
        "doc_shards": f"""
SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 32 AS shard,
       count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}'))) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1""",
        # boundary-based deciles (see textstats.quality_deciles: no
        # global window); quantile_cont == Spark percentile (both R-7)
        "doc_quality_deciles": """
WITH bs AS (
  SELECT quantile_cont(n_chars, [0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1]) AS b
  FROM documents
)
SELECT doc_id, lang, n_chars,
       1 + len(list_filter(bs.b, x -> n_chars < x)) AS decile
FROM documents, bs""",
        "doc_token_ids": f"""
WITH counts AS (
  SELECT w AS word, count(*) AS n
  FROM (SELECT unnest(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS w FROM documents)
  GROUP BY w
),
top AS (SELECT * FROM counts ORDER BY n DESC, word LIMIT 200),
vocab AS (
  SELECT word, row_number() OVER (ORDER BY n DESC, word) AS token_id FROM top
),
words AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS word,
         generate_subscripts(regexp_extract_all(text, '{_TOKEN_RE_SQL}'), 1) AS pos
  FROM documents
),
joined AS (
  SELECT doc_id, pos, coalesce(v.token_id, 0) AS tid
  FROM words LEFT JOIN vocab v USING (word)
)
SELECT doc_id, count(*) AS n_tokens,
       string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos) AS token_ids_csv
FROM joined GROUP BY doc_id""",
        # twin of textstats.bpe_merge_candidates: distinct-word pair
        # enumeration via range() (empty for 1-char words), weighted by
        # word frequency, lexicographic tie-breaks
        "corpus_bpe_merges": f"""
WITH wf AS (
  SELECT w AS word, count(*) AS n
  FROM (SELECT unnest(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS w FROM documents)
  GROUP BY w
),
pos AS (SELECT word, n, unnest(range(1, length(word))) AS i FROM wf),
pairs AS (
  SELECT substr(word, i, 1) AS left_sym, substr(word, i + 1, 1) AS right_sym,
         CAST(sum(n) AS BIGINT) AS pair_count
  FROM pos GROUP BY 1, 2
),
top AS (SELECT * FROM pairs
        ORDER BY pair_count DESC, left_sym, right_sym LIMIT 20)
SELECT left_sym, right_sym, pair_count,
       row_number() OVER (ORDER BY pair_count DESC, left_sym, right_sym)
         AS merge_rank
FROM top""",
        "corpus_vocab_topk": f"""
WITH counts AS (
  SELECT w AS word, count(*) AS n
  FROM (SELECT unnest(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS w FROM documents)
  GROUP BY w
),
top AS (SELECT * FROM counts ORDER BY n DESC, word LIMIT 200)
SELECT word, n, row_number() OVER (ORDER BY n DESC, word) AS token_id FROM top""",
        "dedup_keep_canonical": (
            "SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d\n"
            "ANTI JOIN (\n"
            "  SELECT doc_id FROM (\n" + _dedup_clusters_sql() + "\n"
            "  ) WHERE doc_id <> cluster_id\n"
            ") l ON d.doc_id = l.doc_id"
        ),
        "text_clean": """
SELECT doc_id,
       trim(regexp_replace(
           regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               'https?://[^\\s]+', '<URL>', 'g'),
           '\\s+', ' ', 'g')) AS clean_text,
       length(text) - length(trim(regexp_replace(
           regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               'https?://[^\\s]+', '<URL>', 'g'),
           '\\s+', ' ', 'g'))) AS removed_chars
FROM documents""",
        # exact interpolated quantiles: both engines implement R-7
        "doc_length_quantiles": """
SELECT lang, count(*) AS n_docs,
       quantile_cont(n_chars, 0.5) AS p50_chars,
       quantile_cont(n_chars, 0.9) AS p90_chars,
       quantile_cont(n_chars, 0.99) AS p99_chars
FROM documents GROUP BY lang""",
        "doc_stratified_sample": """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE ('0x' || substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 10 = 0""",
        "doc_unigram_logprob": rf"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS term FROM documents
),
tc AS (SELECT term, count(*) AS tc FROM words GROUP BY term),
total AS (SELECT CAST(sum(tc) AS DOUBLE) AS total_tokens FROM tc)
SELECT doc_id, count(*) AS n_tokens,
       round(sum(log10(CAST(tc.tc AS DOUBLE))) / count(*)
             - log10((SELECT total_tokens FROM total)), 6) AS mean_logprob
FROM words JOIN tc USING (term)
GROUP BY doc_id""",
        "corpus_mixture_weights": rf"""
WITH toks AS (
  SELECT lang, source, len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS n FROM documents
),
grp AS (
  SELECT lang, source, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens
  FROM toks GROUP BY lang, source
),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS t FROM grp),
w AS (
  SELECT lang, source, n_docs, n_tokens,
         n_tokens / (SELECT t FROM tot) AS weight,
         pow(n_tokens / (SELECT t FROM tot), 0.7) AS pw
  FROM grp
),
z AS (SELECT sum(pw) AS z FROM w)
SELECT lang, source, n_docs, n_tokens, round(weight, 6) AS weight,
       round(pw / (SELECT z FROM z), 6) AS weight_smoothed
FROM w""",
        # twin of textstats.sample_k_per_group: bottom-k by the portable
        # doc_id hash per lang (the oracle may use a rank window -- the
        # Spark side must not, plan-tested)
        "doc_sample_k_per_group": """
WITH hashed AS (
  SELECT doc_id, lang, source, n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS h
  FROM documents
),
ranked AS (
  SELECT doc_id, lang, source, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
  FROM hashed
)
SELECT doc_id, lang, source, n_chars FROM ranked WHERE rn <= 10""",
        "doc_repeated_spans": rf"""
WITH doc_words AS (
  SELECT doc_id, regexp_extract_all(text, '{_TOKEN_RE_SQL}') AS w FROM documents
),
doc_spans AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(span), 1, 12))::BIGINT % {MINHASH_PRIME} AS h
  FROM (
    SELECT doc_id, unnest(
      CASE WHEN len(w) >= 20 THEN list_transform(
        generate_series(1, len(w) - 19), i -> array_to_string(w[i:i+19], ' '))
      ELSE [] END) AS span
    FROM doc_words
  )
),
span_df AS (SELECT h, count(*) AS df FROM doc_spans GROUP BY h)
SELECT d.doc_id, count(*) AS n_spans,
       CAST(sum(CASE WHEN s.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
       sum(CASE WHEN s.df >= 2 THEN 1 ELSE 0 END) / count(*) AS repeated_ratio
FROM doc_spans d JOIN span_df s USING (h)
GROUP BY d.doc_id""",
        # twin of dedup.remove_repeated_spans (k=20, keep_first):
        # same 48-bit span hash, EVERY occurrence with its 1-based
        # position, df over distinct docs, covered-index union, rebuild
        # as the ordered single-space join of surviving words
        "doc_span_removal": rf"""
WITH doc_words AS (
  SELECT doc_id, regexp_extract_all(text, '{_TOKEN_RE_SQL}') AS w FROM documents
),
spans AS (
  SELECT doc_id, s.pos AS pos, s.h AS h FROM (
    SELECT doc_id, unnest(
      CASE WHEN len(w) >= 20 THEN list_transform(
        generate_series(1, len(w) - 19),
        i -> struct_pack(pos := i,
               h := ('0x' || substr(md5(array_to_string(w[i:i+19], ' ')), 1, 12))::BIGINT % {MINHASH_PRIME}))
      ELSE [] END) AS s
    FROM doc_words)
),
spandf AS (
  SELECT h, min(doc_id) AS keeper FROM spans GROUP BY h
  HAVING count(DISTINCT doc_id) >= 2
),
rem AS (
  SELECT s.doc_id, s.pos FROM spans s JOIN spandf d USING (h)
  WHERE s.doc_id <> d.keeper
),
covered AS (
  SELECT DISTINCT doc_id, pos + unnest(generate_series(0, 19)) AS idx FROM rem
),
tokens AS (
  SELECT doc_id, t.idx AS idx, t.word AS word FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)),
      i -> struct_pack(idx := i, word := w[i]))) AS t
    FROM doc_words)
),
kept AS (
  SELECT t.doc_id, t.idx, t.word
  FROM tokens t ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.idx = c.idx
),
reb AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY idx) AS text, count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(r.text, '') AS text,
       CAST(len(d.w) AS BIGINT) AS n_words,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(len(d.w) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
FROM doc_words d LEFT JOIN reb r USING (doc_id)""",
        # twin of dedup.remove_boilerplate_segments (seg_words=3,
        # df_threshold=4): non-overlapping 3-word segments, 48-bit
        # segment hash, df over distinct docs, drop ALL over-threshold
        # occurrences, rebuild in segment order
        "doc_boilerplate_removal": rf"""
WITH doc_words AS (
  SELECT doc_id, regexp_extract_all(trim(text), '{_TOKEN_RE_SQL}') AS w FROM documents
),
base AS (
  SELECT doc_id, w, CAST(ceil(len(w) / 3.0) AS BIGINT) AS n_segments FROM doc_words
),
occ AS (
  SELECT doc_id, s.seg_idx AS seg_idx, s.seg AS seg,
         ('0x' || substr(md5(s.seg), 1, 12))::BIGINT % {MINHASH_PRIME} AS h
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             CASE WHEN n_segments > 0
                  THEN generate_series(0, CAST(n_segments AS INT) - 1) ELSE [] END,
             i -> struct_pack(seg_idx := i,
                    seg := array_to_string(w[i*3+1:i*3+3], ' ')))) AS s
    FROM base) t
),
boiler AS (
  SELECT h FROM (SELECT DISTINCT doc_id, h FROM occ) GROUP BY h HAVING count(*) >= 4
),
kept AS (SELECT * FROM occ ANTI JOIN boiler USING (h)),
rebuilt AS (
  SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS t, count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id, coalesce(r.t, '') AS text_clean, b.n_segments,
       CAST(b.n_segments - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped
FROM base b LEFT JOIN rebuilt r USING (doc_id)""",
        "doc_repetition": rf"""
WITH doc_words AS (
  SELECT doc_id, regexp_extract_all(text, '{_TOKEN_RE_SQL}') AS w FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3 THEN list_transform(
             generate_series(1, len(w) - 2), i -> array_to_string(w[i:i+2], ' '))
         ELSE [] END AS grams
  FROM doc_words
)
SELECT doc_id, len(grams) AS n_grams,
       len(list_distinct(grams)) AS n_distinct_grams,
       CASE WHEN len(grams) > 0
            THEN (len(grams) - len(list_distinct(grams))) / len(grams)
            ELSE 0.0 END AS repetition_ratio
FROM g""",
        "doc_fuzzy_contamination": _fuzzy_contamination_sql(),
        "dedup_incremental": _incremental_dedup_sql(),
        # twin of _q_media_exact_dedup: same planted-duplicate blob
        # derivation, digest groupBy
        "media_exact_dedup": """
WITH media AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 490 < 10 THEN 'shared-blob' ELSE text END AS content
  FROM documents
)
SELECT sha256(content) AS sha256,
       min(media_id) AS keep_media_id,
       count(*) AS n_copies,
       CAST(sum(octet_length(encode(content))) AS BIGINT) AS total_bytes
FROM media GROUP BY sha256(content)""",
        "doc_contamination": f"""
WITH {_SHINGLE_CTE},
bench AS (SELECT DISTINCT shingle FROM doc_shingles WHERE doc_id < 10),
marked AS (
  SELECT s.doc_id, CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM doc_shingles s LEFT JOIN bench b ON s.shingle = b.shingle
  WHERE s.doc_id >= 10
)
SELECT doc_id, count(*) AS n_shingles,
       CAST(sum(hit) AS BIGINT) AS n_contaminated,
       sum(hit) / count(*) AS contamination
FROM marked GROUP BY doc_id""",
        "simhash_fingerprints": _simhash_fp_sql(),
        "simhash_near_pairs": _simhash_pairs_sql(),
        # the maintained hamming-LSH index fold reads the same verified
        # pair set as the batch join, verbatim
        "corpus_simhash_incremental": _simhash_pairs_sql(),
        "embedding_near_dup": f"""
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
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
)
SELECT vec_a, vec_b,
       round(dot / (na.norm * nb.norm), 6) AS cos_sim
FROM dots
JOIN norms na ON na.vec_id = vec_a
JOIN norms nb ON nb.vec_id = vec_b
WHERE round(dot / (na.norm * nb.norm), 6) >= 0.99""",
        "ngram_jaccard_pairs": f"""
WITH {_SHINGLE_CTE},
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM shingle_hashes GROUP BY doc_id),
dfreq AS (SELECT h, count(*) AS df FROM shingle_hashes GROUP BY h),
rare AS (
  SELECT s.doc_id, s.h FROM shingle_hashes s
  JOIN dfreq USING (h) WHERE df <= 10
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM rare l JOIN rare r USING (h) WHERE l.doc_id < r.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_intersect
  FROM cand c
  JOIN shingle_hashes sa ON sa.doc_id = c.doc_a
  JOIN shingle_hashes sb ON sb.doc_id = c.doc_b AND sa.h = sb.h
  GROUP BY c.doc_a, c.doc_b
)
SELECT c.doc_a, c.doc_b,
       coalesce(i.n_intersect, 0) AS n_intersect,
       na.n_shingles + nb.n_shingles - coalesce(i.n_intersect, 0) AS n_union,
       coalesce(i.n_intersect, 0) / (na.n_shingles + nb.n_shingles - coalesce(i.n_intersect, 0)) AS jaccard
FROM cand c
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes na ON na.doc_id = c.doc_a
JOIN sizes nb ON nb.doc_id = c.doc_b""",
        # twin of dedup.prefix_filter_pairs: brute-force threshold join
        # (ALL shared-token pairs verified) -- completeness of the
        # Spark side's prefix filter is exactly what equality asserts
        "dedup_prefix_filter_pairs": f"""
WITH {_SHINGLE_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM shingle_hashes GROUP BY doc_id),
inter AS (
  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS n_intersect
  FROM shingle_hashes sa JOIN shingle_hashes sb
    ON sa.h = sb.h AND sa.doc_id < sb.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_intersect,
       na.n + nb.n - n_intersect AS n_union,
       n_intersect / (na.n + nb.n - n_intersect) AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE n_intersect / (na.n + nb.n - n_intersect) >= 0.5""",
        # twin of dedup.containment_pairs: brute directional join
        "dedup_containment_pairs": f"""
WITH {_SHINGLE_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM shingle_hashes GROUP BY doc_id),
inter AS (
  SELECT sa.doc_id AS doc_src, sb.doc_id AS doc_dst, count(*) AS n_intersect
  FROM shingle_hashes sa JOIN shingle_hashes sb
    ON sa.h = sb.h AND sa.doc_id <> sb.doc_id
  GROUP BY 1, 2
)
SELECT doc_src, doc_dst, n_intersect, s.n AS n_src,
       n_intersect / s.n AS containment
FROM inter JOIN sizes s ON s.doc_id = doc_src
WHERE n_intersect / s.n >= 0.8""",
        # twin of dedup.shingle_novelty: first-holder min over the
        # shared shingle-hash frame, per-doc novel fraction
        "doc_shingle_novelty": f"""
WITH {_SHINGLE_CTE},
first_holder AS (SELECT h, min(doc_id) AS first_doc FROM shingle_hashes GROUP BY h)
SELECT s.doc_id, count(*) AS n_shingles,
       CAST(sum(CASE WHEN s.doc_id = f.first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       round(CAST(sum(CASE WHEN s.doc_id = f.first_doc THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS novelty
FROM shingle_hashes s JOIN first_holder f USING (h)
GROUP BY s.doc_id""",
        # twin of textstats.bloom_contamination: identical md5-48
        # depth-salted positions, identical 32-bit-word bitmap, so the
        # filter -- false positives included -- is the shared contract
        "doc_bloom_contamination": f"""
WITH {_SHINGLE_CTE},
bench AS (SELECT DISTINCT shingle FROM doc_shingles WHERE doc_id < 10),
bench_pos AS (
  SELECT DISTINCT
         ('0x' || substr(md5(j::VARCHAR || ':' || shingle), 1, 12))::BIGINT % 4096 AS pos
  FROM bench CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)
),
bitmap AS (
  SELECT pos // 32 AS word, bit_or((1::BIGINT << (pos % 32)::INT)) AS bits
  FROM bench_pos GROUP BY 1
),
probe AS (
  SELECT doc_id, shingle,
         ('0x' || substr(md5(j::VARCHAR || ':' || shingle), 1, 12))::BIGINT % 4096 AS pos
  FROM doc_shingles CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)
  WHERE doc_id >= 10
),
hits AS (
  SELECT doc_id, shingle,
         min(CASE WHEN (coalesce(b.bits, 0) >> (p.pos % 32)::INT) & 1 = 1
                  THEN 1 ELSE 0 END) AS hit
  FROM probe p LEFT JOIN bitmap b ON p.pos // 32 = b.word
  GROUP BY doc_id, shingle
)
SELECT doc_id, count(*) AS n_shingles,
       CAST(sum(hit) AS BIGINT) AS n_bloom_hits,
       round(CAST(sum(hit) AS DOUBLE) / count(*), 6) AS bloom_rate
FROM hits GROUP BY doc_id""",
        # twin of graph.triangles over the LSH pair CTE: oriented
        # wedge + closing edge, each triangle found once
        "graph_near_dup_triangles": (
            f"WITH {_SHINGLE_CTE},\n"
            f"sig AS (SELECT doc_id,\n    {_minhash_aggs()}\nFROM shingle_hashes GROUP BY doc_id),\n"
            f"pairs AS (SELECT DISTINCT doc_a, doc_b FROM (\n{_lsh_band_union()}\n))\n"
            """SELECT w1.doc_a, w1.doc_b, w2.doc_b AS doc_c
FROM pairs w1
JOIN pairs w2 ON w2.doc_a = w1.doc_b
JOIN pairs c ON c.doc_a = w1.doc_a AND c.doc_b = w2.doc_b"""
        ),
        # twin of graph.kcore_nodes over the same LSH pairs: 3 peel
        # rounds unrolled (a1..a3), survivors with their final degree
        "graph_near_dup_kcore": (
            f"WITH {_SHINGLE_CTE},\n"
            f"sig AS (SELECT doc_id,\n    {_minhash_aggs()}\nFROM shingle_hashes GROUP BY doc_id),\n"
            f"pairs AS (SELECT DISTINCT doc_a, doc_b FROM (\n{_lsh_band_union()}\n)),\n"
            """sym AS (SELECT DISTINCT src, dst FROM (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
)),
a0 AS (SELECT DISTINCT src AS node FROM sym),
d1 AS (SELECT s.src AS node, count(*) AS deg FROM sym s
       JOIN a0 x ON x.node = s.src JOIN a0 y ON y.node = s.dst
       GROUP BY 1),
a1 AS (SELECT node FROM d1 WHERE deg >= 2),
d2 AS (SELECT s.src AS node, count(*) AS deg FROM sym s
       JOIN a1 x ON x.node = s.src JOIN a1 y ON y.node = s.dst
       GROUP BY 1),
a2 AS (SELECT node FROM d2 WHERE deg >= 2),
d3 AS (SELECT s.src AS node, count(*) AS deg FROM sym s
       JOIN a2 x ON x.node = s.src JOIN a2 y ON y.node = s.dst
       GROUP BY 1)
SELECT node AS doc_id, deg AS core_degree FROM d3 WHERE deg >= 2"""
        ),
        # twin of similarity.pq_codes: the _KMEANS_CTE recipe per
        # subspace (prefixed, ord-rebased), long-format union
        "embedding_pq_codes": _pq_codes_sql(),
        # twin of similarity.pq_adc_topk (see _pq_adc_sql)
        "ann_pq_adc_topk": _pq_adc_sql(),
        # IVF routing + PQ-ADC scoring composed, like the Spark plan
        "ann_ivf_pq_topk": _ivf_pq_sql(),
        # the n_probe tuning curve: shared index, per-probe re-rank,
        # recall vs the brute truth over the fixed denominator
        "ann_ivf_probe_curve": _ivf_probe_curve_sql(),
        # twin of graph.supplier_pagerank: 3 Pregel steps unrolled,
        # integer rank units (floor spread, 17/20 damping) so every
        # engine agrees bit-for-bit regardless of summation order
        "graph_supplier_pagerank": """
WITH pairs AS (
  SELECT DISTINCT 'c:' || o_custkey AS src, 's:' || l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
n AS (SELECT count(*) AS n_nodes FROM deg),
r0 AS (
  SELECT src AS node,
         CAST(1000000000000 // (SELECT n_nodes FROM n) AS BIGINT) AS units
  FROM deg
),
r1 AS (
  SELECT e.dst AS node,
         CAST(3000000000000 // (20 * (SELECT n_nodes FROM n))
              + (17 * sum(r.units // d.deg)) // 20 AS BIGINT) AS units
  FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON d.src = e.src
  GROUP BY e.dst
),
r2 AS (
  SELECT e.dst AS node,
         CAST(3000000000000 // (20 * (SELECT n_nodes FROM n))
              + (17 * sum(r.units // d.deg)) // 20 AS BIGINT) AS units
  FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON d.src = e.src
  GROUP BY e.dst
),
r3 AS (
  SELECT e.dst AS node,
         CAST(3000000000000 // (20 * (SELECT n_nodes FROM n))
              + (17 * sum(r.units // d.deg)) // 20 AS BIGINT) AS units
  FROM edges e JOIN r2 r ON e.src = r.node JOIN deg d ON d.src = e.src
  GROUP BY e.dst
)
SELECT node, units AS rank_units,
       round(CAST(units AS DOUBLE) / 1000000000000.0, 6) AS rank
FROM r3 WHERE node LIKE 's:%'""",
        # twin of textstats.inverted_index: per-(doc, term) tf, per-term
        # rollup, head posting by (tf DESC, doc_id ASC)
        "doc_inverted_index": f"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}')) AS term
    FROM documents
  ) GROUP BY doc_id, term
),
ranked AS (
  SELECT term, tf, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS rn
  FROM tf
),
agg AS (
  SELECT term, count(*) AS df_docs, CAST(sum(tf) AS BIGINT) AS total_tf
  FROM tf GROUP BY term
)
SELECT a.term, a.df_docs, a.total_tf, r.doc_id AS top_doc_id, r.tf AS top_doc_tf
FROM agg a JOIN ranked r ON a.term = r.term AND r.rn = 1
WHERE a.df_docs >= 2""",
        # twin of textstats.bm25_topk: expression shapes mirrored op
        # for op (k1+1 written as the SUM 1.2+1.0, never the folded
        # 2.2 literal -- they differ by an ulp); rank over the k
        # survivors of an ORDER BY LIMIT
        "doc_bm25_topk": _bm25_sql(10),
        # twin of textstats.weighted_sample_topk: same md5-derived
        # uniform (exact integer + 0.5 over 2^48), ln-key rounded to
        # 1e-9 (cross-libm ulp), doc_id tie-break
        "doc_weighted_sample": """
WITH keyed AS (
  SELECT doc_id, n_chars AS weight,
         round(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                        AS DOUBLE) + 0.5) / 281474976710656.0)
               / CAST(n_chars AS DOUBLE), 9) + 0.0 AS sample_key
  FROM documents
)
SELECT doc_id, weight, sample_key, rank FROM (
  SELECT *, row_number() OVER (ORDER BY sample_key DESC, doc_id) AS rank
  FROM (SELECT * FROM keyed ORDER BY sample_key DESC, doc_id LIMIT 50)
)""",
        # twin of textstats.term_pmi: top-100 vocab by (df DESC, term),
        # doc-level co-occurrence self-join, natural-log PMI
        "doc_term_pmi": f"""
WITH dt AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}')) AS term
    FROM documents
  )
),
dfreq AS (SELECT term, count(*) AS df FROM dt GROUP BY term),
vocab AS (SELECT term, df FROM dfreq ORDER BY df DESC, term ASC LIMIT 100),
nd AS (SELECT count(*) AS n_docs FROM documents),
dv AS (SELECT dt.doc_id, dt.term FROM dt JOIN vocab USING (term)),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_ab
  FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT p.term_a, p.term_b, p.n_ab,
       round(ln(CAST(p.n_ab AS DOUBLE) * (SELECT n_docs FROM nd)
                / (CAST(va.df AS DOUBLE) * CAST(vb.df AS DOUBLE))), 6) AS pmi
FROM pairs p
JOIN vocab va ON va.term = p.term_a
JOIN vocab vb ON vb.term = p.term_b""",
        "ann_cosine_topk": """
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
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5""",
        # Twin of similarity.cosine_topk_ivf: centroid pick, argmax
        # assignment, n_probe probing and re-rank all mirrored; the
        # max_by struct tie-break equals (c_cos DESC, centroid_id).
        "ann_cosine_topk_ivf": """
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS norm FROM ex GROUP BY vec_id),
cdots AS (
  SELECT e.vec_id AS vec_id, ce.vec_id AS centroid_id, sum(e.v * ce.v) AS dot
  FROM ex e JOIN ex ce ON e.ord = ce.ord
  WHERE ce.vec_id % 37 = 0 AND ce.vec_id < 37 * 16
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
    FROM ccos WHERE vec_id < 32) WHERE rn <= 4
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assignment a ON a.centroid_id = p.centroid_id
  WHERE a.vec_id <> p.query_id
),
dots AS (
  SELECT c.query_id, c.neighbor_id, sum(q.v * e.v) AS dot
  FROM cand c
  JOIN ex q ON q.vec_id = c.query_id
  JOIN ex e ON e.vec_id = c.neighbor_id AND e.ord = q.ord
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
) WHERE rank <= 5""",
        "ann_cosine_topk_lsh": f"""
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS norm FROM ex GROUP BY vec_id),
buckets AS ({_hyperplane_bucket_sql()}),
q AS (SELECT * FROM ex WHERE vec_id < 32),
cand AS (
  SELECT qb.vec_id AS query_id, eb.vec_id AS neighbor_id
  FROM buckets qb JOIN buckets eb ON qb.bucket = eb.bucket
  WHERE qb.vec_id < 32 AND eb.vec_id <> qb.vec_id
),
dots AS (
  SELECT c.query_id, c.neighbor_id, sum(qe.v * ee.v) AS dot
  FROM cand c
  JOIN ex qe ON qe.vec_id = c.query_id
  JOIN ex ee ON ee.vec_id = c.neighbor_id AND qe.ord = ee.ord
  GROUP BY c.query_id, c.neighbor_id
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
) WHERE rank <= 5""",
        # identical contract to ann_cosine_topk -- the pandas/numpy path
        # must reproduce the fold-based result exactly
        "ann_cosine_topk_pandas": """
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
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5""",
        # twin of similarity.sign_bit_words: per-dim mean thresholds
        # (1e-6-rounded, the ulp-absorption discipline), literal
        # signed-64 bit values OR-folded -- DuckDB cannot shift 1<<63
        # so bit 63 is the long-min literal, same table as SIGN_POWERS
        "embedding_sign_bits": """
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
thr AS (SELECT ord, round(avg(v), 6) AS thr FROM ex GROUP BY ord),
words AS (
  SELECT e.vec_id,
         bit_or(CASE WHEN e.v > t.thr THEN
             CASE WHEN e.ord = 63 THEN -9223372036854775807 - 1
                  ELSE 1::BIGINT << e.ord END
           ELSE 0::BIGINT END) AS sign_word
  FROM ex e JOIN thr t ON e.ord = t.ord
  GROUP BY e.vec_id
)
SELECT vec_id, sign_word, CAST(bit_count(sign_word) AS INT) AS n_pos
FROM words""",
        # twin of similarity.hamming_topk: same words CTE, Hamming
        # shortlist (rank<=20 on (distance, vec_id)), exact-cosine
        # re-rank of the survivors (rank<=5 on (cos desc, neighbor))
        "ann_hamming_topk": """
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS ord,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
thr AS (SELECT ord, round(avg(v), 6) AS thr FROM ex GROUP BY ord),
words AS (
  SELECT e.vec_id,
         bit_or(CASE WHEN e.v > t.thr THEN
             CASE WHEN e.ord = 63 THEN -9223372036854775807 - 1
                  ELSE 1::BIGINT << e.ord END
           ELSE 0::BIGINT END) AS sign_word
  FROM ex e JOIN thr t ON e.ord = t.ord
  GROUP BY e.vec_id
),
qw AS (SELECT vec_id AS query_id, sign_word AS q_word FROM words
       WHERE vec_id < 32),
hams AS (
  SELECT q.query_id, w.vec_id,
         CAST(bit_count(xor(w.sign_word, q.q_word)) AS INT) AS hamming_dist
  FROM words w JOIN qw q ON w.vec_id <> q.query_id
),
cand AS (
  SELECT query_id, vec_id, hamming_dist FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY hamming_dist, vec_id) AS r
    FROM hams) WHERE r <= 20
),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS norm FROM ex GROUP BY vec_id),
dots AS (
  SELECT c.query_id, c.vec_id AS neighbor_id, c.hamming_dist,
         sum(q.v * e.v) AS dot
  FROM cand c
  JOIN ex q ON q.vec_id = c.query_id
  JOIN ex e ON e.vec_id = c.vec_id AND e.ord = q.ord
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT query_id, neighbor_id, hamming_dist,
         round(dot / (nq.norm * ne.norm), 6) AS cos_sim
  FROM dots
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms ne ON ne.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, hamming_dist, cos_sim, rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5""",
        "events_sessionize": """
WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_ms
  FROM events
),
s AS (
  SELECT *, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS is_new
  FROM e
),
x AS (
  SELECT *, CAST(sum(is_new) OVER (
      PARTITION BY user_id ORDER BY ts_ms, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM s
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts_ms) AS session_start_ms, max(ts_ms) AS session_end_ms
FROM x GROUP BY user_id, session_id""",
        # pivot == conditional aggregation, the portable SQL twin
        "events_type_pivot": """
SELECT user_id % 10 AS cohort,
       CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS click,
       CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END), 0) AS BIGINT) AS error,
       CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
       CAST(coalesce(sum(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS BIGINT) AS signup,
       CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS view
FROM events GROUP BY 1""",
        "events_props_stats": r"""
SELECT event_type,
       count(k) AS n_with_k, min(k) AS min_k, max(k) AS max_k,
       CAST(sum(k) AS BIGINT) AS sum_k
FROM (
  SELECT event_type,
         TRY_CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT) AS k
  FROM events
)
GROUP BY event_type""",
        # DuckDB's native ASOF JOIN independently checks the
        # union-window as-of construction
        "events_asof_purchase": """
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms, value FROM events
),
purch AS (
  SELECT user_id, ts_ms, max(event_id) AS p_event_id,
         arg_max(value, event_id) AS p_value
  FROM ev WHERE event_type = 'purchase' GROUP BY user_id, ts_ms
),
clicks AS (
  SELECT event_id, user_id, ts_ms FROM ev WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.ts_ms,
       p.p_event_id AS purchase_event_id,
       p.ts_ms AS purchase_ts_ms,
       p.p_value AS purchase_value
FROM clicks c
ASOF LEFT JOIN purch p ON c.user_id = p.user_id AND c.ts_ms >= p.ts_ms""",
        # twin of analytics.monthly_revenue_growth: decimal-exact month
        # totals, lag over the aggregated frame
        "monthly_revenue_growth": """
WITH per_month AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY month
)
SELECT month, revenue,
       lag(revenue) OVER (ORDER BY month) AS prev_revenue,
       round(revenue - lag(revenue) OVER (ORDER BY month), 4) AS delta,
       round(revenue / lag(revenue) OVER (ORDER BY month), 6) AS growth
FROM per_month""",
        # twin of analytics.data_quality_report: one SELECT per rule,
        # same rule strings, UNION ALL
        "star_data_quality": """
SELECT 'customer.c_custkey not null' AS rule,
       (SELECT count(*) FROM customer WHERE c_custkey IS NULL) AS violations
UNION ALL SELECT 'customer.c_custkey unique',
       (SELECT count(*) FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING count(*) > 1))
UNION ALL SELECT 'orders.o_orderkey not null',
       (SELECT count(*) FROM orders WHERE o_orderkey IS NULL)
UNION ALL SELECT 'orders.o_orderkey unique',
       (SELECT count(*) FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1))
UNION ALL SELECT 'orders.o_custkey -> customer',
       (SELECT count(*) FROM orders o WHERE NOT EXISTS (
          SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL SELECT 'lineitem.l_orderkey -> orders',
       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
UNION ALL SELECT 'orders.o_totalprice >= 0',
       (SELECT count(*) FROM orders WHERE o_totalprice < 0)
UNION ALL SELECT 'lineitem.l_discount in [0,1]',
       (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
UNION ALL SELECT 'lineitem shipped >= orderdate - 30d',
       (SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate < o.o_orderdate - INTERVAL 30 DAY)""",
    })

    # the streaming Python DataSource roundtrip shares the batch
    # pyds/text parse contract verbatim
    sql["cdc_parse_stream_pyds"] = sql["cdc_parse_binlog_text_pyds"]

    # streaming transaction reassembly: every aggregate in the
    # per-GTID fold is mergeable, so the drained complete-mode state
    # equals the batch rollup verbatim
    sql["cdc_transactions_stream"] = sql["cdc_transactions"]

    # avro lake schema census: the two producer fingerprints are the
    # md5 of the canonical schema dumps the fixture encoder embeds
    # (raw header bytes == json.dumps(schema, separators=(",", ":")))
    import hashlib as _hashlib
    import json as _json

    _md5_v1 = _hashlib.md5(
        _json.dumps(_AVRO_V1_WRITER_SCHEMA, separators=(",", ":")).encode()
    ).hexdigest()
    _md5_cur = _hashlib.md5(
        _json.dumps(DATASTREAM_AVRO_SCHEMA, separators=(",", ":")).encode()
    ).hexdigest()
    sql["cdc_avro_schema_census"] = ("WITH " + oracle.CDC_CTES.strip() + f"""
SELECT binlog_file || '.avro' AS file,
       CASE WHEN CAST(substr(binlog_file, 11) AS BIGINT) % 2 = 0
            THEN '{_md5_v1}' ELSE '{_md5_cur}' END AS schema_md5,
       'deflate' AS codec,
       count(*) AS n_records,
       CAST(ceil(count(*) / 1000.0) AS BIGINT) AS n_blocks
FROM avro_rows_cdc
GROUP BY binlog_file""")

    # cross-table consistency watermark over the derivation CTEs --
    # per GTID source UUID (r8: GNOs only compare within one server's
    # sequence; the fixture is single-UUID, the operator is not)
    sql["cdc_consistency_watermark"] = "WITH " + oracle.CDC_CTES.strip() + """
, g AS (
  SELECT split_part(gtid_next, ':', 1) AS source_uuid, "schema", "table",
         CAST(split_part(gtid_next, ':', 2) AS BIGINT) AS gno
  FROM binlog_events_cdc
  WHERE gtid_next IS NOT NULL AND gtid_next <> ''
    AND "table" IS NOT NULL AND "table" <> ''
),
per AS (
  SELECT source_uuid, "schema", "table", max(gno) AS max_gno,
         count(*) AS n_events
  FROM g GROUP BY 1, 2, 3
),
wm AS (
  SELECT source_uuid, min(max_gno) AS watermark_gno
  FROM per GROUP BY source_uuid
),
applied AS (
  SELECT g.source_uuid, g."schema", g."table", count(*) AS n_at_watermark
  FROM g JOIN wm ON wm.source_uuid = g.source_uuid
  WHERE g.gno <= wm.watermark_gno GROUP BY 1, 2, 3
)
SELECT p.source_uuid, p."schema", p."table", p.max_gno, wm.watermark_gno,
       p.n_events,
       coalesce(a.n_at_watermark, 0) AS n_at_watermark,
       p.max_gno = wm.watermark_gno AS holds_watermark
FROM per p JOIN wm ON wm.source_uuid = p.source_uuid
LEFT JOIN applied a ON a.source_uuid = p.source_uuid
  AND a."schema" = p."schema" AND a."table" = p."table" """

    # the persisted-index probe (functions/layout.ivf_probe_pruned) is
    # result-identical to the in-plan IVF by contract (same quantizer,
    # probe pick, tie-breaks) -- the difference is the partition-pruned
    # scan, which the plan pytest pins; one oracle certifies both
    sql["ann_ivf_probe_pruned"] = sql["ann_cosine_topk_ivf"]
    # incremental append == full rebuild by construction (frozen
    # centroids, query-independent assignment): same oracle again
    sql["ann_ivf_probe_incremental"] = sql["ann_cosine_topk_ivf"]

    # the watermark applied: consistent multi-table snapshot manifest
    sql["cdc_snapshot_at_watermark"] = "WITH " + oracle.CDC_CTES.strip() + """
, g AS (
  SELECT split_part(gtid_next, ':', 1) AS source_uuid, "schema", "table",
         CAST(split_part(gtid_next, ':', 2) AS BIGINT) AS gno,
         log_position
  FROM binlog_events_cdc
  WHERE gtid_next IS NOT NULL AND gtid_next <> ''
    AND "table" IS NOT NULL AND "table" <> ''
),
per AS (
  SELECT source_uuid, "schema", "table", max(gno) AS max_gno
  FROM g GROUP BY 1, 2, 3
),
wm AS (
  SELECT source_uuid, min(max_gno) AS watermark_gno
  FROM per GROUP BY source_uuid
)
SELECT g.source_uuid, g."schema", g."table", wm.watermark_gno,
       count(*) AS n_rows, max(g.gno) AS last_gno,
       max(g.log_position) AS last_position
FROM g JOIN wm ON wm.source_uuid = g.source_uuid
WHERE g.gno <= wm.watermark_gno
GROUP BY 1, 2, 3, 4"""

    # DDL schema-change timeline: the oracle derives the per-table
    # SCD2 versions from the Query-event arithmetic directly, while
    # the Spark side renders parser text and runs the full P1-P9
    # pipeline + regexp DDL extraction -- two independent paths.
    # event_id is the final ordering tiebreak: within one file the
    # parser's per-file event ordinal is monotone in event_id, and
    # (vts, file, pos) ties can only occur within one file's render.
    sql["cdc_schema_timeline"] = f"WITH {_DDL_STMT_CTE}" + """
SELECT schema_name, table_name,
       row_number() OVER w AS version,
       ddl_kind, statement,
       vts AS valid_from,
       lead(vts) OVER w AS valid_to,
       (lead(vts) OVER w IS NULL) AS is_current,
       coalesce(last_value(new_table IGNORE NULLS) OVER wc, table_name)
         AS current_name,
       binlog_file, log_position
FROM ddl
WINDOW w AS (PARTITION BY schema_name, table_name
             ORDER BY vts, binlog_file, log_position, event_id, pair_no),
       wc AS (PARTITION BY schema_name, table_name
              ORDER BY vts, binlog_file, log_position, event_id, pair_no
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""

    # effective column inventory per schema version: the oracle folds
    # the DDL SEMANTICS from the event arithmetic (m=1 CREATE declares
    # ['id'], m=0 adds c{eid%4}, m=4/5 drop it, m=5 adds a, m=7/8
    # move c to r/n, m=10 adds p on the canonical table, m=2 empties,
    # m=6 MODIFY leaves the set intact) while the Spark side genuinely
    # parses the statements clause by clause -- two paths again.
    sql["cdc_schema_columns"] = (
        f"WITH {_DDL_STMT_CTE},\n{_COLS_FOLD_CTES}"
        + """
SELECT schema_name, table_name, version, col AS column_name
FROM pres WHERE present"""
    )

    # streaming twins: the statement-log fold re-derives each view at
    # read time, so read-LATEST == the batch operator verbatim
    sql["cdc_schema_timeline_stream"] = sql["cdc_schema_timeline"]
    sql["cdc_schema_columns_stream"] = sql["cdc_schema_columns"]

    # time travel: the timeline AS OF batch 1 of the 4-chunk replay ==
    # the batch timeline over exactly the first two event-time
    # quartiles (the fixture's own ntile(4) split) -- versions are
    # prefix-correct, not just the latest
    sql["cdc_schema_timeline_asof"] = (
        "WITH events_asof AS (\n"
        "  SELECT * FROM events\n"
        "  QUALIFY ntile(4) OVER (ORDER BY ts, event_id) <= 2\n"
        "),\n"
        + _DDL_STMT_CTE.replace("FROM events\n", "FROM events_asof\n")
        + """
SELECT schema_name, table_name,
       row_number() OVER w AS version,
       ddl_kind, statement,
       vts AS valid_from,
       lead(vts) OVER w AS valid_to,
       (lead(vts) OVER w IS NULL) AS is_current,
       coalesce(last_value(new_table IGNORE NULLS) OVER wc, table_name)
         AS current_name,
       binlog_file, log_position
FROM ddl
WINDOW w AS (PARTITION BY schema_name, table_name
             ORDER BY vts, binlog_file, log_position, event_id, pair_no),
       wc AS (PARTITION BY schema_name, table_name
              ORDER BY vts, binlog_file, log_position, event_id, pair_no
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
    )

    # type-aware column matrix: the oracle folds DECLARED types from
    # the m arithmetic ('T:<type>' declares, 'T:' = present untyped --
    # the m=8 rename target -- 'X' resets) and flags same-family
    # narrowing transitions exactly like ddl.schema_column_types; the
    # m=6 parity split (BIGINT NOT NULL / SMALLINT) is the narrowing
    # plant, m=12's VARCHAR(255) adds the char family
    sql["cdc_schema_types"] = f"WITH {_DDL_STMT_CTE}" + """,
vd AS (
  SELECT *, row_number() OVER (PARTITION BY schema_name, table_name
      ORDER BY vts, binlog_file, log_position, event_id, pair_no) AS version
  FROM ddl
),
fx AS (
  SELECT schema_name, table_name, version, 'c' || f4 AS col,
         'T:INT' AS act
  FROM vd WHERE m = 0
  UNION ALL
  SELECT schema_name, table_name, version, 'c' || f4, 'X'
  FROM vd WHERE m IN (4, 5, 7, 8)
  UNION ALL
  SELECT schema_name, table_name, version, 'a' || f4, 'T:DECIMAL(10,2)'
  FROM vd WHERE m = 5
  UNION ALL
  SELECT schema_name, table_name, version, 'c' || f4,
         CASE WHEN p2 = 0 THEN 'T:BIGINT' ELSE 'T:SMALLINT' END
  FROM vd WHERE m = 6
  UNION ALL
  SELECT schema_name, table_name, version, 'r' || f4, 'T:BIGINT'
  FROM vd WHERE m = 7
  UNION ALL
  SELECT schema_name, table_name, version, 'n' || f4, 'T:'
  FROM vd WHERE m = 8
  UNION ALL
  SELECT schema_name, table_name, version, 'p' || f4, 'T:INT'
  FROM vd WHERE m = 10
  UNION ALL
  SELECT schema_name, table_name, version, 'x' || f4, 'T:INT'
  FROM vd WHERE m = 12
  UNION ALL
  SELECT schema_name, table_name, version, 'y' || f4, 'T:VARCHAR(255)'
  FROM vd WHERE m = 12
),
uni AS (
  SELECT DISTINCT schema_name, table_name, col FROM (
    SELECT schema_name, table_name, col FROM fx
    UNION ALL
    SELECT schema_name, table_name, c.col
    FROM (SELECT DISTINCT schema_name, table_name FROM vd WHERE m = 1) t
    CROSS JOIN (SELECT unnest(['id', 'order_id', 'quantity']) AS col) c
  )
),
grid AS (
  SELECT v.schema_name, v.table_name, v.version, u.col,
    CASE WHEN v.m = 1 THEN
           (CASE u.col WHEN 'id' THEN 'T:INT'
                       WHEN 'order_id' THEN 'T:BIGINT'
                       WHEN 'quantity' THEN 'T:INT'
                       ELSE 'X' END)
         WHEN v.m = 2 THEN 'X'
         ELSE f.act END AS act
  FROM vd v
  JOIN uni u USING (schema_name, table_name)
  LEFT JOIN fx f ON f.schema_name = v.schema_name
    AND f.table_name = v.table_name AND f.version = v.version
    AND f.col = u.col
),
st AS (
  SELECT *, last_value(act IGNORE NULLS) OVER (
    PARTITION BY schema_name, table_name, col ORDER BY version
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS state
  FROM grid
),
ty AS (
  SELECT schema_name, table_name, version, col,
    CASE WHEN state LIKE 'T:_%' THEN substr(state, 3) END AS cur,
    lag(state) OVER (PARTITION BY schema_name, table_name, col
                     ORDER BY version) AS prev_state
  FROM st
),
tp AS (
  SELECT *,
    CASE WHEN prev_state LIKE 'T:_%' THEN substr(prev_state, 3) END AS prv
  FROM ty WHERE cur IS NOT NULL
),
rk AS (
  SELECT *,
    regexp_extract(cur, '^([A-Z]+)', 1) AS fam_c,
    regexp_extract(coalesce(prv, ''), '^([A-Z]+)', 1) AS fam_p,
    try_cast(regexp_extract(cur, '\\((\\d+)', 1) AS INT) AS n1_c,
    try_cast(regexp_extract(coalesce(prv, ''), '\\((\\d+)', 1) AS INT)
      AS n1_p,
    try_cast(regexp_extract(cur, ',(\\d+)\\)', 1) AS INT) AS n2_c,
    try_cast(regexp_extract(coalesce(prv, ''), ',(\\d+)\\)', 1) AS INT)
      AS n2_p
  FROM tp
)
SELECT schema_name, table_name, version, col AS column_name,
  cur AS column_type,
  coalesce(
    (CASE fam_c WHEN 'TINYINT' THEN 1 WHEN 'SMALLINT' THEN 2
                WHEN 'MEDIUMINT' THEN 3 WHEN 'INT' THEN 4
                WHEN 'INTEGER' THEN 4 WHEN 'BIGINT' THEN 5 END
     < CASE fam_p WHEN 'TINYINT' THEN 1 WHEN 'SMALLINT' THEN 2
                  WHEN 'MEDIUMINT' THEN 3 WHEN 'INT' THEN 4
                  WHEN 'INTEGER' THEN 4 WHEN 'BIGINT' THEN 5 END)
    OR (fam_p IN ('CHAR', 'VARCHAR') AND fam_c = fam_p
        AND n1_c < n1_p)
    OR (fam_p IN ('DECIMAL', 'NUMERIC') AND fam_c = fam_p
        AND (n1_c < n1_p
             OR coalesce(n2_c, 0) < coalesce(n2_p, 0))),
    FALSE) AS is_narrowing
FROM rk"""

    # streaming twin of the type matrix: same read-time derivation
    # from the statement-log fold, so read-LATEST == batch verbatim
    sql["cdc_schema_types_stream"] = sql["cdc_schema_types"]

    # cross-source schema agreement: the declared CURRENT column set
    # (the membership fold at each table's LAST version -- from vd,
    # not from present-only rows, so a table ending on DROP
    # contributes nothing) full-outer against the avro lake's observed
    # field census (matched avro payload keys x the 5 payload field
    # names, keyed to (schema, table) through the binlog LWW meta --
    # the dmlk/avk arithmetic the guarded-diff oracles mirror).  The
    # m=1 CREATE declares order_id/quantity on purpose: AGREE,
    # BINLOG_ONLY, and LAKE_ONLY all populate.
    sql["cdc_schema_vs_lake"] = (
        f"WITH {_DDL_STMT_CTE},\n{_COLS_FOLD_CTES}"
        + """,
lastv AS (
  SELECT schema_name, table_name, max(version) AS v
  FROM vd GROUP BY 1, 2
),
cur AS (
  SELECT p.schema_name, p.table_name, p.col
  FROM pres p
  JOIN lastv l ON l.schema_name = p.schema_name
    AND l.table_name = p.table_name AND p.version = l.v
  WHERE p.present
),
dmlk AS (
  SELECT binlog_file, binlog_position, schema_name, table_name FROM (
    SELECT 'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0')
             AS binlog_file,
      CASE WHEN event_id % 211 = 0 THEN 0
           WHEN event_id % 53 = 0 THEN 100 * ((event_id + 4) // 4) + 4
           ELSE 100 * (event_id // 4) + 4 END AS binlog_position,
      event_id,
      'db' || CAST(user_id % 2 AS VARCHAR) AS schema_name,
      't' || CAST(user_id % 3 AS VARCHAR) AS table_name
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
      AND event_id % 223 <> 0
  ) WHERE binlog_position <> 0
  QUALIFY row_number() OVER (
    PARTITION BY binlog_file, binlog_position ORDER BY event_id DESC) = 1
),
avk AS (
  SELECT 'mysql-bin.' || lpad(CAST(event_id % 4 AS VARCHAR), 6, '0')
           AS binlog_file,
    CASE WHEN event_id % 17 = 5 THEN 100 * (event_id // 4) + 4 + 7
         ELSE 100 * (event_id // 4) + 4 END AS binlog_position
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase')
    AND event_id % 13 <> 0 AND event_id % 29 <> 1
),
obs AS (
  SELECT d.schema_name, d.table_name, f.field_name,
         count(*) AS n_obs
  FROM avk a
  JOIN dmlk d USING (binlog_file, binlog_position)
  CROSS JOIN (SELECT unnest(['order_id', 'customer_name',
    'product_name', 'quantity', 'order_timestamp']) AS field_name) f
  GROUP BY 1, 2, 3
)
SELECT coalesce(c.schema_name, o.schema_name) AS schema_name,
       coalesce(c.table_name, o.table_name) AS table_name,
       coalesce(c.col, o.field_name) AS column_name,
       CASE WHEN c.col IS NOT NULL AND o.field_name IS NOT NULL
              THEN 'AGREE'
            WHEN c.col IS NOT NULL THEN 'BINLOG_ONLY'
            ELSE 'LAKE_ONLY' END AS status,
       coalesce(o.n_obs, 0) AS n_obs
FROM cur c
FULL OUTER JOIN obs o
  ON o.schema_name = c.schema_name AND o.table_name = c.table_name
  AND o.field_name = c.col"""
    )
    # the live agreement view's read-LATEST contract: identical SQL to
    # the batch report (same fold-state discipline as the other
    # _stream aliases above)
    sql["cdc_schema_vs_lake_stream"] = sql["cdc_schema_vs_lake"]
    # the both-sides-live variant reads the same contract: declared
    # side from the fold state, observed side from the summed
    # per-batch census log -- full-feed agreement either way
    sql["cdc_schema_vs_lake_live"] = sql["cdc_schema_vs_lake"]

    # statement-vocabulary census: per ddl_kind, frame rows + distinct
    # canonical tables -- the r11 vocabulary completion (TRUNCATE,
    # standalone INDEX, multi-name MAINTENANCE) must all land under
    # their kinds, the maintenance _r names threaded into the base
    # tables' canonical identity exactly as the ddl CTE mirrors
    sql["cdc_ddl_statement_census"] = f"WITH {_DDL_STMT_CTE}" + """
SELECT ddl_kind,
       count(*) AS n_rows,
       count(DISTINCT schema_name || '.' || table_name) AS n_tables
FROM ddl
GROUP BY ddl_kind
ORDER BY ddl_kind"""

    # the PARTIAL_PARSE channel: the fixture's only unparseable
    # fragment is the m=10 CONVERT clause; the anomaly reports the
    # WRITTEN (renamed) table name -- the operator's actionable handle
    sql["cdc_ddl_partial_parse"] = f"WITH {_DDL_STMT_CTE}" + """
SELECT schema_name, written_table AS table_name, binlog_file,
       log_position, 'UNPARSED_CLAUSE' AS reason,
       'CONVERT TO CHARACTER SET utf8mb4' AS fragment
FROM ddl WHERE m = 10"""

    # drift windows annotated with the moved-column set (the frame the
    # column-granular quarantine consumes); arrays string-joined for
    # the cross-engine hash, empty-as-'' on both sides
    sql["cdc_ddl_window_columns"] = (
        f"WITH {_DDL_STMT_CTE},\n{_DDL_WINDOWS_CTE},\n{_DDL_WINCOLS_CTE}"
        + """
SELECT schema_name, table_name, win_from, win_to,
       coalesce(list_aggregate(moved_cols, 'string_agg', ','), '')
         AS moved_cols,
       moved_known
FROM wc"""
    )

    # twin of snapshot.changelog_compaction: arg_min/arg_max over the
    # same (ts_ms, event_id) ordering tuple, same net rule
    sql["cdc_changelog_compaction"] = """
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
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts_ms, event_id) AS rn_first,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts_ms DESC, event_id DESC) AS rn_last,
         count(*) OVER (PARTITION BY user_id) AS n_events,
         first(op) OVER (PARTITION BY user_id
                         ORDER BY ts_ms, event_id) AS first_op
  FROM changes
),
agg AS (
  SELECT user_id, first_op, op AS last_op, ts_ms AS last_ts_ms,
         event_id AS last_event_id, round(value, 4) AS last_value, n_events
  FROM ranked WHERE rn_last = 1
)
SELECT user_id,
       CASE WHEN first_op = 'INSERT' AND last_op = 'DELETE' THEN 'NOOP'
            WHEN last_op = 'DELETE' THEN 'DELETE'
            WHEN first_op = 'INSERT' THEN 'INSERT'
            ELSE 'UPDATE' END AS net_op,
       first_op, last_op, last_ts_ms, last_event_id, last_value, n_events
FROM agg"""

    # twin of compare.multimaster_conflicts over the block-rotating
    # synthetic writer view (fixtures.derive_multimaster_changes)
    sql["cdc_multimaster_conflicts"] = """
WITH c AS (
  SELECT user_id AS key,
         'uuid-' || CAST((event_id // 64) % 3 AS VARCHAR) AS writer,
         epoch_ms(ts) AS ts_ms, event_id
  FROM events WHERE user_id IS NOT NULL
),
flagged AS (
  SELECT key, writer, ts_ms,
         (writer <> lag(writer) OVER w
          AND ts_ms - lag(ts_ms) OVER w <= 3600000) AS conflict
  FROM c WINDOW w AS (PARTITION BY key ORDER BY ts_ms, event_id)
),
per_key AS (
  SELECT key,
         count(DISTINCT writer) AS n_writers,
         count(*) AS n_events,
         CAST(sum(CASE WHEN conflict THEN 1 ELSE 0 END) AS BIGINT) AS n_conflicts,
         min(CASE WHEN conflict THEN ts_ms END) AS first_conflict_ts_ms,
         max(CASE WHEN conflict THEN ts_ms END) AS last_conflict_ts_ms,
         list_aggregate(list_sort(list(DISTINCT writer)), 'string_agg', ',')
           AS writers
  FROM flagged GROUP BY key
)
SELECT * FROM per_key WHERE n_conflicts > 0"""
