"""relational + distributed-statistics queries (split from registry.py, round 7; behavior
identical -- see registry.py for the assembly order)."""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _q_distinct_users(spark, sf_dir):
    ensure_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


def _q_trailing_10min(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.analytics import trailing_window_10min

    return trailing_window_10min(load_table(spark, sf_dir, "events"))


def _q_part_above_brand_avg(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.analytics import part_above_brand_avg

    return part_above_brand_avg(load_table(spark, sf_dir, "part"))


def _q_top_parts_per_brand(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.analytics import top_parts_per_brand

    return top_parts_per_brand(load_table(spark, sf_dir, "part"))


def _q_value_histogram(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.analytics import value_histogram

    return value_histogram(load_table(spark, sf_dir, "events"))


def _q_rank_family(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.analytics import rank_family

    return rank_family(load_table(spark, sf_dir, "events"))


def _q_orders_cube(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.analytics import orders_cube

    return orders_cube(load_table(spark, sf_dir, "orders"))


def _q_zorder_layout(spark, sf_dir):
    """Z-order layout keys for lineitem on (l_partkey, l_suppkey): the
    key + target-file assignment a layout-optimizing writer would
    range-partition and sort by (functions/zorder.py docstring has the
    full write recipe)."""
    ensure_session_conf(spark)
    from ..functions.zorder import zorder_key

    li = load_table(spark, sf_dir, "lineitem")
    z = zorder_key(F.col("l_partkey"), F.col("l_suppkey"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        z.alias("z_key"),
        F.shiftright(z, 26).alias("file_id"),
    )


def _q_hilbert_layout(spark, sf_dir):
    """Hilbert-curve layout keys for lineitem on (l_partkey, l_suppkey):
    the locality-improving sibling of the Z-order layout (same
    repartitionByRange + sortWithinPartitions write recipe; see
    functions/hilbert.py for why the curve clusters strictly better
    and why the walk is a fold, not an unrolled expression)."""
    ensure_session_conf(spark)
    from ..functions.hilbert import hilbert_key

    li = load_table(spark, sf_dir, "lineitem")
    h = hilbert_key(F.col("l_partkey"), F.col("l_suppkey"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        h.alias("h_key"),
        F.shiftright(h, 26).alias("file_id"),
    )


def _q_bootstrap_mean(spark, sf_dir):
    """Poisson-bootstrap error bars for mean(l_extendedprice): 32
    deterministic replicates in one pass
    (analytics.bootstrap_mean_price)."""
    ensure_session_conf(spark)
    from ..operators.analytics import bootstrap_mean_price

    return bootstrap_mean_price(load_table(spark, sf_dir, "lineitem"))


def _q_winsorized(spark, sf_dir):
    """Winsorized values: per-type [p01, p99] clip from a broadcast
    bounds frame (analytics.winsorized_values)."""
    ensure_session_conf(spark)
    from ..operators.analytics import winsorized_values

    return winsorized_values(load_table(spark, sf_dir, "events"))


def _q_zorder3_layout(spark, sf_dir):
    """Three-column Morton layout keys (functions/zorder.zorder_key_n)
    on (l_partkey, l_suppkey, l_orderkey) -- the n-dim generalization
    of the 2-column Z-order layout, 48-bit key."""
    ensure_session_conf(spark)
    from ..functions.zorder import zorder_key_n

    li = load_table(spark, sf_dir, "lineitem")
    z = zorder_key_n([F.col("l_partkey"), F.col("l_suppkey"), F.col("l_orderkey")])
    return li.select(
        "l_orderkey",
        "l_linenumber",
        z.alias("z3_key"),
        F.shiftright(z, 42).alias("file_id"),
    )


def _q_rolling_mau(spark, sf_dir):
    """Monthly + trailing-3-month rolling active customers
    (analytics.rolling_monthly_active_customers): the rolling distinct
    a window frame cannot express, via window_m-fold explode of the
    distinct (customer, month) frame."""
    ensure_session_conf(spark)
    from ..operators.analytics import rolling_monthly_active_customers

    return rolling_monthly_active_customers(load_table(spark, sf_dir, "orders"))


def _q_purchase_attribution(spark, sf_dir):
    """First/last-touch conversion attribution per purchase within the
    30-minute-gap session (analytics.purchase_attribution)."""
    ensure_session_conf(spark)
    from ..operators.analytics import purchase_attribution

    return purchase_attribution(load_table(spark, sf_dir, "events"))


def _q_hll_sketch_union(spark, sf_dir):
    """Mergeable DataSketches HLL table: per-(type, day) sketches
    unioned to the per-type estimate (analytics.hll_sketch_table_union);
    oracle asserts the exact count + error bound, the hll_distinct_users
    contract."""
    ensure_session_conf(spark)
    from ..operators.analytics import hll_sketch_table_union

    return hll_sketch_table_union(load_table(spark, sf_dir, "events"))


def _q_events_sessionize(spark, sf_dir):
    ensure_session_conf(spark)
    return sessionize(load_table(spark, sf_dir, "events"))


def _q_q1(spark, sf_dir):
    ensure_session_conf(spark)
    return q1_pricing_summary(load_table(spark, sf_dir, "lineitem"))


def _q_top_revenue(spark, sf_dir):
    ensure_session_conf(spark)
    return top_revenue_orders(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def _q_data_quality_report(spark, sf_dir):
    ensure_session_conf(spark)
    return data_quality_report(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


def _q_late_exclusive_suppliers(spark, sf_dir):
    ensure_session_conf(spark)
    return late_exclusive_suppliers(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def _q_hll_distinct_users(spark, sf_dir):
    ensure_session_conf(spark)
    return hll_distinct_users(load_table(spark, sf_dir, "events"))


def _q_monthly_revenue_growth(spark, sf_dir):
    ensure_session_conf(spark)
    return monthly_revenue_growth(load_table(spark, sf_dir, "orders"))


def _q_customer_order_distribution(spark, sf_dir):
    ensure_session_conf(spark)
    return customer_order_distribution(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


def _q_late_shipment_orders(spark, sf_dir):
    ensure_session_conf(spark)
    return late_shipment_orders(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def _q_big_ticket_orders(spark, sf_dir):
    ensure_session_conf(spark)
    return big_ticket_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


def _q_high_value_customers(spark, sf_dir):
    ensure_session_conf(spark)
    return high_value_customers(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


def _q_user_set_ops(spark, sf_dir):
    ensure_session_conf(spark)
    return user_set_ops(load_table(spark, sf_dir, "events"))


def _q_revenue_rollup(spark, sf_dir):
    ensure_session_conf(spark)
    return revenue_rollup(load_table(spark, sf_dir, "orders"))


def _q_regional_supplier_volume(spark, sf_dir):
    ensure_session_conf(spark)
    return regional_supplier_volume(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def _q_part_profit_by_nation(spark, sf_dir):
    ensure_session_conf(spark)
    return part_profit_by_nation(
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "nation"),
    )


def _q_events_funnel(spark, sf_dir):
    ensure_session_conf(spark)
    return funnel_stages(load_table(spark, sf_dir, "events"))


def _q_events_cms_counts(spark, sf_dir):
    from ..operators.analytics import cms_type_counts

    ensure_session_conf(spark)
    return cms_type_counts(load_table(spark, sf_dir, "events"))


def _q_events_retention_cohorts(spark, sf_dir):
    ensure_session_conf(spark)
    return retention_cohorts(load_table(spark, sf_dir, "events"))


def _q_events_type_transitions(spark, sf_dir):
    ensure_session_conf(spark)
    return event_type_transitions(load_table(spark, sf_dir, "events"))


def _q_graph_supplier_pagerank(spark, sf_dir):
    from ..operators.graph import supplier_pagerank

    ensure_session_conf(spark)
    return supplier_pagerank(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def _q_asof_purchase(spark, sf_dir):
    """As-of join: for each click, the user's latest purchase at or
    before it (union-window construction, operators/joins.py); DuckDB's
    native ASOF JOIN is the independent oracle."""
    from ..operators.joins import as_of_join

    ensure_session_conf(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_millis("ts").alias("ts_ms"), "value"
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_ms")
        .agg(
            F.max("event_id").alias("p_event_id"),
            F.max_by("value", "event_id").alias("p_value"),
        )
        .withColumn("p_ts_ms", F.col("ts_ms"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_ms"
    )
    j = as_of_join(
        clicks, purch, ["user_id"], "ts_ms", ["p_event_id", "p_ts_ms", "p_value"]
    )
    return j.select(
        "event_id",
        "user_id",
        "ts_ms",
        F.col("__asof.p_event_id").alias("purchase_event_id"),
        F.col("__asof.p_ts_ms").alias("purchase_ts_ms"),
        F.col("__asof.p_value").alias("purchase_value"),
    )


def _q_view_click_range(spark, sf_dir):
    """Banded range join: clicks within 10 minutes after a view by the
    same user (interval-bucketed equi-join, operators/joins.py)."""
    from ..operators.joins import range_join_bucketed

    ensure_session_conf(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_millis("ts").alias("ts_ms")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts_ms"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_ms"
    )
    j = range_join_bucketed(views, clicks, ["user_id"], "ts_ms", 0, 600_000)
    return j.select(
        F.col("event_id").alias("view_event_id"),
        F.col("r_event_id").alias("click_event_id"),
        "user_id",
        (F.col("r_ts_ms") - F.col("ts_ms")).alias("gap_ms"),
    )


def _q_events_pivot(spark, sf_dir):
    """Pivot family: per user-cohort event-type count matrix.  The
    explicit value list keeps the pivot a single pass (no extra
    distinct-values job) and makes the output schema static -- the
    form that scales.  Counts only: integer-exact across engines."""
    ensure_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("cohort", F.col("user_id") % 10)
        .groupBy("cohort")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )


def _q_events_props_stats(spark, sf_dir):
    """Semi-structured column handling: ``props`` is a JSON string;
    schema-on-read ``from_json`` extracts the typed field inline (no
    second pass, no UDF) and the aggregate runs on the parsed value.
    The oracle extracts the same field with a regexp so it needs no
    DuckDB JSON extension."""
    ensure_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k long")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").cast("long").alias("sum_k"),
        )
    )


def _q_kmv_distinct(spark, sf_dir):
    ensure_session_conf(spark)
    return kmv_distinct_users(load_table(spark, sf_dir, "events"))


def _q_kmv_setops(spark, sf_dir):
    """Theta-style set operations from KMV sketches: union / Jaccard /
    intersection estimates for every event-type pair's user sets,
    merged purely from the per-type bottom-k sketches, with the exact
    values as the error exhibit (analytics.kmv_set_ops)."""
    ensure_session_conf(spark)
    from ..operators.analytics import kmv_set_ops

    return kmv_set_ops(load_table(spark, sf_dir, "events"))


def _q_salted_type_stats(spark, sf_dir):
    """Skew-safe two-phase aggregation as a driver query: event_type
    has only 5 values (maximal key skew), the textbook salted-agg case.
    All outputs are exact (count/min/max/integer-sum), so the result is
    salt-invariant and equals the plain GROUP BY the oracle runs."""
    from ..functions import salted_aggregate

    ensure_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return salted_aggregate(
        ev,
        ["event_type"],
        {
            "n_events": ("event_id", "count"),
            "max_value": ("value", "max"),
            "min_id": ("event_id", "min"),
            "sum_ids": ("event_id", "sum"),
        },
    )


def _q_running_windows(spark, sf_dir):
    ensure_session_conf(spark)
    return running_windows(load_table(spark, sf_dir, "events"))


def _q_nation_revenue(spark, sf_dir):
    ensure_session_conf(spark)
    return customer_nation_revenue(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


# --- round-4 relational tier (TPC-H Q2/Q6/Q7/Q8/Q10/Q11/Q12/Q14/Q15/
# Q20/Q22 shapes over the available schema), lexical diversity, and the
# engine-native session-window stream ------------------------------------

def _q_discounted_revenue(spark, sf_dir):
    ensure_session_conf(spark)
    return discounted_revenue(load_table(spark, sf_dir, "lineitem"))


def _q_promo_revenue_share(spark, sf_dir):
    ensure_session_conf(spark)
    return promo_revenue_share(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def _q_late_line_priority_mix(spark, sf_dir):
    ensure_session_conf(spark)
    return late_line_priority_mix(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def _q_volume_shipping(spark, sf_dir):
    ensure_session_conf(spark)
    return volume_shipping(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def _q_nation_market_share(spark, sf_dir):
    ensure_session_conf(spark)
    return nation_market_share(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def _q_returned_item_losses(spark, sf_dir):
    ensure_session_conf(spark)
    return returned_item_losses(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "nation"),
    )


def _q_important_parts(spark, sf_dir):
    ensure_session_conf(spark)
    return important_parts(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def _q_top_revenue_supplier(spark, sf_dir):
    ensure_session_conf(spark)
    return top_revenue_supplier(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "supplier")
    )


def _q_min_cost_supplier_per_part(spark, sf_dir):
    ensure_session_conf(spark)
    return min_cost_supplier_per_part(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def _q_excess_quantity_suppliers(spark, sf_dir):
    ensure_session_conf(spark)
    return excess_quantity_suppliers(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
    )


def _q_idle_rich_customers(spark, sf_dir):
    ensure_session_conf(spark)
    return idle_rich_customers(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


def _q_shipping_priority(spark, sf_dir):
    ensure_session_conf(spark)
    return shipping_priority(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


def _q_supplier_part_counts(spark, sf_dir):
    ensure_session_conf(spark)
    return supplier_part_counts(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
    )


def _q_small_quantity_revenue(spark, sf_dir):
    ensure_session_conf(spark)
    return small_quantity_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def _q_brand_bracket_revenue(spark, sf_dir):
    ensure_session_conf(spark)
    return brand_bracket_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def _q_lineitem_measure_profile(spark, sf_dir):
    """UNPIVOT + GROUPING SETS in one pass: melt the four lineitem
    measures to long form (one Expand, zero shuffle), then a single
    grouping-sets aggregate emits per-flag and measure-total stats."""
    from ..operators.analytics import measure_profile

    ensure_session_conf(spark)
    return measure_profile(load_table(spark, sf_dir, "lineitem"))


def _q_events_time_rollup(spark, sf_dir):
    ensure_session_conf(spark)
    return time_rollup(load_table(spark, sf_dir, "events"))


def _q_events_gap_fill(spark, sf_dir):
    ensure_session_conf(spark)
    return gap_fill_locf(load_table(spark, sf_dir, "events"))


def _q_burst_minutes(spark, sf_dir):
    ensure_session_conf(spark)
    return burst_minutes(load_table(spark, sf_dir, "events"))


def _q_value_anomalies(spark, sf_dir):
    ensure_session_conf(spark)
    return value_anomalies(load_table(spark, sf_dir, "events"))


def _q_hdr_quantiles(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.analytics import hdr_quantiles

    return hdr_quantiles(load_table(spark, sf_dir, "events"))


def _q_gopher_quality(spark, sf_dir):
    ensure_session_conf(spark)
    return gopher_quality_flags(_docs(spark, sf_dir))


def _q_ab_test_welch(spark, sf_dir):
    """Welch two-sample t-test per event type over the md5-parity user
    split (analytics.ab_test_welch): one conditional-sum aggregate,
    statistics from exact sums."""
    ensure_session_conf(spark)
    from ..operators.analytics import ab_test_welch

    return ab_test_welch(load_table(spark, sf_dir, "events"))


def _q_value_trend_ols(spark, sf_dir):
    """Closed-form per-type OLS trend of value over the hour index
    (analytics.value_trend_ols): five exact sufficient statistics, one
    aggregate, no sort."""
    ensure_session_conf(spark)
    from ..operators.analytics import value_trend_ols

    return value_trend_ols(load_table(spark, sf_dir, "events"))


def _q_cusum_changepoints(spark, sf_dir):
    """CUSUM change-point per event type (analytics.cusum_changepoints):
    running deviation sum over the minute-count frame, arg-max pick by
    struct-max."""
    ensure_session_conf(spark)
    from ..operators.analytics import cusum_changepoints

    return cusum_changepoints(load_table(spark, sf_dir, "events"))


def _q_basket_brand_pairs(spark, sf_dir):
    """Market-basket brand pair mining with support + lift
    (analytics.basket_brand_pairs): distinct (order, brand) frame,
    a<b self-join bounded per basket, broadcast marginals."""
    ensure_session_conf(spark)
    from ..operators.analytics import basket_brand_pairs

    return basket_brand_pairs(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def _q_customer_360(spark, sf_dir):
    """Entity-360 golden record (analytics.customer_360): per-key
    pre-aggregates on both sides, one FULL OUTER join of key-sized
    frames, absence-as-segment."""
    ensure_session_conf(spark)
    from ..operators.analytics import customer_360

    return customer_360(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "events")
    )


def _q_chi_square(spark, sf_dir):
    """Chi-square independence of event type x hour-of-day
    (analytics.chi_square_independence): one contingency aggregate,
    decimal-summed cell contributions, Cramer's V."""
    ensure_session_conf(spark)
    from ..operators.analytics import chi_square_independence

    return chi_square_independence(load_table(spark, sf_dir, "events"))


def _q_psi_drift(spark, sf_dir):
    """Population stability index pre/post cutoff
    (analytics.psi_drift_report): reference-decile buckets, smoothed
    proportions, decimal-summed contributions."""
    ensure_session_conf(spark)
    from ..operators.analytics import psi_drift_report

    return psi_drift_report(load_table(spark, sf_dir, "events"))


def _q_ks_drift(spark, sf_dir):
    """Two-sample KS drift per type over the HDR bucket sketch
    (analytics.ks_drift_report)."""
    ensure_session_conf(spark)
    from ..operators.analytics import ks_drift_report

    return ks_drift_report(load_table(spark, sf_dir, "events"))


def _q_mad_anomalies(spark, sf_dir):
    """MAD modified-z outlier flags (analytics.mad_anomalies): two
    broadcast percentile aggregates, zero corpus shuffle."""
    ensure_session_conf(spark)
    from ..operators.analytics import mad_anomalies

    return mad_anomalies(load_table(spark, sf_dir, "events"))


def _q_twap_daily(spark, sf_dir):
    """Time-weighted average value per user-day (analytics.twap_daily):
    LOCF holding intervals from one key-partitioned window, exact
    decimal weighted sums."""
    ensure_session_conf(spark)
    from ..operators.analytics import twap_daily

    return twap_daily(load_table(spark, sf_dir, "events"))


def _q_path_trigrams(spark, sf_dir):
    """Top-k 3-step event-type paths (analytics.event_path_trigrams):
    one per-user window, bounded-vocabulary count, TakeOrdered top-k."""
    ensure_session_conf(spark)
    from ..operators.analytics import event_path_trigrams

    return event_path_trigrams(load_table(spark, sf_dir, "events"))


def _q_hll_rolling(spark, sf_dir):
    """Rolling distinct users from merged hourly HLL partials
    (analytics.hll_rolling_distinct): sketch rows explode, raw events
    never re-scan; exact explode path + error-bound flag as contract."""
    ensure_session_conf(spark)
    from ..operators.analytics import hll_rolling_distinct

    return hll_rolling_distinct(load_table(spark, sf_dir, "events"))


def _q_conversion_ab(spark, sf_dir):
    """Two-proportion conversion z-test over the md5-parity arms
    (analytics.conversion_ab_test)."""
    ensure_session_conf(spark)
    from ..operators.analytics import conversion_ab_test

    return conversion_ab_test(load_table(spark, sf_dir, "events"))


def _q_benford(spark, sf_dir):
    """Benford first-digit audit over order totals
    (analytics.benford_audit)."""
    ensure_session_conf(spark)
    from ..operators.analytics import benford_audit

    return benford_audit(load_table(spark, sf_dir, "orders"))


def _q_abc_classes(spark, sf_dir):
    """ABC/Pareto customer classification (analytics.abc_classes):
    bucketed two-phase exact-decimal prefix sum, no global window."""
    ensure_session_conf(spark)
    from ..operators.analytics import abc_classes

    return abc_classes(load_table(spark, sf_dir, "orders"))


def _q_multitouch(spark, sf_dir):
    """Linear multi-touch attribution (analytics.multitouch_attribution):
    1/n credit per in-session preceding touch, session-bounded pairing."""
    ensure_session_conf(spark)
    from ..operators.analytics import multitouch_attribution

    return multitouch_attribution(load_table(spark, sf_dir, "events"))


def _q_multitouch_position(spark, sf_dir):
    """U-shaped 40/20/40 attribution (multitouch_attribution
    model='position')."""
    ensure_session_conf(spark)
    from ..operators.analytics import multitouch_attribution

    return multitouch_attribution(
        load_table(spark, sf_dir, "events"), model="position"
    )


def _q_multitouch_decay(spark, sf_dir):
    """Time-decay attribution (multitouch_attribution
    model='time_decay'): 2^(-age/10min) weights normalized per
    purchase."""
    ensure_session_conf(spark)
    from ..operators.analytics import multitouch_attribution

    return multitouch_attribution(
        load_table(spark, sf_dir, "events"), model="time_decay"
    )


def _q_median_of_means(spark, sf_dir):
    """Median-of-means robust mean (analytics.median_of_means):
    md5-bucketed exact-sum means, R-7 median over the bucket frame."""
    ensure_session_conf(spark)
    from ..operators.analytics import median_of_means

    return median_of_means(load_table(spark, sf_dir, "lineitem"))


def _q_rfm(spark, sf_dir):
    """RFM quintile scores + segment codes (analytics.rfm_scores):
    broadcast percentile boundaries, never an ntile window."""
    ensure_session_conf(spark)
    from ..operators.analytics import rfm_scores

    return rfm_scores(load_table(spark, sf_dir, "orders"))


def _q_funnel_timing(spark, sf_dir):
    """Funnel velocity (analytics.funnel_timing): per-transition
    conversion rate + R-7 median time-to-convert."""
    ensure_session_conf(spark)
    from ..operators.analytics import funnel_timing

    return funnel_timing(load_table(spark, sf_dir, "events"))


def _q_range_sort_plan(spark, sf_dir):
    """Balanced-sort range partition planner
    (analytics.range_sort_plan): exact percentile boundaries + the
    per-partition balance report for a global fact-table sort."""
    ensure_session_conf(spark)
    from ..operators.analytics import range_sort_plan

    return range_sort_plan(load_table(spark, sf_dir, "lineitem"))


def _q_zorder_skipping_report(spark, sf_dir):
    """Layout EFFECTIVENESS report: does the Z-order file assignment
    actually let a predicate skip files?  Per-file min/max of
    l_partkey (exactly the parquet footer stats a reader prunes on)
    plus, for the canonical range predicate l_partkey IN [100, 200],
    whether the file is skippable -- the pruning ratio is the number
    the layout exists to maximize, so the layout tier ships with its
    own grading.  One aggregate over the keyed frame; file-cardinality
    output."""
    ensure_session_conf(spark)
    from ..functions.zorder import zorder_key

    li = load_table(spark, sf_dir, "lineitem")
    z = zorder_key(F.col("l_partkey"), F.col("l_suppkey"))
    # finer file granularity than the writer query (>>14 vs >>26) so
    # the report grades pruning at every SF -- a grading knob, not a
    # layout change
    keyed = li.select(
        "l_partkey", F.shiftright(z, 14).alias("file_id")
    )
    lo, hi = 100, 200
    return (
        keyed.groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("min_partkey"),
            F.max("l_partkey").alias("max_partkey"),
        )
        .select(
            "file_id",
            "n_rows",
            "min_partkey",
            "max_partkey",
            # footer-stats pruning: the file is skipped when its
            # [min, max] cannot intersect the predicate range
            (
                (F.col("max_partkey") < lo) | (F.col("min_partkey") > hi)
            ).alias("skippable"),
        )
    )


def _q_watermark_plan(spark, sf_dir):
    """Event-time disorder profile (analytics.watermark_plan): the
    measured lateness quantiles that pick a streaming watermark delay
    -- bucketed two-phase running max, no global window."""
    ensure_session_conf(spark)
    from ..operators.analytics import watermark_plan

    return watermark_plan(load_table(spark, sf_dir, "events"))


def _q_session_gaps(spark, sf_dir):
    """Per-user inter-event gap quantiles (analytics.session_gap_profile):
    the measured sessionization timeout next to the measured watermark
    delay."""
    ensure_session_conf(spark)
    from ..operators.analytics import session_gap_profile

    return session_gap_profile(load_table(spark, sf_dir, "events"))


def _q_bot_scores(spark, sf_dir):
    """Bot-traffic scoring (analytics.bot_scores): per-user event rate
    + inter-event gap regularity -- metronomic or flooding users
    flagged before they pollute analytics or training data."""
    ensure_session_conf(spark)
    from ..operators.analytics import bot_scores

    return bot_scores(load_table(spark, sf_dir, "events"))


def _q_k_anonymity(spark, sf_dir):
    """k-anonymity / l-diversity release audit
    (analytics.k_anonymity_report): equivalence-class sizes over the
    (nation, segment, balance-bracket) quasi-identifier with the
    order-priority sensitive column -- HIGH/MEDIUM/LOW risk bands."""
    ensure_session_conf(spark)
    from ..operators.analytics import k_anonymity_report

    return k_anonymity_report(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


def _q_seasonal_profile(spark, sf_dir):
    """Monthly-revenue seasonal decomposition
    (analytics.seasonal_profile): centered 12-month MA trend +
    per-month seasonal index + deseasonalized series, all
    decimal-exact."""
    ensure_session_conf(spark)
    from ..operators.analytics import seasonal_profile

    return seasonal_profile(load_table(spark, sf_dir, "orders"))


def _q_user_lifecycle(spark, sf_dir):
    """Growth-accounting lifecycle ledger (analytics.user_lifecycle):
    per-day new / returning / resurrected active-user decomposition."""
    ensure_session_conf(spark)
    from ..operators.analytics import user_lifecycle

    return user_lifecycle(load_table(spark, sf_dir, "events"))


def _q_supplier_similarity(spark, sf_dir):
    """Shared-catalog supplier Jaccard (analytics.supplier_similarity):
    inverted-index pair enumeration with the df-cap discipline --
    exact set similarity, never supplier x supplier."""
    ensure_session_conf(spark)
    from ..operators.analytics import supplier_similarity

    return supplier_similarity(load_table(spark, sf_dir, "lineitem"))


def _q_hourly_autocorr(spark, sf_dir):
    """Hourly-volume autocorrelation (analytics.hourly_autocorr):
    integer-exact Pearson terms, one double expression per (type,
    lag) -- the periodicity detector."""
    ensure_session_conf(spark)
    from ..operators.analytics import hourly_autocorr

    return hourly_autocorr(load_table(spark, sf_dir, "events"))


def _q_forecast_baseline(spark, sf_dir):
    """Seasonal-naive vs naive-1 MASE report
    (analytics.forecast_baseline_report): integer-exact error sums,
    one division -- the must-beat baseline for any volume forecast."""
    ensure_session_conf(spark)
    from ..operators.analytics import forecast_baseline_report

    return forecast_baseline_report(load_table(spark, sf_dir, "events"))


def _q_top_movers(spark, sf_dir):
    """Half-over-half log-ratio movers (analytics.top_movers): top-k
    risers and fallers, WindowGroupLimit top-k, tfidf rounding
    discipline on the log."""
    ensure_session_conf(spark)
    from ..operators.analytics import top_movers

    return top_movers(load_table(spark, sf_dir, "events"))


def _q_cohort_ltv(spark, sf_dir):
    """Cohort LTV triangle (analytics.cohort_ltv): first-order-month
    cohorts, decimal-exact revenue by month age, cumulative LTV per
    member."""
    ensure_session_conf(spark)
    from ..operators.analytics import cohort_ltv

    return cohort_ltv(load_table(spark, sf_dir, "orders"))


def _q_fulfillment_sla(spark, sf_dir):
    """Order-to-ship SLA profile (analytics.fulfillment_sla_profile):
    exact-int delay stats + R-7 percentiles per priority."""
    ensure_session_conf(spark)
    from ..operators.analytics import fulfillment_sla_profile

    return fulfillment_sla_profile(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )


def _q_engagement_ratios(spark, sf_dir):
    """DAU/WAU/MAU + stickiness (analytics.engagement_ratios):
    set-exact trailing distincts from ONE explode + one aggregate --
    no window function."""
    ensure_session_conf(spark)
    from ..operators.analytics import engagement_ratios

    return engagement_ratios(load_table(spark, sf_dir, "events"))


def _q_returns_control(spark, sf_dir):
    """Weekly return-rate p-chart (analytics.returns_control_chart):
    3-sigma binomial control limits around the pooled rate."""
    ensure_session_conf(spark)
    from ..operators.analytics import returns_control_chart

    return returns_control_chart(load_table(spark, sf_dir, "lineitem"))


def _q_sourcing_hhi(spark, sf_dir):
    """Sourcing-concentration HHI per part bracket
    (analytics.sourcing_concentration): exact-decimal share algebra,
    DOJ bands."""
    ensure_session_conf(spark)
    from ..operators.analytics import sourcing_concentration

    return sourcing_concentration(load_table(spark, sf_dir, "lineitem"))


def _q_slo_burn(spark, sf_dir):
    """Multi-window SLO burn rates (analytics.slo_burn_rates): 1 h / 6 h
    trailing error-budget multiples, page on both-hot."""
    ensure_session_conf(spark)
    from ..operators.analytics import slo_burn_rates

    return slo_burn_rates(load_table(spark, sf_dir, "events"))


__all__ = [_n for _n in list(globals()) if not _n.startswith('__') and _n != '_shared']
