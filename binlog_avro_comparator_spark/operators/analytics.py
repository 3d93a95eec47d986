"""Relational analytics queries over the TPC-H-ish tables.

These exercise the relational surface the reference lacks (SURVEY.md
section 2.10: group-by aggregation, sort, top-k, multi-way join,
window) so the engine is a complete query surface, and double as bench
headliners.

Float determinism: monetary aggregates are summed as DECIMAL (exact,
order-independent) and only then cast to DOUBLE, so Spark's partial
aggregation order can't perturb results vs. single-threaded oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DEC = "decimal(12,2)"


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan -> filter -> hash agg.
    One shuffle on the tiny (flag, status) grouping key; partial
    aggregation does nearly all the work map-side."""
    qty = F.col("l_quantity").cast(_DEC)
    price = F.col("l_extendedprice").cast(_DEC)
    disc_mult = (F.lit(1) - F.col("l_discount")).cast(_DEC)
    tax_mult = (F.lit(1) + F.col("l_tax")).cast(_DEC)
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * disc_mult).cast("double").alias("sum_disc_price"),
            F.sum(price * disc_mult * tax_mult).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
    )


def top_revenue_orders(orders: DataFrame, lineitem: DataFrame, k: int = 10) -> DataFrame:
    """Join + aggregate + global top-k.

    Revenue aggregates lineitem *before* the join (shuffle carries one
    row per order, not one per line item), then joins orders -- the
    aggregate-below-join placement that matters at 100 TB.  Top-k is
    ``orderBy().limit(k)``, which Spark plans as TakeOrderedAndProject:
    every partition keeps only its local k rows and the driver merges
    k*numPartitions candidates -- no global sort, no single-task window
    funnel.  The rank column is attached afterwards with a window over
    the k surviving rows (bounded work regardless of input size).
    """
    price = F.col("l_extendedprice").cast(_DEC)
    disc_mult = (F.lit(1) - F.col("l_discount")).cast(_DEC)
    rev = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(price * disc_mult).cast("double").alias("revenue"))
    )
    joined = rev.join(
        orders.select("o_orderkey", "o_custkey", "o_orderstatus"),
        rev["l_orderkey"] == F.col("o_orderkey"),
    )
    topk = (
        joined.select("o_orderkey", "o_custkey", "o_orderstatus", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
    return topk.withColumn("rank", F.row_number().over(w))


def high_value_customers(customer: DataFrame, orders: DataFrame, min_total: float = 100_000.0) -> DataFrame:
    """LEFT SEMI join: customers having at least one high-value order.
    Semi joins ship only the key column of the probe side -- at scale
    that's the cheapest existence check there is."""
    big = orders.filter(F.col("o_totalprice") >= min_total).select("o_custkey")
    return customer.join(
        big, customer["c_custkey"] == big["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


def user_set_ops(events: DataFrame) -> DataFrame:
    """Set operations over per-type user sets: INTERSECT (purchasers who
    also clicked) and EXCEPT (purchasers who never clicked), tagged."""
    purchasers = events.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    clickers = events.filter(F.col("event_type") == "click").select("user_id").distinct()
    both = purchasers.intersect(clickers).select(
        F.col("user_id"), F.lit("purchase_and_click").alias("cohort")
    )
    only = purchasers.exceptAll(clickers).select(
        F.col("user_id"), F.lit("purchase_no_click").alias("cohort")
    )
    return both.unionAll(only)


def revenue_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP aggregation: order totals by (status, priority) with
    subtotals and a grand total -- the grouping-sets tier."""
    price = F.col("o_totalprice").cast(_DEC)
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum(price).cast("double").alias("total_price"),
            F.count("*").alias("n_orders"),
        )
    )


def customer_nation_revenue(
    customer: DataFrame, nation: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Multi-way join with broadcast dimensions: lineitem -> orders ->
    customer -> nation, revenue rolled up per nation.  nation/customer
    are broadcast (classic star-schema plan); the only big shuffle is
    lineitem's pre-aggregation by order key."""
    price = F.col("l_extendedprice").cast(_DEC)
    disc_mult = (F.lit(1) - F.col("l_discount")).cast(_DEC)
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.sum(price * disc_mult).alias("order_rev")
    )
    j = (
        per_order.join(
            orders.select("o_orderkey", "o_custkey"),
            per_order["l_orderkey"] == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        j.groupBy("n_name")
        .agg(
            F.sum("order_rev").cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def regional_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_lo: str = "1998-01-01",
    date_hi: str = "1999-01-01",
) -> DataFrame:
    """TPC-H Q5-shaped local-supplier volume: revenue per nation for
    line items whose customer and supplier sit in the same nation,
    within one region and one order-date year.

    Star-schema plan, the 100 TB shape: region -> nation -> supplier
    are broadcast (region prunes nation, nation prunes supplier BEFORE
    the fact join, so the filter reaches the big side as a join-key
    reduction); orders is filtered by the date predicate AT THE SCAN
    (pushed to parquet row-group pruning) and only then joined to
    lineitem -- the one genuinely big-big shuffle in the query.  The
    customer join stays unhinted: at sf0.01 AQE broadcasts it, at 100 TB
    customer is itself large and AQE picks shuffle sides.  The
    same-nation requirement (c_nationkey = s_nationkey) rides as a
    post-join filter on two already-present small ints, not an extra
    join."""
    r = region.filter(F.col("r_name") == region_name).select("r_regionkey")
    n = nation.join(
        F.broadcast(r), nation["n_regionkey"] == r["r_regionkey"]
    ).select("n_nationkey", "n_name")
    s = supplier.join(
        F.broadcast(n), supplier["s_nationkey"] == n["n_nationkey"]
    ).select("s_suppkey", "s_nationkey", "n_name")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    price = F.col("l_extendedprice").cast(_DEC)
    disc_mult = (F.lit(1) - F.col("l_discount")).cast(_DEC)
    j = (
        lineitem.select("l_orderkey", "l_suppkey", price.alias("__p"), disc_mult.alias("__d"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
    )
    return j.groupBy("n_name").agg(
        F.sum(F.col("__p") * F.col("__d")).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


def part_profit_by_nation(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    name_pattern: str = "%bolt%",
) -> DataFrame:
    """TPC-H Q9-shaped product-line profit: discounted revenue per
    (supplier nation, order year) for parts matching a name pattern.

    The selective dimension leads: part is filtered by the LIKE at its
    scan and broadcast, so the fact table sheds non-matching rows in
    the very first (map-side) join -- the cheapest place to lose data.
    supplier+nation broadcast likewise.  orders arrives pre-projected
    to (key, year): the year is computed BEFORE the shuffle so the
    exchange carries an int, not a timestamp.  One big shuffle total
    (lineitem x orders)."""
    p = part.filter(F.col("p_name").like(name_pattern)).select("p_partkey")
    sn = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    o = orders.select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    price = F.col("l_extendedprice").cast(_DEC)
    disc_mult = (F.lit(1) - F.col("l_discount")).cast(_DEC)
    j = (
        lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey",
            (price * disc_mult).alias("__amount"),
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return j.groupBy("n_name", "o_year").agg(
        F.sum("__amount").cast("double").alias("profit"),
        F.count("*").alias("n_items"),
    )


def funnel_stages(events: DataFrame) -> DataFrame:
    """Ordered-funnel analysis: for each user, the first ``view``, the
    first ``click`` strictly after that view, and the first ``purchase``
    strictly after that click -- the classic product-analytics funnel,
    which SQL engines without MATCH_RECOGNIZE express as N chained
    self-joins.

    Here it is ONE shuffle: group events per user, sort the (bounded,
    per-user) struct array once, and walk the stages with higher-order
    array functions -- each stage is ``try_element_at(filter(...), 1)``
    against the previous stage's (ts, event_id) cursor.  "After" is
    strict on the (ts_ms, event_id) pair, so ties are deterministic and
    a same-millisecond click still counts if its event_id is larger.
    At 100 TB: per-user arrays are session-sized (the same bound
    sessionize and any per-key window already accepts); no stage joins,
    no window over the full stream.  ``stage_reached`` in {1,2,3}; users
    with no view event do not appear."""
    ts_ms = F.unix_millis(F.col("ts"))
    base = events.filter(
        F.col("event_type").isin("view", "click", "purchase")
        & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        F.struct(
            ts_ms.alias("ts_ms"),
            F.col("event_id").alias("event_id"),
            F.col("event_type").alias("etype"),
        ).alias("e"),
    )
    per_user = base.groupBy("user_id").agg(
        F.array_sort(F.collect_list("e")).alias("es")
    )

    def _after(etype: str, prev: str) -> F.Column:
        # first event of `etype` strictly after the (ts, id) of `prev`
        return F.try_element_at(
            F.filter(
                F.col("es"),
                lambda x: (x["etype"] == etype)
                & (
                    (x["ts_ms"] > F.col(f"{prev}.ts_ms"))
                    | (
                        (x["ts_ms"] == F.col(f"{prev}.ts_ms"))
                        & (x["event_id"] > F.col(f"{prev}.event_id"))
                    )
                ),
            ),
            F.lit(1),
        )

    staged = (
        per_user.withColumn(
            "e1",
            F.try_element_at(F.filter(F.col("es"), lambda x: x["etype"] == "view"), F.lit(1)),
        )
        .filter(F.col("e1").isNotNull())
        .withColumn("e2", _after("click", "e1"))
        .withColumn("e3", _after("purchase", "e2"))
    )
    return staged.select(
        "user_id",
        F.col("e1.ts_ms").alias("view_ts_ms"),
        F.col("e2.ts_ms").alias("click_ts_ms"),
        F.col("e3.ts_ms").alias("purchase_ts_ms"),
        (
            F.lit(1)
            + F.col("e2").isNotNull().cast("int")
            + F.col("e3").isNotNull().cast("int")
        ).alias("stage_reached"),
    )


def running_windows(events: DataFrame) -> DataFrame:
    """Running-window family over the event stream: per-user running
    count and max, previous-event gap (lag), and a 3-row sliding min --
    ROWS-frame windows + offset functions, the remaining §2.10 window
    shapes (cumulative frames were already covered by sessionize's
    cumulative sum).

    Every output is order-exact (counts, max/min, timestamp
    subtraction -- no float accumulation), so the values are identical
    in any engine without rounding tricks.  Scale: one shuffle on
    user_id; within a partition the window is a single sort -- the
    same bound as any per-key sessionization."""
    ts_ms = F.unix_millis(F.col("ts"))
    base = events.select(
        "user_id", "event_id", ts_ms.alias("ts_ms"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    last3 = w.rowsBetween(-2, 0)
    return base.select(
        "user_id",
        "event_id",
        "ts_ms",
        F.count("*").over(cum).alias("n_events_so_far"),
        F.max("value").over(cum).alias("running_max_value"),
        (F.col("ts_ms") - F.lag("ts_ms", 1).over(w)).alias("gap_ms"),
        F.min("value").over(last3).alias("min_value_3"),
    )


KMV_K = 64
KMV_SPACE = float(1 << 48)  # word_hash domain


def _kmv_bottom_k(events: DataFrame, k: int = KMV_K) -> DataFrame:
    """Per-type bottom-k sketch frame (event_type, ks array<long>),
    built two-phase so no task anywhere sorts more than one input
    partition's hashes (see kmv_distinct_users for the full argument)."""
    from .textstats import word_hash

    hashed = events.filter(F.col("user_id").isNotNull()).select(  # NULL is not a user
        "event_type", word_hash(F.col("user_id").cast("string")).alias("h")
    )
    local = (
        hashed.withColumn("pid", F.spark_partition_id())
        .groupBy("event_type", "pid")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("ks"))
    )
    return (
        local.select("event_type", F.explode("ks").alias("h"))
        .groupBy("event_type")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("ks"))
    )


def kmv_distinct_users(events: DataFrame, k: int = KMV_K) -> DataFrame:
    """Distinct-count SKETCH per event type: k-minimum-values (KMV /
    bottom-k) estimator over the portable 48-bit hash -- the classic
    fixed-memory distinct sketch (Bar-Yossef et al. 2002), built from
    plain DataFrame ops.

    Estimate = (k-1) * HASH_SPACE / kth_smallest_hash; groups with
    fewer than k distinct hashes report exactly.  Unlike
    approx_count_distinct (whose HLL sketch is engine-internal), every
    intermediate here is integer-exact and the hash is the shared
    md5-48bit, so the ESTIMATE itself is reproducible in any engine --
    the property that makes a sketch auditable across systems.

    Scale shape -- TWO-PHASE bottom-k, the way a real sketch merges:

      phase 1  group by (event_type, spark_partition_id()): the partial
               collect_set dedups map-side, so the exchange carries one
               locally-deduped hash set per (type, input-partition) --
               the volume a plain ``distinct`` would move, but in a
               single shuffle instead of distinct's shuffle PLUS a rank
               window's second one.  Each group then truncates to k
               longs via ``slice(array_sort(...), 1, k)``, distributed
               across (type, partition) groups.
      phase 2  explode the <= n_partitions * k survivors per type and
               take the bottom-k of their (re-deduped) union -- a
               kilobyte-scale aggregate.

    The point vs a rank window (``row_number over partition by
    event_type``): the window sorts EVERY distinct hash of a type in
    ONE task -- with few types and 1e9 users that is a single-task sort
    per type, not map-side combinable.  Here no task anywhere touches
    more than one input partition's hashes, and the plan is pure
    aggregates (plan-test: no Window operator).  A deployment that can
    tolerate an engine-internal sketch would use approx_count_distinct
    and shuffle O(sketch) bytes only; this operator exists for the
    cross-engine-reproducible estimate, and keeps the exact bottom-k
    contract the DuckDB twin checks."""
    agg = _kmv_bottom_k(events, k).select(
        "event_type",
        F.size("ks").cast("long").alias("n_kept"),
        F.array_max("ks").alias("kth_hash"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise((k - 1) * F.lit(KMV_SPACE) / F.col("kth_hash"))
    return agg.select(
        "event_type",
        "n_kept",
        "kth_hash",
        F.round(est, 4).alias("est_distinct_users"),
    )


def kmv_set_ops(events: DataFrame, k: int = KMV_K) -> DataFrame:
    """Set-operation ESTIMATES between every pair of event types' user
    sets from their KMV sketches -- the theta-sketch trick that makes
    bottom-k the composable distinct sketch: two sketches merge to the
    union's sketch (bottom-k of the concatenation), the Jaccard
    estimator is the fraction of the union sketch's hashes present in
    BOTH input sketches, and intersection = jaccard * union.  HLL can
    only union; this is why audit pipelines carry KMV.

    Engine shape: the corpus is touched exactly twice -- once for the
    per-type sketches (the two-phase bottom-k of _kmv_bottom_k: one
    shuffle of locally-deduped hash sets), once for the exact exhibit
    side (a distinct (user, type) frame self-joined on user_id --
    shuffles by user, the unavoidable exact cost that the sketch path
    exists to avoid).  Everything pairwise happens on the n_types-row
    sketch frame: the pair join, union-merge, and intersect are array
    ops over k=64 longs, broadcast-joined -- at 100 TB the pairwise
    stage costs kilobytes regardless of corpus size.

    Determinism: hashes are the portable md5-48bit words, merges are
    sorted-distinct array ops, estimates are single divisions of
    exactly-determined values (the kmv_distinct_users contract).

    Returns one row per unordered type pair: (type_a, type_b,
    n_union_kept, union_kth, est_union, sketch_common, jaccard_est,
    est_intersection, exact_a, exact_b, exact_union,
    exact_intersection)."""
    sketches = _kmv_bottom_k(events, k)
    a = sketches.select(
        F.col("event_type").alias("type_a"), F.col("ks").alias("ks_a")
    )
    b = sketches.select(
        F.col("event_type").alias("type_b"), F.col("ks").alias("ks_b")
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    u = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("ks_a"), F.col("ks_b")))),
        1,
        k,
    )
    paired = pairs.select(
        "type_a",
        "type_b",
        u.alias("__u"),
        F.size(F.array_intersect(F.array_intersect(u, F.col("ks_a")), F.col("ks_b")))
        .cast("long")
        .alias("sketch_common"),
    ).select(
        "type_a",
        "type_b",
        F.size("__u").cast("long").alias("n_union_kept"),
        F.array_max("__u").alias("union_kth"),
        "sketch_common",
    )
    est_union = F.when(
        F.col("n_union_kept") < k, F.col("n_union_kept").cast("double")
    ).otherwise((k - 1) * F.lit(KMV_SPACE) / F.col("union_kth"))
    jac = F.col("sketch_common") / F.col("n_union_kept")
    est = paired.select(
        "type_a",
        "type_b",
        "n_union_kept",
        "union_kth",
        F.round(est_union, 4).alias("est_union"),
        "sketch_common",
        F.round(jac, 6).alias("jaccard_est"),
        F.round(jac * est_union, 4).alias("est_intersection"),
    )
    ut = events.filter(F.col("user_id").isNotNull()).select(
        "user_id", "event_type"
    ).distinct()
    inter = (
        ut.alias("x")
        .join(ut.alias("y"), "user_id")
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("exact_intersection"))
    )
    counts = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    return (
        est.join(
            F.broadcast(counts.select(F.col("event_type").alias("type_a"), F.col("n").alias("exact_a"))),
            "type_a",
        )
        .join(
            F.broadcast(counts.select(F.col("event_type").alias("type_b"), F.col("n").alias("exact_b"))),
            "type_b",
        )
        .join(F.broadcast(inter), ["type_a", "type_b"], "left")
        .withColumn(
            "exact_intersection", F.coalesce(F.col("exact_intersection"), F.lit(0))
        )
        .select(
            "type_a",
            "type_b",
            "n_union_kept",
            "union_kth",
            "est_union",
            "sketch_common",
            "jaccard_est",
            "est_intersection",
            "exact_a",
            "exact_b",
            (F.col("exact_a") + F.col("exact_b") - F.col("exact_intersection")).alias(
                "exact_union"
            ),
            "exact_intersection",
        )
    )


def rank_family(events: DataFrame) -> DataFrame:
    """The ranking-function surface in one query: rank / dense_rank /
    percent_rank / cume_dist over a TIED ordering (value floored to an
    int bucket -- gaps and plateaus become visible) and ntile over a
    UNIQUE ordering (ties would make ntile assignment order-dependent;
    (ts, event_id) is total, so the decile is deterministic).

    Determinism contract: every output column is a pure function of the
    data -- tied rows share rank/dense_rank/percent_rank/cume_dist by
    definition, and ntile's ordering is unique -- so any engine
    reproduces it bit-for-bit (percent_rank/cume_dist rounded to 1e-6).

    Scale note: a rank over PARTITION BY event_type sorts each type's
    full partition in one task -- this query exists for SQL-surface
    parity and analyst workloads where groups are bounded.  Global
    top-k wants TakeOrderedAndProject (top_revenue_orders), per-group
    top-k wants WindowGroupLimit pushdown (last-write-wins dedup), and
    quantile binning wants the broadcast-percentile shape
    (quality_deciles) -- all three already in the repo."""
    ts_ms = F.unix_millis(F.col("ts"))
    vb = F.floor(F.col("value")).cast("long")
    tied = Window.partitionBy("event_type").orderBy(vb)
    unique = Window.partitionBy("event_type").orderBy(ts_ms, "event_id")
    return events.select(
        "event_id",
        "event_type",
        vb.alias("value_bucket"),
        F.rank().over(tied).alias("rnk"),
        F.dense_rank().over(tied).alias("dense_rnk"),
        F.round(F.percent_rank().over(tied), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(tied), 6).alias("cume"),
        F.ntile(10).over(unique).alias("time_decile"),
    )


def orders_cube(orders: DataFrame) -> DataFrame:
    """CUBE aggregate over (order year, order status): every rollup
    combination (both, year-only, status-only, grand total) in one
    pass -- the OLAP subtotal surface (revenue_rollup covers ROLLUP;
    this is the full lattice).

    Spark plans CUBE as a single Expand + hash aggregate: each input
    row is replicated once per grouping set BEFORE the shuffle and
    partially aggregated map-side, so the exchange carries one partial
    row per (grouping set x key) per input partition -- at 100 TB the
    4x Expand factor is map-local and the shuffle stays tiny.
    grouping_id distinguishes a genuine NULL key from a subtotal
    row."""
    yr = F.year("o_orderdate").alias("o_year")
    return (
        orders.cube(yr, F.col("o_orderstatus"))
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("total_price"),
        )
    )


def trailing_window_10min(events: DataFrame) -> DataFrame:
    """Time-RANGE-frame trailing aggregate: per user, the event count
    and exact value max over the PRECEDING 10 MINUTES of event time --
    the rate-limit / rolling-exposure query, and the RANGE-frame
    complement to running_windows' ROWS frames (a ROWS frame counts
    rows; a RANGE frame spans time, however many events it holds).

    rangeBetween is expressed on the epoch-millis long, so both engines
    bound the frame with identical integer arithmetic; count and max
    are order-exact (no float accumulation).  Scale: one user_id
    shuffle, one sort per partition -- the frame adds no extra pass
    (Spark keeps a sliding frame cursor), and per-user partitions are
    the same bound every per-key window in the repo accepts."""
    ts_ms = F.unix_millis(F.col("ts"))
    base = events.select("user_id", "event_id", ts_ms.alias("ts_ms"), "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms")
        .rangeBetween(-600_000, 0)
    )
    return base.select(
        "user_id",
        "event_id",
        "ts_ms",
        F.count("*").over(w).alias("n_last_10min"),
        F.max("value").over(w).alias("max_value_10min"),
    )


def part_above_brand_avg(part: DataFrame) -> DataFrame:
    """Correlated-subquery surface: parts priced above the average
    retail price OF THEIR BRAND -- 'WHERE p_retailprice > (SELECT
    avg(...) WHERE brand = outer.brand)' in SQL.

    Spark-first: Catalyst decorrelates this to aggregate-then-join, so
    we declare that plan directly -- a small per-brand average
    (broadcast) joined back, comparison as a filter.  The correlated
    form and the declared form are the same logical plan after
    rewriting; at 100 TB the explicit form is also the explainable one
    (1-row-per-brand frame broadcast, fact side never shuffles).
    avg is a single IEEE division of a decimal-exact sum, rounded to 4
    for engine determinism like the other price averages."""
    avg_by_brand = part.groupBy("p_brand").agg(
        F.round(
            F.sum(F.col("p_retailprice").cast(_DEC)).cast("double")
            / F.count("*"),
            4,
        ).alias("brand_avg")
    )
    return (
        part.join(F.broadcast(avg_by_brand), on="p_brand")
        .filter(F.col("p_retailprice").cast("double") > F.col("brand_avg"))
        .select(
            "p_partkey",
            "p_brand",
            F.col("p_retailprice").cast("double").alias("p_retailprice"),
            "brand_avg",
        )
    )


def top_parts_per_brand(part: DataFrame, k: int = 3) -> DataFrame:
    """Per-GROUP top-k (the 'latest k orders per customer' shape):
    rank over (brand, price DESC) filtered to rank <= k.

    Spark 3.5+ plans the rank-then-filter idiom as WindowGroupLimit:
    each map task keeps only its local top-k PER GROUP before the
    shuffle, so the exchange carries k rows per (group x partition),
    not the group's whole history -- the per-group analogue of
    TakeOrderedAndProject (plan-tested).  Ordering ties break on
    p_partkey so the k survivors are engine-deterministic."""
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.select(
            "p_brand",
            "p_partkey",
            F.col("p_retailprice").cast("double").alias("p_retailprice"),
        )
        .withColumn("price_rank", F.row_number().over(w))
        .filter(F.col("price_rank") <= k)
    )


def value_histogram(events: DataFrame, width: float = 10.0) -> DataFrame:
    """Fixed-width histogram of the value column per event type -- the
    profiling query every column gets before filters are chosen.
    floor(value/width) is exact integer bucketing (no percentile state);
    one map-side-combinable aggregate, shuffle carries (type, bucket)
    partials."""
    bucket = F.floor(F.col("value") / width).cast("long")
    return (
        events.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame, exclude_priority: str = "1-URGENT"
) -> DataFrame:
    """TPC-H Q13-shaped customer order-count distribution: how many
    customers placed exactly N qualifying orders, INCLUDING the
    zero-order customers only an outer join can see.

    Two-aggregate shape: orders is filtered at the scan, pre-aggregated
    to (o_custkey, cnt) -- map-side combinable, the shuffle carries one
    row per customer that ever ordered -- then LEFT joined onto
    customer (null -> 0) and re-aggregated by count.  The second
    aggregate's key space is tiny (distinct counts), so the only real
    shuffle is the per-customer one; at 100 TB both sides of that join
    are customer-cardinality, not order-cardinality, and AQE picks the
    join strategy.  Returns (c_count, custdist)."""
    per_cust = (
        orders.filter(F.col("o_orderpriority") != exclude_priority)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("__cnt"))
    )
    counts = customer.select("c_custkey").join(
        per_cust, customer["c_custkey"] == per_cust["o_custkey"], "left"
    ).select(F.coalesce(F.col("__cnt"), F.lit(0)).alias("c_count"))
    return counts.groupBy("c_count").agg(F.count("*").alias("custdist"))


def late_shipment_orders(
    orders: DataFrame, lineitem: DataFrame, late_days: int = 80
) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: orders with AT LEAST ONE
    line item shipped more than ``late_days`` after the order date,
    counted per priority.  (The synthetic lineitem has no commit/
    receipt dates; ship-vs-order lateness is the same EXISTS shape.)

    The EXISTS is a LEFT SEMI hash join on l_orderkey -- each order
    emits at most once no matter how many late items it has, so no
    distinct pass; the lateness inequality rides on the hash match as
    a join residual, not a nested-loop condition.  The semi join's
    build side is pre-projected to (key, date); the per-priority
    aggregate after it is map-side combinable over a 5-value key.
    Returns (o_orderpriority, order_count)."""
    o = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def big_ticket_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 180.0,
) -> DataFrame:
    """TPC-H Q18-shaped large-volume-order report: orders whose total
    line-item quantity exceeds ``min_qty``, with their customer.

    HAVING-on-a-join-key shape: the lineitem aggregate runs FIRST and
    its survivor set (a few per mille of orders) drives everything --
    orders and customer join onto it, so at 100 TB the two dimension
    joins see thousands of rows, not billions; AQE broadcasts the
    survivor side.  The quantity sum is decimal-exact, cast to double
    only at the output boundary.  Returns (c_name, c_custkey,
    o_orderkey, o_orderdate_ms, o_totalprice, total_qty)."""
    qty = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("__q"))
        .filter(F.col("__q") > min_qty)
    )
    j = qty.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
        customer, F.col("o_custkey") == F.col("c_custkey")
    )
    return j.select(
        "c_name",
        "c_custkey",
        "o_orderkey",
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_ms"),
        "o_totalprice",
        F.col("__q").cast("double").alias("total_qty"),
    )


def monthly_revenue_growth(orders: DataFrame) -> DataFrame:
    """Month-over-month order-revenue trend: per-month totals with the
    previous month's total, absolute delta, and growth ratio -- the
    lag-window time-series shape (the running_windows family covers
    ROWS frames; this is the calendar-bucket + lag tier).

    Scale shape: the month aggregate is map-side combined (the shuffle
    carries ~one row per month per input partition) and the lag window
    runs over the AGGREGATED frame -- tens of rows, one task, which is
    exactly where a global-ordering window belongs.  Revenue sums are
    decimal-exact, cast to double at the boundary; the growth ratio is
    a single division of those doubles, rounded to 6.  Returns
    (month, revenue, prev_revenue, delta, growth)."""
    per_month = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.sum(F.col("o_totalprice").cast(_DEC)).alias("__rev"))
    w = Window.orderBy("month")
    rev = F.col("__rev").cast("double")
    prev = F.lag(rev).over(w)
    return per_month.select(
        "month",
        rev.alias("revenue"),
        prev.alias("prev_revenue"),
        F.round(rev - prev, 4).alias("delta"),
        F.round(rev / prev, 6).alias("growth"),
    )


def hll_distinct_users(events: DataFrame, max_rel_err: float = 0.1) -> DataFrame:
    """Engine-native HyperLogLog distinct-count sketch next to the
    exact answer -- the mergeable-sketch tier Spark ships built in
    (``approx_count_distinct`` = HLL++, constant memory per group,
    map-side combinable partials), complementing the portable KMV
    sketch in kmv_distinct_users.

    Sketch estimates are ALGORITHM-specific, so no two engines agree
    digit-for-digit; the cross-engine contract is the published error
    bound, not the estimate.  The output therefore carries the exact
    count (oracle-comparable) and ``within_bound`` = |approx - exact|
    / exact <= ``max_rel_err`` -- with default rsd 5%% and a 10%%
    bound the flag is deterministically true in any correct engine,
    and THAT is what the oracle asserts (DuckDB's own HLL must satisfy
    its own bound).  Returns (event_type, n_exact, within_bound)."""
    agg = events.filter(F.col("user_id").isNotNull()).groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id").alias("__n_approx"),
    )
    return agg.select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("__n_approx") - F.col("n_exact"))
            / F.col("n_exact")
            <= max_rel_err
        ).alias("within_bound"),
    )


def late_exclusive_suppliers(
    orders: DataFrame, lineitem: DataFrame, late_days: int = 80
) -> DataFrame:
    """TPC-H Q21-shaped 'suppliers who kept orders waiting': for each
    supplier, the count of multi-supplier orders where THEIR item
    shipped more than ``late_days`` after the order date and no other
    supplier's item did -- the classic correlated EXISTS + NOT EXISTS
    pair.

    Spark-first DECORRELATION: instead of two correlated subqueries
    per row (the oracle states that literal form), the per-order facts
    are computed ONCE -- distinct suppliers and distinct LATE suppliers
    per order, one map-side-combinable aggregate -- and joined back;
    the EXISTS pair collapses to `is_late AND n_suppliers > 1 AND
    n_late_suppliers = 1`.  Two shuffles total (the orders join and
    the per-order aggregate; the join-back rides the same order key
    partitioning), independent of supplier count.  Returns
    (l_suppkey, numwait)."""
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    flagged = li.select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        ).alias("__late"),
    )
    per_supp = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("__late").alias("__s_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("__n_supp"),
        F.sum(F.col("__s_late").cast("long")).alias("__n_late"),
    )
    qualifying = (
        per_supp.join(per_order, on="l_orderkey")
        .filter(F.col("__s_late") & (F.col("__n_supp") > 1) & (F.col("__n_late") == 1))
    )
    return qualifying.groupBy("l_suppkey").agg(F.count("*").alias("numwait"))


def data_quality_report(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Constraint-check report over the star schema -- the data-quality
    gate a pipeline runs before publishing a snapshot: one row per
    declared rule with its violation count (0 = pass).

    Rules: key non-null, key uniqueness, referential integrity
    (orders.o_custkey -> customer, lineitem.l_orderkey -> orders),
    domain ranges (non-negative totalprice, discount in [0,1]),
    cross-field sanity (shipdate not before orderdate by > 30 days
    pre-dating, as a changed-data tripwire).

    Scale shape: each rule is ONE aggregate or ONE anti-join count --
    all map-side combinable or AQE-planned; the rules union into a
    single lazy plan so one action materializes the whole report.
    Violation ROWS are a filter away (same predicates); the report
    carries counts because at 100 TB you gate on the count and sample
    the rows, not ship them."""
    checks = []

    def add(rule: str, df: DataFrame) -> None:
        checks.append(
            df.agg(F.count("*").cast("long").alias("violations")).select(
                F.lit(rule).alias("rule"), "violations"
            )
        )

    add("customer.c_custkey not null", customer.filter(F.col("c_custkey").isNull()))
    add(
        "customer.c_custkey unique",
        customer.groupBy("c_custkey").agg(F.count("*").alias("n")).filter(F.col("n") > 1),
    )
    add("orders.o_orderkey not null", orders.filter(F.col("o_orderkey").isNull()))
    add(
        "orders.o_orderkey unique",
        orders.groupBy("o_orderkey").agg(F.count("*").alias("n")).filter(F.col("n") > 1),
    )
    add(
        "orders.o_custkey -> customer",
        orders.join(
            customer.select("c_custkey"),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        ),
    )
    add(
        "lineitem.l_orderkey -> orders",
        lineitem.join(
            orders.select(F.col("o_orderkey").alias("__ok")),
            lineitem["l_orderkey"] == F.col("__ok"),
            "left_anti",
        ),
    )
    add("orders.o_totalprice >= 0", orders.filter(F.col("o_totalprice") < 0))
    add(
        "lineitem.l_discount in [0,1]",
        lineitem.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
    )
    add(
        "lineitem shipped >= orderdate - 30d",
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"]).filter(
            F.col("l_shipdate") < F.col("o_orderdate") - F.expr("INTERVAL 30 DAYS")
        ),
    )
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def discounted_revenue(
    lineitem: DataFrame,
    year: int = 1997,
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6-shaped forecast-revenue-change: one filtered scan, one
    global sum -- the canonical predicate-pushdown showcase.

    All four predicates (shipdate year range, discount band, quantity
    cap) are plain column comparisons, so every one reaches the parquet
    reader as a PushedFilter and row groups outside the year range are
    skipped entirely via min/max stats; the aggregate is a map-side
    partial with a 1-row shuffle.  At 100 TB this query's cost is the
    I/O of the surviving row groups, nothing else.  The revenue product
    is summed as DECIMAL so partial-aggregation order can't perturb the
    result.  Returns one row (revenue)."""
    f = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
        & (F.col("l_discount") >= disc_lo)
        & (F.col("l_discount") <= disc_hi)
        & (F.col("l_quantity") < max_qty)
    )
    rev = F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC)
    return f.agg(F.sum(rev).cast("double").alias("revenue"))


def promo_revenue_share(
    lineitem: DataFrame, part: DataFrame, month: str = "1997-09"
) -> DataFrame:
    """TPC-H Q14-shaped promotion-effect ratio: the share of one
    month's revenue that came from PROMO-type parts.

    One month of lineitem (shipdate range pushed to the scan) joins the
    part dimension on l_partkey; part is orders of magnitude smaller
    than lineitem, so AQE broadcasts it and no lineitem shuffle exists
    at all -- the conditional numerator rides the same pass as the
    denominator (CASE inside two sums, map-side combined to one row).
    Sums are decimal-exact; the ratio is one final double division,
    rounded to 6.  Returns one row (promo_revenue_pct)."""
    start = F.lit(f"{month}-01").cast("timestamp")
    f = lineitem.filter(
        (F.col("l_shipdate") >= start)
        & (F.col("l_shipdate") < F.add_months(start, 1).cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    j = f.join(part.select("p_partkey", "p_type"), F.col("l_partkey") == F.col("p_partkey"))
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC)
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev)).alias("__promo"),
        F.sum(rev).alias("__total"),
    )
    return agg.select(
        F.round(
            F.lit(100.0) * F.col("__promo").cast("double") / F.col("__total").cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


def late_line_priority_mix(
    orders: DataFrame, lineitem: DataFrame, late_days: int = 60
) -> DataFrame:
    """TPC-H Q12-shaped priority mix: for line items shipped late
    (> ``late_days`` after the order date), bucket the lateness and
    count high-priority (1-URGENT / 2-HIGH) vs lower-priority lines
    per bucket.  (The synthetic lineitem has no shipmode; the lateness
    bucket plays its grouping role -- the plan shape, join + CASE
    conditional aggregation, is Q12's.)

    The join is a plain equi hash join on the order key with the
    lateness inequality as a join residual; the conditional counts are
    map-side combinable over a 3-value key, so the post-join shuffle
    carries three rows per input partition.  Returns
    (late_bucket, high_line_count, low_line_count)."""
    o = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate")
    days_late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    # filter and bucket share ONE arithmetic (calendar-day datediff):
    # a timestamp-interval filter would admit 60-day-12-hour lines
    # whose datediff is 60, mislabeling them into the '61-90' bucket
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        days_late > late_days
    )
    # bucket edges/labels DERIVE from late_days (default 60 -> 61-90 /
    # 91-120 / 120+, the oracle's literals) so a retuned threshold
    # can't leave lines wearing another threshold's label
    e1, e2 = late_days + 30, late_days + 60
    bucket = (
        F.when(days_late <= e1, F.lit(f"{late_days + 1}-{e1}"))
        .when(days_late <= e2, F.lit(f"{e1 + 1}-{e2}"))
        .otherwise(F.lit(f"{e2}+"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.withColumn("late_bucket", bucket)
        .groupBy("late_bucket")
        .agg(
            F.count(F.when(is_high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~is_high, F.lit(1))).alias("low_line_count"),
        )
    )


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7-shaped volume shipping: revenue flowing between two
    nations (supplier nation -> customer nation, both directions),
    per ship year.

    The two nation filters are applied to the DIMENSION sides before
    any fact join, so supplier and customer shrink to ~1/25 of
    themselves and both dimension joins broadcast; lineitem is the only
    big input and it is never shuffled -- the disjunctive nation-pair
    predicate ((a,b) or (b,a)) lands after the broadcasts as a cheap
    residual filter.  The per-(pair, year) aggregate is map-side
    combinable over a handful of keys.  Returns
    (supp_nation, cust_nation, l_year, revenue)."""
    n = nation.filter(F.col("n_name").isin(nation_a, nation_b)).select(
        "n_nationkey", "n_name"
    )
    s = supplier.join(
        n.select(F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation")),
        F.col("s_nationkey") == F.col("__snk"),
    ).select("s_suppkey", "supp_nation")
    c = customer.join(
        n.select(F.col("n_nationkey").alias("__cnk"), F.col("n_name").alias("cust_nation")),
        F.col("c_nationkey") == F.col("__cnk"),
    ).select("c_custkey", "cust_nation")
    o = orders.select("o_orderkey", "o_custkey").join(
        c, F.col("o_custkey") == F.col("c_custkey")
    )
    j = (
        lineitem.select(
            "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
    )
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC)
    return (
        j.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


def nation_market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = "NATION_3",
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q8-shaped national market share: among revenue sold to
    customers of one region, the share supplied by one target nation,
    per order year.

    Same broadcast discipline as Q7: region->nation->customer shrinks
    the probe dimension before the fact joins, the supplier dimension
    carries only a boolean is-target flag, and the share is a
    conditional-sum-over-sum on a per-year key -- one pass over
    lineitem, zero fact shuffles before the final tiny aggregate.
    Returns (o_year, mkt_share)."""
    rn = (
        nation.join(
            region.filter(F.col("r_name") == region_name),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("__cnk"))
    )
    c = customer.join(rn, F.col("c_nationkey") == F.col("__cnk")).select("c_custkey")
    o = orders.select("o_orderkey", "o_custkey", "o_orderdate").join(
        c, F.col("o_custkey") == F.col("c_custkey")
    )
    tn = nation.filter(F.col("n_name") == target_nation).select(
        F.col("n_nationkey").alias("__tnk")
    )
    s = supplier.select("s_suppkey", "s_nationkey").join(
        tn, F.col("s_nationkey") == F.col("__tnk"), "left"
    ).select("s_suppkey", F.col("__tnk").isNotNull().alias("__is_target"))
    j = (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC)
    agg = (
        j.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("__is_target"), rev)).alias("__t"),
            F.sum(rev).alias("__all"),
        )
    )
    return agg.select(
        "o_year",
        F.round(F.col("__t").cast("double") / F.col("__all").cast("double"), 6).alias(
            "mkt_share"
        ),
    )


def returned_item_losses(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    year: int = 1998,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: the ``k`` customers who
    returned the most revenue (l_returnflag = 'R') in one order year.

    The returnflag + year filters are pushed to the two fact scans
    (flag to lineitem, year to orders) BEFORE their join, so the join
    sees the returned slice only; the per-customer aggregate runs on
    the joined facts and the two dimension hookups (customer, nation)
    attach AFTER aggregation -- thousands of rows, broadcast joins,
    never a fact-sized dimension shuffle.  Top-k is
    TakeOrderedAndProject (no global sort materialization).  Ties
    broken by c_custkey for determinism.  Returns
    (c_custkey, c_name, revenue, n_name, c_acctbal)."""
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC)
    per_cust = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )
    j = per_cust.join(customer, F.col("o_custkey") == F.col("c_custkey")).join(
        nation, F.col("c_nationkey") == F.col("n_nationkey")
    )
    return j.select("c_custkey", "c_name", "revenue", "n_name", "c_acctbal").orderBy(
        F.desc("revenue"), F.asc("c_custkey")
    ).limit(k)


def important_parts(lineitem: DataFrame, part: DataFrame, factor: float = 1.5) -> DataFrame:
    """TPC-H Q11-shaped important-inventory cut: parts whose lineitem
    revenue exceeds ``factor`` times the AVERAGE per-part revenue.

    The threshold is relative to the average part (not an absolute
    share of the total), so the selected fraction of parts is stable
    as the catalog grows -- an absolute-share cut goes empty at 100x
    the part count.  The average is a 1-row reduction OF the per-part
    aggregate (thousands of rows, not the fact), broadcast back as a
    scalar-subquery HAVING; part names attach after the cut.  Returns
    (p_partkey, p_name, part_value)."""
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC)
    li = lineitem.select("l_partkey", rev.alias("__rev"))
    per_part = li.groupBy("l_partkey").agg(
        F.sum("__rev").alias("__vd"),
    ).select("l_partkey", F.col("__vd"), F.col("__vd").cast("double").alias("__v"))
    # threshold = decimal sum / count, divided ONCE -- avg() over the
    # per-part doubles would fold in partial-aggregation order and a
    # part within an ulp of avg*factor could flip between engines,
    # breaking the module's float-determinism contract
    avg_v = per_part.agg(
        (F.sum("__vd").cast("double") / F.count("*")).alias("__avg")
    )
    cut = per_part.crossJoin(F.broadcast(avg_v)).filter(
        F.col("__v") > F.col("__avg") * factor
    )
    return cut.join(part, F.col("l_partkey") == F.col("p_partkey")).select(
        "p_partkey", "p_name", F.col("__v").alias("part_value")
    )  # __v double for output; the cut compared against the exact-sum avg


def top_revenue_supplier(
    lineitem: DataFrame, supplier: DataFrame, quarter_start: str = "1997-01-01"
) -> DataFrame:
    """TPC-H Q15-shaped top supplier: supplier(s) achieving the MAX
    revenue over one quarter (ties all emitted, like the reference
    view formulation).

    Per-supplier revenue is one filtered-scan aggregate; the max is a
    1-row reduction of THAT aggregate (thousands of rows, not the
    fact), broadcast back as an equality filter -- the classic
    argmax-without-window shape, no global sort, no window over the
    fact.  Returns (s_suppkey, s_name, total_revenue)."""
    start = F.lit(quarter_start).cast("timestamp")
    li = lineitem.filter(
        (F.col("l_shipdate") >= start)
        & (F.col("l_shipdate") < F.add_months(start, 3).cast("timestamp"))
    )
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC)
    per_supp = li.groupBy("l_suppkey").agg(F.sum(rev).alias("__r"))
    mx = per_supp.agg(F.max("__r").alias("__mx"))
    top = per_supp.crossJoin(F.broadcast(mx)).filter(F.col("__r") == F.col("__mx"))
    return top.join(supplier, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "s_suppkey", "s_name", F.col("__r").cast("double").alias("total_revenue")
    )


def min_cost_supplier_per_part(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE",
    k: int = 100,
) -> DataFrame:
    """TPC-H Q2-shaped min-cost supplier: within one region, each
    part's cheapest supplier by observed unit price (the synthetic
    corpus has no partsupp; sum(extendedprice)/sum(quantity) over a
    supplier's shipments of a part plays ps_supplycost).

    The min-per-part is groupBy + equi-join-back, NOT a window over
    the fact: the per-(part, supplier) aggregate is map-side combined,
    the per-part min reduces THAT (already small) frame, and the
    join-back is aggregate-to-aggregate -- at 100 TB no window ever
    sees a fact-sized partition and AQE broadcasts the min side.
    Unit cost is decimal-summed, then the quotient stays integral --
    the equality join-back key is exact, not float-fuzzy: the cost is
    kept in integer 1e-4 units (cents scaled by 10^4, floor-divided),
    never a rounded double.  Top-k by (cost asc, partkey, suppkey)
    for a deterministic cut.  Returns
    (p_partkey, s_suppkey, s_name, n_name, unit_cost_e4)."""
    rs = (
        nation.join(
            region.filter(F.col("r_name") == region_name),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    s = supplier.join(rs, F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", "s_name", "n_name"
    )
    ps = (
        lineitem.select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(s.select("s_suppkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast(_DEC)).alias("__e"),
            F.sum(F.col("l_quantity").cast(_DEC)).alias("__q"),
        )
        .select(
            "l_partkey",
            "l_suppkey",
            # integer arithmetic end to end: cents * 10^4 DIV cents ->
            # unit cost in 1e-4 units, bit-identical across engines
            # (a rounded double quotient diverges on half-ulp edges)
            F.expr(
                "(CAST(__e * 100 AS BIGINT) * 10000) DIV CAST(__q * 100 AS BIGINT)"
            ).alias("unit_cost_e4"),
        )
    )
    mn = ps.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.min("unit_cost_e4").alias("__mn")
    )
    best = ps.join(
        mn,
        (F.col("l_partkey") == F.col("__pk"))
        & (F.col("unit_cost_e4") == F.col("__mn")),
    )
    return (
        best.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            "n_name",
            "unit_cost_e4",
        )
        .orderBy(F.asc("unit_cost_e4"), F.asc("p_partkey"), F.asc("s_suppkey"))
        .limit(k)
    )


def excess_quantity_suppliers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    name_prefix: str = "small",
    share: float = 0.002,
) -> DataFrame:
    """TPC-H Q20-shaped excess-quantity cut: suppliers who shipped more
    than ``share`` of the TOTAL quantity of parts whose name starts
    with ``name_prefix`` -- the semi-join-chain shape (part filter ->
    lineitem semi -> supplier cut).

    The part-name filter runs on the dimension and semi-joins into
    lineitem (broadcast, prefix pushed as StartsWith to the part scan);
    the per-supplier and global aggregates both reduce the surviving
    slice, and the threshold attaches as a broadcast 1-row scalar.
    Supplier names hook on after the cut.  Returns
    (s_suppkey, s_name, ship_qty)."""
    pk = part.filter(F.col("p_name").startswith(name_prefix)).select("p_partkey")
    li = lineitem.select("l_partkey", "l_suppkey", "l_quantity").join(
        pk, F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    from ..functions.caching import scoped_cache

    # the per-supplier aggregate is read TWICE (threshold total +
    # cut), so it is scoped-cached: without the cache each reader
    # re-executes the fact scan + semi-join as its own subtree.  The
    # frame is aggregate-sized (one row per supplier); decimal sums
    # are exact, so the sum-of-sums total equals a direct fact total
    # bit-for-bit
    per_supp = scoped_cache(
        li.groupBy("l_suppkey").agg(
            F.sum(F.col("l_quantity").cast(_DEC)).alias("__q")
        )
    )
    total = per_supp.agg(F.sum("__q").alias("__t"))
    cut = per_supp.crossJoin(F.broadcast(total)).filter(
        F.col("__q").cast("double") > F.col("__t").cast("double") * share
    )
    return cut.join(supplier, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "s_suppkey", "s_name", F.col("__q").cast("double").alias("ship_qty")
    )


def idle_rich_customers(
    customer: DataFrame, orders: DataFrame, since: str = "1999-01-01"
) -> DataFrame:
    """TPC-H Q22-shaped global-sales-opportunity report: customers with
    above-average positive account balance and NO orders since
    ``since``, counted per nation.  (The synthetic customer has no
    phone; the nation key plays the country-code grouping role, and
    the recency cut plays the no-orders test -- on a long-lived corpus
    literally-never-ordered goes empty, dormancy doesn't.)

    The average is a 1-row broadcast scalar over the positive-balance
    slice; the dormancy test is a LEFT ANTI hash join on o_custkey
    with the orders side pre-filtered (date pushed to the scan) and
    pre-projected to its key column only -- at 100 TB the anti join
    shuffles a single long per recent order, nothing else, and the
    final per-nation aggregate is map-side combinable over 25 keys.
    Returns (c_nationkey, numcust, totacctbal)."""
    # decimal sum / count, one division: avg() over raw doubles folds
    # in partial order (see important_parts note)
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("__avg")
    )
    rich = customer.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("__avg")
    )
    idle = rich.join(
        orders.filter(
            F.col("o_orderdate") >= F.lit(since).cast("timestamp")
        ).select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(14,4)")).cast("double"), 4).alias(
            "totacctbal"
        ),
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-shaped shipping priority: unshipped-revenue top-k for
    one market segment (orders placed before ``cutoff``, line items
    shipped after it; o_orderpriority plays o_shippriority on this
    schema).

    The segment filter runs on the customer DIM and semi-joins into
    orders (broadcast -- only matching custkeys ship); the date
    predicates push to both fact scans; lineitem revenue aggregates
    per order BEFORE the orders join so the big shuffle carries one
    row per order.  Top-k is TakeOrderedAndProject, never a global
    sort.  Returns (l_orderkey, revenue, o_orderdate, o_orderpriority)
    with the date formatted as yyyy-MM-dd so the cross-engine hash
    compares strings, not timestamp encodings."""
    cut = F.lit(cutoff).cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = (
        orders.filter(F.col("o_orderdate") < cut)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    rev = (
        lineitem.filter(F.col("l_shipdate") > cut)
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * (F.lit(1) - F.col("l_discount")).cast(_DEC)
            ).alias("__rev")
        )
    )
    return (
        rev.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            F.col("__rev").cast("double").alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(k)
    )


def supplier_part_counts(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    excl_brand: str = "Brand#1",
    excl_type: str = "PROMO",
    sizes: tuple[int, ...] = (1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49),
) -> DataFrame:
    """TPC-H Q16-shaped supplier/part relationship count: how many
    DISTINCT suppliers can furnish each (brand, type, size) bucket,
    excluding one brand, one type family, and complained-about
    suppliers (no partsupp in this corpus: the observed distinct
    (l_partkey, l_suppkey) shipping pairs play the relationship, and
    a negative account balance plays the complaint flag).

    The NOT-IN supplier exclusion decorrelates to a LEFT ANTI hash
    join against a ~100-row broadcast side; the part filters are
    dimension-side (brand/type inequality + an IN-list on size, all
    pushed to the part scan).  The fact pass reduces to distinct
    pairs FIRST -- the count-distinct then runs over the already-
    deduplicated relationship frame, so the wide shuffle carries
    (partkey, suppkey) pairs once each, not one row per line item.
    Returns (p_brand, p_type, p_size, supplier_cnt)."""
    rel = lineitem.select("l_partkey", "l_suppkey").distinct()
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    rel = rel.join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    pt = part.filter(
        (F.col("p_brand") != excl_brand)
        & (F.col("p_type") != excl_type)
        & F.col("p_size").isin(*sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        rel.join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#23", frac: float = 0.2
) -> DataFrame:
    """TPC-H Q17-shaped small-quantity-order revenue: the yearly gross
    loss if orders below ``frac`` of a part's average quantity were no
    longer filled, over one brand (no p_container on this schema; the
    brand filter alone scopes the part set).

    The correlated per-part average DECORRELATES to one groupBy over
    the brand's line items + a join-back -- no window touches the
    fact, and both the threshold side and the join are scoped to the
    brand's partkeys (semi-join pushdown, broadcast at any scale
    where one brand's catalog fits an executor).  The quantity
    threshold stays in DOUBLE: quantities are integral doubles, their
    sum is exact (< 2^53), so avg and frac*avg are bit-identical
    across engines and the strict < cut is deterministic.  Returns
    one row (avg_yearly)."""
    pk = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.select("l_partkey", "l_quantity", "l_extendedprice").join(
        F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    thresh = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.avg("l_quantity") * frac).alias("__cut")
    )
    small = li.join(
        thresh,
        (F.col("l_partkey") == F.col("__pk")) & (F.col("l_quantity") < F.col("__cut")),
    )
    return small.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / F.lit(7.0), 4
        ).alias("avg_yearly")
    )


def brand_bracket_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brackets: tuple[tuple[str, int, float], ...] = (
        ("Brand#12", 5, 11.0),
        ("Brand#23", 10, 20.0),
        ("Brand#24", 15, 30.0),
    ),
) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate revenue: an OR of three
    (brand, max size, quantity window) conjunctions, each bracket
    pairing a part-side predicate with a lineitem-side one (no
    p_container / l_shipmode here; size and a 10-wide quantity band
    play those roles, quantity band = (max_qty-10, max_qty]).

    The join stays a single partkey EQUI-join -- the disjunction rides
    as a residual filter, so Catalyst still plans a hash join, never a
    cartesian.  Each side ALSO gets the union of its own bracket
    predicates pushed to its scan (brand IN-list + size cap on part,
    the overall quantity envelope on lineitem): the residual only
    re-checks bracket pairing on rows that already passed the scan
    cut.  Returns one row (revenue)."""
    qty_lo = min(b[2] for b in brackets) - 10.0
    qty_hi = max(b[2] for b in brackets)
    pt = part.filter(
        F.col("p_brand").isin(*[b[0] for b in brackets])
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= max(b[1] for b in brackets))
    ).select("p_partkey", "p_brand", "p_size")
    li = lineitem.filter(
        (F.col("l_quantity") > qty_lo) & (F.col("l_quantity") <= qty_hi)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    residual = None
    for brand, max_size, max_q in brackets:
        clause = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") <= max_size)
            & (F.col("l_quantity") > max_q - 10.0)
            & (F.col("l_quantity") <= max_q)
        )
        residual = clause if residual is None else (residual | clause)
    joined = li.join(pt, (F.col("l_partkey") == F.col("p_partkey")) & residual)
    return joined.agg(
        F.sum(
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1) - F.col("l_discount")).cast(_DEC)
        )
        .cast("double")
        .alias("revenue")
    )


def misra_gries_heavy_hitters(
    df: DataFrame, key_col: str, share: float = 0.05
) -> DataFrame:
    """Frequent-items sketch (Misra-Gries 1982): every key holding more
    than ``share`` of the rows, found WITHOUT shuffling per-key counts
    -- the third sketch tier next to KMV (bottom-k distinct) and HLL.

    Two phases, the way a real heavy-hitter pipeline runs:

      phase 1  true Misra-Gries per input partition via a mapInPandas
               GENERATOR: one pass over the partition's Arrow batches
               with a counter dict capped at ceil(1/share) entries
               (arrival increments a tracked key, a full table decrements
               all); emits only the surviving candidate KEYS.  The MG
               guarantee transfers by pigeonhole: a key with global
               frequency > share*N exceeds share*N_p in at least one
               partition, and MG with 1/share counters never evicts such
               a key for good within that partition.  Network cost of
               phase 1 is <= 1/share rows PER PARTITION -- Arrow moves
               the key column JVM->Python locally, but nothing wider
               than the candidate list ever crosses the wire.  (A pure
               groupBy formulation would shuffle one row per
               partition-distinct key -- exactly the cost a sketch
               exists to avoid; this is the case where the built-in
               operators genuinely can't express bounded-memory
               semantics, so Python earns its place.)
      phase 2  exact confirmation: the deduped candidate set (<=
               n_partitions/share keys) broadcast-semi-joins back into
               the fact, exact counts of ONLY those keys, strict filter
               against the 1-row broadcast total.

    Output equals the exact ``HAVING count > share*N`` answer -- the
    sketch changes the cost, not the result -- so the operator is fully
    oracle-comparable.  NULL keys are out of scope BY CONTRACT: a null
    is the absence of a key, not a key, so the sketch skips null rows,
    N counts only non-null rows, and phase 2's equi-semi-join could
    never match a null candidate anyway (SQL null != null) -- the
    exclusion is consistent end-to-end, and the oracle twin restricts
    to non-null keys to match.  Returns (key, cnt, share) ordered
    nowhere; callers sort."""
    import math
    from pyspark.sql import types as T

    k = max(1, math.ceil(1.0 / share))

    def _mg(batches):
        # mergeable-summary form (Agarwal/Cormode et al. 2012): fold
        # each Arrow batch's exact value_counts into the sketch, then
        # trim back to k counters by subtracting the (k+1)-th largest
        # count from all and dropping the non-positive -- vectorized,
        # same N_p/(k+1) undercount bound as row-at-a-time MG, so no
        # heavy key is ever a false negative (strict > in phase 2).
        # The same pass also counts the partition's rows (emitted as a
        # null-key row), so the global N needs NO separate scan: the
        # operator reads the input exactly twice -- sketch + confirm.
        import pandas as pd

        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            n_rows += int(pdf["key"].notna().sum())
            for key, n in pdf["key"].dropna().value_counts().items():
                counters[key] = counters.get(key, 0) + int(n)
            if len(counters) > k:
                sub = sorted(counters.values(), reverse=True)[k]
                counters = {c: n - sub for c, n in counters.items() if n > sub}
        yield pd.DataFrame(
            {
                "key": list(counters.keys()) + [None],
                "part_rows": [0] * len(counters) + [n_rows],
            }
        )

    from ..functions.caching import scoped_cache

    keyed = df.select(F.col(key_col).cast("string").alias("key"))
    # candidates AND the total ride one sketch pass; the tiny sketch
    # frame (<= (k+1) rows per partition) is scoped-cached because two
    # plan subtrees read it -- without the cache the Python stage (and
    # the input scan under it) would run twice
    sketch = scoped_cache(
        keyed.mapInPandas(
            _mg,
            T.StructType(
                [
                    T.StructField("key", T.StringType()),
                    T.StructField("part_rows", T.LongType()),
                ]
            ),
        )
    )
    cand = sketch.filter(F.col("key").isNotNull()).select("key").distinct()
    total = sketch.agg(F.sum("part_rows").alias("__n"))
    exact = (
        keyed.join(F.broadcast(cand), "key", "left_semi")
        .groupBy("key")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt").cast("double") > F.col("__n").cast("double") * share)
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("__n"), 6).alias("share"),
        )
    )


def time_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style hierarchical time rollup: event counts and
    decimal-exact value sums at minute, hour, and day granularity (plus
    the grand total) in ONE pass -- ``rollup(day, hour, minute)`` plans
    a single Expand + partially-aggregated hash agg, so the fact is
    scanned once and each row contributes its four grouping combinations
    map-side; no per-granularity re-scan, no self-union.

    The level label derives from WHICH bucket columns are non-null
    (ts is never null here, so a null bucket can only mean 'rolled
    up') -- portable across engines, no grouping_id() dialect.  Buckets
    are emitted as formatted strings so the cross-engine hash compares
    text, not timestamp encodings.  Returns (level, day, hour, minute,
    n_events, sum_value)."""
    e = events.select(
        F.date_trunc("day", F.col("ts")).alias("__d"),
        F.date_trunc("hour", F.col("ts")).alias("__h"),
        F.date_trunc("minute", F.col("ts")).alias("__m"),
        "value",
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return (
        e.rollup("__d", "__h", "__m")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
            ).alias("sum_value"),
        )
        .select(
            F.when(F.col("__m").isNotNull(), "minute")
            .when(F.col("__h").isNotNull(), "hour")
            .when(F.col("__d").isNotNull(), "day")
            .otherwise("total")
            .alias("level"),
            F.date_format("__d", fmt).alias("day"),
            F.date_format("__h", fmt).alias("hour"),
            F.date_format("__m", fmt).alias("minute"),
            "n_events",
            "sum_value",
        )
    )


def gap_fill_locf(events: DataFrame, step: str = "day") -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward:
    every user gets a dense ``step``-bucket grid between their first
    and last event, empty buckets inherit the latest earlier value --
    the TimescaleDB time_bucket_gapfill + locf() pattern.

    Shape: per-(user, bucket) observed values reduce map-side FIRST
    (arg-max by event_id -- unique ids make the in-bucket pick exact,
    never a float tie); the grid explodes a per-user sequence() whose
    length is bounded by the user's own active span; the LOCF window
    partitions BY USER (bounded partitions, never a global window).
    At 100 TB the grid is the only row-multiplying step and it scales
    with users x span/step, independent of event volume.  Returns
    (user_id, bucket, observed, n_events, value_filled)."""
    b = F.date_trunc(step, F.col("ts"))
    per_bucket = (
        events.select("user_id", b.alias("__b"), "event_id", "value")
        .groupBy("user_id", "__b")
        .agg(
            F.count("*").alias("n_events"),
            F.max_by("value", "event_id").alias("__v"),
        )
    )
    grid = (
        events.select("user_id", b.alias("__b"))
        .groupBy("user_id")
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
        .select(
            "user_id",
            F.explode(
                F.expr(f"sequence(__lo, __hi, interval 1 {step})")
            ).alias("__b"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(per_bucket, on=["user_id", "__b"], how="left")
    return joined.select(
        "user_id",
        F.date_format("__b", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        F.col("__v").isNotNull().alias("observed"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.last("__v", ignorenulls=True).over(w).alias("value_filled"),
    )


def value_anomalies(events: DataFrame, z_cut: float = 3.0) -> DataFrame:
    """Per-type z-score anomaly flags over the value column -- the
    basic statistical outlier gate a metrics pipeline runs before
    training on telemetry.

    Moments are EXACT-SUM: sum and sum-of-squares accumulate as
    decimals (order-independent), mean and variance come from single
    double divisions of those exact sums, and IEEE sqrt is correctly
    rounded -- so the z-scores, and therefore the flags, are
    bit-reproducible in any engine (a running Welford fold would not
    be).  One map-side-combined aggregate over a handful of type keys,
    broadcast back onto the stream of rows: zero extra shuffle beyond
    the tiny aggregate.  Returns (event_id, event_type, value, zscore,
    is_anomaly)."""
    v = F.col("value").cast("decimal(18,6)")
    stats = events.groupBy("event_type").agg(
        F.count("*").alias("__n"),
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__ss"),
    )
    mean = F.col("__s").cast("double") / F.col("__n")
    var = F.col("__ss").cast("double") / F.col("__n") - mean * mean
    enriched = events.select("event_id", "event_type", "value").join(
        F.broadcast(
            stats.select(
                "event_type", mean.alias("__mean"), F.sqrt(var).alias("__std")
            )
        ),
        "event_type",
    )
    # zero-variance guard: a constant-valued (or single-row) type has
    # std == 0; Spark's divide-by-zero yields NULL while an IEEE-float
    # engine yields inf/NaN -- neither is a useful flag, so both engines
    # pin the z-score of such groups to exactly 0.0 (CASE-mirrored in
    # the oracle SQL)
    z = F.round(
        F.when(
            F.col("__std") > 0,
            (F.col("value") - F.col("__mean")) / F.col("__std"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    return enriched.select(
        "event_id",
        "event_type",
        "value",
        z.alias("zscore"),
        (F.abs(z) > z_cut).alias("is_anomaly"),
    )


def burst_minutes(events: DataFrame, z_cut: float = 3.0) -> DataFrame:
    """Rate-spike detection: minute buckets whose event count sits
    more than ``z_cut`` sigmas above the mean minute rate -- the
    traffic-burst gate an ingestion pipeline runs before trusting a
    window of telemetry.

    Two tiny aggregates: minute counts (map-side combined), then
    exact-sum moments OVER THE COUNTS (integer sum and sum-of-squares
    -- order-independent; single double divisions + IEEE sqrt, same
    bit-reproducibility contract as value_anomalies) broadcast back
    onto the minute frame.  Returns (minute, n_events, zscore,
    is_burst) with the minute formatted for cross-engine hashing."""
    per_min = events.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("__m")
    ).agg(F.count("*").alias("n_events"))
    stats = per_min.agg(
        F.count("*").alias("__k"),
        F.sum("n_events").alias("__s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("__ss"),
    )
    mean = F.col("__s").cast("double") / F.col("__k")
    var = F.col("__ss").cast("double") / F.col("__k") - mean * mean
    # same zero-variance guard as value_anomalies: a uniform minute
    # rate (std == 0) pins every z-score to 0.0 in both engines instead
    # of NULL-vs-inf divergence
    z = F.round(
        F.when(
            F.col("__std") > 0,
            (F.col("n_events") - F.col("__mean")) / F.col("__std"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    return (
        per_min.crossJoin(
            F.broadcast(
                stats.select(mean.alias("__mean"), F.sqrt(var).alias("__std"))
            )
        )
        .select(
            F.date_format("__m", "yyyy-MM-dd HH:mm:ss").alias("minute"),
            "n_events",
            z.alias("zscore"),
            (z > z_cut).alias("is_burst"),
        )
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly retention-cohort matrix: users grouped by the week of
    their first event (the cohort), tracked across subsequent weeks --
    the canonical product-analytics rollup (cohort x week-offset ->
    active users, retention rate vs the cohort's own size).

    ONE per-user shuffle does all the heavy lifting: a single
    ``groupBy(user_id)`` emits the cohort week (min) and the distinct
    active weeks (collect_set -- bounded by the calendar, ~52 entries
    per user-year, never by event volume since weeks are deduped
    map-side inside the set agg).  Exploding that set and re-grouping
    by (cohort, offset) is a second shuffle over ~cohorts*offsets
    keys -- tiny.  Cohort sizes are the offset-0 slice of the same
    frame (every user is active in their own first week by
    construction), broadcast back for the rate -- no third pass over
    the events.  At 100 TB the user_id groupBy is the same uniform
    near-unique-key shuffle sessionize already rides; no window, no
    self-join.  Returns (cohort_week, week_offset, n_users,
    retention) with the week formatted for cross-engine hashing."""
    wk = F.date_trunc("week", F.col("ts"))
    per_user = (
        events.filter(F.col("user_id").isNotNull())
        .select("user_id", wk.alias("__wk"))
        .groupBy("user_id")
        .agg(
            F.min("__wk").alias("__cohort"),
            F.collect_set("__wk").alias("__weeks"),
        )
    )
    activity = per_user.select(
        "__cohort",
        F.explode("__weeks").alias("__wk"),
    ).select(
        "__cohort",
        (F.datediff(F.col("__wk"), F.col("__cohort")) / 7).cast("int").alias(
            "week_offset"
        ),
    )
    matrix = activity.groupBy("__cohort", "week_offset").agg(
        F.count("*").alias("n_users")
    )
    sizes = matrix.filter(F.col("week_offset") == 0).select(
        F.col("__cohort").alias("__c0"), F.col("n_users").alias("__cohort_size")
    )
    return (
        matrix.join(F.broadcast(sizes), matrix["__cohort"] == sizes["__c0"])
        .select(
            F.date_format("__cohort", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("__cohort_size"), 6
            ).alias("retention"),
        )
    )


def event_type_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: P(next event_type | current event_type), the session-flow
    profile a behavioural pipeline derives before funnel design.

    ONE shuffle: the per-user ``lead`` window (partition user_id,
    order ts then event_id for a total deterministic order) pairs each
    event with its successor in-partition; the (from, to) count and
    the from-marginal are both map-side-combined aggregates over a
    handful of type-pair keys, and the probability joins the tiny
    marginal back broadcast.  Same skew bound as sessionize: a user's
    history is the session-bounded unit.  End-of-stream events (no
    successor) are dropped -- the matrix is over observed transitions.
    Returns (from_type, to_type, n_transitions, p_transition)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.filter(F.col("user_id").isNotNull())
        .select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    marginals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").alias("__from_total")
    )
    return counts.join(F.broadcast(marginals), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double") / F.col("__from_total"), 6
        ).alias("p_transition"),
    )


def hdr_quantiles(
    events: DataFrame, qs: tuple = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Histogram-sketch quantiles (HdrHistogram-style) next to the
    exact percentiles -- the QUANTILE member of the sketch family
    (HLL/KMV distinct, CMS/Misra-Gries frequency): values land in
    log-spaced buckets of 16 subbuckets per octave, per-partition
    bucket counts merge by plain addition (Spark's partial aggregation
    IS the sketch merge), and any quantile reads off the cumulative
    histogram with relative error bounded by the bucket width (6.25%
    worst-case, half that at the midpoint estimate).  This is how
    latency percentiles actually get computed at 100 TB: an exact
    percentile needs a global sort (or one pass per group through
    approx_percentile's GK summaries); the histogram needs one
    map-side-combined groupBy over a few hundred (type, bucket) keys,
    is streamable, and two days' sketches merge cell-wise.

    Determinism is the point: bucketing is PURE INTEGER bit
    arithmetic -- centi-units, bit-length octaves, shifts -- with no
    libm in sight, so the sketch, the picked buckets, and the midpoint
    estimates are bit-identical in any engine.  The sketch itself is
    the oracle-checked contract (the CMS/HLL discipline); the exact
    R-7 percentile rides along to exhibit the error, which the bucket
    geometry bounds.  Domain note: the geometry is designed for >= 0
    values (the HdrHistogram assumption -- latencies, sizes, prices).
    Negative centi-units are still handled deterministically: the
    ``__u < 16`` branch catches them FIRST (in both the Spark impl and
    the DuckDB oracle), so they land in exact unit buckets that sort
    below every positive bucket and quantiles invert correctly -- they
    just get exact (width-1) buckets instead of log-spaced ones, so a
    wide negative domain inflates the histogram's key count rather
    than its error.  Returns (event_type, q, est_value, exact_value,
    rel_err)."""
    qlits = [float(q) for q in qs]
    from ..functions.caching import scoped_cache

    # two plan subtrees read the histogram (cumulative walk + totals);
    # scope-cache it so the event scan + bucket aggregate run once
    hist = scoped_cache(
        hdr_bucket_frame(events)
        .groupBy("event_type", "__idx")
        .agg(F.count("*").alias("__n"))
    )
    picked = hdr_quantile_estimates(hist, qs)
    qarr = F.array(*[F.lit(q) for q in qlits])
    exact = (
        events.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.percentile(F.col("value"), qarr).alias("__ps"))
        .select(
            "event_type",
            F.posexplode("__ps").alias("__i", "__exact"),
        )
        .withColumn("q", F.element_at(qarr, F.col("__i") + 1))
        .drop("__i")
    )
    joined = picked.join(exact, ["event_type", "q"])
    # ulp absorption (doc_weighted_sample discipline): Spark's
    # `percentile` and DuckDB's `quantile_cont` are both R-7 but may
    # evaluate the lerp in a different order, so pre-round the exact
    # value at 1e-9 before the published 6-dp round -- otherwise a
    # 1-ulp difference can flip the 6th decimal of exact_value/rel_err
    exact9 = F.round(F.col("__exact"), 9)
    rel = F.when(
        exact9 > 0,
        F.abs(F.col("__est_raw") - exact9) / exact9,
    ).otherwise(F.lit(0.0))
    return joined.select(
        "event_type",
        "q",
        F.round(F.col("__est_raw"), 6).alias("est_value"),
        F.round(exact9, 6).alias("exact_value"),
        F.round(rel, 6).alias("rel_err"),
    )


def hdr_bucket_frame(events: DataFrame) -> DataFrame:
    """(event_type, __idx): each non-null value mapped to its
    HdrHistogram bucket index -- values < 16 centi-units are exact
    (bucket = value); above, the top 5 bits place the value in
    (octave, subbucket); bin()'s digit count is floor(log2)+1, kept
    integer.  The groupBy(event_type, __idx).count() over this frame
    IS the sketch -- in batch (hdr_quantiles) and as a streaming
    aggregation (registry events_hdr_stream) alike."""
    u = F.floor(F.col("value") * 100).cast("long")
    base = events.filter(F.col("value").isNotNull()).select(
        "event_type", u.alias("__u")
    )
    b = F.length(F.bin(F.col("__u"))).cast("long")
    top5 = F.expr("shiftright(__u, cast(length(bin(__u)) - 5 as int))")
    idx = F.when(F.col("__u") < 16, F.col("__u")).otherwise(
        (b - 5) * 16 + top5
    )
    return base.select("event_type", idx.alias("__idx"))


def hdr_quantile_estimates(
    hist: DataFrame, qs: tuple, hist_for_ranks: DataFrame | None = None
) -> DataFrame:
    """Quantile inversion over a materialized (event_type, __idx, __n)
    bucket histogram: cumulative walk, rank pick, bucket-midpoint
    estimate -- every window/aggregate runs over the AGGREGATED
    histogram only (a few hundred rows per type), never the event
    stream, which is what lets the histogram come from ANYWHERE (a
    batch aggregate, a drained streaming state table, yesterday's
    persisted sketch).  Returns (event_type, q, __est_raw)."""
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    # the histogram feeds two join sides; a MATERIALIZED hist (memory
    # table) trips conflicting-reference resolution if the same
    # DataFrame instance feeds both, so callers with a table-backed
    # hist pass an independent read as ``hist_for_ranks`` (fresh
    # attribute ids); the batch path's scope-cached frame self-joins
    # fine and defaults to ``hist``
    cum = hist.withColumn(
        "__cum",
        F.sum("__n").over(Window.partitionBy("event_type").orderBy("__idx")),
    )
    ranks = (
        (hist_for_ranks if hist_for_ranks is not None else hist)
        .groupBy("event_type")
        .agg(F.sum("__n").alias("__total"))
        .select("event_type", "__total", F.explode(qarr).alias("q"))
        .withColumn("__rank", F.ceil(F.col("q") * F.col("__total")).cast("long"))
    )
    picked = (
        cum.join(F.broadcast(ranks), "event_type")
        .filter(F.col("__cum") >= F.col("__rank"))
        .groupBy("event_type", "q")
        .agg(F.min("__idx").alias("__pick"))
    )
    # invert the index to the bucket's [low, low+width) centi-range
    low = F.when(F.col("__pick") < 16, F.col("__pick")).otherwise(
        F.expr(
            "shiftleft(16 + (__pick - 16) % 16, cast((__pick - 16) / 16 as int))"
        )
    )
    width = F.when(F.col("__pick") < 16, F.lit(1).cast("long")).otherwise(
        F.expr("shiftleft(1L, cast((__pick - 16) / 16 as int))")
    )
    est_raw = (low.cast("double") + width.cast("double") / 2.0) / 100.0
    return picked.select("event_type", "q", est_raw.alias("__est_raw"))


def cms_type_counts(events: DataFrame, d: int = 4, w: int = 64) -> DataFrame:
    """Count-Min Sketch frequency estimates next to exact truth -- the
    bounded-memory COUNTER sketch (Cormode-Muthukrishnan) completing
    the sketch family (HLL/KMV distinct, Misra-Gries heavy hitters):
    d x w integer counters estimate any key's count with one-sided
    error (est >= true, over-count <= N*e/w w.h.p.), and two sketches
    merge by cell-wise addition -- which is EXACTLY what Spark's
    partial aggregation does here, so the build is one map-side-
    combined groupBy over (depth, bucket) keys: d*w counters cross the
    wire per partition, never the stream.

    Estimates query the d counters for each distinct key (broadcast
    sketch, min over depths).  Every hash is the shared portable
    md5-48bit (depth salted into the input), so counters, estimates,
    and the overestimate gap are bit-identical in any engine -- unlike
    engine-internal CMS implementations, the sketch itself is the
    oracle-checked contract.  Returns (key, true_n, est_n, overcount)
    with overcount >= 0 by construction."""
    from .textstats import word_hash

    key = F.col("event_type")
    depths = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("depth")
    hashed = events.filter(key.isNotNull()).select(
        key.alias("key"), depths
    ).select(
        "key",
        "depth",
        (
            word_hash(F.concat(F.col("depth").cast("string"), F.lit(":"), F.col("key")))
            % w
        ).alias("bucket"),
    )
    sketch = hashed.groupBy("depth", "bucket").agg(F.count("*").alias("__c"))
    truth = events.filter(key.isNotNull()).groupBy(key.alias("key")).agg(
        F.count("*").alias("true_n")
    )
    probes = truth.select(
        "key", "true_n", F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("depth")
    ).select(
        "key",
        "true_n",
        "depth",
        (
            word_hash(F.concat(F.col("depth").cast("string"), F.lit(":"), F.col("key")))
            % w
        ).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy("key", "true_n")
        .agg(F.min("__c").alias("est_n"))
    )
    return est.select(
        "key", "true_n", "est_n", (F.col("est_n") - F.col("true_n")).alias("overcount")
    )


def measure_profile(lineitem: DataFrame) -> DataFrame:
    """Long-form measure profile: UNPIVOT the wide numeric measures to
    (measure, value) rows -- the melt every feature-statistics pass
    over a training table starts with -- then one GROUPING SETS
    aggregate producing both the per-returnflag and the measure-total
    stats in a single pass.  The two relational verbs the repo had not
    yet exercised as first-class operators: df.unpivot (an Expand, one
    scan, zero shuffle, never a per-measure UNION of scans) and
    df.groupingSets (a second Expand + ONE shuffled hash aggregate for
    all grouping sets -- never one aggregate per set).

    Scale: Expand multiplies rows 4x BEFORE the partial aggregate, but
    partial aggregation collapses them map-side to ~(flags x measures
    x sets) keys, so the shuffle carries dozens of rows regardless of
    fact size.  Sums are decimal-exact then cast to double (the q1
    discipline), so any engine and any partitioning produce identical
    bits; avg is one double division of those exacts.  is_total =
    grouping(l_returnflag) disambiguates the rolled-up rows from a
    hypothetical NULL flag value."""
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    melted = lineitem.select("l_returnflag", *measures).unpivot(
        ["l_returnflag"], measures, "measure", "value"
    )
    return (
        melted.groupingSets(
            [["l_returnflag", "measure"], ["measure"]], "l_returnflag", "measure"
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("is_total"),
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
            F.round(
                F.sum(F.col("value").cast(_DEC)).cast("double") / F.count("*"), 6
            ).alias("avg_value"),
        )
        .select(
            "l_returnflag", "measure", "is_total", "n", "sum_value", "avg_value"
        )
    )


def purchase_attribution(events: DataFrame, gap_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Session-scoped conversion attribution: for every purchase, the
    FIRST and LAST preceding non-purchase touch (view/click) by the
    same user inside the same 30-minute-gap session, plus the touch
    count -- first-touch and last-touch attribution in one pass, the
    analytic a marketing/conversion pipeline runs next to the funnel.

    Engine shape: the gap sessionization (lag + cumulative is-new sum,
    operators/sessionize.py's construction) and the attribution
    windows all share ONE (user_id) partitioning under the total
    (ts_ms, event_id) order, so the whole operator is a single
    key-shuffle followed by window evaluation -- no self-joins, no
    per-purchase scans.  first/last touch ride IGNORE-NULLS
    first/last_value over the preceding-rows frame; attribution of a
    purchase with no session touches reports nulls and zero (a direct
    conversion), which the oracle mirrors.

    Returns (event_id, user_id, ts_ms, session_id, first_touch_id,
    first_touch_type, last_touch_id, last_touch_type, n_touches)."""
    ms = F.unix_millis(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_ms").asc(), F.col("event_id").asc()
    )
    base = events.select(
        "user_id", "event_id", "event_type", ms.alias("ts_ms")
    ).withColumn("prev_ms", F.lag("ts_ms").over(w))
    sess = base.withColumn(
        "is_new",
        (
            F.col("prev_ms").isNull()
            | ((F.col("ts_ms") - F.col("prev_ms")) > gap_ms)
        ).cast("long"),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        F.col("ts_ms").asc(), F.col("event_id").asc()
    )
    prior = ws.rowsBetween(Window.unboundedPreceding, -1)
    touch = F.when(
        F.col("event_type") != "purchase",
        F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("t")),
    )
    attributed = (
        sess.withColumn("__first", F.first(touch, ignorenulls=True).over(prior))
        .withColumn("__last", F.last(touch, ignorenulls=True).over(prior))
        .withColumn(
            "n_touches",
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") != "purchase", 1).otherwise(0)
                ).over(prior),
                F.lit(0),
            ).cast("long"),
        )
    )
    return attributed.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts_ms",
        "session_id",
        F.col("__first.id").alias("first_touch_id"),
        F.col("__first.t").alias("first_touch_type"),
        F.col("__last.id").alias("last_touch_id"),
        F.col("__last.t").alias("last_touch_type"),
        "n_touches",
    )


def hll_sketch_table_union(
    events: DataFrame, max_rel_err: float = 0.1
) -> DataFrame:
    """The MERGEABLE-sketch-table pattern on Spark's bundled Apache
    DataSketches HLL surface (``hll_sketch_agg`` -> binary sketch
    column, ``hll_union_agg`` -> merged sketch,
    ``hll_sketch_estimate``): per-(type, day) sketches stand in for
    the materialized daily sketch table a 100 TB pipeline persists,
    and the per-type answer is computed by UNIONING those sketches --
    re-aggregation reads kilobytes of sketch state, never the raw
    events again.  This is the operational difference from
    approx_count_distinct (hll_distinct_users), whose sketch lives and
    dies inside one query.

    Cross-engine contract as in hll_distinct_users: estimates are
    algorithm-specific, so the oracle asserts the exact count and the
    published error BOUND (the flag is deterministically true in any
    correct engine), plus the day count proving the union really
    spanned partitions.  Returns (event_type, n_days, n_exact,
    within_bound)."""
    clean = events.filter(F.col("user_id").isNotNull())
    daily = clean.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("__day")
    ).agg(F.hll_sketch_agg(F.col("user_id")).alias("__sk"))
    merged = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("__sk"))).alias("__approx"),
    )
    exact = clean.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "n_exact",
        (
            F.abs(F.col("__approx") - F.col("n_exact")) / F.col("n_exact")
            <= max_rel_err
        ).alias("within_bound"),
    )


def join_key_skew_report(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Shuffle-skew diagnostic for a join/aggregation key: per-key row
    counts summarized into the numbers that predict whether a shuffle
    on this key needs salting or AQE skew-split -- key cardinality,
    max and p99 per-key volume, the max/avg skew factor, and the
    heaviest key itself.  This is the profile you run BEFORE keying a
    100 TB join; the engine's salting utilities
    (functions/skew.py, salted_aggregate) are the remedies it points
    at.

    Shape: one map-side-combined count per key; every summary then
    runs over the AGGREGATED (n_keys-row) frame -- the percentile,
    the 1-row top-key frame, and the scalar rollup never touch the
    event stream.  avg is a single division of exact longs; p99 is
    the R-7 interpolation over integer counts, 1e-9 pre-rounded (ulp
    absorption) then published at 4 dp.

    Returns (key_col, n_keys, n_rows, max_key_rows, avg_key_rows,
    p99_key_rows, skew_factor, top_key)."""
    kc = (
        events.filter(F.col(key).isNotNull())
        .groupBy(F.col(key).alias("k"))
        .agg(F.count("*").alias("cnt"))
    )
    from ..functions.caching import scoped_cache

    kc = scoped_cache(kc)
    top = kc.orderBy(F.col("cnt").desc(), F.col("k").desc()).limit(1).select(
        F.col("k").alias("top_key")
    )
    summary = kc.groupBy().agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_key_rows"),
        F.round(F.round(F.percentile(F.col("cnt"), F.lit(0.99)), 9), 4).alias(
            "p99_key_rows"
        ),
    )
    return summary.crossJoin(F.broadcast(top)).select(
        F.lit(key).alias("key_col"),
        "n_keys",
        "n_rows",
        "max_key_rows",
        F.round(F.col("n_rows") / F.col("n_keys"), 4).alias("avg_key_rows"),
        "p99_key_rows",
        F.round(
            F.col("max_key_rows") / (F.col("n_rows") / F.col("n_keys")), 4
        ).alias("skew_factor"),
        "top_key",
    )


def winsorized_values(
    events: DataFrame, lo: float = 0.01, hi: float = 0.99
) -> DataFrame:
    """Winsorization: clip each value to its event type's [p01, p99]
    band -- the standard outlier treatment before moments-based
    features (a single fat-fingered reading otherwise owns the mean).
    Bounds come from ONE tiny per-type aggregate broadcast back onto
    the stream (the value_anomalies shape: the corpus never shuffles,
    clipping is a scan-speed projection).

    Determinism: bounds are R-7 percentiles pre-rounded at 1e-9 (the
    cross-engine lerp ulp absorbed) and published at 6 dp; the clip
    compares against the ROUNDED bounds on both engines, so a value
    within an ulp of a bound clips identically.  Returns (event_id,
    event_type, value, lo_bound, hi_bound, value_winsorized,
    was_clipped)."""
    bounds = (
        events.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(F.round(F.percentile("value", F.lit(lo)), 9), 6).alias("lo_bound"),
            F.round(F.round(F.percentile("value", F.lit(hi)), 9), 6).alias("hi_bound"),
        )
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo_bound")), F.col("hi_bound"))
    return (
        events.filter(F.col("value").isNotNull())
        .join(F.broadcast(bounds), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            "lo_bound",
            "hi_bound",
            clipped.alias("value_winsorized"),
            ((F.col("value") < F.col("lo_bound")) | (F.col("value") > F.col("hi_bound"))).alias(
                "was_clipped"
            ),
        )
    )


def rolling_monthly_active_customers(orders: DataFrame, window_m: int = 3) -> DataFrame:
    """Monthly active customers plus the trailing-``window_m``-month
    ROLLING distinct count -- the MAU/rolling-MAU pair every growth
    dashboard carries, and a distinct-count that a plain window CANNOT
    express (count(distinct) over a frame is unsupported; re-counting
    from raw per month re-scans the fact table).

    Shape: one distinct (customer, month) frame (map-side combinable),
    then each row EXPLODES to the <= window_m target months it is
    visible in -- the replication factor is the window length, never
    the data -- and one count-distinct per target month finishes.  At
    100 TB the rolling tier costs window_m x the distinct frame, not
    window_m x the fact table.  Returns (month, n_active,
    n_active_rolling)."""
    cm = (
        orders.select(
            F.col("o_custkey").alias("c"),
            F.trunc(F.col("o_orderdate"), "month").alias("m"),  # DATE-typed month
        )
        .distinct()
    )
    monthly = cm.groupBy("m").agg(F.count("*").alias("n_active"))
    visible = cm.select(
        "c",
        F.explode(
            F.array(*[F.add_months(F.col("m"), i) for i in range(window_m)])
        ).alias("m"),
    )
    rolling = visible.groupBy("m").agg(
        F.count_distinct("c").alias("n_active_rolling")
    )
    return (
        monthly.join(rolling, "m")
        .select(
            F.date_format("m", "yyyy-MM").alias("month"),
            "n_active",
            "n_active_rolling",
        )
    )


# P(Poisson(1) <= k) for k = 0..5: the inverse-CDF thresholds of the
# bootstrap weights.  LITERAL doubles shared with the DuckDB oracle so
# the replicate weights are bit-identical in any engine.
POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


def bootstrap_mean_price(lineitem: DataFrame, b: int = 32) -> DataFrame:
    """Poisson bootstrap of mean(l_extendedprice): ``b`` resampling
    replicates in ONE pass, each row drawing a Poisson(1) weight per
    replicate from its portable hash-uniform (the distributed
    bootstrap -- true resampling would need the row count up front and
    a shuffle per replicate; Poisson weights are exchangeable,
    per-row, and mergeable, which is why large-scale systems bootstrap
    this way).  The replicate spread IS the standard error of the
    mean -- the error bar a 100 TB aggregate should ship with.

    Determinism: u = md5-48bit / 2^48 exactly as in weighted sampling;
    weights come from literal CDF thresholds (POISSON1_CDF, shared
    with the oracle); each replicate's numerator is an EXACT decimal
    sum (integer weight x decimal price) and its denominator an
    integer sum, so every replicate mean is one double division --
    no cross-engine sum-order drift anywhere.  Returns b+1 rows:
    (replicate, n_eff, mean_price) with replicate 0 = the unweighted
    point estimate."""
    from .textstats import word_hash

    key = F.concat_ws(
        "_",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("replicate").cast("string"),
    )
    u = word_hash(key) / F.lit(float(1 << 48))
    w = F.lit(len(POISSON1_CDF))
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    reps = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.explode(F.sequence(F.lit(1), F.lit(b))).alias("replicate"),
    ).select(
        "replicate", w.alias("w"), F.col("l_extendedprice").alias("p")
    )
    boot = reps.groupBy("replicate").agg(
        F.sum("w").cast("long").alias("n_eff"),
        (F.sum(F.col("w") * F.col("p")).cast("double") / F.sum("w")).alias(
            "mean_price"
        ),
    )
    point = lineitem.groupBy().agg(
        F.count("*").alias("n_eff"),
        (F.sum("l_extendedprice").cast("double") / F.count("*")).alias(
            "mean_price"
        ),
    ).select(F.lit(0).alias("replicate"), "n_eff", "mean_price")
    return point.unionAll(
        boot.select("replicate", "n_eff", "mean_price")
    ).select(
        "replicate", "n_eff", F.round(F.col("mean_price"), 6).alias("mean_price")
    )


def ab_test_welch(events: DataFrame) -> DataFrame:
    """Welch two-sample t-test per event type -- the experiment
    readout an A/B platform computes over billions of exposures.  Arms
    are assigned by the PORTABLE 48-bit md5 user hash (parity bit), so
    the split -- and therefore every statistic -- is reproducible in
    any engine and stable under reshuffling/backfill (the property a
    random() split lacks).

    Shape: ONE map-side-combined aggregate over a handful of type keys
    -- conditional exact-decimal sums per arm (count / sum / sum of
    squares accumulate order-independently), then the Welch t statistic
    and Satterthwaite degrees of freedom come from single double
    expressions over those exact sums, evaluated in the same order in
    the DuckDB twin.  No second pass, no per-user shuffle: the fact
    stream is scanned once and only (type x 6) numbers cross the wire.
    Returns (event_type, n_a, n_b, mean_a, mean_b, mean_diff, t_stat,
    df)."""
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
        ).cast("long")
        % 2
    )
    v = F.col("value").cast("decimal(18,6)")
    base = events.filter(F.col("value").isNotNull()).select(
        "event_type", arm.alias("__arm"), v.alias("__v")
    )

    def _side(tag: int, name: str):
        onside = F.col("__arm") == tag
        return [
            F.count(F.when(onside, 1)).alias(f"__n_{name}"),
            F.sum(F.when(onside, F.col("__v"))).alias(f"__s_{name}"),
            F.sum(F.when(onside, F.col("__v") * F.col("__v"))).alias(
                f"__ss_{name}"
            ),
        ]

    agg = base.groupBy("event_type").agg(*_side(0, "a"), *_side(1, "b"))

    def _stats(name: str):
        n = F.col(f"__n_{name}").cast("double")
        s = F.col(f"__s_{name}")
        ss = F.col(f"__ss_{name}")
        mean = s.cast("double") / n
        # sample variance from the exact sums via the value_anomalies
        # discipline: single double divisions of exact decimals (a
        # decimal n*ss - s*s would overflow precision 38 and round
        # differently per engine)
        var = (ss.cast("double") / n - mean * mean) * (n / (n - F.lit(1.0)))
        return mean, var, n

    mean_a, var_a, n_a = _stats("a")
    mean_b, var_b, n_b = _stats("b")
    sa = var_a / n_a
    sb = var_b / n_b
    se2 = sa + sb
    t = F.when(se2 > 0, (mean_a - mean_b) / F.sqrt(se2)).otherwise(F.lit(0.0))
    df = F.when(
        (sa > 0) | (sb > 0),
        (se2 * se2)
        / (sa * sa / (n_a - F.lit(1.0)) + sb * sb / (n_b - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    return agg.filter((F.col("__n_a") > 1) & (F.col("__n_b") > 1)).select(
        "event_type",
        F.col("__n_a").alias("n_a"),
        F.col("__n_b").alias("n_b"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(mean_a - mean_b, 6).alias("mean_diff"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 6).alias("df"),
    )


def value_trend_ols(events: DataFrame) -> DataFrame:
    """Per-type least-squares trend of value over time -- the
    closed-form OLS a metrics warehouse fits to every series without a
    single ML-library import, and WITHOUT a sort: simple linear
    regression is just five sufficient statistics.

    x is the HOUR index (epoch-millis div 3600000): an exact BIGINT
    small enough that every sufficient statistic (sx, sxx as longs;
    sy, syy, sxy as narrow decimals) accumulates EXACTLY and therefore
    order-independently; the combination algebra (n*sxy - sx*sy etc.)
    then runs in double with one cast per sum and the same op order in
    the DuckDB twin, so the fit is bit-reproducible at any
    partitioning (the cancellation double admits is the same bits in
    both engines).  ONE map-side-combined aggregate; nothing but
    (type x 6) numbers shuffle.  Returns (event_type, n, slope_per_hour,
    intercept, r2)."""
    x = F.expr("unix_millis(ts) div 3600000")
    y = F.col("value").cast("decimal(18,6)")
    base = events.filter(F.col("value").isNotNull()).select(
        "event_type", x.alias("__x"), y.alias("__y")
    )
    # sums stay EXACT: hour indexes and their squares fit comfortably
    # in longs, value cross terms in narrow decimals (the x side is
    # pre-narrowed to decimal(10,0) so the product precision stays
    # inside 38 -- a decimal(38)*decimal(38) product would overflow and
    # round engine-specifically)
    xd = F.col("__x").cast("decimal(10,0)")
    agg = base.groupBy("event_type").agg(
        F.count("*").alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.sum(xd * F.col("__y")).alias("__sxy"),
    )
    # combination algebra in DOUBLE, identical op order in the DuckDB
    # twin: the exact sums cast once, then n*sxy - sx*sy etc.; the
    # cancellation this admits is the same bits in both engines
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    num = n * F.col("__sxy").cast("double") - sx * sy
    den = n * F.col("__sxx").cast("double") - sx * sx
    deny = n * F.col("__syy").cast("double") - sy * sy
    slope = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    intercept = (
        F.col("__sy").cast("double") - slope * F.col("__sx").cast("double")
    ) / F.col("__n").cast("double")
    r2 = F.when(
        (den > 0) & (deny > 0),
        (num / (F.sqrt(den) * F.sqrt(deny)))
        * (num / (F.sqrt(den) * F.sqrt(deny))),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "event_type",
        F.col("__n").alias("n"),
        F.round(slope, 6).alias("slope_per_hour"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def cusum_changepoints(events: DataFrame) -> DataFrame:
    """CUSUM change-point detection on per-type minute rates: the
    running sum of (count - mean rate) peaks exactly where the series'
    level shifts -- the standard one-pass answer to "WHEN did this
    metric change", complementing burst_minutes' "which single minutes
    spiked".

    Shape discipline: the event stream collapses to a (type, minute)
    count frame FIRST (map-side combined), the per-type mean comes
    from a second tiny aggregate over those counts (exact integer
    sums, one double division), and the cumulative walk is a window
    over the AGGREGATED frame only -- thousands of rows, never the
    fact table; at 100 TB the window input is still calendar-bounded.
    The change point is the arg-max |cusum| picked by ONE struct-max
    (earliest minute wins ties via the negated epoch), no second
    window.  Returns (event_type, change_minute, cusum_at_peak,
    n_minutes)."""
    per_min = events.groupBy(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("__m")
    ).agg(F.count("*").alias("__c"))
    stats = per_min.groupBy("event_type").agg(
        F.sum("__c").alias("__tot"), F.count("*").alias("__k")
    )
    mean = F.col("__tot").cast("double") / F.col("__k").cast("double")
    dev = per_min.join(
        F.broadcast(stats.select("event_type", mean.alias("__mean"))),
        "event_type",
    ).select(
        "event_type",
        "__m",
        (F.col("__c").cast("double") - F.col("__mean")).alias("__d"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("__m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walked = dev.select(
        "event_type",
        "__m",
        F.round(F.sum("__d").over(w), 6).alias("__cusum"),
    )
    peak = walked.groupBy("event_type").agg(
        F.max(
            F.struct(
                F.abs(F.col("__cusum")).alias("a"),
                (-F.unix_timestamp("__m")).alias("negm"),
                F.col("__cusum").alias("c"),
            )
        ).alias("__pk"),
        F.count("*").alias("n_minutes"),
    )
    return peak.select(
        "event_type",
        F.date_format(
            F.to_timestamp(-F.col("__pk.negm")), "yyyy-MM-dd HH:mm:ss"
        ).alias("change_minute"),
        F.col("__pk.c").alias("cusum_at_peak"),
        "n_minutes",
    )


def basket_brand_pairs(
    lineitem: DataFrame, part: DataFrame, min_support: int = 2
) -> DataFrame:
    """Market-basket pair mining: brand pairs that co-occur in the
    same order, with support and lift -- the first iteration of
    Apriori/FP-growth, which at warehouse scale is usually the only
    one anybody runs ("what sells together").

    The fact table collapses to the DISTINCT (order, brand) frame
    before anything pairs up (map-side combinable; the dimension join
    is a broadcast hash join -- part is the small side by orders of
    magnitude).  The pair join is a self-equi-join ON THE ORDER KEY
    with a < b, so candidates are bounded by C(brands-per-order, 2)
    per order -- a per-basket constant, never corpus-quadratic; brand
    marginals and the order count are broadcast back for the lift.
    Lift's divisions run in one double expression mirrored by the
    oracle.  Returns (brand_a, brand_b, n_orders_both, lift)."""
    ob = (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
    )
    from ..functions.caching import scoped_cache

    ob = scoped_cache(ob)  # three readers: pairs, marginals, order count
    left = ob.select("o", F.col("b").alias("brand_a"))
    right = ob.select("o", F.col("b").alias("brand_b"))
    pairs = (
        left.join(right, "o")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_orders_both"))
        .filter(F.col("n_orders_both") >= min_support)
    )
    marg = ob.groupBy("b").agg(F.count("*").alias("__nb"))
    n_orders = ob.select(F.count_distinct("o").alias("__no"))
    lift = (
        F.col("n_orders_both").cast("double")
        * F.col("__no").cast("double")
        / (F.col("__na_ct").cast("double") * F.col("__nb_ct").cast("double"))
    )
    return (
        pairs.join(
            F.broadcast(marg.select(F.col("b").alias("brand_a"), F.col("__nb").alias("__na_ct"))),
            "brand_a",
        )
        .join(
            F.broadcast(marg.select(F.col("b").alias("brand_b"), F.col("__nb").alias("__nb_ct"))),
            "brand_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "n_orders_both",
            F.round(lift, 6).alias("lift"),
        )
    )


def customer_360(orders: DataFrame, events: DataFrame) -> DataFrame:
    """Entity-360 consolidation: the order side and the behavioral
    side of a customer folded into one profile row per entity -- the
    canonical warehouse "golden record" join, where neither side is
    authoritative and absence on either side is itself a segment
    (churned buyer, window shopper).

    Both sides pre-aggregate to one row per key BEFORE the join --
    max_by/count/sum fold map-side, so the FULL OUTER join shuffles
    two key-sized frames, never raw facts (at 100 TB the join cost is
    the entity count).  Money stays decimal until the final double
    cast.  Returns (entity_id, n_orders, total_spend, n_events,
    last_event_type, segment)."""
    o = orders.groupBy(F.col("o_custkey").alias("__k")).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__spend"),
    )
    e = events.filter(F.col("user_id").isNotNull()).groupBy(
        F.col("user_id").alias("__k")
    ).agg(
        F.count("*").alias("n_events"),
        F.max_by(
            "event_type",
            F.struct(F.unix_millis("ts").alias("t"), F.col("event_id").alias("i")),
        ).alias("last_event_type"),
    )
    j = o.join(e, "__k", "full_outer")
    segment = (
        F.when(F.col("n_orders").isNull(), "prospect")
        .when(F.col("n_events").isNull(), "dormant_buyer")
        .otherwise("active_buyer")
    )
    return j.select(
        F.col("__k").alias("entity_id"),
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.round(
            F.coalesce(
                F.col("__spend"), F.lit(0).cast("decimal(18,2)")
            ).cast("double"),
            2,
        ).alias("total_spend"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        "last_event_type",
        segment.alias("segment"),
    )


def chi_square_independence(events: DataFrame) -> DataFrame:
    """Pearson chi-square test of independence between event type and
    hour-of-day -- "does behavior depend on time of day", the
    categorical counterpart of the A/B tier's mean tests.

    The contingency table is ONE map-side-combined aggregate (type x
    24 cells); marginals, the grand total, and the full r x c grid
    (including EMPTY cells, whose expected counts still contribute)
    all derive from that tiny frame -- broadcast-sized joins, the fact
    table is scanned once.  Per-cell contributions are rounded at 9 dp
    and summed as decimals, so the statistic is order-independent (a
    raw double sum over cells would vary with partitioning); Cramer's
    V normalizes it to [0, 1].  Returns one row (n_rows, n_cols, dof,
    chi2, cramers_v)."""
    cells = events.groupBy(
        "event_type", F.hour("ts").alias("__h")
    ).agg(F.count("*").alias("__o"))
    from ..functions.caching import scoped_cache

    cells = scoped_cache(cells)
    rowt = cells.groupBy("event_type").agg(F.sum("__o").alias("__rt"))
    colt = cells.groupBy("__h").agg(F.sum("__o").alias("__ct"))
    tot = cells.agg(F.sum("__o").alias("__n"))
    grid = (
        rowt.crossJoin(colt)
        .join(cells, ["event_type", "__h"], "left")
        .crossJoin(F.broadcast(tot))
    )
    o = F.coalesce(F.col("__o"), F.lit(0)).cast("double")
    e = (
        F.col("__rt").cast("double")
        * F.col("__ct").cast("double")
        / F.col("__n").cast("double")
    )
    contrib = F.round((o - e) * (o - e) / e, 9).cast("decimal(38,12)")
    agg = grid.agg(
        F.sum(contrib).alias("__chi2"),
        F.count_distinct("event_type").alias("__r"),
        F.count_distinct("__h").alias("__c"),
        F.max("__n").alias("__nn"),
    )
    chi2 = F.col("__chi2").cast("double")
    v = F.sqrt(
        chi2
        / (
            F.col("__nn").cast("double")
            * F.least(F.col("__r") - 1, F.col("__c") - 1).cast("double")
        )
    )
    return agg.select(
        F.col("__r").alias("n_rows"),
        F.col("__c").alias("n_cols"),
        ((F.col("__r") - 1) * (F.col("__c") - 1)).alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(v, 6).alias("cramers_v"),
    )


def psi_drift_report(
    events: DataFrame, cutoff: str = "2024-01-16", n_buckets: int = 10
) -> DataFrame:
    """Population stability index between the pre-cutoff (reference)
    and post-cutoff (current) value distributions -- the ML-ops drift
    gate that decides whether a model's input distribution moved
    enough to retrain.

    Bucket edges are the reference deciles (R-7, ulp-pre-rounded at
    1e-9 then published at 6 dp -- the winsorize discipline), computed
    by ONE tiny aggregate and broadcast as an array; each side's
    bucket assignment is a JVM-side array filter against that rounded
    edge list, so both engines place boundary-adjacent values
    identically.  Proportions are Laplace-smoothed ((c + 0.5) /
    (n + buckets/2)) so an empty bucket contributes a finite term;
    each contribution is rounded at 9 dp (absorbing cross-libm ln
    ulps) and the total sums as decimals.  Returns one row per bucket
    (bucket, n_ref, n_cur, psi_contrib, psi_total)."""
    cut = F.lit(cutoff).cast("timestamp")
    base = events.filter(F.col("value").isNotNull())
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges = base.filter(F.col("ts") < cut).agg(
        F.array(
            *[
                F.round(F.round(F.percentile("value", F.lit(q)), 9), 6)
                for q in qs
            ]
        ).alias("__edges")
    )
    bucketed = base.crossJoin(F.broadcast(edges)).select(
        (F.col("ts") >= cut).alias("__cur"),
        F.size(
            F.filter(F.col("__edges"), lambda b: b < F.col("value"))
        ).alias("bucket"),
    )
    counts = bucketed.groupBy("bucket").agg(
        F.count(F.when(~F.col("__cur"), 1)).alias("n_ref"),
        F.count(F.when(F.col("__cur"), 1)).alias("n_cur"),
    )
    return psi_from_counts(counts, n_buckets)


def psi_from_counts(counts: DataFrame, n_buckets: int = 10) -> DataFrame:
    """PSI inversion over a materialized (bucket, n_ref, n_cur) count
    frame -- the hdr_quantile_estimates pattern applied to drift: the
    counts can come from the batch bucketing pass, a drained streaming
    state table (events_psi_stream), or yesterday's persisted
    histogram; everything here runs over the few-row aggregated frame
    only."""
    tot = counts.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    half = F.lit(n_buckets / 2.0)
    j = counts.crossJoin(F.broadcast(tot))
    p = (F.col("n_ref").cast("double") + 0.5) / (
        F.col("__tr").cast("double") + half
    )
    q = (F.col("n_cur").cast("double") + 0.5) / (
        F.col("__tc").cast("double") + half
    )
    contrib = F.round((p - q) * F.log(p / q), 9).cast("decimal(38,12)")
    per_bucket = j.select(
        "bucket", "n_ref", "n_cur", contrib.alias("__contrib")
    )
    from ..functions.caching import scoped_cache

    per_bucket = scoped_cache(per_bucket)
    total = per_bucket.agg(
        F.round(F.sum("__contrib").cast("double"), 6).alias("psi_total")
    )
    return per_bucket.crossJoin(F.broadcast(total)).select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round(F.col("__contrib").cast("double"), 6).alias("psi_contrib"),
        "psi_total",
    )


def ks_drift_report(events: DataFrame, cutoff: str = "2024-01-16") -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic per event type,
    computed over the HDR bucket sketch rather than raw values -- the
    100 TB-shaped KS: both sides collapse to (type, bucket) counts
    (pure-integer bucketing, map-side combined), the empirical CDFs
    walk the AGGREGATED few-hundred-row frame, and the statistic is
    the max |CDF_pre - CDF_post| over shared bucket support.  Bucket
    granularity bounds the error exactly like hdr_quantiles' estimates
    (<= the bucket's probability mass).  Returns (event_type, n_pre,
    n_post, ks_stat)."""
    cut = F.lit(cutoff).cast("timestamp")
    # hdr_bucket_frame's exact integer bucketing, with the pre/post
    # side tag carried through (the shared frame projects only
    # (event_type, __idx), so the arithmetic is restated inline)
    u = F.floor(F.col("value") * 100).cast("long")
    base = events.filter(F.col("value").isNotNull()).select(
        "event_type", (F.col("ts") >= cut).alias("__cur"), u.alias("__u")
    )
    b = F.length(F.bin(F.col("__u"))).cast("long")
    top5 = F.expr("shiftright(__u, cast(length(bin(__u)) - 5 as int))")
    idx = F.when(F.col("__u") < 16, F.col("__u")).otherwise((b - 5) * 16 + top5)
    counts = base.select(
        "event_type", "__cur", idx.alias("__idx")
    ).groupBy("event_type", "__idx").agg(
        F.count(F.when(~F.col("__cur"), 1)).alias("__np"),
        F.count(F.when(F.col("__cur"), 1)).alias("__nc"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("__idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("event_type")
    cdfp = F.sum("__np").over(w).cast("double") / F.sum("__np").over(
        tot_w
    ).cast("double")
    cdfc = F.sum("__nc").over(w).cast("double") / F.sum("__nc").over(
        tot_w
    ).cast("double")
    walked = counts.select(
        "event_type",
        F.sum("__np").over(tot_w).alias("n_pre"),
        F.sum("__nc").over(tot_w).alias("n_post"),
        F.round(F.abs(cdfp - cdfc), 9).alias("__d"),
    )
    return walked.groupBy("event_type", "n_pre", "n_post").agg(
        F.round(F.max("__d"), 6).alias("ks_stat")
    )


def mad_anomalies(events: DataFrame, z_cut: float = 3.5) -> DataFrame:
    """Robust outlier flags via the median absolute deviation -- the
    Iglewicz-Hoaglin modified z-score (0.6745 * (x - median) / MAD)
    that value_anomalies' moment-based z cannot give you when the
    contamination itself inflates the standard deviation (one fat
    tail and sigma doubles; the median and MAD barely move).

    Two tiny per-type aggregates: the median (R-7, ulp-pre-rounded at
    1e-9 then 6 dp -- the winsorize discipline), then the MAD over
    deviations from the BROADCAST median; both broadcast back onto the
    stream, so the corpus is scanned twice and shuffled never.
    Zero-MAD groups (constant values) pin the score to 0.0 on both
    engines.  Returns (event_id, event_type, value, mod_z,
    is_anomaly)."""
    base = events.filter(F.col("value").isNotNull())
    med = base.groupBy("event_type").agg(
        F.round(F.round(F.percentile("value", F.lit(0.5)), 9), 6).alias("__med")
    )
    dev = base.select("event_type", "value").join(
        F.broadcast(med), "event_type"
    )
    mad = dev.groupBy("event_type").agg(
        F.round(
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("__med")), F.lit(0.5)),
                9,
            ),
            6,
        ).alias("__mad")
    )
    scored = base.select("event_id", "event_type", "value").join(
        F.broadcast(med.join(mad, "event_type")), "event_type"
    )
    z = F.round(
        F.when(
            F.col("__mad") > 0,
            F.lit(0.6745) * (F.col("value") - F.col("__med")) / F.col("__mad"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    return scored.select(
        "event_id",
        "event_type",
        "value",
        z.alias("mod_z"),
        (F.abs(z) > z_cut).alias("is_anomaly"),
    )


def twap_daily(events: DataFrame) -> DataFrame:
    """Time-weighted average value per user-day over irregular samples
    -- the TWAP every IoT/market pipeline needs because a plain mean
    over-weights chatty periods: each observation holds until the next
    one (LOCF weighting), the last one holds to midnight.

    One (user, day) window under the total (ts, event_id) order
    supplies the holding interval; the weighted sum accumulates as
    decimal (interval-ms x value products are exact), one double
    division publishes.  The window partitioning is the natural key
    partitioning -- per-key cost bounded by that user-day's samples,
    hot users split across days.  Zero-length holds (same-timestamp
    ties) carry zero weight on both engines by the same arithmetic.
    Returns (user_id, day, n_samples, twap)."""
    base = events.filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.unix_millis("ts").alias("__ms"),
        "event_id",
        F.col("value").cast("decimal(18,6)").alias("__v"),
    )
    w = Window.partitionBy("user_id", "day").orderBy("__ms", "event_id")
    day_end = (
        F.unix_millis(F.date_add(F.col("day"), 1).cast("timestamp"))
    )
    hold = F.coalesce(F.lead("__ms").over(w), day_end) - F.col("__ms")
    weighted = base.select(
        "user_id",
        "day",
        hold.cast("decimal(18,0)").alias("__w"),
        F.col("__v"),
    )
    agg = weighted.groupBy("user_id", "day").agg(
        F.count("*").alias("n_samples"),
        F.sum(F.col("__w") * F.col("__v")).alias("__wv"),
        F.sum("__w").alias("__tw"),
    )
    return agg.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_samples",
        F.round(
            F.col("__wv").cast("double") / F.col("__tw").cast("double"), 6
        ).alias("twap"),
    )


def event_path_trigrams(events: DataFrame, k: int = 20) -> DataFrame:
    """Top-k behavioral trigrams: the most common 3-step event-type
    paths across users -- the sequence-mining readout one step past
    the Markov transition matrix (events_type_transitions), where
    funnels that the pairwise view hides become visible.

    One per-user window (total (ts, event_id) order) supplies both
    lookaheads, the trigram count map-side combines over a bounded
    vocabulary (types^3 keys), and the global top-k compiles to
    TakeOrderedAndProject under the deterministic (n DESC, path) tie
    order.  Returns (step_1, step_2, step_3, n)."""
    w = Window.partitionBy("user_id").orderBy(
        F.unix_millis("ts"), "event_id"
    )
    tri = (
        events.filter(F.col("user_id").isNotNull())
        .select(
            F.col("event_type").alias("step_1"),
            F.lead("event_type", 1).over(w).alias("step_2"),
            F.lead("event_type", 2).over(w).alias("step_3"),
        )
        .filter(F.col("step_3").isNotNull())
    )
    counts = tri.groupBy("step_1", "step_2", "step_3").agg(
        F.count("*").alias("n")
    )
    return counts.orderBy(
        F.col("n").desc(), "step_1", "step_2", "step_3"
    ).limit(k)


def hll_rolling_distinct(
    events: DataFrame, window_h: int = 3, max_rel_err: float = 0.15
) -> DataFrame:
    """Trailing-``window_h``-hour rolling DISTINCT users from MERGED
    hourly HLL sketch partials -- the sketch answer to the problem
    orders_rolling_mau solves exactly: a rolling count-distinct that no
    window frame can express.  The exact path explodes the distinct
    (user, hour) frame window_h-fold; this path explodes only the
    per-hour SKETCH ROWS (kilobytes each, one per hour), so at 100 TB
    the rolling tier costs window_h x a few-hundred-row sketch table
    instead of window_h x the distinct frame -- the persisted-partials
    pattern of hll_sketch_table_union applied to a sliding window.

    Cross-engine contract (the hll family discipline): estimates are
    algorithm-specific, so the published columns are the exact rolling
    count (explode path, itself the orders_rolling_mau recipe on
    hours) and the deterministically-true error-bound flag.  Returns
    (hour, n_hours_merged, n_exact_rolling, within_bound)."""
    clean = events.filter(F.col("user_id").isNotNull())
    hourly = clean.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("__h")
    ).agg(F.hll_sketch_agg(F.col("user_id")).alias("__sk"))
    visible = hourly.select(
        F.explode(
            F.array(
                *[
                    (F.col("__h") + F.make_dt_interval(F.lit(0), F.lit(i)))
                    for i in range(window_h)
                ]
            )
        ).alias("__th"),
        "__sk",
    )
    merged = visible.groupBy("__th").agg(
        F.count("*").cast("long").alias("n_hours_merged"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("__sk"))).alias("__approx"),
    )
    uh = clean.select(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("__h")
    ).distinct()
    exact = (
        uh.select(
            "user_id",
            F.explode(
                F.array(
                    *[
                        (F.col("__h") + F.make_dt_interval(F.lit(0), F.lit(i)))
                        for i in range(window_h)
                    ]
                )
            ).alias("__th"),
        )
        .groupBy("__th")
        .agg(F.count_distinct("user_id").alias("n_exact_rolling"))
    )
    # target hours past the data's end exist on both paths identically
    # (every source hour projects the same window_h targets)
    return (
        merged.join(exact, "__th")
        .select(
            F.date_format("__th", "yyyy-MM-dd HH:00:00").alias("hour"),
            "n_hours_merged",
            "n_exact_rolling",
            (
                F.abs(F.col("__approx") - F.col("n_exact_rolling"))
                / F.col("n_exact_rolling")
                <= max_rel_err
            ).alias("within_bound"),
        )
    )


def psi_bucket_counts_frozen(
    df: DataFrame, edges: list[float], cutoff: str
) -> DataFrame:
    """The PSI bucketing pass against FROZEN edge literals -- the
    production monitor shape: edges are computed once from the
    reference period (and versioned as config), so the current slice
    streams through a scan-speed array filter with no reference
    re-scan.  Works identically on a batch frame or a readStream
    (events_psi_stream drains this as a complete-mode aggregate).
    Returns (bucket, n_ref, n_cur) counts for psi_from_counts."""
    cut = F.lit(cutoff).cast("timestamp")
    arr = F.array(*[F.lit(float(e)) for e in edges])
    bucketed = df.filter(F.col("value").isNotNull()).select(
        (F.col("ts") >= cut).alias("__cur"),
        F.size(F.filter(arr, lambda b: b < F.col("value"))).alias("bucket"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.when(~F.col("__cur"), 1)).alias("n_ref"),
        F.count(F.when(F.col("__cur"), 1)).alias("n_cur"),
    )


def join_plan_report(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    broadcast_rows: int = 1_000_000,
    skew_cut: float = 8.0,
) -> DataFrame:
    """Pre-flight join planner: EXACT output cardinality and skew for
    an equi-join, computed from the two per-key count frames BEFORE
    anyone pays for the join itself -- sum(n_left(k) * n_right(k)) is
    the join size, its largest per-key term is the task that will
    straggle, and the two input row counts decide broadcastability.
    This is the homework behind every strategy hint the engine ships
    (functions/skew.salted_shuffle_join, broadcast(), AQE thresholds),
    and pairs with join_key_skew_report's single-side profile.

    Cost: two map-side-combined key-count aggregates and one key-sized
    join between them -- at 100 TB you pay key-cardinality, not fact
    tonnage, to know whether the real join is safe.  The strategy
    column applies the engine's own decision ladder on exact integers:
    broadcast when a side fits, salted shuffle when one key owns more
    than ``skew_cut`` x the mean per-key output, plain shuffle
    otherwise.  Returns ONE row."""
    lc = left.groupBy(F.col(left_key).alias("__k")).agg(
        F.count("*").alias("__nl")
    )
    rc = right.groupBy(F.col(right_key).alias("__k")).agg(
        F.count("*").alias("__nr")
    )
    per_key = lc.join(rc, "__k").select(
        "__k", (F.col("__nl") * F.col("__nr")).alias("__prod")
    )
    from ..functions.caching import scoped_cache

    stats = scoped_cache(
        per_key.agg(
            F.sum("__prod").alias("est_join_rows"),
            F.count("*").alias("n_join_keys"),
            F.max(
                F.struct(F.col("__prod").alias("p"), F.col("__k").alias("k"))
            ).alias("__top"),
        )
    )
    sides = (
        lc.agg(
            F.sum("__nl").alias("n_left"), F.count("*").alias("n_left_keys")
        )
        .crossJoin(
            rc.agg(
                F.sum("__nr").alias("n_right"),
                F.count("*").alias("n_right_keys"),
            )
        )
    )
    j = stats.crossJoin(sides)
    mean_per_key = F.col("est_join_rows").cast("double") / F.col(
        "n_join_keys"
    ).cast("double")
    skew = F.round(F.col("__top.p").cast("double") / mean_per_key, 6)
    strategy = (
        F.when(
            F.least(F.col("n_left"), F.col("n_right")) <= broadcast_rows,
            "broadcast",
        )
        .when(skew > skew_cut, "salted_shuffle")
        .otherwise("shuffle")
    )
    return j.select(
        "n_left",
        "n_right",
        "n_left_keys",
        "n_right_keys",
        "est_join_rows",
        "n_join_keys",
        F.col("__top.k").alias("top_key"),
        F.col("__top.p").alias("top_key_rows"),
        skew.alias("skew_factor"),
        strategy.alias("strategy"),
    )


def conversion_ab_test(events: DataFrame) -> DataFrame:
    """Two-proportion z-test on CONVERSION (did the user purchase?)
    between the md5-parity arms -- the binary-outcome sibling of
    ab_test_welch's mean test; most experiments read out on a rate,
    not a mean.

    One distinct (user, converted) fold (map-side combinable: max of
    the purchase flag per user), then ONE conditional aggregate over
    the user frame; the pooled-variance z statistic is a single double
    expression over four exact counts, mirrored op-for-op.  Returns
    one row (n_a, n_b, conv_a, conv_b, rate_a, rate_b, z_stat)."""
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
        ).cast("long")
        % 2
    )
    users = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "purchase").cast("int")).alias(
                "__conv"
            )
        )
        .select(arm.alias("__arm"), "__conv")
    )
    agg = users.agg(
        F.count(F.when(F.col("__arm") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("__arm") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("__arm") == 0, F.col("__conv"))).alias("conv_a"),
        F.sum(F.when(F.col("__arm") == 1, F.col("__conv"))).alias("conv_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    pa = F.col("conv_a").cast("double") / na
    pb = F.col("conv_b").cast("double") / nb
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (na + nb)
    se = F.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    z = F.when(se > 0, (pa - pb) / se).otherwise(F.lit(0.0))
    return agg.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_stat"),
    )


# P(first digit = d) under Benford's law, as LITERAL doubles shared
# with the DuckDB twin (log10(1 + 1/d) -- evaluated once here so no
# engine's libm is in the comparison path).
BENFORD_P = (
    0.3010299956639812,
    0.17609125905568124,
    0.12493873660829993,
    0.09691001300805642,
    0.07918124604762482,
    0.06694678963061322,
    0.05799194697768673,
    0.05115252244738129,
    0.04575749056067514,
)


def benford_audit(orders: DataFrame) -> DataFrame:
    """Benford's-law first-digit audit over order totals -- the
    classic fabricated-numbers screen (organic monetary amounts follow
    log-uniform first digits; invented ones don't).  Not a proof of
    fraud, a cheap tripwire worth running on any financial feed.

    First digits via string head of the absolute value (exact integer
    semantics, no libm); ONE 9-key aggregate; expected shares are
    literal constants so the chi-square statistic is identical in any
    engine.  Returns (digit, n, share, expected, chi2_total)."""
    d = F.substring(
        F.abs(F.col("o_totalprice")).cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("int")
    counts = (
        orders.filter(F.col("o_totalprice") > 0)
        .select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    exp_map = F.element_at(
        F.array(*[F.lit(p) for p in BENFORD_P]), F.col("digit")
    )
    tot = counts.agg(F.sum("n").alias("__t"))
    j = counts.crossJoin(F.broadcast(tot))
    share = F.col("n").cast("double") / F.col("__t").cast("double")
    e = exp_map * F.col("__t").cast("double")
    cell = F.round(
        (F.col("n").cast("double") - e) * (F.col("n").cast("double") - e) / e,
        9,
    ).cast("decimal(38,12)")
    from ..functions.caching import scoped_cache

    per = scoped_cache(
        j.select(
            "digit",
            "n",
            F.round(share, 6).alias("share"),
            F.round(exp_map, 6).alias("expected"),
            cell.alias("__cell"),
        )
    )
    chi2 = per.agg(
        F.round(F.sum("__cell").cast("double"), 6).alias("chi2_total")
    )
    return per.crossJoin(F.broadcast(chi2)).select(
        "digit", "n", "share", "expected", "chi2_total"
    )


def abc_classes(orders: DataFrame) -> DataFrame:
    """ABC / Pareto classification of customers by revenue: A = the
    heavy heads covering the first 80% of cumulative revenue, B = the
    next 15%, C = the long tail -- inventory-management's oldest
    segmentation, and the shape behind "20% of customers are 80% of
    revenue".

    The fact table folds to one exact-decimal revenue row per customer
    FIRST, and the cumulative sum over that entity frame is TWO-PHASE:
    revenue-range buckets (approximate percentile boundaries -- they
    only choose the partitioning, never the answer, because decimal
    addition is exact under any grouping), per-bucket totals folded to
    broadcast exclusive offsets, then a window PARTITIONED by bucket.
    No global single-task window exists in the plan, so the recipe
    survives a 100M-entity frame; ordering is (revenue DESC, key) --
    value ties share a bucket by construction, keeping the phases
    exact.  Returns (o_custkey, revenue, cum_share, abc_class)."""
    from ..functions.caching import scoped_cache

    per = scoped_cache(
        orders.groupBy("o_custkey").agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__rev")
        )
    )
    n_buckets = 8
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = per.agg(
        F.array(
            *[F.percentile_approx("__rev", F.lit(q)) for q in qs]
        ).alias("__b")
    )
    # strictly-less membership: equal revenues always share a bucket,
    # so the bucket phases add exactly the rows the global order would
    bucketed = per.crossJoin(F.broadcast(bounds)).select(
        "o_custkey",
        "__rev",
        F.size(F.filter(F.col("__b"), lambda b: b < F.col("__rev"))).alias(
            "__bk"
        ),
    )
    btot = bucketed.groupBy("__bk").agg(F.sum("__rev").alias("__bt"))
    wb = (
        Window.orderBy(F.col("__bk").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # <= n_buckets rows: the only global window is bucket-sized
    offsets = btot.select(
        "__bk",
        F.coalesce(
            F.sum("__bt").over(wb), F.lit(0).cast("decimal(38,2)")
        ).alias("__off"),
    )
    w = (
        Window.partitionBy("__bk")
        .orderBy(F.col("__rev").desc(), F.col("o_custkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = per.agg(F.sum("__rev").alias("__t"))
    walked = (
        bucketed.join(F.broadcast(offsets), "__bk")
        .crossJoin(F.broadcast(tot))
        .select(
            "o_custkey",
            F.round(F.col("__rev").cast("double"), 2).alias("revenue"),
            F.round(
                (F.col("__off") + F.sum("__rev").over(w)).cast("double")
                / F.col("__t").cast("double"),
                6,
            ).alias("cum_share"),
        )
    )
    cls = (
        F.when(F.col("cum_share") <= 0.80, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    return walked.select(
        "o_custkey", "revenue", "cum_share", cls.alias("abc_class")
    )


def anomaly_scores_frozen(
    df: DataFrame, stats: list, z_cut: float = 3.0
) -> DataFrame:
    """value_anomalies' scoring pass against FROZEN per-type (mean,
    std) literals -- the deployed-monitor shape (the psi frozen-edges
    discipline applied to z-scores): stats version as config, the live
    feed scores stateless at scan speed.  Works identically on a batch
    frame or a readStream; with stats computed from the full feed the
    stream's output equals batch value_anomalies row for row.
    ``stats`` rows carry (event_type, mean, std)."""
    mean_expr = F.lit(None).cast("double")
    std_expr = F.lit(None).cast("double")
    for r in stats:
        cond = F.col("event_type") == r["event_type"]
        mean_expr = F.when(cond, F.lit(r["mean"])).otherwise(mean_expr)
        std_expr = F.when(cond, F.lit(r["std"])).otherwise(std_expr)
    z = F.round(
        F.when(
            std_expr > 0, (F.col("value") - mean_expr) / std_expr
        ).otherwise(F.lit(0.0)),
        6,
    )
    return df.select(
        "event_id",
        "event_type",
        "value",
        z.alias("zscore"),
        (F.abs(z) > z_cut).alias("is_anomaly"),
    )


def multitouch_attribution(
    events: DataFrame, gap_ms: int = 30 * 60 * 1000, model: str = "linear"
) -> DataFrame:
    """LINEAR multi-touch attribution: every purchase's conversion
    credit splits equally across ALL its preceding in-session touches
    (1/n each), aggregated per touch type -- the model marketing teams
    reach for when first/last-touch (purchase_attribution) over-credits
    the endpoints of the journey.

    Shape: the same single-key-shuffle sessionized frame as
    purchase_attribution; the purchase-x-touch pairing is a
    session-keyed equi-join whose candidates are bounded by the
    session's own length (the per-basket bound of the market-basket
    join, applied in time).  Per-pair credits are 1/n rounded at 9 dp
    and summed as decimals -- order-independent and engine-identical.
    Returns (touch_type, n_credited_touches, credit)."""
    ms = F.unix_millis(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_ms").asc(), F.col("event_id").asc()
    )
    base = events.filter(F.col("user_id").isNotNull()).select(
        "user_id", "event_id", "event_type", ms.alias("ts_ms")
    ).withColumn("prev_ms", F.lag("ts_ms").over(w))
    sess = base.withColumn(
        "is_new",
        (
            F.col("prev_ms").isNull()
            | ((F.col("ts_ms") - F.col("prev_ms")) > gap_ms)
        ).cast("long"),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        F.col("ts_ms").asc(), F.col("event_id").asc()
    )
    prior = ws.rowsBetween(Window.unboundedPreceding, -1)
    is_touch = (F.col("event_type") != "purchase").cast("long")
    from ..functions.caching import scoped_cache

    tagged = scoped_cache(
        sess.withColumn(
            "__n_prior", F.coalesce(F.sum(is_touch).over(prior), F.lit(0))
        )
    )
    purchases = tagged.filter(
        (F.col("event_type") == "purchase") & (F.col("__n_prior") > 0)
    ).select(
        "user_id",
        "session_id",
        F.col("ts_ms").alias("__p_ms"),
        F.col("event_id").alias("__p_id"),
        F.col("__n_prior").alias("__n"),
    )
    touches = tagged.filter(F.col("event_type") != "purchase").select(
        "user_id",
        "session_id",
        F.col("ts_ms").alias("__t_ms"),
        F.col("event_id").alias("__t_id"),
        F.col("event_type").alias("touch_type"),
    )
    before = (F.col("__t_ms") < F.col("__p_ms")) | (
        (F.col("__t_ms") == F.col("__p_ms")) & (F.col("__t_id") < F.col("__p_id"))
    )
    pairs = touches.join(purchases, ["user_id", "session_id"]).filter(before)
    if model == "linear":
        credit = F.round(F.lit(1.0) / F.col("__n").cast("double"), 9)
    elif model == "time_decay":
        # exponential recency weighting, half-life = 10 min: per-pair
        # raw weights round at 9 dp (absorbing cross-libm pow ulps) and
        # normalize per purchase over a DECIMAL window sum, so each
        # conversion still hands out exactly ~1.0 credit
        wp = Window.partitionBy("user_id", "session_id", "__p_id")
        raw = F.round(
            F.pow(
                F.lit(2.0),
                -(F.col("__p_ms") - F.col("__t_ms")).cast("double")
                / F.lit(600000.0),
            ),
            9,
        ).cast("decimal(38,12)")
        pairs = pairs.withColumn("__w", raw).withColumn(
            "__wsum", F.sum("__w").over(wp)
        )
        credit = F.round(
            F.col("__w").cast("double") / F.col("__wsum").cast("double"), 9
        )
    elif model == "position":
        # U-shaped: endpoints 0.4 each, interior splits 0.2 -- the
        # position window is per PURCHASE (session-bounded candidates)
        wp = Window.partitionBy("user_id", "session_id", "__p_id").orderBy(
            "__t_ms", "__t_id"
        )
        pos = F.row_number().over(wp)
        pairs = pairs.withColumn("__pos", pos)
        n = F.col("__n").cast("double")
        credit = F.round(
            F.when(F.col("__n") == 1, F.lit(1.0))
            .when(F.col("__n") == 2, F.lit(0.5))
            .when(F.col("__pos") == 1, F.lit(0.4))
            .when(F.col("__pos") == F.col("__n"), F.lit(0.4))
            .otherwise(F.lit(0.2) / (n - F.lit(2.0))),
            9,
        )
    else:
        raise ValueError(f"unknown attribution model: {model!r}")
    credit = credit.cast("decimal(38,12)")
    return (
        pairs.groupBy("touch_type")
        .agg(
            F.count("*").alias("n_credited_touches"),
            F.round(F.sum(credit).cast("double"), 6).alias("credit"),
        )
    )


def median_of_means(lineitem: DataFrame, n_buckets: int = 32) -> DataFrame:
    """Median-of-means estimator for a heavy-tailed mean: rows hash
    into ``n_buckets`` deterministic buckets, each bucket contributes
    its exact-sum mean, and the estimate is the MEDIAN of those means
    -- sub-Gaussian concentration from nothing but a groupBy, where
    the plain mean's error is hostage to the tail (the robust-
    statistics sibling of the Poisson bootstrap's error bars).

    The bucket key is the portable 48-bit md5 of the row key, so the
    buckets -- and therefore the estimate -- are identical in any
    engine and under any partitioning; bucket means are single double
    divisions of decimal sums; the median is R-7 with the 1e-9 ulp
    pre-round over a 32-row frame.  ONE map-side-combined aggregate
    over n_buckets keys.  Returns (n_rows, n_buckets, mean,
    median_of_means)."""
    key = F.concat_ws(
        ":", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    bucket = (
        F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long")
        % n_buckets
    )
    v = F.col("l_extendedprice").cast("decimal(18,2)")
    per = lineitem.groupBy(bucket.alias("__b")).agg(
        F.count("*").alias("__n"), F.sum(v).alias("__s")
    )
    bmean = (F.col("__s").cast("double") / F.col("__n").cast("double")).alias(
        "__m"
    )
    means = per.select("__b", "__n", "__s", bmean)
    return means.agg(
        F.sum("__n").alias("n_rows"),
        F.count("*").alias("n_buckets"),
        F.round(
            F.sum("__s").cast("double") / F.sum("__n").cast("double"), 6
        ).alias("mean"),
        F.round(F.round(F.percentile("__m", F.lit(0.5)), 9), 6).alias(
            "median_of_means"
        ),
    )


def rfm_scores(orders: DataFrame, n_bins: int = 5) -> DataFrame:
    """RFM customer scoring -- recency / frequency / monetary quintile
    scores (5 = best) and the concatenated segment code, the oldest
    segmentation in CRM and still the first thing a retention team
    asks the warehouse for.

    Per-customer facts fold in ONE aggregate (max date, count, exact
    decimal spend); each dimension's quintile boundaries come from one
    1-row percentile aggregate broadcast back (the quality_deciles
    discipline -- never an ntile() window funneling every customer
    through one task), with the R-7 + 1e-9 ulp pre-round keeping the
    cuts engine-identical.  Scoring is a per-row comparison at scan
    speed.  Returns (o_custkey, recency_days, frequency, monetary,
    r_score, f_score, m_score, segment)."""
    from ..functions.caching import scoped_cache

    per = scoped_cache(
        orders.groupBy("o_custkey").agg(
            F.max("o_orderdate").alias("__last"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__m"),
        )
    )
    anchor = per.agg(F.max("__last").alias("__anchor"))
    base = per.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff(F.col("__anchor"), F.col("__last")).alias("recency_days"),
        "frequency",
        F.round(F.col("__m").cast("double"), 2).alias("monetary"),
    )
    base = scoped_cache(base)
    qs = [i / n_bins for i in range(1, n_bins)]

    def boundaries(col):
        return base.agg(
            F.array(
                *[
                    F.round(F.round(F.percentile(col, F.lit(q)), 9), 6)
                    for q in qs
                ]
            ).alias(f"__b_{col}")
        )

    out = (
        base.crossJoin(F.broadcast(boundaries("recency_days")))
        .crossJoin(F.broadcast(boundaries("frequency")))
        .crossJoin(F.broadcast(boundaries("monetary")))
    )

    def score(col, higher_is_better):
        over = F.size(
            F.filter(F.col(f"__b_{col}"), lambda b: b < F.col(col))
        )
        return (F.lit(1) + over) if higher_is_better else (F.lit(5) - over)

    r, fq, m = (
        score("recency_days", False),  # recent (small) = high score
        score("frequency", True),
        score("monetary", True),
    )
    return out.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        r.alias("r_score"),
        fq.alias("f_score"),
        m.alias("m_score"),
        F.concat(
            r.cast("string"), fq.cast("string"), m.cast("string")
        ).alias("segment"),
    )


def funnel_timing(events: DataFrame) -> DataFrame:
    """Funnel VELOCITY on top of funnel_stages' reach: per transition
    (view->click, click->purchase), how many users attempted it, how
    many converted, the conversion rate, and the R-7 median
    time-to-convert -- the "where do users stall, and for how long"
    readout a growth team reads next to the raw funnel counts.

    One aggregate over the (already one-shuffle) per-user stage frame;
    medians carry the 1e-9 ulp pre-round.  Returns one row per
    transition (step, n_eligible, n_converted, conversion_rate,
    median_gap_ms)."""
    staged = funnel_stages(events)

    def _row(step, from_col, to_col):
        eligible = staged.filter(F.col(from_col).isNotNull())
        agg = eligible.agg(
            F.count("*").alias("n_eligible"),
            F.count(F.col(to_col)).alias("n_converted"),
            F.round(
                F.count(F.col(to_col)).cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("conversion_rate"),
            F.round(
                F.round(
                    F.percentile(
                        F.col(to_col) - F.col(from_col), F.lit(0.5)
                    ),
                    9,
                ),
                6,
            ).alias("median_gap_ms"),
        )
        return agg.select(
            F.lit(step).alias("step"),
            "n_eligible",
            "n_converted",
            "conversion_rate",
            "median_gap_ms",
        )

    from ..functions.caching import scoped_cache

    staged = scoped_cache(staged)
    return _row("view_to_click", "view_ts_ms", "click_ts_ms").unionAll(
        _row("click_to_purchase", "click_ts_ms", "purchase_ts_ms")
    )


def range_sort_plan(lineitem: DataFrame, n_partitions: int = 16) -> DataFrame:
    """Balanced-sort RANGE PARTITION PLANNER: the boundaries and the
    resulting per-partition balance report for a global sort of the
    fact table by ``l_extendedprice`` -- the planning pass you run
    before committing a 100 TB sort, because a RangePartitioner with
    bad boundaries turns a cluster-wide sort into one straggler task.

    Discipline mirrors quality_deciles: the n-1 boundaries come from
    ONE 1-row exact R-7 percentile aggregate (the module's established
    cross-engine quantile contract, quantile_cont on the DuckDB side),
    6-dp rounded -- price granularity is cents, interpolation quarters
    of cents, so the rounding is exact -- then broadcast back; each
    row's partition is a pure comparison against the boundary array;
    the report is one map-side-combined aggregate.  Skew shows up as
    balance_ratio > 1 -- on a heavily duplicated key the boundaries
    collapse and the report SAYS so (the point of planning before
    sorting).  Exact percentiles buffer the value list in one
    aggregation buffer -- the module's documented contract
    (cdc_latency_stats / doc_length_quantiles) applies: swap in
    approx_percentile with a tight accuracy when the fact column
    outgrows an executor; boundaries then carry the sketch's rank
    error, which the balance report itself surfaces.  Returns one row
    per non-empty partition: (partition, n_rows, min_price, max_price,
    balance_ratio)."""
    qs = [i / n_partitions for i in range(1, n_partitions)]
    bounds = lineitem.agg(
        F.transform(
            F.percentile(
                F.col("l_extendedprice"), F.array(*[F.lit(q) for q in qs])
            ),
            lambda b: F.round(b, 6),
        ).alias("__bs")
    )
    part = F.size(
        F.filter(F.col("__bs"), lambda b: F.col("l_extendedprice") > b)
    )
    tagged = lineitem.select("l_extendedprice").crossJoin(
        F.broadcast(bounds)
    ).select(
        F.col("l_extendedprice").alias("price"), part.alias("partition")
    )
    # total rides a window over the n_partitions-row REPORT frame (a
    # global window over <=16 rows, never the fact table) -- no second
    # scan for the denominator
    total = F.sum("n_rows").over(Window.partitionBy())
    return (
        tagged.groupBy("partition")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("price").alias("min_price"),
            F.max("price").alias("max_price"),
        )
        .select(
            "partition",
            "n_rows",
            "min_price",
            "max_price",
            F.round(
                F.col("n_rows") / (total / F.lit(float(n_partitions))), 6
            ).alias("balance_ratio"),
        )
    )


def watermark_plan(events: DataFrame, block: int = 1 << 20) -> DataFrame:
    """Event-time DISORDER profile for watermark planning: per event,
    its lateness relative to the maximum event time already seen in
    arrival order (``event_id`` -- the feed's arrival counter), rolled
    into the one-row report that answers "what
    ``withWatermark`` delay keeps p99 of late data": late fraction,
    lateness quantiles, and ``suggested_delay_ms = ceil(p99)``.  This
    is the batch pre-flight for every watermarked streaming operator in
    streaming/ -- measured disorder instead of a guessed delay.

    Scale shape: the running max over arrival order is computed with
    NO global window -- the bucketed two-phase prefix trick (the
    customer_abc_classes discipline): per-block maxima (block =
    event_id div ``block``) prefix-scan on the BLOCK-cardinality frame
    only, broadcast back; the within-block running max is a window
    PARTITIONED by block.  At the 1M-row default block, 1e11 events
    make a ~100k-row block frame (the only unpartitioned window) and
    ~100k within-block partitions whose state is one running max --
    both ends stay executor-sized at any corpus.  Quantiles are exact
    percentiles over the lateness column (R-7, 1e-9 ulp pre-round),
    one aggregation row out.

    Returns (n_events, n_late, late_frac, p50_ms, p90_ms, p99_ms,
    max_ms, suggested_delay_ms)."""
    ts_ms = F.unix_millis(F.col("ts"))
    base = events.select(
        (F.col("event_id") / block).cast("long").alias("__b"),
        F.col("event_id").alias("__id"),
        ts_ms.alias("__ms"),
    )
    blocks = base.groupBy("__b").agg(F.max("__ms").alias("__bmax"))
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    prev = blocks.select(
        "__b", F.max("__bmax").over(wb).alias("__pmax")
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = base.withColumn("__rmax", F.max("__ms").over(w_in))
    late = (
        F.greatest(F.col("__rmax"), F.coalesce(F.col("__pmax"), F.col("__rmax")))
        - F.col("__ms")
    )
    scored = run.join(F.broadcast(prev), "__b").select(late.alias("__late"))
    p = lambda q: F.round(F.round(F.percentile("__late", F.lit(q)), 9), 6)
    return scored.agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("__late") > 0).cast("long")).alias("n_late"),
        F.round(
            F.sum((F.col("__late") > 0).cast("long"))
            / F.count("*").cast("double"),
            6,
        ).alias("late_frac"),
        p(0.5).alias("p50_ms"),
        p(0.9).alias("p90_ms"),
        p(0.99).alias("p99_ms"),
        F.max("__late").alias("max_ms"),
        F.ceil(F.round(F.percentile("__late", F.lit(0.99)), 9))
        .cast("long")
        .alias("suggested_delay_ms"),
    )


def session_gap_profile(events: DataFrame) -> DataFrame:
    """Inter-event GAP profile per user -- the measured input to a
    sessionization timeout, the way watermark_plan is the measured
    input to a watermark delay: gap quantiles over consecutive
    same-user events, with ``suggested_timeout_ms = ceil(p95)`` (a
    timeout below the p95 gap shreds genuine sessions; far above it
    merges distinct visits).  Pairs with the sessionize operators in
    operators/ and streaming/ whose timeout is otherwise a guess.

    Shape: ONE window partitioned by user_id (the natural key -- state
    scales with users, never corpus), ordered by (event time, event_id
    tie-break); exact R-7 percentiles over the integer millisecond
    gaps, 1e-9 ulp pre-round, one row out.  Returns (n_users, n_gaps,
    p50_ms, p90_ms, p95_ms, max_ms, suggested_timeout_ms)."""
    base = events.filter(F.col("user_id").isNotNull()).select(
        "user_id",
        F.unix_millis(F.col("ts")).alias("__ms"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("__ms", "event_id")
    gaps = base.select(
        "user_id", (F.col("__ms") - F.lag("__ms").over(w)).alias("__gap")
    ).filter(F.col("__gap").isNotNull())
    p = lambda q: F.round(F.round(F.percentile("__gap", F.lit(q)), 9), 6)
    return gaps.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_gaps"),
        p(0.5).alias("p50_ms"),
        p(0.9).alias("p90_ms"),
        p(0.95).alias("p95_ms"),
        F.max("__gap").alias("max_ms"),
        F.ceil(F.round(F.percentile("__gap", F.lit(0.95)), 9))
        .cast("long")
        .alias("suggested_timeout_ms"),
    )


def bot_scores(
    events: DataFrame,
    rate_cut_per_min: float = 20.0,
    cv_cut: float = 0.2,
    min_gaps: int = 5,
) -> DataFrame:
    """Bot-traffic scoring: per user, the event rate and the
    REGULARITY of inter-event gaps -- the pre-analytics filter that
    keeps metronomic scrapers and click-bots out of training data.
    Humans are bursty (high gap coefficient-of-variation); bots fire
    on timers (CV near zero) or flood (rate far above human).  Flag =
    rate >= rate_cut OR (enough gaps AND cv <= cv_cut).

    Scale shape: one user-partitioned lag window (state = the same
    per-user bound sessionize accepts) feeding ONE map-side-combined
    aggregate; gap moments accumulate as exact integers/decimals
    (order-independent), mean/variance/CV are single double
    expressions in mirrored op order (the value_anomalies discipline)
    -- bit-reproducible flags in any engine.  Output is
    user-cardinality.  Returns (user_id, n_events, n_types, span_ms,
    rate_per_min, mean_gap_ms, gap_cv, bot_flag)."""
    ts_ms = F.unix_millis(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_ms, F.col("event_id"))
    gapped = events.select(
        "user_id",
        "event_type",
        ts_ms.alias("__ts"),
        (ts_ms - F.lag(ts_ms).over(w)).alias("__gap"),
    )
    g = F.col("__gap")
    per_user = gapped.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        (F.max("__ts") - F.min("__ts")).alias("span_ms"),
        F.count(g).alias("__ng"),
        F.sum(g.cast("decimal(18,0)")).alias("__gs"),
        F.sum((g * g).cast("decimal(38,0)")).alias("__gss"),
    )
    mean_gap = F.col("__gs").cast("double") / F.col("__ng")
    var = (
        F.col("__gss").cast("double") / F.col("__ng") - mean_gap * mean_gap
    )
    cv = F.when(
        (F.col("__ng") > 0) & (mean_gap > 0),
        F.sqrt(F.greatest(var, F.lit(0.0))) / mean_gap,
    ).otherwise(F.lit(0.0))
    rate = (F.col("n_events") * 60000).cast("double") / F.greatest(
        F.col("span_ms"), F.lit(60000)
    )
    out = per_user.select(
        "user_id",
        "n_events",
        "n_types",
        "span_ms",
        F.round(rate, 6).alias("rate_per_min"),
        F.round(
            F.when(F.col("__ng") > 0, mean_gap).otherwise(F.lit(0.0)), 6
        ).alias("mean_gap_ms"),
        F.round(cv, 6).alias("gap_cv"),
    )
    return out.withColumn(
        "bot_flag",
        (F.col("rate_per_min") >= rate_cut_per_min)
        | (
            (F.col("n_events") - 1 >= min_gaps)
            & (F.col("gap_cv") <= cv_cut)
            & (F.col("mean_gap_ms") > 0)
        ),
    )


def feed_gaps(events: DataFrame, bucket_ms: int = 60_000) -> DataFrame:
    """Feed-SILENCE detection: contiguous runs of minutes with zero
    events between the feed's first and last activity -- the dual of
    burst_minutes (which finds spikes) and the ops trigger for "did
    the producer stall?".  A replication pipeline that is merely slow
    shows lag; one that is down shows a gap.

    Shape: the event stream collapses to its DISTINCT active minutes
    first (bucket-cardinality, map-side combined), then the gtid_gaps
    islands idiom -- one lag window over the aggregated minute frame
    -- emits one row per silent run.  Output is gap-cardinality;
    nothing bigger than the active-minute set ever shuffles.  Returns
    (gap_start_ms, gap_end_ms, n_minutes)."""
    minutes = (
        events.select(
            (
                F.floor(F.unix_millis(F.col("ts")) / bucket_ms) * bucket_ms
            ).cast("long").alias("__m")
        )
        .distinct()
    )
    w = Window.orderBy("__m")
    lagged = minutes.select(
        "__m", F.lag("__m").over(w).alias("__prev")
    ).filter(
        F.col("__prev").isNotNull()
        & (F.col("__m") - F.col("__prev") > bucket_ms)
    )
    return lagged.select(
        (F.col("__prev") + bucket_ms).alias("gap_start_ms"),
        (F.col("__m") - bucket_ms).alias("gap_end_ms"),
        ((F.col("__m") - F.col("__prev")) / bucket_ms - 1)
        .cast("long")
        .alias("n_minutes"),
    )


def k_anonymity_report(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """k-anonymity / l-diversity audit over customer quasi-identifiers.

    A release of ``customer`` keyed by the quasi-identifier tuple
    (nation, market segment, account-balance bracket) is k-anonymous
    iff every equivalence class holds >= k individuals, and l-diverse
    iff every class sees >= l distinct values of the sensitive
    attribute (here: the order priorities the class's members used --
    a proxy for the behavioural column a real release would carry).
    Sweeney's k-anonymity and Machanavajjhala's l-diversity are the
    published framework; this is the audit a pipeline runs BEFORE
    publishing a training slice keyed on demographic columns.

    Scale shape: one shuffle to aggregate orders per customer is
    avoided entirely -- the join key is c_custkey, so we aggregate
    AFTER the join, and the single groupBy on the QI tuple map-side
    combines (classes ~ |nations| x |segments| x |brackets|, a tiny
    frame).  No windows, no driver collect; the customer x orders
    join shuffles on custkey once (or broadcasts the dimension at
    real scale where orders >> customer).  Returns one row per
    equivalence class: (nationkey, mktsegment, bal_bracket, k,
    l_diversity, risk_band) with HIGH < 5 <= MEDIUM < 20 <= LOW.
    """
    bracket = F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("int")
    joined = customer.select(
        "c_custkey",
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        bracket.alias("bal_bracket"),
    ).join(
        orders.select("o_custkey", "o_orderpriority"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left",
    )
    per_class = joined.groupBy("nationkey", "mktsegment", "bal_bracket").agg(
        F.count_distinct("c_custkey").alias("k"),
        F.count_distinct("o_orderpriority").alias("l_diversity"),
    )
    risk = (
        F.when(F.col("k") < 5, "HIGH")
        .when(F.col("k") < 20, "MEDIUM")
        .otherwise("LOW")
    )
    return per_class.select(
        "nationkey", "mktsegment", "bal_bracket", "k", "l_diversity",
        risk.alias("risk_band"),
    )


def seasonal_profile(orders: DataFrame) -> DataFrame:
    """Classical seasonal decomposition of the monthly revenue series:
    centered 12-month moving-average trend, per-month seasonal index,
    and the deseasonalized series -- the ratio-to-moving-average half of a
    Cleveland-style STL, kept to exactly the pieces two engines can
    agree on bit-for-bit.

    Float determinism: monthly revenue is a DECIMAL sum (exact,
    order-independent); the trend is a DECIMAL window sum over ROWS
    BETWEEN 5 PRECEDING AND 6 FOLLOWING divided once (only full
    12-row frames keep a trend); the seasonal index is an exact
    DECIMAL sum of the 6-dp-rounded ratios divided ONCE by the
    month's count and left UNROUNDED -- the 6-dp decimal numerator
    makes exact half-ulp ties at any further rounding boundary
    likely (sf0.01 hits 1.0391555 in month 09), and HALF_UP (JVM
    BigDecimal) vs round-via-double (C printf family) disagree
    exactly there, so the contract value is the raw IEEE quotient,
    which IS bit-deterministic (exact numerator, one division).

    Scale shape: the calendar aggregate map-side combines down to one
    row per month; the ordered window and the 12-row month-of-year
    index frame both run over that months-sized frame (a single task,
    which is exactly where a global-ordering window belongs -- the
    raw orders table is never windowed).  Returns (month, revenue,
    trend, ratio, month_of_year, seasonal_index, deseasonalized).
    """
    per_month = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.sum(F.col("o_totalprice").cast(_DEC)).alias("__rev"))
    w = Window.orderBy("month").rowsBetween(-5, 6)
    rev = F.col("__rev").cast("double")
    trend = F.when(
        F.count("*").over(w) == 12,
        F.sum("__rev").over(w).cast("double") / F.lit(12.0),
    )
    ratio = F.round(rev / trend, 6)
    monthly = per_month.select(
        "month",
        rev.alias("revenue"),
        trend.alias("trend"),
        ratio.alias("ratio"),
        F.substring("month", 6, 2).alias("month_of_year"),
    )
    idx = monthly.groupBy("month_of_year").agg(
        (
            F.sum(F.col("ratio").cast("decimal(18,6)")).cast("double")
            / F.count("ratio")
        ).alias("seasonal_index")
    )
    return monthly.join(F.broadcast(idx), "month_of_year").select(
        "month",
        "revenue",
        "trend",
        "ratio",
        "month_of_year",
        "seasonal_index",
        F.round(F.col("revenue") / F.col("seasonal_index"), 4).alias(
            "deseasonalized"
        ),
    )


def user_lifecycle(events: DataFrame, resurrect_days: int = 7) -> DataFrame:
    """Growth-accounting lifecycle rollup: every active (user, day) is
    NEW (first day ever), RETURNING (last activity within
    ``resurrect_days``), or RESURRECTED (a longer gap) -- the
    new/retained/resurrected ledger every DAU dashboard decomposes
    into, per the standard growth-accounting identity.

    Scale shape: dedup to (user, day) is one map-side-combinable
    aggregate; the lag window partitions BY USER (millions of small
    partitions, never a global sort); the final day rollup map-side
    combines to calendar size.  Returns per day: (day, n_active,
    n_new, n_returning, n_resurrected).
    """
    user_days = events.filter(F.col("user_id").isNotNull()).select(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    gap = F.datediff(
        F.col("day").cast("date"), F.lag("day").over(w).cast("date")
    )
    status = (
        F.when(gap.isNull(), "new")
        .when(gap <= resurrect_days, "returning")
        .otherwise("resurrected")
    )
    tagged = user_days.select("day", status.alias("status"))
    return tagged.groupBy("day").agg(
        F.count("*").alias("n_active"),
        F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).alias("n_new"),
        F.sum(F.when(F.col("status") == "returning", 1).otherwise(0)).alias(
            "n_returning"
        ),
        F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0)).alias(
            "n_resurrected"
        ),
    )


def supplier_similarity(
    lineitem: DataFrame,
    top_k: int = 5,
    max_suppliers_per_part: int = 200,
) -> DataFrame:
    """Supplier-to-supplier similarity by shared part catalogs: Jaccard
    over each supplier's distinct part set, pairs generated through the
    part-side INVERTED INDEX (the set-similarity-join recipe: a pair is
    enumerated once per shared part and counted, never supplier x
    supplier).  The relational twin of the document MinHash tier --
    same join shape, exact instead of sketched, for entity-resolution /
    substitute-supplier questions.

    Scale shape: dedup to (supplier, part) is one map-side-combinable
    aggregate; pair enumeration self-joins WITHIN part groups only, so
    cost is sum(suppliers_per_part^2) -- bounded by the
    ``max_suppliers_per_part`` df-cap (the tfidf discipline: a part
    carried by everyone says nothing about similarity and only feeds
    the quadratic; capped parts are dropped, stated, not silently
    sampled).  Per-supplier set sizes are a supplier-cardinality frame
    broadcast back.  Jaccard = inter / (|A| + |B| - inter) is ONE
    division of exact ints, left unrounded (bit-identical IEEE in any
    engine; rounding can land on half-ulp ties for power-of-two
    denominators).

    Output is each supplier's ``top_k`` most similar peers (jaccard
    desc, supp_b tie-break) -- an ABSOLUTE jaccard threshold cannot be
    scale-stable (overlap dilutes as the catalog grows: max pair
    jaccard is 0.19 at sf0.01 but 0.035 at sf0.1), while "my 5 nearest
    substitutes" is the question at any size, and the rank executes as
    WindowGroupLimit so each task ships its local top-k only.  Pairs
    are ENUMERATED once in canonical order (supp_a < supp_b) to halve
    the quadratic, then MIRRORED before ranking so every supplier --
    including the highest-keyed one -- sees all its neighbors, not
    just the higher-keyed half.  Returns (supp_a, supp_b, n_shared,
    n_a, n_b, jaccard, rank).
    """
    from pyspark.sql import Window

    from ..functions.caching import scoped_cache

    sp = scoped_cache(
        lineitem.select(
            F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
        ).distinct()
    )
    part_df = sp.groupBy("p").agg(F.count("*").alias("__df"))
    # cached both sides: the df-cap filter, the two size frames, and
    # the a/b pair legs would otherwise each re-run the distinct scan
    # (4 computations of the same exchange -- measured 9.4 s -> cached
    # once at sf0.1)
    sp_capped = scoped_cache(
        sp.join(
            part_df.filter(F.col("__df") <= max_suppliers_per_part).select(
                "p"
            ),
            "p",
        )
    )
    sizes = sp_capped.groupBy("s").agg(F.count("*").alias("n_parts"))
    a = sp_capped.select(F.col("p"), F.col("s").alias("supp_a"))
    b = sp_capped.select(F.col("p"), F.col("s").alias("supp_b"))
    inter = (
        a.join(b, "p")
        .filter(F.col("supp_a") < F.col("supp_b"))
        .groupBy("supp_a", "supp_b")
        .agg(F.count("*").alias("n_shared"))
    )
    jac = F.col("n_shared") / (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    )
    scored = (
        inter.join(
            F.broadcast(sizes.select(F.col("s").alias("supp_a"),
                                     F.col("n_parts").alias("n_a"))),
            "supp_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("s").alias("supp_b"),
                                     F.col("n_parts").alias("n_b"))),
            "supp_b",
        )
        .select("supp_a", "supp_b", "n_shared", "n_a", "n_b",
                jac.alias("jaccard"))
    )
    # mirror the canonical-order pairs so the top-k window sees each
    # supplier's FULL neighborhood (a < b enumeration alone would hide
    # every lower-keyed neighbor from a's list and give the max-keyed
    # supplier no list at all)
    mirrored = scored.unionByName(
        scored.select(
            F.col("supp_b").alias("supp_a"),
            F.col("supp_a").alias("supp_b"),
            "n_shared",
            F.col("n_b").alias("n_a"),
            F.col("n_a").alias("n_b"),
            "jaccard",
        )
    )
    w = Window.partitionBy("supp_a").orderBy(
        F.col("jaccard").desc(), "supp_b"
    )
    return mirrored.withColumn(
        "rank", F.row_number().over(w)
    ).filter(F.col("rank") <= top_k)


_AUTOCORR_LAGS = (1, 2, 3, 6, 12, 24)


def hourly_autocorr(events: DataFrame) -> DataFrame:
    """Traffic periodicity: Pearson autocorrelation of the hourly event
    volume per event type at lags 1/2/3/6/12/24 h -- the seasonality
    detector that tells a capacity planner (or an anomaly monitor
    baselining against 'same hour yesterday') whether the signal
    actually repeats at that period.

    Exactness: hourly counts are integers; every Pearson term (N, sum
    x, sum y, sum x^2, sum y^2, sum xy over the lag-aligned overlap) is
    an exact BIGINT aggregate, and the correlation is computed ONCE
    from those ints in a fixed double expression -- deterministic
    across engines with no rounding contract needed.  Missing hours
    simply produce no aligned pair (stated: gaps shrink N rather than
    imputing zeros).

    Scale shape: the hour rollup map-side combines to calendar size;
    lag alignment is an equi-join of that calendar frame to itself
    (hour = hour - lag) after a 6-row lag explode; the final aggregate
    is per (type, lag) -- every stage is hash-partitioned on small
    keys, the raw event table is touched once.
    """
    hours = events.groupBy(
        "event_type",
        F.floor(F.unix_millis("ts") / 3_600_000).alias("hour"),
    ).agg(F.count("*").alias("c"))
    lags = F.explode(
        F.array(*[F.lit(v) for v in _AUTOCORR_LAGS])
    ).alias("lag")
    cur = hours.select("event_type", "hour", F.col("c").alias("cx"), lags)
    prev = hours.select(
        "event_type",
        F.col("hour").alias("__ph"),
        F.col("c").alias("cy"),
    )
    pairs = cur.join(
        prev,
        (cur.event_type == prev.event_type)
        & (F.col("__ph") == F.col("hour") - F.col("lag")),
    ).select(cur.event_type, "lag", "cx", "cy")
    agg = pairs.groupBy("event_type", "lag").agg(
        F.count("*").alias("n_pairs"),
        F.sum("cx").alias("__sx"),
        F.sum("cy").alias("__sy"),
        F.sum(F.col("cx") * F.col("cx")).alias("__qx"),
        F.sum(F.col("cy") * F.col("cy")).alias("__qy"),
        F.sum(F.col("cx") * F.col("cy")).alias("__a"),
    )
    # cast the exact BIGINT sums to double BEFORE combining (the
    # established Pearson pattern at the trend fit above): n*qx with
    # qx ~ hours*c^2 silently wraps int64 once hourly counts grow,
    # while the same double expression is deterministic in any engine
    n = F.col("n_pairs").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    vx = n * F.col("__qx").cast("double") - sx * sx
    vy = n * F.col("__qy").cast("double") - sy * sy
    num = n * F.col("__a").cast("double") - sx * sy
    r = F.when(
        (vx > 0) & (vy > 0), num / (F.sqrt(vx) * F.sqrt(vy))
    )
    return agg.select("event_type", "lag", "n_pairs", r.alias("r"))


def forecast_baseline_report(events: DataFrame) -> DataFrame:
    """Forecast-baseline evaluation: how well does SEASONAL-NAIVE
    (predict this hour = same hour yesterday) beat NAIVE-1 (= previous
    hour) on the hourly event volume -- Hyndman's MASE framing, where
    any real forecasting model must first beat exactly these two frees.
    A capacity planner reads ``mase < 1`` as 'daily seasonality is
    real, baseline on same-hour-yesterday'.

    Exactness: hourly counts are integers, both absolute-error sums
    are exact BIGINTs over the SAME evaluable hours (those with both
    an h-24 and an h-1 observation -- gaps shrink the overlap, never
    impute), and MASE = err_seasonal / err_naive needs ONE division
    of those exact ints.  No rounding contract required anywhere.

    Scale shape: calendar-sized hour rollup (map-side combined), two
    equi-joins of that frame to itself at fixed offsets, one final
    per-type aggregate.  Returns (event_type, n_hours,
    mae_seasonal, mae_naive, mase).
    """
    hours = events.groupBy(
        "event_type",
        F.floor(F.unix_millis("ts") / 3_600_000).alias("hour"),
    ).agg(F.count("*").alias("c"))
    cur = hours.select("event_type", "hour", F.col("c").alias("c_now"))
    day = hours.select(
        "event_type", (F.col("hour") + 24).alias("hour"),
        F.col("c").alias("c_day"),
    )
    prev = hours.select(
        "event_type", (F.col("hour") + 1).alias("hour"),
        F.col("c").alias("c_prev"),
    )
    joined = cur.join(day, ["event_type", "hour"]).join(
        prev, ["event_type", "hour"]
    )
    agg = joined.groupBy("event_type").agg(
        F.count("*").alias("n_hours"),
        F.sum(F.abs(F.col("c_now") - F.col("c_day"))).alias("__es"),
        F.sum(F.abs(F.col("c_now") - F.col("c_prev"))).alias("__en"),
    )
    return agg.select(
        "event_type",
        "n_hours",
        (F.col("__es") / F.col("n_hours")).alias("mae_seasonal"),
        (F.col("__en") / F.col("n_hours")).alias("mae_naive"),
        F.when(
            F.col("__en") > 0, F.col("__es") / F.col("__en")
        ).alias("mase"),
    )


def top_movers(events: DataFrame, k: int = 10) -> DataFrame:
    """Half-over-half activity movers: the users whose event volume
    rose or fell hardest between the window's two halves (split at the
    fixed snapshot cutoff the versioned-snapshot family already uses),
    scored by the add-1-smoothed log volume ratio -- the triage list a
    growth or abuse analyst reads first.

    Determinism: counts are exact; the log ratio is rounded to 1e-6
    BEFORE ranking (libm ln() may differ in the last ulp across
    engines -- the tfidf discipline) with a user_id tie-break.

    Scale shape: one conditional-count aggregate per user (map-side
    combined), one global top-k per direction -- expressed as a rank
    window that Spark executes as WindowGroupLimit (each task ships
    only its local top-k, never the user table).  Returns per
    direction (RISER/FALLER) the top ``k``: (direction, rank, user_id,
    n_first, n_second, log_ratio).
    """
    cutoff = F.lit("2024-01-16").cast("timestamp")
    per_user = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum((F.col("ts") < cutoff).cast("long")).alias("n_first"),
            F.sum((F.col("ts") >= cutoff).cast("long")).alias("n_second"),
        )
    )
    score = F.round(
        F.log((F.col("n_second") + 1) / (F.col("n_first") + 1)), 6
    )
    scored = per_user.select(
        "user_id", "n_first", "n_second", score.alias("log_ratio")
    )
    w_rise = Window.orderBy(F.col("log_ratio").desc(), "user_id")
    w_fall = Window.orderBy(F.col("log_ratio").asc(), "user_id")
    risers = scored.select(
        F.lit("RISER").alias("direction"),
        F.row_number().over(w_rise).alias("rank"),
        "user_id", "n_first", "n_second", "log_ratio",
    ).filter(F.col("rank") <= k)
    fallers = scored.select(
        F.lit("FALLER").alias("direction"),
        F.row_number().over(w_fall).alias("rank"),
        "user_id", "n_first", "n_second", "log_ratio",
    ).filter(F.col("rank") <= k)
    return risers.unionByName(fallers)


def cohort_ltv(orders: DataFrame) -> DataFrame:
    """Cohort lifetime-value triangle: customers grouped by the month
    of their FIRST order, revenue tracked by month-age since that
    first order -- the cumulative-LTV-per-cohort curve every
    subscription/commerce dashboard draws, and the input to payback
    and CAC-ceiling decisions.

    Float determinism: revenue is decimal-exact per (cohort, age); the
    cumulative sum runs over the SAME decimal column (exact at any
    window order); LTV-per-member is a single division by the cohort
    size, unrounded (exact decimal numerator cast to double over an
    int -- identical IEEE in any engine).

    Scale shape: the first-order month is ONE per-customer aggregate
    (map-side combined); the triangle aggregate shuffles
    (cohort, age) -- calendar x calendar cardinality; the running
    window and the size join act on the triangle frame, never on
    orders.  Cohort size = distinct buyers at age 0 (by construction
    every cohort member buys in month 0).  Returns (cohort_month,
    age_months, n_buyers, revenue, cum_revenue, cum_ltv_per_member).
    """
    mkey = F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
    first = (
        orders.groupBy("o_custkey")
        .agg(F.min(mkey).alias("__cohort_key"))
    )
    joined = orders.join(first, "o_custkey").select(
        "o_custkey",
        "o_totalprice",
        F.col("__cohort_key").alias("ck"),
        (mkey - F.col("__cohort_key")).alias("age_months"),
    )
    tri = joined.groupBy("ck", "age_months").agg(
        F.count_distinct("o_custkey").alias("n_buyers"),
        F.sum(F.col("o_totalprice").cast(_DEC)).alias("__rev"),
    )
    w = (
        Window.partitionBy("ck")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sizes = tri.filter(F.col("age_months") == 0).select(
        "ck", F.col("n_buyers").alias("__size")
    )
    cohort_month = F.concat(
        F.floor(F.col("ck") / 12).cast("string"),
        F.lit("-"),
        F.lpad((F.col("ck") % 12 + 1).cast("string"), 2, "0"),
    )
    return (
        tri.withColumn("__cum", F.sum("__rev").over(w))
        .join(F.broadcast(sizes), "ck")
        .select(
            cohort_month.alias("cohort_month"),
            "age_months",
            "n_buyers",
            F.col("__rev").cast("double").alias("revenue"),
            F.col("__cum").cast("double").alias("cum_revenue"),
            (F.col("__cum").cast("double") / F.col("__size")).alias(
                "cum_ltv_per_member"
            ),
        )
    )


def fulfillment_sla_profile(
    lineitem: DataFrame, orders: DataFrame, sla_days: int = 90
) -> DataFrame:
    """Order-to-ship latency profile per order priority: exact mean,
    R-7 percentiles (p50/p90/p99, 6-dp rounded -- interpolation of
    integer day counts is engine-identical given identical IEEE
    inputs), and the share of line items blowing the ``sla_days`` SLA
    -- the operations-facing dual of the revenue tier.

    Scale shape: one lineitem-to-orders equi-join on orderkey (the
    fact table's own key -- at warehouse scale both sides are bucketed
    by it already), one hash aggregate per priority; delays are exact
    int day counts so the mean is a single division of exact ints.
    Returns (priority, n_lines, mean_delay_days, p50, p90, p99,
    pct_over_sla).
    """
    j = lineitem.select("l_orderkey", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderpriority", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).alias("__d"),
    )
    return j.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n_lines"),
        (F.sum("__d") / F.count("*")).alias("mean_delay_days"),
        F.round(F.percentile("__d", 0.5), 6).alias("p50"),
        F.round(F.percentile("__d", 0.9), 6).alias("p90"),
        F.round(F.percentile("__d", 0.99), 6).alias("p99"),
        (
            F.sum((F.col("__d") > sla_days).cast("long")) / F.count("*")
        ).alias("pct_over_sla"),
    )


def engagement_ratios(events: DataFrame) -> DataFrame:
    """DAU / WAU / MAU and the DAU/MAU stickiness ratio per calendar
    day -- the engagement panel every consumer product tracks, with
    the trailing windows computed SET-exactly (a user active twice in
    the window counts once) rather than as sums of daily actives.

    The trailing distinct-user windows come from one explode: each
    active (user, day) contributes to the 30 window-days it can be
    visible in, and a conditional distinct count per window-day reads
    DAU (offset 0), WAU (offset <= 6), and MAU (offset <= 29) in ONE
    aggregate.  Only days that are themselves active emit a row (the
    calendar join), so a silent feed produces gaps, not zeros --
    consistent with events_feed_gaps being the silence detector.

    Exactness: counts are integers; stickiness is one division.

    Scale shape: |user-days| x 30 rows into one hash aggregate keyed
    by day -- linear, map-side combinable, no window function at all;
    the active-day calendar is a broadcast.  Returns (day, dau, wau,
    mau, stickiness).
    """
    user_days = (
        events.filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.floor(F.unix_millis("ts") / 86_400_000).alias("d"),
        )
        .distinct()
    )
    active_days = user_days.select("d").distinct()
    contrib = user_days.select(
        "user_id",
        "d",
        F.explode(F.sequence(F.lit(0), F.lit(29))).alias("o"),
    ).select("user_id", (F.col("d") + F.col("o")).alias("wd"), "o")
    per_day = (
        contrib.join(
            F.broadcast(active_days.select(F.col("d").alias("wd"))), "wd"
        )
        .groupBy("wd")
        .agg(
            F.count_distinct(
                F.when(F.col("o") == 0, F.col("user_id"))
            ).alias("dau"),
            F.count_distinct(
                F.when(F.col("o") <= 6, F.col("user_id"))
            ).alias("wau"),
            F.count_distinct("user_id").alias("mau"),
        )
    )
    return per_day.select(
        F.date_format(
            F.timestamp_millis(F.col("wd") * 86_400_000), "yyyy-MM-dd"
        ).alias("day"),
        "dau",
        "wau",
        "mau",
        (F.col("dau") / F.col("mau")).alias("stickiness"),
    )


def returns_control_chart(lineitem: DataFrame) -> DataFrame:
    """Shewhart p-chart over the weekly RETURN RATE: each week's
    returned-line fraction against 3-sigma binomial control limits
    around the pooled rate -- the SPC gate that separates 'this week
    is noise' from 'the process changed' (the statistical upgrade of
    a fixed return-rate threshold).

    Exactness: weekly and pooled counts are exact ints; p_bar and each
    week's rate are single divisions; the limit sigma =
    sqrt(p_bar*(1-p_bar)/n_week) is one fixed double expression per
    row over those exact operands -- identical in any engine, no
    rounding contract.

    Scale shape: ONE conditional-count aggregate to week cardinality,
    the pooled rate a 1-row broadcast back over the week frame.
    Returns (week, n_lines, n_returned, rate, p_bar, ucl, lcl,
    out_of_control).
    """
    weekly = lineitem.groupBy(
        F.date_format(
            F.date_trunc("week", F.col("l_shipdate")), "yyyy-MM-dd"
        ).alias("week")
    ).agg(
        F.count("*").alias("n_lines"),
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias(
            "n_returned"
        ),
    )
    pooled = weekly.agg(
        (
            F.sum("n_returned").cast("double") / F.sum("n_lines")
        ).alias("p_bar")
    )
    rate = F.col("n_returned") / F.col("n_lines")
    sigma = F.sqrt(
        F.col("p_bar") * (1 - F.col("p_bar")) / F.col("n_lines")
    )
    ucl = F.col("p_bar") + 3 * sigma
    lcl = F.greatest(F.col("p_bar") - 3 * sigma, F.lit(0.0))
    return weekly.crossJoin(F.broadcast(pooled)).select(
        "week",
        "n_lines",
        "n_returned",
        rate.alias("rate"),
        "p_bar",
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        ((rate > ucl) | (rate < lcl)).alias("out_of_control"),
    )


def sourcing_concentration(lineitem: DataFrame) -> DataFrame:
    """Herfindahl-Hirschman sourcing-concentration index per part
    brand-bracket: HHI = sum(share^2) of each supplier's quantity
    share within the bracket -- the procurement-risk score (DOJ bands:
    < 0.15 competitive, < 0.25 moderate, else concentrated); a
    bracket sourced 90/10 from two suppliers is one bankruptcy away
    from a line-down.

    Keyed by part-key bracket (partkey // 100 -- category-cardinality)
    rather than raw part so the output is dashboard-sized at any SF.

    Exactness: quantities sum as DECIMAL (exact); HHI =
    sum(q_s^2) / (sum(q_s))^2 needs ONE division of exact decimal
    casts -- never a sum of per-supplier ratio doubles.

    Scale shape: two hash aggregates ((bracket, supplier) then
    bracket), both map-side combined.  Returns (bracket, n_suppliers,
    total_qty, hhi, band).
    """
    per_supp = lineitem.groupBy(
        F.floor(F.col("l_partkey") / 100).alias("bracket"),
        "l_suppkey",
    ).agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("__q"))
    agg = per_supp.groupBy("bracket").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("__q").alias("__tot"),
        F.sum(
            (F.col("__q") * F.col("__q")).cast("decimal(38,4)")
        ).alias("__sq"),
    )
    hhi = F.col("__sq").cast("double") / (
        F.col("__tot").cast("double") * F.col("__tot").cast("double")
    )
    band = (
        F.when(hhi < 0.15, "COMPETITIVE")
        .when(hhi < 0.25, "MODERATE")
        .otherwise("CONCENTRATED")
    )
    return agg.select(
        "bracket",
        "n_suppliers",
        F.col("__tot").cast("double").alias("total_qty"),
        hhi.alias("hhi"),
        band.alias("band"),
    )


def slo_burn_rates(
    events: DataFrame, budget: float = 0.05
) -> DataFrame:
    """Multi-window SLO burn-rate alerts (the Google SRE workbook
    recipe): the error-event fraction over a trailing 1 h and a
    trailing 6 h window, each expressed as a MULTIPLE of the error
    budget -- page when BOTH windows burn hot (fast-burn confirmed by
    the long window, so a single bad minute cannot page and a slow
    leak still does).

    Exactness: windowed counts are exact ints via the engagement-
    ratios explode pattern (each hour's traffic contributes to the 6
    trailing window-hours it is visible in -- no window function);
    burn = (errors/total)/budget is a fixed double expression.

    Returns per active hour: (hour_ms, n_1h, err_1h, burn_1h, n_6h,
    err_6h, burn_6h, page) -- page = burn_1h > 2 AND burn_6h > 1.
    """
    hours = events.groupBy(
        F.floor(F.unix_millis("ts") / 3_600_000).alias("h")
    ).agg(
        F.count("*").alias("n"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("e"),
    )
    contrib = hours.select(
        "n",
        "e",
        F.explode(F.sequence(F.lit(0), F.lit(5))).alias("o"),
        F.col("h"),
    ).select("n", "e", "o", (F.col("h") + F.col("o")).alias("wh"))
    win = (
        contrib.join(
            F.broadcast(hours.select(F.col("h").alias("wh"))), "wh"
        )
        .groupBy("wh")
        .agg(
            F.sum(F.when(F.col("o") == 0, F.col("n"))).alias("n_1h"),
            F.sum(F.when(F.col("o") == 0, F.col("e"))).alias("err_1h"),
            F.sum("n").alias("n_6h"),
            F.sum("e").alias("err_6h"),
        )
    )
    burn1 = F.col("err_1h") / F.col("n_1h") / budget
    burn6 = F.col("err_6h") / F.col("n_6h") / budget
    return win.select(
        (F.col("wh") * 3_600_000).alias("hour_ms"),
        "n_1h",
        "err_1h",
        burn1.alias("burn_1h"),
        "n_6h",
        "err_6h",
        burn6.alias("burn_6h"),
        ((burn1 > 2.0) & (burn6 > 1.0)).alias("page"),
    )
