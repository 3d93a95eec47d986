"""Skew-mitigation utilities for hot keys.

AQE's skew-join splitting covers sort-merge joins automatically; these
helpers cover the two cases it doesn't:

- ``salted_aggregate``: a groupBy where one key holds a large share of
  all rows (a hot binlog_file, an empty-string key, a null-ish bucket).
  Two-phase: aggregate on (key, salt) first -- spreading the hot key
  over ``n_salts`` reducers -- then merge the partials.  Works for any
  algebraic aggregate (sum/count/min/max), which is what the engine's
  summary counters are.

- ``salted_broadcastable_join``: a large-x-small join where the small
  side fits in a broadcast but the large side's key is skewed.  With a
  broadcast there is no shuffle at all, so skew is moot -- the helper
  exists to make that decision explicit and assert the small side really
  is small (guarding against silently planning a 100 GB broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__salt"


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}.  count merges with sum in phase 2.

    The salt is ``pmod(hash(every column), n_salts)`` -- deterministic
    row-for-row (same input -> same salt -> same phase-1 partials on any
    rerun or recomputed partition), unlike a rand() salt, while still
    spreading a hot KEY's rows across salts because the hash covers the
    non-key columns too.  Fully duplicate rows co-locate on one salt,
    which only narrows spread if a key's rows are mostly identical --
    harmless for algebraic aggregates.
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    salted = df.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*keys, SALT_COL).agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(out).alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )


def salted_broadcastable_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    max_small_rows: int = 10_000_000,
) -> DataFrame:
    """Broadcast the small side (skew-immune: no shuffle of the large
    side at all), refusing if the small side is unexpectedly large."""
    n = small.count()
    if n > max_small_rows:
        raise ValueError(
            f"small side has {n} rows > max_small_rows={max_small_rows}; "
            "a broadcast would risk OOM -- use a shuffled join with AQE "
            "skew handling instead"
        )
    return large.join(F.broadcast(small), on=on, how=how)


def salted_shuffle_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Big-big shuffle join with one HOT-KEYED side: the skewed side
    gets a deterministic row-level salt appended to the join key, the
    other side is REPLICATED n_salts ways (explode of a literal array),
    and the equi-join runs on (keys..., salt) -- a hot key's rows land
    on n_salts reducers instead of one.

    When to reach for this instead of AQE's skew-join split: AQE only
    splits at shuffle-read time inside a SortMergeJoin stage; a salted
    plan also survives where AQE can't act (stream-stream joins, a
    join feeding a same-key aggregate that would re-concentrate, or a
    key so hot that even AQE's split granularity leaves a straggler).
    Cost model is explicit: the other side's shuffle volume multiplies
    by n_salts -- size n_salts to the skew factor, not higher.

    The salt is pmod(hash(all skewed-side columns), n_salts): the same
    determinism contract as salted_aggregate (stable under retries and
    recomputed partitions, spreads a hot key because non-key columns
    vary).  Join-key columns are dropped from ``other`` after the join
    (same names), so the output schema matches a plain
    ``skewed.join(other, on, how)``."""
    if how not in ("inner", "left"):
        raise ValueError("salted_shuffle_join supports inner/left only")
    s = skewed.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    )
    o = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return s.join(o, on=[*on, SALT_COL], how=how).drop(SALT_COL)


def auto_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    broadcast_rows: int = 1_000_000,
    skew_cut: float = 8.0,
    n_salts: int = 8,
) -> tuple[DataFrame, str]:
    """Execute an equi-join through the planner's decision ladder
    (analytics.join_plan_report made actionable): broadcast when a
    side fits, salted shuffle when one key owns more than ``skew_cut``
    x the mean per-key output, plain shuffle (AQE's problem) otherwise.

    The planning pass costs two key-count aggregates and a key-sized
    join -- at 100 TB you pay key-cardinality up front instead of
    discovering the straggler at hour three.  The result rows are
    IDENTICAL for every strategy (that is the point); only the physical
    plan changes.  Returns (joined_frame, strategy)."""
    lc = left.groupBy(*on).agg(F.count("*").alias("__nl"))
    rc = right.groupBy(*on).agg(F.count("*").alias("__nr"))
    stats = (
        lc.join(rc, on)
        .agg(
            F.sum(F.col("__nl") * F.col("__nr")).alias("est"),
            F.count("*").alias("keys"),
            F.max(F.col("__nl") * F.col("__nr")).alias("top"),
        )
        .crossJoin(
            lc.agg(F.sum("__nl").alias("n_left")).crossJoin(
                rc.agg(F.sum("__nr").alias("n_right"))
            )
        )
        .collect()[0]
    )  # five scalars -- the planner's whole footprint on the driver
    n_left, n_right = stats.n_left or 0, stats.n_right or 0
    skew = (
        (stats.top * stats.keys / stats.est) if stats.est else 0.0
    )
    if n_right <= broadcast_rows:
        return left.join(F.broadcast(right), on, how), "broadcast"
    if n_left <= broadcast_rows:
        # the small side is the LEFT: inner commutes, so flip and hash-
        # broadcast it; an OUTER join cannot hash-broadcast its
        # preserved side (Spark would silently ignore the hint), so
        # outer joins with only a small left fall through to the
        # shuffle tiers instead of claiming a broadcast that never runs
        if how == "inner":
            return right.join(F.broadcast(left), on, how).select(
                *left.columns,
                *[c for c in right.columns if c not in left.columns],
            ), "broadcast"
    if skew > skew_cut:
        return salted_shuffle_join(left, right, on, n_salts=n_salts, how=how), (
            "salted_shuffle"
        )
    return left.join(right, on, how), "shuffle"
