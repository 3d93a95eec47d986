"""Temporal join operators Spark's API lacks as primitives (the brief's
canonical examples of custom operators): AS-OF join and banded RANGE
join, each expressed as a composition of existing DataFrame ops chosen
for their shuffle shape at corpus scale.

as_of_join -- the union-window construction: instead of a range join
(which Catalyst can only plan as broadcast-nested-loop or a skewy
inequality sort-merge), both sides are unioned with a source tag and a
single per-key window takes the last right-side payload at-or-before
each left row.  ONE shuffle on the key, no pair explosion, no range
predicate -- the standard scale-safe as-of recipe.

range_join_bucketed -- the interval-bucketing construction: right rows
land in one coarse time bucket, left rows explode to the (at most two,
for window-sized buckets) buckets their band overlaps, and a plain
equi-join on (key, bucket) + exact band filter replaces the O(n*m)
inequality join.  Candidates are bounded by per-bucket occupancy --
the same linearization argument as LSH banding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    payload_cols: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """For each left row: the latest right row with ts <= left.ts,
    per key (left rows keep NULL payload when no right row precedes).

    The right payload travels as ONE struct so all its columns come
    from the same right row atomically.  At equal timestamps the right
    row wins (<= semantics, matching DuckDB's ``ASOF JOIN .. >=``);
    ``tie_col`` breaks ties among right rows sharing a timestamp
    (highest wins -- last-write style)."""
    tie = F.col(tie_col) if tie_col else F.lit(0)
    r = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("__is_left"),
        tie.alias("__tie"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__asof"),
    )
    l = left.select(
        *left.columns,
        F.lit(1).alias("__is_left"),
        # null placeholders typed from the right side so unionByName
        # works for ANY tie/payload column types
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(r.schema["__asof"].dataType).alias("__asof"),
    )
    unioned = r.unionByName(l, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__is_left").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn("__asof", F.last("__asof", ignorenulls=True).over(w))
    return filled.filter(F.col("__is_left") == 1).drop("__is_left", "__tie")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    lo_ms: int,
    hi_ms: int,
) -> DataFrame:
    """Pairs (left, right) sharing ``keys`` with
    ``right.ts in [left.ts + lo_ms, left.ts + hi_ms)``.

    Right rows are bucketed once at width (hi-lo); left rows explode to
    the <=2 buckets their band can overlap; equi-join then exact filter.
    Left columns keep their names, right columns gain ``r_``."""
    width = hi_ms - lo_ms
    if width <= 0:
        raise ValueError("range_join_bucketed: need hi_ms > lo_ms")

    def floor_bucket(col):
        # floor division, exact in integer arithmetic: pmod is always
        # non-negative, so (x - pmod(x, w)) is the largest multiple of w
        # <= x even for negative x.  A bare (x / w).cast('long') would
        # truncate toward zero and put negative timestamps on opposite
        # sides of zero into inconsistent buckets, silently dropping
        # valid pairs.
        return ((col - F.pmod(col, F.lit(width))) / width).cast("long")

    rb = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        floor_bucket(F.col(ts_col)).alias("__bucket"),
    )
    lo_b = floor_bucket(F.col(ts_col) + lo_ms)
    hi_b = floor_bucket(F.col(ts_col) + hi_ms - 1)
    lb = left.withColumn(
        "__bucket", F.explode(F.array_distinct(F.array(lo_b, hi_b)))
    )
    on = [F.col(k) == F.col(f"r_{k}") for k in keys] + [
        lb["__bucket"] == rb["__bucket"]
    ]
    joined = lb.join(rb, on)
    band = (F.col(f"r_{ts_col}") >= F.col(ts_col) + lo_ms) & (
        F.col(f"r_{ts_col}") < F.col(ts_col) + hi_ms
    )
    return joined.filter(band).drop("__bucket", *[f"r_{k}" for k in keys])
