"""Hilbert-curve layout keys: the locality-improving sibling of
Z-order (functions/zorder.py has the pruning rationale and the write
recipe -- both keys drop into the same repartitionByRange +
sortWithinPartitions pattern).

Why offer both: the Morton curve's bit-interleave has long diagonal
jumps (at every power-of-two boundary the curve teleports across the
square), so a sorted run can span distant regions in key space and
widen per-file min/max stats.  The Hilbert curve visits cells so that
CONSECUTIVE curve positions are always ADJACENT cells -- measured
clustering of range queries is strictly better (Moon et al., "Analysis
of the Clustering Properties of the Hilbert Space-Filling Curve",
TKDE 2001), which is why table formats added `OPTIMIZE ... HILBERT`
next to ZORDER.  The price is a stateful per-level rotation instead of
a stateless interleave.

Implementation: the classic 16-level xy2d walk (rx/ry quadrant bits,
d += s*s*((3*rx) XOR ry), conditional reflect + swap) as ONE
``aggregate`` fold over the literal array of level sizes with a
(x, y, d) STRUCT accumulator -- JVM-side, no UDF, no shuffle.  The
fold matters: unrolling the walk into a Column chain (the zorder_key
trick) explodes EXPONENTIALLY here, because every level reads the
previous level's x and y more than once (~3^levels nodes hangs the
analyzer; measured).  Same reason the DuckDB twin
(``hilbert_sql_ctes``) is a LINEAR chain of 16 CTEs rather than one
substituted expression.

Keys fold into ``bits`` bits via pmod like zorder_key (layout wants
locality, not uniqueness); the XOR rides as arithmetic CASE
((3*rx) XOR ry == ry when rx=0 else 3-ry) so both engines share
integer-only operations.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def hilbert_key(a: Column, b: Column, bits: int = 16) -> Column:
    """d = position of cell (a mod 2^bits, b mod 2^bits) along the
    Hilbert curve of order ``bits`` -- a ``2*bits``-bit key."""
    x0 = F.pmod(a.cast("long"), F.lit(1 << bits))
    y0 = F.pmod(b.cast("long"), F.lit(1 << bits))
    levels = F.array(
        *[F.lit(1 << i).cast("long") for i in range(bits - 1, -1, -1)]
    )
    zero = F.struct(
        x0.alias("x"), y0.alias("y"), F.lit(0).cast("long").alias("d")
    )

    def step(acc: Column, s: Column) -> Column:
        x, y, d = acc["x"], acc["y"], acc["d"]
        rx = F.when(x.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        nd = d + s * s * F.when(rx == 0, ry).otherwise(F.lit(3) - ry)
        nx = F.when(
            ry == 0, F.when(rx == 1, s - 1 - y).otherwise(y)
        ).otherwise(x)
        ny = F.when(
            ry == 0, F.when(rx == 1, s - 1 - x).otherwise(x)
        ).otherwise(y)
        return F.struct(nx.alias("x"), ny.alias("y"), nd.alias("d"))

    return F.aggregate(levels, zero, step, lambda acc: acc["d"])


def hilbert_sql_ctes(
    a: str, b: str, source_sql: str, keep_cols: str, bits: int = 16
) -> str:
    """The identical walk as a linear CTE chain for the DuckDB oracle:
    ``WITH h0 AS (SELECT {keep_cols}, x, y, 0 AS d FROM ...), h1 AS
    (...), ...`` -- returns the full WITH clause text ending in a
    final CTE named ``hk`` exposing ``keep_cols`` + ``h_key``.
    Non-negative mod spelled out because DuckDB's ``%`` keeps the
    dividend's sign (the zorder_key_sql lesson)."""
    m = 1 << bits
    parts = [
        f"h0 AS (SELECT {keep_cols}, "
        f"(({a} % {m}) + {m}) % {m} AS x, "
        f"(({b} % {m}) + {m}) % {m} AS y, "
        f"CAST(0 AS BIGINT) AS d FROM {source_sql})"
    ]
    lvl = 0
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        prev, cur = f"h{lvl}", f"h{lvl + 1}"
        parts.append(
            f"{cur} AS (SELECT {keep_cols},\n"
            f"  CASE WHEN (y & {s}) = 0 THEN"
            f" (CASE WHEN (x & {s}) > 0 THEN {s - 1} - y ELSE y END)"
            f" ELSE x END AS x,\n"
            f"  CASE WHEN (y & {s}) = 0 THEN"
            f" (CASE WHEN (x & {s}) > 0 THEN {s - 1} - x ELSE x END)"
            f" ELSE y END AS y,\n"
            f"  d + {s}::BIGINT * {s} * (CASE WHEN (x & {s}) = 0 THEN"
            f" (CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
            f" ELSE (CASE WHEN (y & {s}) > 0 THEN 2 ELSE 3 END) END) AS d"
            f"\n  FROM {prev})"
        )
        lvl += 1
    parts.append(f"hk AS (SELECT {keep_cols}, d AS h_key FROM h{lvl})")
    return "WITH " + ",\n".join(parts)
