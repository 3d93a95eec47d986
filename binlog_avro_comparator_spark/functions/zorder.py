"""Z-order (Morton) layout keys: multi-dimensional data clustering for
scan pruning.

Parquet prunes row groups with per-column min/max stats, but a sort on
ONE column destroys locality on every other: after `ORDER BY
l_partkey`, a predicate on l_suppkey still scans every file.  The
Z-order curve interleaves the BITS of several keys, so rows close on
the curve are close in every dimension at once -- sorting the table by
z_key keeps min/max ranges tight for ALL interleaved columns, and
point/range predicates on any of them prune most files.  This is the
published multi-dimensional-clustering recipe table formats expose as
`OPTIMIZE ... ZORDER BY`; here it is a plain column expression any
writer can use.

At 100 TB the write pattern is::

    df.withColumn("z", zorder_key(F.col("a"), F.col("b")))
      .repartitionByRange(n_files, "z")      # range partition = file
      .sortWithinPartitions("z")             # tight stats inside files
      .write.parquet(...)

-- one range shuffle, no global sort, and every downstream scan with a
predicate on `a` OR `b` prunes.  The expression itself is a pure
bitwise literal chain: JVM whole-stage-codegen, no UDF, no shuffle.

Keys are folded into ``bits`` bits via pmod, the standard coarse
bucketing (layout wants LOCALITY, not uniqueness -- collisions just
co-locate rows, which is the point).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two integer columns into a
    ``2*bits``-bit Morton key (a's bits at even positions, b's at odd).
    Deterministic, engine-portable integer arithmetic (the DuckDB twin
    spells out the same shift/mask chain)."""
    az = F.pmod(a.cast("long"), F.lit(1 << bits))
    bz = F.pmod(b.cast("long"), F.lit(1 << bits))
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(az, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(bz, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return z


def zorder_key_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical interleave as a SQL expression string (DuckDB
    oracle twin of ``zorder_key``).  The fold uses a non-negative mod
    -- ``((x % m) + m) % m`` -- because DuckDB's ``%`` keeps the
    dividend's sign while Spark's ``pmod`` is always non-negative;
    without it the two interleaves diverge on negative keys."""
    m = 1 << bits
    terms = []
    for i in range(bits):
        # every term fully parenthesized: DuckDB gives << and | equal
        # left-associative precedence, so a bare chain mis-parses
        az = f"((({a} % {m}) + {m}) % {m})"
        bz = f"((({b} % {m}) + {m}) % {m})"
        terms.append(f"((({az} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({bz} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_key_n(cols: list[Column], bits: int = 16) -> Column:
    """N-column Morton interleave: column j's bit i lands at position
    ``i * n + j`` -- the 2-column ``zorder_key`` generalized so a
    layout can cluster three or four predicate columns at once (the
    key is ``n * bits`` wide; keep ``n * bits <= 62``).  Same pmod
    fold, same pure-codegen bitwise chain."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"zorder_key_n: {n} x {bits} bits exceeds a long")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cz = F.pmod(c.cast("long"), F.lit(1 << bits))
        for i in range(bits):
            bit = F.shiftright(cz, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_key_n_sql(names: list[str], bits: int = 16) -> str:
    """The identical n-column interleave as SQL text (DuckDB twin of
    ``zorder_key_n``); same non-negative-mod and full-parenthesization
    rules as ``zorder_key_sql``."""
    n = len(names)
    m = 1 << bits
    terms = []
    for j, a in enumerate(names):
        az = f"((({a} % {m}) + {m}) % {m})"
        for i in range(bits):
            terms.append(f"((({az} >> {i}) & 1) << {i * n + j})")
    return "(" + " | ".join(terms) + ")"
