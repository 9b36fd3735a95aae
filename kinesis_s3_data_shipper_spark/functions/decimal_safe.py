"""Engine-reproducible aggregation over double columns.

Summing IEEE doubles is order-dependent, and Spark's partial/final
aggregation order differs run-to-run and engine-to-engine — so a raw
``SUM(double)`` can never hash-match a DuckDB oracle bit-for-bit.

The fix: cast to DECIMAL before aggregating. Decimal arithmetic is
exact and associative, so the sum is identical regardless of partition
order or engine, and casting the exact decimal result back to DOUBLE is
a single deterministic conversion both engines perform identically.
(The double→decimal cast itself is unambiguous: a binary double can
never land exactly halfway between two scale≥1 decimals, so there is no
rounding-mode divergence to worry about.)

This costs a few % over native double sums but buys bit-exact
reproducibility — the property the correctness gate (and any sane
large-scale pipeline) actually wants. Map-side partial aggregation
still applies: decimal sums are still one pass, still codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Default decimal type for measure columns. Scale 6 comfortably covers
#: the test tables' 2-dp money / small-fraction values; precision 18
#: keeps products within decimal(38) bounds.
DEC = "decimal(18,6)"


def dec(col: Column | str, typ: str = DEC) -> Column:
    """Cast a (double) measure column to exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: Column | str, alias: str, typ: str = DEC) -> Column:
    """Order-independent, engine-exact SUM(double) → double."""
    return F.sum(dec(col, typ)).cast("double").alias(alias)


def davg(col: Column | str, alias: str, typ: str = DEC) -> Column:
    """Deterministic AVG: exact decimal sum, then one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, typ)).cast("double") / F.count(c)).alias(alias)


# The matching DuckDB oracle spellings, kept next to the Spark ones so
# the two sides evolve together:
#   dsum(x)  ≡  CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)
#   davg(x)  ≡  CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(x)
def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
            f" / COUNT({expr}) AS {alias}")


def fixed2_str(col: Column | str) -> Column:
    """Engine-exact 2-decimal string rendering of a double, valid at
    ANY magnitude. A bare double→string cast diverges between engines
    at |x| >= 1e7 (Java flips to scientific notation, DuckDB stays
    plain decimal), so renderings that feed a hash-checked output go
    through this instead: ROUND(x, 2) — half-away-from-zero in both
    engines — then DECIMAL(38,2), whose string form is plain decimal
    with exactly two fraction digits everywhere (range 1e36, beyond
    any realistic measure). Pair with :func:`sql_fixed2_str`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, 2).cast("decimal(38,2)").cast("string")


def sql_fixed2_str(expr: str) -> str:
    return f"CAST(CAST(ROUND({expr}, 2) AS DECIMAL(38,2)) AS VARCHAR)"
