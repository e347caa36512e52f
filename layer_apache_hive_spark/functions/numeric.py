"""Deterministic numeric aggregation helpers.

Floating-point SUM/AVG are accumulation-order dependent: Spark's
partial (map-side) + final two-phase aggregation over N partitions
sums in a different order than a single-threaded engine, so the last
ulps of a double sum differ run-to-run and engine-to-engine. For
oracle value-hash parity (SURVEY.md §5.2) we accumulate exactly:

    cast each double to DECIMAL(p, s)  → one deterministic rounding
    SUM the decimals                   → exact, order-independent
    cast the total back to DOUBLE      → one deterministic rounding

Both Spark and DuckDB implement this identically, so results are
bit-identical regardless of parallelism. At 100 TB this costs a wider
accumulator per group (decimal vs double) — negligible against scan
cost, and it keeps map-side partial aggregation fully intact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 4 keeps cents-level data exact; precision 38 (max) leaves
# 34 integer digits of headroom — enough for ~1e30-row sums.
_PREC = 38
_SCALE = 4


def dsum(col: Column | str, scale: int = _SCALE) -> Column:
    """Order-independent SUM of a double column, returned as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({_PREC},{scale})")).cast("double")


def davg(col: Column | str, scale: int = _SCALE) -> Column:
    """Order-independent AVG: exact decimal sum / count, as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def sql_dsum(expr: str, scale: int = _SCALE) -> str:
    """DuckDB twin of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({_PREC},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = _SCALE) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"
