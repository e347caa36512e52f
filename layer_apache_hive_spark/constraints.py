"""Table constraints — declaration, validation, and write-time
enforcement [upstream: Hive 3 ql/ddl constraint support (HIVE-16575:
PRIMARY KEY / FOREIGN KEY ... RELY NOVALIDATE, HIVE-16605: NOT NULL
ENFORCED, CHECK constraints in Hive 3.0); public-knowledge
reconstruction, SURVEY.md §0].

Hive 3 splits constraints into ENFORCED (NOT NULL, CHECK — validated
on write, the write fails on violation) and informational RELY
NOVALIDATE (PRIMARY KEY / UNIQUE / FOREIGN KEY — trusted by the CBO
for join cardinality, never validated). Open-source Spark has neither
statement surface (Delta added CHECK constraints the same way this
module does), so the engine provides them as:

* a declarative :class:`Constraint` description per table,
* :func:`violation_counts` — ONE distributed single-pass aggregate
  that scores every constraint over a candidate batch (no per-
  constraint scan, no driver-side row loop: a conditional count per
  ENFORCED constraint plus COUNT DISTINCT for key constraints, all
  in the same Aggregate operator), and
* :func:`enforce` — the Delta-style write gate: reject the batch if
  any ENFORCED constraint is violated, BEFORE a byte lands.

SQL semantics respected: CHECK passes on NULL (three-valued logic —
a NULL predicate is not a violation; declare NOT NULL separately),
NOT NULL is a CHECK on ``col IS NOT NULL``, PRIMARY KEY/UNIQUE count
``n_rows − n_distinct_keys`` duplicate slots.

Scale: validation is a map-side-combinable aggregate over the batch
being written — O(|batch|), one shuffle to a single row, independent
of table size. COUNT DISTINCT on the key is the one genuinely
expensive term (exact, two-phase); Hive's RELY NOVALIDATE exists
precisely because validating PK on every write is a scan — enforce()
therefore lets callers down-grade key constraints to informational,
same trade-off, made explicit.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ConstraintViolation(Exception):
    """An ENFORCED constraint failed on the batch; nothing was written."""


@dataclass(frozen=True)
class Constraint:
    name: str
    kind: str  # 'NOT NULL' | 'CHECK' | 'PRIMARY KEY' | 'UNIQUE'
    expr: str | None = None  # boolean SQL each row must satisfy
    cols: tuple[str, ...] = ()  # key columns for PRIMARY KEY / UNIQUE
    enforced: bool = True  # False = informational (RELY NOVALIDATE)

    def _violations(self) -> Column:
        if self.kind in ("NOT NULL", "CHECK"):
            pred = (
                f"({self.expr}) IS NOT NULL AND NOT ({self.expr})"
                if self.kind == "CHECK"
                # NOT NULL: a NULL predicate IS the violation
                else f"NOT ({self.expr})"
            )
            return F.count(F.when(F.expr(pred), F.lit(1)))
        if self.kind in ("PRIMARY KEY", "UNIQUE"):
            nonnull = " AND ".join(f"{c} IS NOT NULL" for c in self.cols)
            # duplicate slots among fully-non-null keys (SQL UNIQUE:
            # NULLs never conflict with each other)
            dup = F.count(F.when(F.expr(nonnull), F.lit(1))) - F.count_distinct(
                *[F.col(c) for c in self.cols]
            )
            if self.kind == "PRIMARY KEY":
                # PK additionally forbids NULL key parts
                return dup + F.count(F.when(~F.expr(nonnull), F.lit(1)))
            return dup
        raise ValueError(f"unknown constraint kind: {self.kind!r}")


def not_null(name: str, col: str, enforced: bool = True) -> Constraint:
    return Constraint(name, "NOT NULL", expr=f"{col} IS NOT NULL",
                      enforced=enforced)


def check(name: str, expr: str, enforced: bool = True) -> Constraint:
    return Constraint(name, "CHECK", expr=expr, enforced=enforced)


def primary_key(name: str, *cols: str, enforced: bool = False) -> Constraint:
    """Hive default is RELY NOVALIDATE (informational): enforcing PK
    means an exact COUNT DISTINCT per write — opt in explicitly."""
    return Constraint(name, "PRIMARY KEY", cols=tuple(cols),
                      enforced=enforced)


def violation_counts(
    df: DataFrame, constraints: list[Constraint]
) -> DataFrame:
    """Score every constraint over ``df`` in ONE aggregate pass.

    Returns (constraint_name, kind, enforced, n_checked, n_violations)
    — one row per constraint, computed distributed (a stack() reshape
    of a single 1-row Aggregate; no collect)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(constraints):
        aggs.append(c._violations().alias(f"_v{i}"))
    one = df.agg(*aggs)
    parts = []
    for i, c in enumerate(constraints):
        parts += [
            f"'{c.name}'",
            f"'{c.kind}'",
            str(c.enforced).lower(),
            "_n",
            f"_v{i}",
        ]
    return one.selectExpr(
        f"stack({len(constraints)}, {', '.join(parts)}) AS "
        "(constraint_name, kind, enforced, n_checked, n_violations)"
    )


def enforce(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Write gate: raise :class:`ConstraintViolation` naming every
    violated ENFORCED constraint, or return ``df`` untouched for the
    caller to write. Informational constraints are skipped — exactly
    Hive's RELY NOVALIDATE contract. The validation is one bounded
    scalar collect (a 1-row aggregate), the documented driver-side-
    scalar exception."""
    active = [c for c in constraints if c.enforced]
    if not active:
        return df
    row = violation_counts(df, active).collect()
    bad = {r.constraint_name: r.n_violations for r in row
           if r.n_violations > 0}
    if bad:
        raise ConstraintViolation(
            "batch rejected, nothing written: " + ", ".join(
                f"{name} ({n} violations)" for name, n in sorted(bad.items())
            )
        )
    return df
