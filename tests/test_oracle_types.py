"""Type-representation gate for the oracle corpus.

Rounds 3-4 burned on a single bug class: DuckDB types ``SUM(CASE …)``
(and window SUMs, factorial, etc.) as HUGEINT (int128), and DuckDB's
pandas bridge lowers HUGEINT to **float64** — so the oracle frame holds
``2014.0`` where Spark holds int64 ``2014``. Values compare equal under
``check_dtype=False``, but a representation-sensitive driver hash
rejects it. Two permanent defenses live here:

1. A ``DESCRIBE``-sweep over every registered oracle asserting no
   HUGEINT / unsigned output column anywhere (the authoring-time gate —
   write ``CAST(SUM(…) AS BIGINT)`` in the oracle).
2. A unit test pinning that ``compare_frames`` itself now flags
   integer-vs-float dtype drift (the verification-time gate — the four
   local replicate artifacts can no longer green a frame the driver
   hash would redden).
"""

from __future__ import annotations

import pandas as pd
import pytest

from layer_apache_hive_spark.oracle_compare import compare_frames
from layer_apache_hive_spark.registry import _REGISTRY, _load_all_modules

_load_all_modules()
_ORACLE_IDS = sorted(qid for qid, q in _REGISTRY.items() if q.oracle)

# Types whose client-bridge lowering silently changes the value
# representation (HUGEINT -> float64; unsigned ints -> widened/float;
# DECIMAL -> float64 in DuckDB pandas vs Decimal objects in Spark).
# No oracle may emit them in its OUTPUT schema — use them freely in
# intermediate math, then CAST the final column to BIGINT/DOUBLE.
_BANNED = (
    "HUGEINT",
    "UHUGEINT",
    "UBIGINT",
    "UINTEGER",
    "USMALLINT",
    "UTINYINT",
    "DECIMAL",
)


@pytest.mark.parametrize("qid", _ORACLE_IDS)
def test_oracle_output_types_are_portable(oracle_con, qid):
    desc = oracle_con.execute(f"DESCRIBE {_REGISTRY[qid].oracle}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in desc
        if any(b in typ.upper() for b in _BANNED)
    ]
    assert not bad, (
        f"{qid}: oracle emits non-portable integer type(s) {bad}; "
        f"cast to BIGINT in the oracle SQL (DuckDB lowers these to "
        f"float64 in pandas, which a driver value-hash rejects)"
    )


def test_comparator_flags_int_float_drift():
    got = pd.DataFrame({"n": pd.Series([2014], dtype="int64")})
    want = pd.DataFrame({"n": pd.Series([2014.0], dtype="float64")})
    problems = compare_frames(got, want)
    assert problems and "dtype-kind" in problems[0]


def test_comparator_accepts_matching_kinds():
    got = pd.DataFrame(
        {"n": pd.Series([1, 2], dtype="int64"), "x": [0.5, 1.5]}
    )
    want = pd.DataFrame(
        {"n": pd.Series([2, 1], dtype="int64"), "x": [1.5, 0.5]}
    )
    assert compare_frames(got, want) == []


def test_comparator_ignores_nullable_float_pair():
    # NULL-bearing integer columns lower to float64 on BOTH engines —
    # same kind on both sides must stay green.
    got = pd.DataFrame({"n": pd.Series([1.0, None], dtype="float64")})
    want = pd.DataFrame({"n": pd.Series([None, 1.0], dtype="float64")})
    assert compare_frames(got, want) == []
