"""Cross-engine result comparison used by tests and scripts/verify_contract.

Mirrors the driver harness semantics (__spark_entry__.py docstring):
columns sorted by name, rows compared order-insensitively, values
exactly equal. Normalization handles the representation gaps between
Spark-via-Arrow and DuckDB pandas output (tz-aware vs naive
timestamps, datetime.date vs datetime64, lists vs tuples, Decimal).
"""

from __future__ import annotations

import datetime
import decimal

import numpy as np
import pandas as pd


def _normalize_object_cell(v):
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(
            float(x) if isinstance(x, decimal.Decimal) else x for x in v
        )
    if isinstance(v, decimal.Decimal):
        # DuckDB's pandas output lowers DECIMAL to float64; Spark keeps
        # Decimal objects — compare on the common float representation.
        return float(v)
    return v


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name; canonicalize dtypes; sort rows by all values."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            try:
                col = col.dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = col.astype("datetime64[us]")
        elif col.dtype == object:
            sample = col.dropna()
            first = sample.iloc[0] if len(sample) else None
            if isinstance(first, datetime.date) and not isinstance(first, datetime.datetime):
                df[c] = pd.to_datetime(col).astype("datetime64[us]")
            else:
                df[c] = col.map(_normalize_object_cell)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _numeric_kind(col: pd.Series) -> str | None:
    """'int' / 'float' for plainly-numeric dtypes, None otherwise.

    Object columns are excluded on purpose: Spark keeps Decimal cells
    in object dtype while DuckDB lowers DECIMAL to float64 — a
    representation gap the cell normalizer already reconciles. The
    check below exists for the one class the value comparison cannot
    see: an INTEGER column on one engine that the other engine emits
    as float64 (e.g. DuckDB HUGEINT -> pandas float64, `2014.0` vs
    Spark int64 `2014`), which hashes differently in the driver while
    passing a check_dtype=False local compare (rounds 3-4 red row).
    """
    if pd.api.types.is_bool_dtype(col):
        return None
    if pd.api.types.is_integer_dtype(col):
        return "int"
    if pd.api.types.is_float_dtype(col):
        return "float"
    return None


def compare_frames(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    got, want = normalize(got), normalize(want)
    problems: list[str] = []
    if list(got.columns) != list(want.columns):
        problems.append(
            f"cols spark={list(got.columns)} oracle={list(want.columns)}"
        )
    if len(got) != len(want):
        problems.append(f"rows spark={len(got)} oracle={len(want)}")
    if not problems:
        for c in got.columns:
            gk, wk = _numeric_kind(got[c]), _numeric_kind(want[c])
            if gk and wk and gk != wk:
                problems.append(
                    f"dtype-kind[{c}]: spark={got[c].dtype} ({gk}) "
                    f"oracle={want[c].dtype} ({wk}) — representation "
                    f"drift the driver hash would reject"
                )
    if not problems:
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        except AssertionError as err:
            problems.append("values: " + str(err).splitlines()[0])
    return problems


def assert_matches(got: pd.DataFrame, want: pd.DataFrame) -> None:
    problems = compare_frames(got, want)
    assert not problems, "; ".join(problems)
