"""Canonical serialization of nested (array) output columns.

The driver's oracle harness canonicalizes result tables with pandas,
which cannot sort/hash Python-list cells — so any query whose OUTPUT
contains ``array<T>`` must project it to a deterministic string before
returning.

Doubles are canonicalized as micro-unit integers, ``round(x * 1e6)`` cast
to bigint: Spark's ``round`` (Java HALF_UP) and DuckDB's ``round`` on
doubles both round ties away from zero, so the integers agree bit-for-bit.
String-formatting with ``%.6f`` would NOT be safe: Java's formatter
rounds half-up while DuckDB's fmt-based printf rounds half-even, and the
two diverge on exact 1/128-multiples (e.g. 0.0078125 -> "0.007813" vs
"0.007812").

Null elements inside lists become the sentinel ``N`` (array_join drops
nulls otherwise; DuckDB's array_to_string skips them too, so both sides
substitute before joining).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NULL = "N"


def arr_micro(col) -> Column:
    """array<double> -> 'i,i,...' of round(x*1e6) bigints ('N' for nulls)."""
    return F.array_join(
        F.transform(
            col,
            lambda x: F.when(x.isNull(), F.lit(_NULL)).otherwise(
                F.round(x * 1000000).cast("bigint").cast("string")
            ),
        ),
        ",",
    )


def arr_str(col) -> Column:
    """array of integral/bool/string -> comma-joined ('N' for nulls)."""
    return F.array_join(
        F.transform(
            col,
            lambda x: F.when(x.isNull(), F.lit(_NULL)).otherwise(x.cast("string")),
        ),
        ",",
    )


def sql_arr_micro(expr: str) -> str:
    """DuckDB twin of :func:`arr_micro` for an array<double> expression.

    DuckDB's ``array_to_string`` yields NULL for an empty list where Spark's
    ``array_join`` yields ``''`` — coalesce (no query returns a NULL list).
    """
    return (
        "coalesce(array_to_string(list_transform(" + expr + ", x -> CASE WHEN x IS NULL "
        "THEN 'N' ELSE CAST(CAST(round(x * 1000000) AS BIGINT) AS VARCHAR) END), ','), '')"
    )


def sql_arr_str(expr: str) -> str:
    """DuckDB twin of :func:`arr_str` for integral/bool/string arrays."""
    return (
        "coalesce(array_to_string(list_transform(" + expr + ", x -> CASE WHEN x IS NULL "
        "THEN 'N' ELSE CAST(x AS VARCHAR) END), ','), '')"
    )
