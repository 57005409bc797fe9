"""Binned aggregations — the dask-histogram companion surface.

The reference engine's ecosystem pipes every analysis into boost-histogram
via dask-histogram (``dask_histogram.factory(dak_array, axes=...)``); the
reference itself exposes the jagged arrays that feed it. This module is
the Spark-first analogue: fixed-width 1-D / 2-D histograms and profile
plots as ONE tiny-key shuffle each.

Scale shape: the bin index is a pure row-local expression (no UDF), so the
``groupBy(bin)`` aggregate does a full map-side partial reduction — each
of the N input partitions emits at most ``bins + 2`` partial rows, and the
single Exchange moves O(partitions x bins) rows regardless of input size.
At 100 TB this is the cheapest possible reduction: the shuffle payload is
kilobytes. Weighted fills carry ``sumw`` / ``sumw2`` (the boost-histogram
``Weight()`` storage) in the same pass.

Flow convention (matches boost-histogram): bin 0 is underflow (x < lo),
bins 1..n are the closed-open interior cells, bin n+1 is overflow
(x >= hi). NULL x rows are dropped, like ak.flatten drops missing before
a histogram fill.

Bit-exactness: the bin index uses ``floor((x - lo) / (hi - lo) * n)`` with
the SAME left-to-right IEEE-double evaluation order the DuckDB oracle
uses, so Spark and the oracle always agree on the cell — even for values
that land within one ulp of an edge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bin_index(x: Column, lo: float, hi: float, bins: int) -> Column:
    """Fixed-width bin index with under/overflow (0 and bins+1)."""
    if bins <= 0:
        raise ValueError(f"bins must be positive, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    return (
        F.when(x < F.lit(lo), F.lit(0))
        .when(x >= F.lit(hi), F.lit(bins + 1))
        .otherwise(
            (F.floor((x - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(bins)))).cast(
                "int"
            )
            + F.lit(1)
        )
    )


def sql_bin_index(x: str, lo: float, hi: float, bins: int) -> str:
    """DuckDB twin of :func:`bin_index` — identical arithmetic and order."""
    return (
        f"CASE WHEN {x} < {lo!r} THEN 0 "
        f"WHEN {x} >= {hi!r} THEN {bins + 1} "
        f"ELSE CAST(floor(({x} - {lo!r}) / {hi - lo!r} * {float(bins)!r}) AS INT) + 1 END"
    )


def hist1d(
    df: DataFrame,
    x: Column | str,
    bins: int,
    lo: float,
    hi: float,
    weight: Column | str | None = None,
) -> DataFrame:
    """1-D fixed-width histogram: (bin, n, sumw, sumw2), flow bins included.

    Unweighted fills use weight 1, so sumw == n and sumw2 == n (the
    boost-histogram convention). One groupBy on <= bins+2 keys.
    """
    x = F.col(x) if isinstance(x, str) else x
    w = (
        F.lit(1.0)
        if weight is None
        else (F.col(weight) if isinstance(weight, str) else weight)
    )
    return (
        df.where(x.isNotNull())
        .select(bin_index(x, lo, hi, bins).alias("bin"), w.alias("w"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("w").alias("sumw"),
            F.sum(F.col("w") * F.col("w")).alias("sumw2"),
        )
    )


def hist2d(
    df: DataFrame,
    x: Column | str,
    y: Column | str,
    xbins: int,
    xlo: float,
    xhi: float,
    ybins: int,
    ylo: float,
    yhi: float,
    weight: Column | str | None = None,
) -> DataFrame:
    """2-D fixed-width histogram keyed on (xbin, ybin); flow on both axes.

    Still one shuffle of <= (xbins+2)(ybins+2) keys per partition.
    """
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    w = (
        F.lit(1.0)
        if weight is None
        else (F.col(weight) if isinstance(weight, str) else weight)
    )
    return (
        df.where(x.isNotNull() & y.isNotNull())
        .select(
            bin_index(x, xlo, xhi, xbins).alias("xbin"),
            bin_index(y, ylo, yhi, ybins).alias("ybin"),
            w.alias("w"),
        )
        .groupBy("xbin", "ybin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("w").alias("sumw"),
            F.sum(F.col("w") * F.col("w")).alias("sumw2"),
        )
    )


def profile1d(
    df: DataFrame,
    x: Column | str,
    y: Column | str,
    bins: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """Profile plot: per-x-bin count, sum(y) and sum(y^2) — mean/stderr of
    y as a function of binned x, derived client-side from the exact sums.
    Same single tiny-key shuffle as hist1d."""
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    return (
        df.where(x.isNotNull() & y.isNotNull())
        .select(bin_index(x, lo, hi, bins).alias("bin"), y.alias("y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("sumy"),
            F.sum(F.col("y") * F.col("y")).alias("sumy2"),
        )
    )


def bin_index_var(x: Column, edges: list[float]) -> Column:
    """Irregular-edge bin index: number of edges <= x. 0 = underflow,
    len(edges) = overflow of [edges[0], edges[-1]); row-local expression,
    no UDF (the edge list rides the plan as an array literal)."""
    if len(edges) < 2 or any(a >= b for a, b in zip(edges, edges[1:])):
        raise ValueError("edges must be >= 2 strictly increasing values")
    from .vectors import array_lit

    arr = array_lit([float(e) for e in edges])
    return F.size(F.filter(arr, lambda e: x >= e))


def sql_bin_index_var(x: str, edges: list[float]) -> str:
    """DuckDB twin of :func:`bin_index_var` (identical comparison set)."""
    lits = ", ".join(repr(float(e)) for e in edges)
    return f"len(list_filter([{lits}], e -> {x} >= e))"


def hist1d_var(df: DataFrame, x: Column | str, edges: list[float]) -> DataFrame:
    """1-D histogram over irregular bin edges (e.g. log-spaced): same
    single tiny-key shuffle as hist1d; bins 1..len(edges)-1 are the
    interior cells, 0/len(edges) the flow bins."""
    x = F.col(x) if isinstance(x, str) else x
    return (
        df.where(x.isNotNull())
        .select(bin_index_var(x, edges).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def edges(bins: int, lo: float, hi: float) -> list[float]:
    """The bins+1 interior edge positions (driver-side helper; identical
    arithmetic to bin_index so edges[i] maps to bin i+1's left edge)."""
    width = hi - lo
    return [lo + width * i / bins for i in range(bins + 1)]
