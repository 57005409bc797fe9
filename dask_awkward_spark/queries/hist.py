"""Histogram / profile queries — the dask-histogram workload the reference
feeds (jagged arrays -> boost-histogram fills), each with an exact DuckDB
oracle.

Float discipline (queries/__init__.py docstring): weighted fills carry the
weight as EXACT integer cents (``round(w*100)`` as bigint) so the sums are
associative and hash bit-for-bit regardless of partition order; unweighted
fills are plain counts. sumw2 columns are only emitted where the exact
integer square-sum provably fits int64 at sf>=1 (cents of events.value:
49_002^2 * 1e7 rows ~ 2.4e16 << 2^63); price-weighted 2-D fills emit sumw
only — the library still computes sumw2, Catalyst prunes it unused.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core import NestedArray  # noqa: F401  (public type of the jagged path)
from ..functions import hist as H
from ..operators import structure as st
from ..sources.tables import load_table
from .nested import _arr, _nested


def hist_event_values(spark, sf_dir):
    """1-D weighted histogram of events.value in [16, 256), 30 bins +
    under/overflow, weight = exact cents. sumw == n-weighted cents sum,
    sumw2 = sum of squared cents (boost-histogram Weight() storage)."""
    ev = load_table(spark, sf_dir, "events")
    w = F.round(F.col("value") * 100).cast("bigint")
    h = H.hist1d(ev, "value", bins=30, lo=16.0, hi=256.0, weight=w)
    return h.select(
        "bin",
        "n",
        F.col("sumw").alias("sumw_c"),
        F.col("sumw2").alias("sumw2_c2"),
    )


HIST_EVENT_SQL = f"""
SELECT {H.sql_bin_index('value', 16.0, 256.0, 30)} AS bin,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sumw_c,
       CAST(sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sumw2_c2
FROM events
WHERE value IS NOT NULL
GROUP BY 1
"""


def hist2d_qty_discount(spark, sf_dir):
    """2-D histogram: lineitem quantity (25 bins, [0,50)) x discount
    (10 bins, [0,0.1)), weighted by extendedprice cents. Exercises both
    overflow rows (quantity=50, discount=0.1 land in flow bins)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    h = H.hist2d(
        li,
        "l_quantity",
        "l_discount",
        xbins=25,
        xlo=0.0,
        xhi=50.0,
        ybins=10,
        ylo=0.0,
        yhi=0.1,
        weight=w,
    )
    # sumw2 of price-cents would overflow int64 at sf>=0.1 — not selected,
    # so Catalyst prunes that aggregate expression entirely.
    return h.select("xbin", "ybin", "n", F.col("sumw").alias("sum_price_c"))


HIST2D_SQL = f"""
SELECT {H.sql_bin_index('l_quantity', 0.0, 50.0, 25)} AS xbin,
       {H.sql_bin_index('l_discount', 0.0, 0.1, 10)} AS ybin,
       count(*) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
FROM lineitem
WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
GROUP BY 1, 2
"""


def hist_profile_price_by_qty(spark, sf_dir):
    """Profile plot: mean extendedprice per quantity bin. avg derived from
    the exact cents sum (identical IEEE division both engines); the spread
    term sums squared WHOLE-DOLLAR values so it stays exact in int64 at
    any sf (105_000^2 * 6e6 rows at sf1 ~ 6.6e16)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    )
    pr = H.profile1d(
        li,
        "l_quantity",
        F.round(F.col("l_extendedprice") * 100).cast("bigint"),
        bins=25,
        lo=0.0,
        hi=50.0,
    )
    dollars = H.profile1d(
        li,
        "l_quantity",
        F.round(F.col("l_extendedprice")).cast("bigint"),
        bins=25,
        lo=0.0,
        hi=50.0,
    ).select("bin", F.col("sumy2").alias("sumy2_d2"))
    return (
        pr.join(dollars, "bin")
        .select(
            "bin",
            "n",
            F.col("sumy").alias("sum_price_c"),
            F.round(F.col("sumy").cast("double") / F.col("n"))
            .cast("bigint")
            .alias("avg_price_c"),
            "sumy2_d2",
        )
    )


PROFILE_SQL = f"""
SELECT {H.sql_bin_index('l_quantity', 0.0, 50.0, 25)} AS bin,
       count(*) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
       CAST(round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / count(*)) AS BIGINT) AS avg_price_c,
       CAST(sum(CAST(round(l_extendedprice) AS BIGINT) * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sumy2_d2
FROM lineitem
WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
GROUP BY 1
"""


def hist_jagged_flatten(spark, sf_dir):
    """The dak -> dask-histogram path: per-order jagged quantity lists,
    ravelled (flatten axis=None) and filled into a 1-D histogram — the
    flatten is a row-local explode, so the whole fill is still scan +
    explode + one tiny-key shuffle."""
    qs = _arr(_nested(spark, sf_dir), "qs")
    flat = st.flatten(qs, axis=None)
    h = H.hist1d(flat.to_df(), "v", bins=25, lo=0.0, hi=50.0)
    return h.select("bin", "n")


HIST_JAGGED_SQL = f"""
SELECT {H.sql_bin_index('l_quantity', 0.0, 50.0, 25)} AS bin,
       count(*) AS n
FROM lineitem
WHERE l_quantity IS NOT NULL
GROUP BY 1
"""


_LOG_EDGES = [1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0, 256.0, 512.0]


def hist_log_edges(spark, sf_dir):
    """Irregular (log-spaced) edges over events.value — the axis shape
    real latency/size distributions need; underflow (<1) and the exact
    edge values both exercised."""
    ev = load_table(spark, sf_dir, "events")
    return H.hist1d_var(ev, "value", _LOG_EDGES)


HIST_LOG_SQL = f"""
SELECT {H.sql_bin_index_var('value', _LOG_EDGES)} AS bin,
       count(*) AS n
FROM events
WHERE value IS NOT NULL
GROUP BY 1
"""


QUERIES = {
    "hist_event_values": hist_event_values,
    "hist2d_qty_discount": hist2d_qty_discount,
    "hist_profile_price_by_qty": hist_profile_price_by_qty,
    "hist_jagged_flatten": hist_jagged_flatten,
    "hist_log_edges": hist_log_edges,
}

ORACLES = {
    "hist_event_values": HIST_EVENT_SQL,
    "hist2d_qty_discount": HIST2D_SQL,
    "hist_profile_price_by_qty": PROFILE_SQL,
    "hist_jagged_flatten": HIST_JAGGED_SQL,
    "hist_log_edges": HIST_LOG_SQL,
}
