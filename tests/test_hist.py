"""Binned-aggregation (dask-histogram companion) tests: fill semantics
(flow bins, weights, sumw2), NULL handling, profile math, and the
single-tiny-shuffle plan shape."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from dask_awkward_spark.functions import hist as H
from dask_awkward_spark.plans import explain_str


def _fill(spark, vals, weights=None):
    if weights is None:
        return spark.createDataFrame([(float(v),) for v in vals], "x double")
    return spark.createDataFrame(
        [(float(v), float(w)) for v, w in zip(vals, weights)], "x double, w double"
    )


def test_hist1d_flow_and_counts(spark):
    # bins=4 over [0,4): underflow -1, overflow 4 and 7.5, interior rest
    df = _fill(spark, [-1, 0, 0.5, 1, 2.99, 3, 4, 7.5])
    got = {r["bin"]: (r["n"], r["sumw"]) for r in H.hist1d(df, "x", 4, 0.0, 4.0).collect()}
    assert got == {
        0: (1, 1.0),  # underflow
        1: (2, 2.0),  # [0,1): 0, 0.5
        2: (1, 1.0),  # [1,2)
        3: (1, 1.0),  # [2,3): 2.99
        4: (1, 1.0),  # [3,4)
        5: (2, 2.0),  # overflow: 4, 7.5
    }


def test_hist1d_weighted_sumw2(spark):
    df = _fill(spark, [0.5, 0.5, 1.5], weights=[2, 3, 4])
    got = {
        r["bin"]: (r["n"], r["sumw"], r["sumw2"])
        for r in H.hist1d(df, "x", 2, 0.0, 2.0, weight="w").collect()
    }
    assert got == {1: (2, 5.0, 13.0), 2: (1, 4.0, 16.0)}


def test_hist1d_drops_nulls(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "x double")
    rows = H.hist1d(df, "x", 4, 0.0, 4.0).collect()
    assert sum(r["n"] for r in rows) == 2


def test_hist1d_validates_args(spark):
    df = _fill(spark, [1.0])
    with pytest.raises(ValueError):
        H.hist1d(df, "x", 0, 0.0, 1.0)
    with pytest.raises(ValueError):
        H.hist1d(df, "x", 4, 1.0, 1.0)


def test_hist2d_flow_cells(spark):
    df = spark.createDataFrame(
        [(0.5, 0.5), (0.5, 9.0), (-1.0, 0.5)], "x double, y double"
    )
    got = {
        (r["xbin"], r["ybin"]): r["n"]
        for r in H.hist2d(df, "x", "y", 2, 0.0, 2.0, 2, 0.0, 2.0).collect()
    }
    assert got == {(1, 1): 1, (1, 3): 1, (0, 1): 1}


def test_profile_mean(spark):
    df = spark.createDataFrame(
        [(0.5, 10.0), (0.5, 20.0), (1.5, 5.0)], "x double, y double"
    )
    got = {
        r["bin"]: (r["n"], r["sumy"], r["sumy2"])
        for r in H.profile1d(df, "x", "y", 2, 0.0, 2.0).collect()
    }
    assert got == {1: (2, 30.0, 500.0), 2: (1, 5.0, 25.0)}


def test_hist1d_var_irregular_edges(spark):
    # edges [1,2,4]: underflow 0.5 -> 0; 1 and 1.9 -> 1; 2 -> 2; 4,9 -> 3
    df = _fill(spark, [0.5, 1.0, 1.9, 2.0, 4.0, 9.0])
    got = {r["bin"]: r["n"] for r in H.hist1d_var(df, "x", [1.0, 2.0, 4.0]).collect()}
    assert got == {0: 1, 1: 2, 2: 1, 3: 2}


def test_hist1d_var_validates_edges(spark):
    df = _fill(spark, [1.0])
    with pytest.raises(ValueError):
        H.hist1d_var(df, "x", [1.0])
    with pytest.raises(ValueError):
        H.hist1d_var(df, "x", [2.0, 1.0])


def test_edges_helper():
    assert H.edges(4, 0.0, 2.0) == [0.0, 0.5, 1.0, 1.5, 2.0]


def test_hist_plan_is_one_tiny_shuffle(spark):
    """The fill must be scan -> row-local bin expression -> partial
    HashAggregate -> ONE Exchange — the map-side combine means the shuffle
    moves O(partitions x bins) rows at any input size."""
    from dask_awkward_spark.queries.hist import hist2d_qty_discount

    plan = explain_str(hist2d_qty_discount(spark, "/root/testdata/sf0.01"), "simple")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "partial_count" in plan  # map-side combine before the exchange
    # the unselected sumw2 aggregate must be pruned from the plan
    assert plan.count("sum(") == plan.count("sum(w#") or "sumw2" not in plan
