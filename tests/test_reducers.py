"""Reducer tests sweeping both regimes (axis>=1 per-list vs axis=None
global) with empty-list identity semantics — the reference's
tests/test_reducers.py parametrization model."""

from __future__ import annotations

import math

import pytest

import dask_awkward_spark as das
from tests.conftest import LISTS


def test_sum_axis1(jagged):
    assert das.sum(jagged, axis=1).compute() == [6, 9, 0, 0]


def test_sum_none(jagged):
    assert das.sum(jagged, axis=None).compute() == 15


def test_prod_axis1(jagged):
    assert das.prod(jagged, axis=1).compute() == [6, 20, 1, 0]


def test_min_max_empty_is_none(jagged):
    assert das.min(jagged, axis=1).compute() == [1, 4, None, 0]
    assert das.max(jagged, axis=1).compute() == [3, 5, None, 0]


def test_min_max_none(jagged):
    assert das.min(jagged, axis=None).compute() == 0
    assert das.max(jagged, axis=None).compute() == 5


def test_count(jagged):
    assert das.count(jagged, axis=1).compute() == [3, 2, 0, 3]
    assert das.count(jagged, axis=None).compute() == 8


def test_count_nonzero(jagged):
    assert das.count_nonzero(jagged, axis=1).compute() == [3, 2, 0, 0]
    assert das.count_nonzero(jagged, axis=None).compute() == 5


def test_any_all(jagged):
    b = jagged > 2
    assert das.any(b, axis=1).compute() == [True, True, False, False]
    assert das.all(b, axis=1).compute() == [False, True, True, False]
    assert das.any(b, axis=None).compute() is True
    assert das.all(b, axis=None).compute() is False


def test_mean_axis1(jagged):
    got = das.mean(jagged, axis=1).compute()
    assert got[0] == pytest.approx(2.0)
    assert got[1] == pytest.approx(4.5)
    assert got[2] is None
    assert got[3] == pytest.approx(0.0)


def test_mean_none(jagged):
    assert das.mean(jagged, axis=None).compute() == pytest.approx(15 / 8)


def test_std_var(jagged):
    var = das.var(jagged, axis=1).compute()
    assert var[0] == pytest.approx(2 / 3)
    assert var[2] is None
    std = das.std(jagged, axis=None).compute()
    flat = [x for row in LISTS for x in row]
    mu = sum(flat) / len(flat)
    exp = math.sqrt(sum((x - mu) ** 2 for x in flat) / len(flat))
    assert std == pytest.approx(exp)


def test_argmin_argmax(jagged):
    assert das.argmin(jagged, axis=1).compute() == [0, 0, None, 0]
    assert das.argmax(jagged, axis=1).compute() == [2, 1, None, 0]


def test_ptp(jagged):
    assert das.ptp(jagged, axis=1).compute() == [2, 1, None, 0]


def test_softmax(spark):
    arr = das.from_lists(spark, [[1.0, 2.0], []], "array<double>")
    got = das.softmax(arr).compute()
    import math as m

    e1, e2 = m.exp(-1.0), m.exp(0.0)
    assert got[0][0] == pytest.approx(e1 / (e1 + e2))
    assert got[1] == []


def test_argminmax_none_raises(jagged):
    with pytest.raises(NotImplementedError):
        das.argmin(jagged, axis=None)


def test_sum_depth2(spark):
    arr = das.from_lists(spark, [[[1, 2], [3]], [[], [4, 5]]], "array<array<bigint>>")
    assert das.sum(arr, axis=2).compute() == [[3, 3], [0, 9]]
    assert das.sum(arr, axis=None).compute() == 15
    assert das.num(arr, axis=2).compute() == [[2, 1], [0, 2]]
    assert das.flatten(arr, axis=2).compute() == [[1, 2, 3], [4, 5]]


def test_moment(jagged):
    got = das.moment(jagged, 2, axis=1).compute()
    from tests.conftest import LISTS

    exp = [sum(x * x for x in row) / len(row) if row else None for row in LISTS]
    for g, e in zip(got, exp):
        if e is None:
            assert g is None
        else:
            assert g == pytest.approx(e)
    assert das.moment(jagged, 2, axis=None).compute() == pytest.approx(
        sum(x * x for row in LISTS for x in row) / 8
    )


def test_corr_covar_linear_fit(spark):
    xs = [[1.0, 2.0, 3.0, 4.0], [], [1.0, 2.0]]
    ys = [[2.0, 4.1, 5.9, 8.0], [], [3.0, 3.0]]
    import pyspark.sql.functions as F

    df = spark.createDataFrame(list(zip(xs, ys)), "a array<double>, b array<double>")
    a, b = das.NestedArray(df, "a"), das.NestedArray(df, "b")
    corr = das.corr(a, b).compute()
    assert corr[0] == pytest.approx(0.9996, abs=1e-3)
    assert corr[1] is None
    assert corr[2] is None  # zero variance in b
    cov = das.covar(a, b).compute()
    import statistics

    exp_cov = sum(
        (x - 2.5) * (y - 5.0) for x, y in zip(xs[0], ys[0])
    ) / 4
    assert cov[0] == pytest.approx(exp_cov)
    fit = das.linear_fit(a, b).compute()
    assert fit[0]["slope"] == pytest.approx(1.98)  # (4*59.9-10*20)/(4*30-100)
    assert fit[1] is None


def test_strings_astype(spark):
    from dask_awkward_spark.functions.strings import strings_astype

    arr = das.from_lists(spark, [["1", "2.5", "x"], []], "array<string>")
    assert strings_astype(arr).compute() == [[1.0, 2.5, None], []]


def test_positional_axis1_depth2(spark):
    """Non-innermost axis: positional combine (ak.sum semantics)."""
    arr = das.from_lists(
        spark, [[[1, 2], [3]], [[], [4, 5]], []], "array<array<bigint>>"
    )
    assert das.sum(arr, axis=1).compute() == [[4, 2], [4, 5], []]
    assert das.max(arr, axis=1).compute() == [[3, 2], [4, 5], []]
    assert das.min(arr, axis=1).compute() == [[1, 2], [4, 5], []]
    assert das.count(arr, axis=1).compute() == [[2, 1], [1, 1], []]
    assert das.prod(arr, axis=1).compute() == [[3, 2], [4, 5], []]


def test_positional_axis2_depth3(spark):
    a3 = das.from_lists(spark, [[[[1], [2, 3]], [[10]]]], "array<array<array<bigint>>>")
    assert das.sum(a3, axis=2).compute() == [[[3, 3], [10]]]


def test_positional_numeric_edge_types(spark):
    """Regression: numeric leaves through any/all, int32 widening,
    count_nonzero along non-innermost axes (code-review findings)."""
    a = das.from_lists(spark, [[[1, 0], [0]]], "array<array<bigint>>")
    assert das.any(a, axis=1).compute() == [[True, False]]
    assert das.all(a, axis=1).compute() == [[False, False]]
    assert das.count_nonzero(a, axis=1).compute() == [[1, 0]]
    i = das.from_lists(spark, [[[2147483647, 1], [10]]], "array<array<int>>")
    assert das.sum(i, axis=1).compute() == [[2147483657, 1]]


def test_ptp_global_and_ddof(spark):
    """Regression (review findings): global ptp spans rows; ddof honored
    at axis=None; decimals widen to double not bigint."""
    a = das.from_lists(spark, [[0.0, 10.0], [100.0, 100.0]], "array<double>")
    assert das.ptp(a, axis=None).compute() == 100.0
    b = das.from_lists(spark, [1.0, 2.0, 3.0], "double")
    assert das.var(b, axis=None, ddof=1).compute() == pytest.approx(1.0)
    assert das.var(b, axis=None).compute() == pytest.approx(2 / 3)
    from decimal import Decimal

    df = spark.createDataFrame(
        [([Decimal("1.50"), Decimal("2.50")],)], "v array<decimal(10,2)>"
    )
    assert das.sum(das.NestedArray(df, "v"), axis=1).compute() == [4.0]
    with pytest.raises(NotImplementedError):
        das.var(das.from_lists(spark, [[[1.0]]], "array<array<double>>"), axis=1, ddof=1)


def test_keepdims_mask_identity(spark):
    """Reference reducer flags (threaded through all reducers there,
    lib/reducers.py + lib/core.py:2298-2334)."""
    jag = das.from_lists(spark, [[1, 2, 3], [], [5]], "array<bigint>")
    assert das.sum(jag, axis=1, mask_identity=True).compute() == [6, None, 5]
    assert das.sum(jag, axis=1, keepdims=True).compute() == [[6], [0], [5]]
    assert das.max(jag, axis=1, keepdims=True, mask_identity=True).compute() == [
        [3],
        [None],
        [5],
    ]
    f = das.from_lists(spark, [[1.0], []], "array<double>")
    assert das.min(f, axis=1, mask_identity=False).compute() == [1.0, float("inf")]
    assert das.argmin(jag, axis=1, mask_identity=False).compute() == [0, -1, 0]


def test_global_argminmax_uplift(spark):
    """Global argmin/argmax (raises in the reference) — first-occurrence
    tie-break via lexicographic min_by/max_by."""
    flat = das.from_lists(spark, [5.0, 1.0, 9.0, 1.0, 9.0], "double")
    assert das.argmin(flat, axis=None).compute() == 1
    assert das.argmax(flat, axis=None).compute() == 2
