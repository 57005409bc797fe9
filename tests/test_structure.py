"""Structural-operator tests on fixtures with empty lists and null rows —
the reference's nested edge cases (FIXTURES.md: missing list vs empty list
vs list of missing)."""

from __future__ import annotations

import math

import dask_awkward_spark as das
from tests.conftest import LISTS, POINTS


def test_num(points):
    assert das.num(points, axis=1).compute() == [3, 0, 2, 1, 3]


def test_num_axis0(points):
    assert das.num(points, axis=0).compute() == 5


def test_flatten(jagged):
    assert das.flatten(jagged).compute() == [1, 2, 3, 4, 5, 0, 0, 0]


def test_zip_unzip(points):
    xs, ys = points["x"], points["y"]
    z = das.zip({"a": xs, "b": ys})
    a, b = das.unzip(z)
    assert a.compute() == xs.compute()
    assert b.compute() == ys.compute()


def test_firsts(jagged):
    assert das.firsts(jagged).compute() == [1, 4, None, 0]


def test_singletons(jagged):
    f = das.firsts(jagged)
    assert das.singletons(f, axis=0).compute() == [[1], [4], [], [0]]


def test_pad_none(jagged):
    assert das.pad_none(jagged, 3, clip=True).compute() == [
        [1, 2, 3],
        [4, 5, None],
        [None, None, None],
        [0, 0, 0],
    ]


def test_pad_none_noclip(jagged):
    got = das.pad_none(jagged, 2).compute()
    assert got == [[1, 2, 3], [4, 5], [None, None], [0, 0, 0]]


def test_fill_drop_none(jagged):
    padded = das.pad_none(jagged, 3, clip=True)
    assert das.fill_none(padded, -1, axis=1).compute() == [
        [1, 2, 3],
        [4, 5, -1],
        [-1, -1, -1],
        [0, 0, 0],
    ]
    assert das.drop_none(padded).compute() == [[1, 2, 3], [4, 5], [], [0, 0, 0]]


def test_is_none_l4(l4):
    assert das.is_none(l4, axis=0).compute() == [False, True, False, False, False]


def test_mask(jagged):
    m = das.mask(jagged, jagged > 1)
    assert m.compute() == [[None, 2, 3], [4, 5], [], [None, None, None]]


def test_where(jagged):
    assert das.where(jagged > 1, jagged, -1).compute() == [
        [-1, 2, 3],
        [4, 5],
        [],
        [-1, -1, -1],
    ]


def test_local_index(jagged):
    assert das.local_index(jagged).compute() == [[0, 1, 2], [0, 1], [], [0, 1, 2]]


def test_sort_argsort(spark):
    arr = das.from_lists(spark, [[3, 1, 2], [], [5, 4]], "array<bigint>")
    assert das.sort(arr).compute() == [[1, 2, 3], [], [4, 5]]
    assert das.sort(arr, ascending=False).compute() == [[3, 2, 1], [], [5, 4]]
    assert das.argsort(arr).compute() == [[1, 2, 0], [], [1, 0]]


def test_combinations(jagged):
    got = das.combinations(jagged, 2).compute()
    exp = []
    for row in LISTS:
        pairs = []
        for i in range(len(row)):
            for j in range(i + 1, len(row)):
                pairs.append({"0": row[i], "1": row[j]})
        exp.append(pairs)
    assert got == exp


def test_cartesian(points):
    xs, ys = points["x"], points["y"]
    got = das.cartesian([xs, ys]).compute()
    exp = [
        [{"0": x, "1": y} for x in [p["x"] for p in row] for y in [p["y"] for p in row]]
        for row in POINTS
    ]
    assert got == exp


def test_run_lengths(spark):
    arr = das.from_lists(spark, [[1, 1, 2, 2, 2, 3], [], [5, 5]], "array<bigint>")
    assert das.run_lengths(arr).compute() == [[2, 3, 1], [], [2]]


def test_concatenate_axis0(spark, jagged):
    other = das.from_lists(spark, [[9]], "array<bigint>")
    got = das.concatenate([jagged, other], axis=0).compute()
    assert sorted(map(tuple, got)) == sorted(map(tuple, LISTS + [[9]]))


def test_concatenate_axis1(points):
    xs, ys = points["x"], points["y"]
    got = das.concatenate([xs, ys], axis=1).compute()
    exp = [[p["x"] for p in row] + [p["y"] for p in row] for row in POINTS]
    assert got == exp


def test_unflatten(spark):
    flat = das.from_lists(spark, [1, 2, 3, 4, 5, 6], "bigint")
    counts = das.from_lists(spark, [2, 0, 3, 1], "bigint")
    got = das.unflatten(flat, counts).compute()
    assert got == [[1, 2], [], [3, 4, 5], [6]]


def test_values_astype(jagged):
    assert das.values_astype(jagged, "double").compute() == [
        [1.0, 2.0, 3.0],
        [4.0, 5.0],
        [],
        [0.0, 0.0, 0.0],
    ]


def test_isclose(points):
    xs = points["x"]
    assert das.isclose(xs * 1.0, xs * (1 + 1e-9)).compute() == [
        [True] * len(row) for row in POINTS
    ]


def test_depth3_ops(spark):
    data = [[[[1, 2], [3]], [[4]]], [[[5, 6]]]]
    arr = das.from_lists(spark, data, "array<array<array<bigint>>>")
    assert arr.depth == 3
    assert das.num(arr, axis=3).compute() == [[[2, 1], [1]], [[2]]]
    assert das.sum(arr, axis=3).compute() == [[[3, 3], [4]], [[11]]]
    assert das.sum(arr, axis=-1).compute() == das.sum(arr, axis=3).compute()
    assert das.flatten(arr, axis=3).compute() == [[[1, 2, 3], [4]], [[5, 6]]]
    assert das.flatten(arr, axis=None).compute() == [1, 2, 3, 4, 5, 6]
    assert das.sum(arr, axis=None).compute() == 21


def test_zip_depth_broadcast(spark, points):
    xs = points["x"]
    n = das.num(points, axis=1)
    z = das.zip({"x": xs, "n": n})  # depth-1 zipped with depth-0 broadcast
    got = z.compute()
    from tests.conftest import POINTS

    assert got == [
        [{"x": p["x"], "n": len(row)} for p in row] for row in POINTS
    ]
