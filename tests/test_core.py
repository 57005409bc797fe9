"""Differential tests on the reference's canonical fixtures (SURVEY §5:
assert_eq-style value comparison against eager Python evaluation)."""

from __future__ import annotations

import dask_awkward_spark as das
from tests.conftest import LISTS, POINTS


def test_field_projection(points):
    assert points["x"].compute() == [[p["x"] for p in row] for row in POINTS]


def test_attr_projection(points):
    assert points.x.compute() == points["x"].compute()


def test_multi_field(points):
    got = points[["x"]].compute()
    assert got == [[{"x": p["x"]} for p in row] for row in POINTS]


def test_fields(points):
    assert points.fields == ["x", "y"]


def test_arithmetic(points):
    xs = points["x"]
    assert (xs * 2 + 1).compute() == [[p["x"] * 2 + 1 for p in row] for row in POINTS]


def test_binary_broadcast(points):
    xs, ys = points["x"], points["y"]
    assert (xs + ys).compute() == [[p["x"] + p["y"] for p in row] for row in POINTS]


def test_inner_bool_filter(points):
    xs = points["x"]
    assert xs[xs > 8].compute() == [[x for x in row if x > 8] for row in [[p["x"] for p in r] for r in POINTS]]


def test_outer_bool_filter(points):
    xs = points["x"]
    n = das.num(points, axis=1)
    assert xs[n > 2].compute() == [[1, 3, 5], [13, 15, 17]]


def test_row_slice(points):
    xs = points["x"]
    assert xs[1:4].compute() == [[], [7, 9], [11]]


def test_inner_slice(points):
    xs = points["x"]
    assert xs[:, :2].compute() == [[1, 3], [], [7, 9], [11], [13, 15]]


def test_record_getitem(points):
    rec = points[2]
    assert rec.compute() == [{"x": 7, "y": 8}, {"x": 9, "y": 10}]


def test_head(points):
    assert len(points.head(2)) == 2


def test_with_field(points):
    xs, ys = points["x"], points["y"]
    z = das.zip({"x": xs, "y": ys})
    z2 = z.with_field("s", xs + ys)
    assert z2.compute() == [
        [{"x": p["x"], "y": p["y"], "s": p["x"] + p["y"]} for p in row] for row in POINTS
    ]


def test_without_field(points):
    got = points.without_field("y").compute()
    assert got == [[{"x": p["x"]} for p in row] for row in POINTS]


def test_jagged_roundtrip(jagged):
    assert jagged.compute() == LISTS


def test_map_partitions(spark, jagged):
    import pyarrow as pa

    def double(batches):
        for b in batches:
            tbl = pa.Table.from_batches([b])
            col = tbl.column("v")
            yield pa.RecordBatch.from_arrays(
                [pa.array([[x * 2 for x in row] for row in col.to_pylist()])], ["v"]
            )

    out = jagged.map_partitions(double, "v array<bigint>")
    assert out.compute() == [[x * 2 for x in row] for row in LISTS]


def test_outer_int_list_gather(points):
    got = points[[3, 0, 2]]
    assert got.compute() == [POINTS[3], POINTS[0], POINTS[2]]


def test_negative_record_index(points):
    assert points[-1].compute() == POINTS[-1]
    assert points[-5].compute() == POINTS[0]


def test_record_field_access(points):
    rec = points[2]
    assert rec.fields == ["x", "y"]
    assert rec["x"].compute() == [7, 9]
    assert rec.y.compute() == [8, 10]
