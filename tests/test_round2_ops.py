"""Round-2 operator additions: axis=0 positional reductions, generic
combinations/cartesian, the scale-safe unflatten, cross-DataFrame
alignment, stepped inner slices, and the dask-array bridges.

Reference semantics: ak.sum(axis=0) grids in tests/test_reducers.py,
unflatten in lib/structure.py:898-922, combinations lib/structure.py:
295-332, partition compatibility lib/core.py:2815-2938.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_awkward_spark import from_lists
from dask_awkward_spark.core import NestedArray, align_many
from dask_awkward_spark.operators import reducers as red
from dask_awkward_spark.operators import structure as st


# ---------------- axis=0 positional reductions ----------------

def test_sum_axis0_jagged(spark):
    a = from_lists(spark, [[1.0, 2.0], [3.0], [4.0, 5.0, 6.0]], "array<double>")
    assert red.sum(a, axis=0).compute() == [8.0, 7.0, 6.0]


def test_min_max_count_axis0(spark):
    a = from_lists(spark, [[1.0, 9.0], [3.0], [4.0, 5.0, 6.0]], "array<double>")
    assert red.min(a, axis=0).compute() == [1.0, 5.0, 6.0]
    assert red.max(a, axis=0).compute() == [4.0, 9.0, 6.0]
    assert red.count(a, axis=0).compute() == [3, 2, 1]


def test_any_all_mean_axis0(spark):
    b = from_lists(spark, [[True, False], [False], [True, True, True]], "array<boolean>")
    assert red.any(b, axis=0).compute() == [True, True, True]
    assert red.all(b, axis=0).compute() == [False, False, True]
    a = from_lists(spark, [[2.0, 4.0], [4.0]], "array<double>")
    assert red.mean(a, axis=0).compute() == [3.0, 4.0]


def test_sum_axis0_depth2(spark):
    b = from_lists(spark, [[[1, 2], [3]], [[10], [20, 30], [5]]], "array<array<bigint>>")
    assert red.sum(b, axis=0).compute() == [[11, 2], [23, 30], [5]]


def test_prod_axis0_stays_integral(spark):
    a = from_lists(spark, [[2, 3], [4]], "array<bigint>")
    assert red.prod(a, axis=0).compute() == [8, 3]


def test_argminmax_axis0_jagged(spark):
    a = from_lists(spark, [[3.0, 1.0], [2.0], [4.0, 1.0, 6.0]], "array<double>")
    # pos1 is a tie (1.0 in rows 0 and 2): first occurrence (row 0) wins
    assert red.argmin(a, axis=0).compute() == [1, 0, 2]
    assert red.argmax(a, axis=0).compute() == [2, 0, 2]


def test_argminmax_axis0_depth2(spark):
    b = from_lists(spark, [[[3.0, 1.0], [5.0]], [[2.0, 9.0]]], "array<array<double>>")
    assert red.argmin(b, axis=0).compute() == [[1, 0], [0]]
    assert red.argmax(b, axis=0).compute() == [[0, 1], [0]]


# ---------------- generic combinations / cartesian ----------------

def test_combinations_n4(spark):
    a = from_lists(spark, [[1, 2, 3, 4, 5]], "array<bigint>")
    out = st.combinations(a, 4, fields=["a", "b", "c", "d"]).compute()[0]
    assert len(out) == 5  # C(5,4)
    assert out[0] == {"a": 1, "b": 2, "c": 3, "d": 4}
    assert out[-1] == {"a": 2, "b": 3, "c": 4, "d": 5}


def test_combinations_n5_and_short_lists(spark):
    a = from_lists(spark, [[1, 2, 3, 4, 5, 6], [1, 2], []], "array<bigint>")
    out = st.combinations(a, 5).compute()
    assert len(out[0]) == 6  # C(6,5)
    assert out[1] == [] and out[2] == []  # too short -> empty


def test_cartesian_three_arrays(spark):
    base = from_lists(spark, [[1, 2]], "array<bigint>")
    b = NestedArray(base._df, F.transform(base._col, lambda v: v * 10))
    c = NestedArray(base._df, F.transform(base._col, lambda v: v * 100))
    out = st.cartesian([base, b, c]).compute()[0]
    assert len(out) == 8
    assert out[0] == {"0": 1, "1": 10, "2": 100}
    assert out[-1] == {"0": 2, "1": 20, "2": 200}


# ---------------- unflatten ----------------

def test_unflatten_axis0_with_empty_groups(spark):
    flat = from_lists(spark, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0], "double")
    cnt = from_lists(spark, [2, 0, 3, 1], "bigint")
    assert st.unflatten(flat, cnt).compute() == [[1.0, 2.0], [], [3.0, 4.0, 5.0], [6.0]]


def test_unflatten_axis0_plan_has_no_nested_loop_join(spark):
    flat = from_lists(spark, [1.0, 2.0, 3.0], "double")
    cnt = from_lists(spark, [2, 1], "bigint")
    plan = st.unflatten(flat, cnt).to_df()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    # no unpartitioned global Sort: every Sort must sit under an Exchange
    # that is range-partitioned (repartitionByRange), not SinglePartition
    assert "SinglePartition" not in plan


def test_unflatten_axis1_fixed_and_counts(spark):
    nested = from_lists(spark, [[1, 2, 3, 4, 5]], "array<bigint>")
    assert st.unflatten(nested, 2, axis=1).compute() == [[[1, 2], [3, 4], [5]]]
    cnts = NestedArray(nested._df, F.expr("array(2, 3)").cast("array<bigint>"))
    assert st.unflatten(nested, cnts, axis=1).compute() == [[[1, 2], [3, 4, 5]]]


def test_unflatten_axis1_none_row_stays_none(spark):
    # option-type parity: a None list chunks to None, not []
    nested = from_lists(spark, [[1, 2, 3], None, []], "array<bigint>")
    assert st.unflatten(nested, 2, axis=1).compute() == [[[1, 2], [3]], None, []]


# ---------------- cross-DataFrame alignment ----------------

def test_cross_df_binop_aligns_by_row_index(spark):
    a = from_lists(spark, [1.0, 2.0, 3.0], "double")
    b = from_lists(spark, [10.0, 20.0, 30.0], "double")
    # element order must survive the alignment join (no sorted() here)
    assert (a + b).compute() == [11.0, 22.0, 33.0]


def test_cross_df_zip(spark):
    a = from_lists(spark, [1, 2, 3], "bigint")
    b = from_lists(spark, [4, 5, 6], "bigint")
    z = st.zip({"x": a, "y": b})
    assert [(r["x"], r["y"]) for r in z.compute()] == [(1, 4), (2, 5), (3, 6)]


def test_cross_df_length_mismatch_raises(spark):
    a = from_lists(spark, [1.0, 2.0, 3.0], "double")
    b = from_lists(spark, [10.0, 20.0], "double")
    with pytest.raises(Exception, match="different lengths|ASSERT"):
        (a + b).compute()


def test_align_many_nonstrict_truncates(spark):
    a = from_lists(spark, [1.0, 2.0, 3.0], "double")
    b = from_lists(spark, [10.0, 20.0], "double")
    la, lb = align_many([a, b], strict=False)
    assert la._binop(lb, lambda x, y: x + y).compute() == [11.0, 22.0]


def test_align_many_same_base_is_noop(spark):
    a = from_lists(spark, [1, 2], "bigint")
    b = NestedArray(a._df, (a._col * 2))
    out = align_many([a, b])
    assert out[0]._df is a._df  # no join inserted


def test_row_index_offsets_memoized(spark):
    a = from_lists(spark, list(range(20)), "bigint")
    i1 = a.with_row_index()
    i2 = NestedArray(a._df, a._col * 2).with_row_index()
    assert i1._df is i2._df  # second call reuses the cached indexed frame


# ---------------- stepped inner slices ----------------

def test_stepped_inner_slice(spark):
    a = from_lists(spark, [[0, 1, 2, 3, 4, 5, 6]], "array<bigint>")
    assert a[:, ::2].compute() == [[0, 2, 4, 6]]
    assert a[:, 1:6:2].compute() == [[1, 3, 5]]
    assert a[:, ::3].compute() == [[0, 3, 6]]


def test_stepped_inner_slice_preserves_null(spark):
    a = from_lists(spark, [[0, 1, 2, 3], None], "array<bigint>")
    # option-type parity with the step==1 branch: None stays None, not []
    assert a[:, ::2].compute() == [[0, 2], None]
    assert a[:, :2].compute() == [[0, 1], None]


def test_sample_factor_composes_with_order_ops(spark):
    a = from_lists(spark, list(range(10)), "bigint")
    s = a.sample(factor=2)  # keeps original positions 0,2,4,6,8
    # the stale pre-sample row ids must NOT leak: slicing/gather act on
    # post-sample positions
    assert s[0:2].compute() == [0, 2]
    assert s.take([1]).compute() == [2]


def test_unflatten_nonpositive_counts_raises(spark):
    nested = from_lists(spark, [[1, 2, 3, 4]], "array<bigint>")
    with pytest.raises(ValueError, match="positive"):
        st.unflatten(nested, 0, axis=1)
    with pytest.raises(ValueError, match="positive"):
        st.unflatten(nested, -2, axis=1)


def test_stepped_slice_zero_step_raises(spark):
    a = from_lists(spark, [[1, 2, 3]], "array<bigint>")
    with pytest.raises(ValueError, match="zero"):
        a[:, ::0]


# ---------------- dask-array bridges ----------------

def test_from_dask_array_numpy(spark):
    import numpy as np

    from dask_awkward_spark.sources.memory import from_dask_array, to_dask_array

    arr1 = from_dask_array(spark, np.array([1.5, 2.5, 3.5]))
    assert sorted(arr1.compute()) == [1.5, 2.5, 3.5]
    arr2 = from_dask_array(spark, np.arange(6).reshape(2, 3))
    out = sorted(arr2.compute())
    assert out == [[0, 1, 2], [3, 4, 5]]
    back = to_dask_array(arr2)
    assert getattr(back, "shape", None) == (2, 3)


def test_partition_compatibility_api(spark):
    from dask_awkward_spark import partition_compatibility

    a = from_lists(spark, [1, 2], "bigint")
    b = NestedArray(a._df, a._col * 2)
    c = from_lists(spark, [3, 4], "bigint")
    assert partition_compatibility(a, b) == "YES"
    assert partition_compatibility(a, c) == "MAYBE"


def test_axis0_skips_none_rows_and_leaves(spark):
    """ak parity: a None LIST row contributes nothing at axis=0; None
    LEAVES act as the identity (skipped by the aggregate)."""
    a = from_lists(
        spark, [[1.0, None, 3.0], None, [10.0, 20.0]], "array<double>"
    )
    assert red.sum(a, axis=0).compute() == [11.0, 20.0, 3.0]
    assert red.count(a, axis=0).compute() == [2, 1, 1]


def test_unflatten_axis0_int_counts(spark):
    a = from_lists(spark, [1, 2, 3, 4, 5], "bigint")
    assert st.unflatten(a, 2, axis=0).compute() == [[1, 2], [3, 4], [5]]


def test_unflatten_axis2_int_counts(spark):
    a = from_lists(spark, [[[1, 2, 3, 4], [5, 6]]], "array<array<bigint>>")
    assert st.unflatten(a, 2, axis=2).compute() == [[[[1, 2], [3, 4]], [[5, 6]]]]


def test_reference_toplevel_export_parity(spark):
    """Every name the reference exports from its package root resolves
    here too (same-named), so `import dask_awkward_spark as dak` is a
    drop-in for the reference's import."""
    import re
    import pathlib

    import dask_awkward_spark as dak

    src = pathlib.Path("/root/reference/src/dask_awkward/__init__.py")
    if not src.exists():
        pytest.skip("reference checkout not present")
    names = set()
    for m in re.finditer(
        r"from [\w.]+ import \(([^)]+)\)|from [\w.]+ import ([\w, ]+)$",
        src.read_text(),
        re.M,
    ):
        for n in (m.group(1) or m.group(2)).split(","):
            n = n.strip().split(" as ")[-1].strip()
            if n and not n.startswith("_"):
                names.add(n)
    names |= {"type", "necessary_columns"}
    missing = sorted(n for n in names if not hasattr(dak, n))
    assert missing == []


def test_compat_surface_smoke(spark):
    import dask_awkward_spark as dak

    a = dak.from_lists(spark, [[1, 2], [3]], "array<bigint>")
    assert dak.backend(a) == "spark"
    assert dak.to_list(a) == [[1, 2], [3]]
    assert dak.compatible_partitions(a, a._wrap(a._col)) is True
    b = dak.from_lists(spark, [10, 20], "bigint")
    assert dak.compatible_partitions(a, b) is False
    assert dak.partition_compatibility(a, b) == dak.PartitionCompatibility.MAYBE
    js = dak.layout_to_jsonschema(a)
    assert js["type"] == "array" and js["items"]["type"] == "integer"
    assert dak.from_awkward(spark, [1, 2, 3]).compute() == [1, 2, 3]
    got = dak.from_delayed(spark, [lambda: [(1,), (2,)], lambda: [(3,)]], "x bigint")
    assert sorted(r["x"] for r in got.compute()) == [1, 2, 3]
    with pytest.raises(ImportError, match="to_local_iterator"):
        dak.to_delayed(a)


# ---------------- connected components / dedup clustering ----------------

def test_connected_components_two_clusters(spark):
    from dask_awkward_spark.functions.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (7, 5)], "src long, dst long"
    )
    got = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 5}


def test_connected_components_chain_diameter(spark):
    from dask_awkward_spark.functions.graph import connected_components

    # a 10-node path needs ~diameter rounds; checks convergence loop
    edges = spark.createDataFrame([(i, i + 1) for i in range(10)], "src long, dst long")
    got = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {i: 0 for i in range(11)}


def test_connected_components_self_loops_and_string_ids(spark):
    from dask_awkward_spark.functions.graph import connected_components

    # self-loop-only node must still appear; string ids use lexicographic min
    edges = spark.createDataFrame(
        [("b", "c"), ("z", "z"), ("a", "b")], "src string, dst string"
    )
    got = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "z": "z"}


def test_cross_df_structure_ops_align(spark):
    """concatenate/mask/isclose across DIFFERENT base DataFrames align on
    row index (partition-compatibility MAYBE path) instead of raising."""
    a = from_lists(spark, [[1, 2], [3]], "array<bigint>")
    b = from_lists(spark, [[10], [20, 30]], "array<bigint>")
    assert st.concatenate([a, b], axis=1).compute() == [[1, 2, 10], [3, 20, 30]]
    m = from_lists(spark, [[True, False], [True]], "array<boolean>")
    assert st.mask(a, m).compute() == [[1, None], [3]]
    x = from_lists(spark, [1.0, 2.0], "double")
    y = from_lists(spark, [1.0000001, 3.0], "double")
    assert st.isclose(x, y, rtol=1e-5).compute() == [True, False]


def test_map_partitions_multi_collection(spark):
    """Reference map_partitions(fn, *colls): several collections arrive in
    one Arrow stream as columns c0..cN, row-index aligned across frames."""
    import pyarrow as pa

    import dask_awkward_spark as das

    a = from_lists(spark, [1.0, 2.0, 3.0], "double")
    b = from_lists(spark, [10.0, 20.0, 30.0], "double")

    def fn(batches):
        for batch in batches:
            t = batch.to_pydict()
            yield pa.RecordBatch.from_pydict(
                {"v": [x + y for x, y in zip(t["c0"], t["c1"])]}
            )

    out = das.map_partitions(fn, a, b, schema="v double")
    assert sorted(out.compute()) == [11.0, 22.0, 33.0]
