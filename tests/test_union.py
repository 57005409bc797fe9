"""Union-type encoding (VERDICT r7 item 7, SURVEY §1.2): Arrow/awkward
UnionArrays ingest as a tagged struct (struct<tag: tinyint, <variants>>,
exactly one live field per row), dense and sparse, top-level or nested;
enforce_type refuses a union target with a pointer at the encoding.
Differential fixtures are built with pyarrow (awkward's Arrow output is
a union of exactly these shapes; the package itself is absent here)."""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from dask_awkward_spark.sources.memory import from_arrow


def _dense_union():
    return pa.UnionArray.from_dense(
        pa.array([0, 1, 1, 0, 2], pa.int8()),
        pa.array([0, 0, 1, 1, 2], pa.int32()),
        [pa.array([11, 44]), pa.array(["a", "b"]), pa.array([3.5, None, 9.5])],
        ["num", "txt", "flt"],
    )


DENSE_EXPECT = [
    {"tag": 0, "num": 11, "txt": None, "flt": None},
    {"tag": 1, "num": None, "txt": "a", "flt": None},
    {"tag": 1, "num": None, "txt": "b", "flt": None},
    {"tag": 0, "num": 44, "txt": None, "flt": None},
    {"tag": 2, "num": None, "txt": None, "flt": 9.5},
]


def test_dense_union_ingests_as_tagged_struct(spark):
    arr = from_arrow(spark, pa.table({"u": _dense_union()}))
    df = arr.to_df("r").select("r.*")
    assert df.schema["u"].dataType.simpleString() == (
        "struct<tag:tinyint,num:bigint,txt:string,flt:double>"
    )
    got = [r.u.asDict() for r in df.orderBy(F.monotonically_increasing_id()).collect()]
    # row order is not guaranteed through ingest; compare as multisets
    key = lambda d: (d["tag"], d["num"], d["txt"], d["flt"])
    assert sorted(got, key=lambda d: str(key(d))) == sorted(
        DENSE_EXPECT, key=lambda d: str(key(d))
    )
    # exactly one live variant per row — the encoding's invariant
    live = df.select(
        (
            F.col("u.num").isNotNull().cast("int")
            + F.col("u.txt").isNotNull().cast("int")
            + F.col("u.flt").isNotNull().cast("int")
        ).alias("n")
    )
    # the dense child carries one genuine NULL (flt child idx 1 is never
    # referenced) — every row referenced a non-null value here
    assert [r.n for r in live.collect()] == [1] * 5


def test_sparse_union_ingests(spark):
    u = pa.UnionArray.from_sparse(
        pa.array([0, 1, 0], pa.int8()),
        [pa.array([1, 2, 3]), pa.array(["x", "y", "z"])],
        ["num", "txt"],
    )
    arr = from_arrow(spark, pa.table({"u": u}))
    got = sorted(
        (r.u.tag, r.u.num, r.u.txt)
        for r in arr.to_df("r").select("r.*").collect()
    )
    assert got == [(0, 1, None), (0, 3, None), (1, None, "y")]


def test_union_nested_in_list_and_struct(spark):
    u = _dense_union()
    lst = pa.ListArray.from_arrays(pa.array([0, 2, 5], pa.int32()), u)
    s = pa.StructArray.from_arrays(
        [pa.array([10, 20]), lst], names=["k", "items"]
    )
    arr = from_arrow(spark, pa.table({"row": s}))
    df = arr.to_df("r").select("r.*")
    assert "struct<tag:tinyint" in df.schema["row"].dataType.simpleString()
    got = {r.row.k: [i.asDict() for i in r.row["items"]] for r in df.collect()}
    assert got[10] == DENSE_EXPECT[:2]
    assert got[20] == DENSE_EXPECT[2:]


def test_union_dispatch_is_one_when_chain(spark):
    """The point of the encoding: one F.when per variant recovers any
    union dispatch, JVM-side."""
    arr = from_arrow(spark, pa.table({"u": _dense_union()}))
    out = arr.to_df("r").select("r.*").select(
        F.when(F.col("u.tag") == 0, F.col("u.num").cast("string"))
        .when(F.col("u.tag") == 1, F.col("u.txt"))
        .otherwise(F.col("u.flt").cast("string"))
        .alias("s")
    )
    assert sorted(r.s for r in out.collect()) == ["11", "44", "9.5", "a", "b"]


def test_union_free_tables_keep_fast_path(spark):
    """No union anywhere → the ingest path is byte-for-byte the old
    pandas bridge (no devolve pass, no pylist materialization)."""
    t = pa.table({"a": pa.array([1, 2, 3]), "s": pa.array(["x", "y", "z"])})
    arr = from_arrow(spark, t)
    assert sorted(
        (r.a, r.s) for r in arr.to_df("r").select("r.*").collect()
    ) == [
        (1, "x"), (2, "y"), (3, "z")
    ]


def test_enforce_type_refuses_union_strings(spark):
    from dask_awkward_spark import from_lists
    from dask_awkward_spark.operators.structure import enforce_type

    arr = from_lists(spark, [[1, 2], [3]], "array<bigint>")
    with pytest.raises(TypeError, match="tagged"):
        enforce_type(arr, "union[int64, string]")


# ---- round-8 review regressions -------------------------------------


def test_null_list_of_union_stays_null(spark):
    """A NULL list entry must not collapse to [] through devolution
    (review finding: list rebuild dropped the validity bitmap)."""
    u = pa.UnionArray.from_dense(
        pa.array([0, 1, 0], pa.int8()),
        pa.array([0, 0, 1], pa.int32()),
        [pa.array([1, 2]), pa.array(["a"])],
        ["num", "txt"],
    )
    lst = pa.ListArray.from_arrays(pa.array([0, 2, None, 3], pa.int32()), u)
    arr = from_arrow(spark, pa.table({"xs": lst}))
    got = {tuple(sorted(d.asDict().items()))
           if d is not None else None: True for d in ()}
    rows = arr.to_df("r").select("r.*").collect()
    vals = sorted(
        (row.xs is None, len(row.xs) if row.xs is not None else -1)
        for row in rows
    )
    assert vals == [(False, 1), (False, 2), (True, -1)]


def test_union_under_map_and_fixed_size_list(spark):
    u = pa.UnionArray.from_dense(
        pa.array([0, 1, 0], pa.int8()),
        pa.array([0, 0, 1], pa.int32()),
        [pa.array([1, 2]), pa.array(["a"])],
        ["num", "txt"],
    )
    mp = pa.MapArray.from_arrays(
        pa.array([0, 2, None, 3], pa.int32()),
        pa.array(["k1", "k2", "k3"]),
        u,
    )
    # null preservation is an ARROW-level property of the devolution
    # (Spark's own pa.Table ingest renders a NULL map as {})
    from dask_awkward_spark.sources.memory import _devolve_unions

    dev = _devolve_unions(mp)
    assert dev.null_count == 1 and dev.to_pylist()[2] is None
    arr = from_arrow(spark, pa.table({"m": mp}))
    rows = [r.m for r in arr.to_df("r").select("r.*").collect() if r.m]
    k1 = next(m["k1"].asDict() for m in rows if "k1" in m)
    assert k1 == {"tag": 0, "num": 1, "txt": None}
    u2 = pa.UnionArray.from_sparse(
        pa.array([0, 1, 0, 1], pa.int8()),
        [pa.array([1, 2, 3, 4]), pa.array(["a", "b", "c", "d"])],
        ["num", "txt"],
    )
    fsl = pa.FixedSizeListArray.from_arrays(u2, 2)
    arr2 = from_arrow(spark, pa.table({"xs": fsl}))
    got = sorted(
        tuple((i.tag, i.num, i.txt) for i in r.xs)
        for r in arr2.to_df("r").select("r.*").collect()
    )
    assert got == [
        ((0, 1, None), (1, None, "b")),
        ((0, 3, None), (1, None, "d")),
    ]


def test_enforce_type_allows_union_substring_names(spark):
    """'union' inside a field name is a legal cast target; only the
    union[...] type syntax is refused."""
    from dask_awkward_spark import from_lists
    from dask_awkward_spark.operators.structure import enforce_type

    arr = from_lists(spark, [[1], [2]], "array<bigint>")
    out = enforce_type(arr, "array<int>")  # sanity: plain cast works
    assert out.to_list() == [[1], [2]]
    rec = from_lists(spark, [{"union_id": 1}], "struct<union_id:bigint>")
    cast = enforce_type(rec, "struct<union_id:int>")
    assert cast.to_list() == [{"union_id": 1}]


def test_sliced_unions_devolve_the_slice_not_the_prefix():
    """ADVICE r8: a sliced UnionArray's .type_codes/.offsets ignore the
    array offset (and a sparse union's children are sliced while its
    codes are not), so devolving a slice used to silently emit rows
    0..n-1 instead of the slice — _devolve_unions must rebase first."""
    from dask_awkward_spark.sources.memory import _devolve_unions

    u = _dense_union()
    s = u.slice(2, 3)  # rows 2..4: txt 'b', num 44, flt 9.5
    out = _devolve_unions(s)
    assert out.to_pylist() == [
        {"tag": 1, "num": None, "txt": "b", "flt": None},
        {"tag": 0, "num": 44, "txt": None, "flt": None},
        {"tag": 2, "num": None, "txt": None, "flt": 9.5},
    ]
    u2 = pa.UnionArray.from_sparse(
        pa.array([0, 1, 0, 1, 0], pa.int8()),
        [pa.array([1, 2, 3, 4, 5]), pa.array(["p", "q", "r", "s", "t"])],
        ["num", "txt"],
    )
    s2 = u2.slice(1, 3)  # rows 1..3: 'q', 3, 's'
    assert [(d["tag"], d["num"], d["txt"]) for d in _devolve_unions(s2).to_pylist()] == [
        (1, None, "q"),
        (0, 3, None),
        (1, None, "s"),
    ]


def test_sliced_struct_hands_down_sliced_union_child():
    """Recursion hazard: a sliced STRUCT's .field() is a sliced view, so
    the union child arrives at _devolve_unions WITH an offset — the
    entry rebase must catch it there too."""
    from dask_awkward_spark.sources.memory import _devolve_unions

    st = pa.StructArray.from_arrays(
        [pa.array([100, 200, 300, 400, 500]), _sparse5()], names=["k", "u"]
    )
    out = _devolve_unions(st.slice(2, 2))  # rows 2,3: (300, 3), (400, 's')
    assert out.to_pylist() == [
        {"k": 300, "u": {"tag": 0, "num": 3, "txt": None}},
        {"k": 400, "u": {"tag": 1, "num": None, "txt": "s"}},
    ]


def _sparse5():
    return pa.UnionArray.from_sparse(
        pa.array([0, 1, 0, 1, 0], pa.int8()),
        [pa.array([1, 2, 3, 4, 5]), pa.array(["p", "q", "r", "s", "t"])],
        ["num", "txt"],
    )


def test_to_arrow_exports_tagged_struct_one_way(spark):
    """Union devolution is one-way by design: to_arrow exports the
    tagged-struct encoding, from which a consumer can rebuild a real
    UnionArray (tag + children) — asserted by doing exactly that."""
    from dask_awkward_spark.sources.memory import to_arrow

    arr = from_arrow(spark, pa.table({"u": _dense_union()}))
    t = to_arrow(arr)
    # to_df wraps rows in one struct column; drill to the u field
    row_t = t.schema.field(0).type
    ut = row_t.field(row_t.get_field_index("u")).type
    assert pa.types.is_struct(ut) and ut.field(0).name == "tag"
    assert not any(
        pa.types.is_union(ut.field(i).type) for i in range(ut.num_fields)
    )
    # rebuild a sparse union from the export and compare row values
    s = t.column(0).combine_chunks().field("u")
    tag = s.field("tag").cast(pa.int8())
    rebuilt = pa.UnionArray.from_sparse(
        tag, [s.field(i) for i in range(1, ut.num_fields)],
        [ut.field(i).name for i in range(1, ut.num_fields)],
    )
    got = sorted(map(str, rebuilt.to_pylist()))
    want = sorted(
        str(v) for v in [11, "a", "b", 44, 9.5]
    )
    assert got == want


def test_to_arrow_restore_unions_roundtrip(spark):
    """restore_unions=True re-encodes tagged structs as SPARSE unions on
    export: values round-trip exactly; custom source type codes come
    back as positions (what devolution stores)."""
    from dask_awkward_spark.sources.memory import to_arrow

    u = pa.UnionArray.from_dense(
        pa.array([5, 9, 5, 9], pa.int8()),
        pa.array([0, 0, 1, 1], pa.int32()),
        [pa.array([10, 20], pa.int64()), pa.array(["a", "b"], pa.string())],
        field_names=["i", "s"],
        type_codes=[5, 9],  # non-contiguous source codes -> positions
    )
    t = pa.table({"u": u, "k": pa.array([1, 2, 3, 4], pa.int64())})
    out = to_arrow(from_arrow(spark, t), restore_unions=True)
    v = out.column(0).combine_chunks()
    ut = v.type.field(v.type.get_field_index("u")).type
    assert pa.types.is_union(ut) and ut.mode == "sparse"
    assert list(ut.type_codes) == [0, 1]
    rows = sorted(v.to_pylist(), key=lambda r: r["k"])
    assert [r["u"] for r in rows] == [10, "a", 20, "b"]


def test_to_arrow_restore_unions_nested_in_list(spark):
    from dask_awkward_spark.sources.memory import to_arrow

    su = pa.UnionArray.from_sparse(
        pa.array([0, 1, 0], pa.int8()),
        [
            pa.array([1, None, 3], pa.int64()),
            pa.array([None, "x", None], pa.string()),
        ],
    )
    lu = pa.ListArray.from_arrays(pa.array([0, 2, 3], pa.int32()), su)
    t = pa.table({"lu": lu, "k": pa.array([1, 2], pa.int64())})
    out = to_arrow(from_arrow(spark, t), restore_unions=True)
    v = out.column(0).combine_chunks()
    rows = sorted(v.to_pylist(), key=lambda r: r["k"])
    assert [r["lu"] for r in rows] == [[1, "x"], [3]]
    lt = v.type.field(v.type.get_field_index("lu")).type
    assert pa.types.is_union(lt.value_type)


def test_to_arrow_restore_unions_null_rows(spark):
    """Arrow unions have no top-level validity: a NULL tagged-struct row
    (made by Spark processing, never by ingest) restores as variant 0
    with a NULL child."""
    from dask_awkward_spark.core import NestedArray
    from dask_awkward_spark.sources.memory import to_arrow

    df = spark.createDataFrame(
        [((0, 7, None),), (None,), ((1, None, "y"),)],
        "v struct<tag:tinyint, i:bigint, s:string>",
    )
    out = to_arrow(NestedArray(df), restore_unions=True)
    v = out.column(0).combine_chunks()
    got = v.to_pylist()
    assert sorted(map(str, got)) == sorted(map(str, [7, None, "y"]))


def test_to_arrow_restore_unions_under_map(spark):
    """A devolved union under a MAP value restores too (review finding:
    the restore walk must mirror _devolve_unions's map branch)."""
    from dask_awkward_spark.sources.memory import to_arrow

    su = pa.UnionArray.from_sparse(
        pa.array([0, 1], pa.int8()),
        [pa.array([7, None], pa.int64()), pa.array([None, "z"], pa.string())],
    )
    m = pa.MapArray.from_arrays(
        pa.array([0, 1, 2], pa.int32()),
        pa.array(["a", "b"], pa.string()),
        su,
    )
    t = pa.table({"m": m, "k": pa.array([1, 2], pa.int64())})
    out = to_arrow(from_arrow(spark, t), restore_unions=True)
    v = out.column(0).combine_chunks()
    mt = v.type.field(v.type.get_field_index("m")).type
    assert pa.types.is_map(mt) and pa.types.is_union(mt.item_type)
    # assert at the ARRAY level: pyarrow 16.1's python-scalar access
    # through a map whose item child is a sliced sparse union drops the
    # value (reproducible on a pure-pyarrow MapArray, no Spark
    # involved), but the Arrow buffers are correct — keys/items read
    # back exactly
    rm = v.field("m")
    ks = sorted(zip(rm.keys.to_pylist(), rm.items.to_pylist()))
    assert ks == [("a", 7), ("b", "z")]
