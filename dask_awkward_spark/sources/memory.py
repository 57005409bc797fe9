"""In-memory ingestion (reference lib/io/io.py: from_awkward :79-134,
from_lists :146-191, from_map :528-697) and exports (to_dataframe
:446-496, to_list)."""

from __future__ import annotations

from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import VALUE_COL, NestedArray, from_lists  # noqa: F401


def _devolve_unions(arr):
    """Arrow UnionArray → tagged struct, recursively (the SURVEY §1.2
    union encoding; reference lib/unproject_layout.py:290-311 is the
    inverse direction — reconstructing unions from flat buffers).

    ``union<f0: T0, f1: T1, ...>`` becomes ``struct<tag: tinyint,
    f0: T0, f1: T1, ...>`` where ``tag`` is the 0-based position of the
    row's live variant and every other field is NULL — Spark has no
    union type, and the tagged struct is the standard relational
    encoding (one ``F.when(tag == i, ...)`` per variant recovers any
    union dispatch). Handles dense AND sparse unions, at the top level
    or nested under structs/lists; non-union arrays pass through
    IDENTICAL (`is`-same), so union-free ingest pays nothing."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.offset:
        # Rebase sliced inputs to offset 0 FIRST: a sliced UnionArray's
        # .type_codes/.offsets ignore the slice window (they return the
        # buffer's first len(arr) entries), and a sparse union's
        # children are sliced while its codes are not — devolving such
        # an array silently emits rows 0..n-1 instead of the slice
        # (verified by execution). concat_arrays rebases every buffer;
        # recursion re-enters here, so sliced children handed down by a
        # parent (sparse-union fields are sliced views) normalize too.
        # Offset-0 inputs — the from_arrow path via combine_chunks —
        # skip this, so union-free ingest still pays nothing.
        arr = pa.concat_arrays([arr])
    t = arr.type
    if pa.types.is_union(t):
        codes = pc.cast(arr.type_codes, pa.int8())
        tcodes = list(t.type_codes)
        # tag = position of the row's type code in the union's code list
        tag = pc.cast(
            pc.index_in(codes, value_set=pa.array(tcodes, pa.int8())), pa.int8()
        )
        names, vals = [], []
        for i in range(t.num_fields):
            child = _devolve_unions(arr.field(i))
            if t.mode == "dense":
                idx = pc.if_else(
                    pc.equal(codes, tcodes[i]),
                    arr.offsets,
                    pa.nulls(len(arr), pa.int32()),
                )
                v = child.take(idx)
            else:  # sparse: children are row-aligned
                v = pc.if_else(
                    pc.equal(codes, tcodes[i]),
                    child,
                    pa.nulls(len(arr), child.type),
                )
            names.append(t.field(i).name)
            vals.append(v)
        return pa.StructArray.from_arrays([tag] + vals, names=["tag"] + names)
    if pa.types.is_struct(t):
        # capture children ONCE: pyarrow returns a fresh wrapper per
        # .field() call, so comparing against a re-fetch would never be
        # identical and every union-free column would be rebuilt
        srcs = [arr.field(i) for i in range(t.num_fields)]
        kids = [_devolve_unions(k) for k in srcs]
        if all(k is s for k, s in zip(kids, srcs)):
            return arr
        return pa.StructArray.from_arrays(
            kids,
            names=[t.field(i).name for i in range(t.num_fields)],
            mask=pc.is_null(arr),
        )
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        src_vals = arr.values
        vals = _devolve_unions(src_vals)
        if vals is src_vals:
            return arr
        cls = pa.ListArray if pa.types.is_list(t) else pa.LargeListArray
        # mask: a NULL list entry must stay NULL, not collapse to []
        # (offsets alone encode lengths; validity travels separately)
        return cls.from_arrays(arr.offsets, vals, mask=pc.is_null(arr))
    if pa.types.is_fixed_size_list(t):
        src_vals = arr.values
        vals = _devolve_unions(src_vals)
        if vals is src_vals:
            return arr
        out = pa.FixedSizeListArray.from_arrays(vals, t.list_size)
        if arr.null_count:
            out = pc.if_else(pc.is_valid(arr), out, pa.nulls(len(arr), out.type))
        return out
    if pa.types.is_map(t):
        src_items, src_keys = arr.items, arr.keys
        items = _devolve_unions(src_items)
        keys = _devolve_unions(src_keys)
        if items is src_items and keys is src_keys:
            return arr
        offs = arr.offsets
        if arr.null_count:
            # MapArray.from_arrays has no mask kwarg: a NULL map entry
            # is encoded as a null at its offsets position instead
            o = offs.to_pylist()
            v = pc.is_valid(arr).to_pylist()
            offs = pa.array(
                [o[i] if (i >= len(v) or v[i]) else None for i in range(len(o))],
                pa.int32(),
            )
        return pa.MapArray.from_arrays(offs, keys, items)
    return arr


def from_arrow(spark: SparkSession, table) -> NestedArray:
    """Arrow table → NestedArray (the reference's from_awkward path is
    awkward→Arrow→partitions; Spark ingests Arrow via pandas). Union-
    typed columns (awkward's UnionArray travels to Arrow as a union)
    are devolved to the tagged-struct encoding first — see
    :func:`_devolve_unions`."""
    import pyarrow as pa

    def has_union(t) -> bool:
        if pa.types.is_union(t):
            return True
        if pa.types.is_struct(t):
            return any(has_union(t.field(i).type) for i in range(t.num_fields))
        if (
            pa.types.is_list(t)
            or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)
        ):
            return has_union(t.value_type)
        if pa.types.is_map(t):
            return has_union(t.key_type) or has_union(t.item_type)
        return False

    if any(has_union(f.type) for f in table.schema):
        cols = [_devolve_unions(table.column(i)) for i in range(table.num_columns)]
        table = pa.table(dict(zip(table.column_names, cols)))
        # devolved tables stay Arrow end-to-end (Spark 4 ingests
        # pa.Table natively — no driver-side Python row materialization)
        df = spark.createDataFrame(table)
    else:
        df = spark.createDataFrame(table.to_pandas())
    return NestedArray(df, F.struct(*[F.col(c) for c in df.columns]))


def _restore_unions(arr):
    """Tagged struct → sparse Arrow union, recursively — the opt-in
    inverse of :func:`_devolve_unions` for export. Any struct whose
    FIRST field is ``tag: int8`` re-encodes as
    ``sparse_union<f0, f1, ...>`` with type codes 0..n-1 (the devolve
    direction remaps original Arrow codes to positions, so positions
    are what round-trips). A NULL struct row (or NULL tag — Arrow
    unions have no top-level validity) restores as variant 0 with a
    NULL child, the standard encoding of "no value" in a union.
    Non-matching arrays pass through ``is``-identical."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.offset:
        arr = pa.concat_arrays([arr])  # same rebase rule as devolve
    t = arr.type
    if (
        pa.types.is_struct(t)
        and t.num_fields >= 2
        and t.field(0).name == "tag"
        and pa.types.is_int8(t.field(0).type)
    ):
        kids = [_restore_unions(arr.field(i)) for i in range(1, t.num_fields)]
        names = [t.field(i).name for i in range(1, t.num_fields)]
        tag = arr.field(0)  # NULL under a NULL parent row too
        codes = pc.if_else(
            pc.is_valid(tag), tag, pa.scalar(0, pa.int8())
        )
        return pa.UnionArray.from_sparse(codes, kids, field_names=names)
    if pa.types.is_struct(t):
        # capture children ONCE: pyarrow returns a fresh wrapper per
        # .field() call, so comparing against a re-fetch would never be
        # identical and every union-free column would be rebuilt
        srcs = [arr.field(i) for i in range(t.num_fields)]
        kids = [_restore_unions(k) for k in srcs]
        if all(k is s for k, s in zip(kids, srcs)):
            return arr
        return pa.StructArray.from_arrays(
            kids,
            names=[t.field(i).name for i in range(t.num_fields)],
            mask=pc.is_null(arr),
        )
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        src = arr.values
        vals = _restore_unions(src)
        if vals is src:
            return arr
        cls = pa.ListArray if pa.types.is_list(t) else pa.LargeListArray
        return cls.from_arrays(arr.offsets, vals, mask=pc.is_null(arr))
    if pa.types.is_fixed_size_list(t):
        src = arr.values
        vals = _restore_unions(src)
        if vals is src:
            return arr
        out = pa.FixedSizeListArray.from_arrays(vals, t.list_size)
        if arr.null_count:
            out = pc.if_else(pc.is_valid(arr), out, pa.nulls(len(arr), out.type))
        return out
    if pa.types.is_map(t):
        # mirror _devolve_unions: a tagged struct under a MAP value or
        # key restores too (Spark renders NULL map entries as {}, so no
        # validity splice is needed on the way back out). Caveat, in
        # pyarrow not here: python-SCALAR access through a map whose
        # item child is a sliced sparse union drops the value in
        # pyarrow 16.1 (reproducible with a pure-pyarrow MapArray) —
        # the buffers are correct; read .keys/.items or use IPC
        ksrc, isrc = arr.keys, arr.items
        keys, items = _restore_unions(ksrc), _restore_unions(isrc)
        if keys is ksrc and items is isrc:
            return arr
        return pa.MapArray.from_arrays(arr.offsets, keys, items)
    return arr


def to_arrow(arr: NestedArray, restore_unions: bool = False):
    """NestedArray → pyarrow Table (reference to_awkward/Arrow bridge;
    Spark 4's native ``DataFrame.toArrow`` — Arrow IPC transfer, no
    pandas hop). Driver-side materialization: size-gate it like any
    collect.

    Union devolution is ONE-WAY by default: a column ingested from an
    Arrow union (:func:`_devolve_unions`) exports as its tagged-struct
    encoding (``struct<tag: tinyint, <variants>>``) — Spark has no
    union type, so the original Arrow type is not recoverable from the
    Spark schema alone. ``restore_unions=True`` opts into the inverse
    (:func:`_restore_unions`): every struct whose first field is
    ``tag: int8`` re-encodes as a SPARSE union with type codes 0..n-1
    (positions, not the source's original code numbers — positions are
    what devolution stores). Only pass the flag when tagged structs in
    the data really are devolved unions; a user struct that happens to
    lead with an ``int8 tag`` field matches the shape too. Spark's
    Arrow export also renders a NULL MAP value as ``{}`` (documented in
    tests/test_union.py)."""
    table = arr.to_df().toArrow()
    if not restore_unions:
        return table
    import pyarrow as pa

    cols = [_restore_unions(table.column(i)) for i in range(table.num_columns)]
    return pa.Table.from_arrays(cols, names=table.column_names)


def from_map(
    spark: SparkSession,
    fn: Callable[..., Iterable[Any]],
    *iterables: Iterable[Any],
    schema: str | None = None,
    args: tuple = (),
    **kwargs: Any,
) -> NestedArray:
    """Generic one-task-per-input scan factory (reference lib/io/io.py:528,
    the substrate of all its sources). Spark analogue: parallelize the
    input descriptors, flatMap the read function, apply the declared
    schema.

    Full reference protocol (tests/test_io.py test_from_map_with_args_kwargs,
    test_from_map_pack_single_iterable, test_from_map_enumerate): several
    iterables are zipped and unpacked into ``fn(*elems, *args, **kwargs)``;
    a single iterable passes its element as the sole positional. The
    trailing positional may be the schema (legacy call shape
    ``from_map(spark, fn, inputs, schema)``)."""
    if (
        schema is None
        and len(iterables) >= 2
        and isinstance(iterables[-1], str)
    ):
        schema, iterables = iterables[-1], iterables[:-1]
    if schema is None:
        raise TypeError("from_map requires an output schema")
    multi = len(iterables) > 1
    inputs = (
        list(zip(*[list(it) for it in iterables])) if multi else list(iterables[0])
    )

    def call(x, _fn=fn, _multi=multi, _args=tuple(args), _kwargs=dict(kwargs)):
        rows = _fn(*x, *_args, **_kwargs) if _multi else _fn(x, *_args, **_kwargs)
        return list(rows)

    rdd = spark.sparkContext.parallelize(inputs, max(len(inputs), 1)).flatMap(call)
    df = spark.createDataFrame(rdd, schema)
    return NestedArray(df, F.struct(*[F.col(c) for c in df.columns]))


def to_local_iterator(arr: NestedArray):
    """Partition-wise export (reference to_delayed/to_dask_bag,
    lib/io/io.py:249-282): lazily iterate rows without materializing the
    whole result on the driver."""
    for row in arr.to_df().toLocalIterator():
        yield row[0]


def from_dask_array(spark: SparkSession, darr, chunk_rows: int = 1 << 20) -> NestedArray:
    """Rectilinear-array bridge (reference lib/io/io.py:381-443
    ``from_dask_array``). Accepts a dask.array, a numpy array, or anything
    numpy can coerce; 1-D becomes a flat collection, 2-D becomes rows of
    fixed-length lists. dask is optional in this environment — when
    present, chunks are materialized chunk-by-chunk (no full-array copy on
    the driver beyond Arrow batching)."""
    import numpy as np

    if hasattr(darr, "compute") and hasattr(darr, "chunks"):  # dask.array duck-type
        # materialize block-by-block along axis 0 — each block is computed
        # and shipped separately (at most chunk_rows rows on the driver at
        # a time), then the per-block frames union lazily; never one
        # full-array copy
        spec = {0: chunk_rows}
        spec.update({i: -1 for i in range(1, darr.ndim)})
        d = darr.rechunk(spec)
        parts = [
            _np_frame(spark, np.asarray(d.blocks[i].compute()))
            for i in range(d.numblocks[0])
        ]
        if not parts:
            return _np_frame(spark, np.asarray(darr.compute()))
        out = parts[0].to_df()
        for p in parts[1:]:
            out = out.unionAll(p.to_df())
        return NestedArray(out)
    return _np_frame(spark, np.asarray(darr))


def _np_frame(spark: SparkSession, arr) -> NestedArray:
    if arr.ndim == 1:
        return from_lists(spark, [x.item() for x in arr], _np_spark_type(arr.dtype))
    if arr.ndim == 2:
        rows = [[x.item() for x in row] for row in arr]
        return from_lists(spark, rows, f"array<{_np_spark_type(arr.dtype)}>")
    raise NotImplementedError("from_dask_array supports 1-D and 2-D arrays")


def to_dask_array(arr: NestedArray):
    """Collection → numpy (and dask.array when available) — reference
    lib/io/io.py:285-378 ``to_dask_array``. Jagged rows are not
    rectilinear; like the reference, this requires a regular shape."""
    import numpy as np

    data = arr.compute()
    out = np.asarray(data)
    try:
        import dask.array as da  # optional in this environment

        return da.from_array(out)
    except Exception:
        return out


def _np_spark_type(dt) -> str:
    import numpy as np

    if np.issubdtype(dt, np.floating):
        return "double"
    if np.issubdtype(dt, np.integer):
        return "bigint"
    if np.issubdtype(dt, np.bool_):
        return "boolean"
    return "string"


def to_dataframe(arr: NestedArray) -> DataFrame:
    """Nested → fully-exploded flat table (reference lib/io/io.py:446-496
    ``to_dataframe`` / ak.to_dataframe): one row per innermost element."""
    df = arr.to_df()
    from pyspark.sql import types as T

    dt = df.schema[0].dataType
    while isinstance(dt, T.ArrayType):
        df = df.select(F.posexplode(VALUE_COL).alias("pos", VALUE_COL))
        df = df.select(VALUE_COL)
        dt = dt.elementType
    if isinstance(dt, T.StructType):
        df = df.select(f"{VALUE_COL}.*")
    return df
