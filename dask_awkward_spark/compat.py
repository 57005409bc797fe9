"""Module-level API parity with the reference's top-level namespace.

The reference (dask-contrib/dask-awkward ``__init__.py``) exposes its
whole surface as free functions next to the ``Array`` class; users write
``dak.fields(arr)`` as often as ``arr.fields``. This module provides the
same free-function spellings over :class:`~.core.NestedArray` so a
reference user can switch imports and keep their code:

- describe surface (reference lib/describe.py): :func:`backend`,
  :func:`fields`.
- inspect surface (lib/inspect.py): :func:`sample`,
  :func:`report_necessary_columns` / :func:`report_necessary_buffers`.
- core surface (lib/core.py): :data:`Array` alias, ``type``
  (exported from the package as ``type`` like the reference's ``_type``),
  :func:`map_partitions`, :func:`with_field` / :func:`without_field`,
  :func:`to_list`, :func:`compatible_partitions`,
  :class:`PartitionCompatibility`.
- io bridges (lib/io/): :func:`from_awkward`, :func:`from_delayed`,
  :func:`to_delayed`, :func:`to_dask_bag`, :func:`layout_to_jsonschema`
  (dask-dependent exports are import-gated — this container has no dask).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame

from .core import NestedArray, PartitionCompatibility, partition_compatibility
from .plans.inspect import necessary_columns as _necessary_columns

#: The reference names its collection class ``Array``.
Array = NestedArray


# ---------------- describe (lib/describe.py) ----------------

def backend(arr: NestedArray) -> str:
    """Execution backend of the collection (reference lib/describe.py
    ``backend`` returns e.g. "cpu"/"typetracer"); here always Spark."""
    return "spark"


def fields(arr: NestedArray) -> list[str]:
    """Record field names (reference lib/describe.py ``fields``)."""
    return arr.fields


# ---------------- core (lib/core.py) ----------------

def calculate_known_divisions(arr: NestedArray) -> tuple:
    """Division boundaries — cumulative row offsets per partition
    (reference lib/core.py:2460-2484; an explicitly eager pass there too).

    Spark analogue: one narrow per-partition count job (no shuffle), then a
    driver-side cumsum over ≤ npartitions rows — the same machinery
    ``with_row_index`` memoizes for order-sensitive ops.
    """
    from pyspark.sql import functions as F

    counts = {
        r["__pid__"]: r["cnt"]
        for r in (
            arr.to_df()
            .select(F.spark_partition_id().alias("__pid__"))
            .groupBy("__pid__")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
    }
    divs, acc = [0], 0
    for pid in sorted(counts):
        acc += counts[pid]
        divs.append(acc)
    return tuple(divs) if counts else (0, 0)


def is_awkward_collection(obj) -> bool:
    """True for any of this engine's collection types (reference
    lib/core.py:2507-2521 checks Array/Record/Scalar)."""
    from .core import Record, Scalar

    return isinstance(obj, (NestedArray, Record, Scalar))


def typeof(arr: NestedArray):
    """The collection's element type (reference ``dak.type``, lib/core.py
    ``_type``); exported from the package as ``type``."""
    return arr.dtype


def to_list(arr: NestedArray) -> list:
    return arr.compute()


def map_partitions(
    fn: Callable, arr: NestedArray, *more, schema=None
) -> NestedArray:
    """Free-function spelling of the Arrow escape hatch (reference
    lib/core.py:2146-2295 ``map_partitions(fn, *colls)``).

    A single collection arrives as column ``v`` (the method contract);
    multiple collections are row-index aligned (partition-compatibility
    MAYBE path) and shipped to ``fn`` in ONE Arrow stream whose batches
    carry columns ``c0..cN`` in argument order — congruent rows of every
    input, the contract the reference gets from zipping partitions.

    Non-collection positionals are forwarded to ``fn`` after the Arrow
    iterator, like the reference broadcasts scalar args to every partition
    call (lib/core.py:2146-2295 packs them via ArgsKwargsPackedFunction).
    ``schema`` may still be passed positionally as the last argument
    (``map_partitions(fn, arr, schema)``) — recognized by type
    (StructType/DataType/DDL string), so a trailing scalar is only taken
    as the schema when no ``schema=`` kwarg was given and it looks like
    one."""
    import pyspark.sql.types as T

    if schema is None and more and isinstance(more[-1], (str, T.DataType)):
        schema, more = more[-1], more[:-1]
    if schema is None:
        raise TypeError("map_partitions requires an output schema")
    colls = [a for a in more if isinstance(a, NestedArray)]
    scalars = [a for a in more if not isinstance(a, NestedArray)]
    if scalars:
        inner = fn

        def fn(it, _inner=inner, _scalars=tuple(scalars)):
            return _inner(it, *_scalars)

    if not colls:
        return arr.map_partitions(fn, schema)
    from .core import align_many

    arrays = align_many([arr, *colls])
    src = arrays[0]._df.select(
        *[a._col.alias(f"c{i}") for i, a in enumerate(arrays)]
    )
    return NestedArray(src.mapInArrow(fn, schema))


def with_field(arr: NestedArray, name: str, value: NestedArray) -> NestedArray:
    return arr.with_field(name, value)


def without_field(arr: NestedArray, name: str) -> NestedArray:
    return arr.without_field(name)


def compatible_partitions(*arrays: NestedArray) -> bool:
    """True when the collections can combine element-wise with NO
    realignment (reference lib/core.py ``compatible_partitions``). MAYBE
    (different bases, alignable by row-index join) counts as False, like
    the reference's unknown-divisions case."""
    return partition_compatibility(*arrays) == PartitionCompatibility.YES


# ---------------- inspect (lib/inspect.py) ----------------

def sample(arr: NestedArray, fraction: float | None = None,
           factor: int | None = None, seed: int = 42) -> NestedArray:
    return arr.sample(fraction=fraction, factor=factor, seed=seed)


def _to_df(x) -> DataFrame:
    return x.to_df() if isinstance(x, NestedArray) else x


def report_necessary_columns(x) -> dict[str, list[str]]:
    """Which source columns the plan actually reads, per scan (reference
    lib/inspect.py:41-107 ``report_necessary_columns``). Accepts a
    NestedArray or a DataFrame."""
    return _necessary_columns(_to_df(x))


def report_necessary_buffers(x) -> dict[str, list[str]]:
    """Reference lib/inspect.py:1-40 reports awkward BUFFERS; Spark's scan
    granularity is the column, so this returns the same per-scan column
    report as :func:`report_necessary_columns`."""
    return _necessary_columns(_to_df(x))


# ---------------- io bridges (lib/io/) ----------------

def from_awkward(spark, ak_arr, npartitions: int | None = None) -> NestedArray:
    """awkward Array → collection (reference lib/io/io.py:79-134). awkward
    is optional here: when importable, the layout travels via Arrow;
    otherwise plain lists / pyarrow tables are accepted directly."""
    from .core import from_lists
    from .sources.memory import from_arrow

    try:
        import awkward as ak  # optional in this environment

        table = ak.to_arrow_table(ak_arr)
        out = from_arrow(spark, table)
    except ImportError:
        if hasattr(ak_arr, "to_pandas") or hasattr(ak_arr, "column_names"):
            out = from_arrow(spark, ak_arr)
        elif isinstance(ak_arr, (list, tuple)):
            return from_lists(spark, ak_arr)
        else:
            raise TypeError(
                "from_awkward without the awkward package accepts lists or "
                "pyarrow tables"
            ) from None
    if npartitions:
        return out.repartition(npartitions)
    return out


def from_delayed(spark, parts: Iterable[Any], schema: str) -> NestedArray:
    """One partition per delayed/callable object (reference
    lib/io/io.py:195-246 ``from_delayed``): each part is evaluated inside
    its Spark task via the generic from_map scan factory — TRUE-lazy like
    the reference keeps foreign partitions lazy. Construction only pickles
    the part descriptors; ``p.compute()`` / ``p()`` runs in executor tasks
    at action time, never on the driver (asserted by
    tests/test_round4_ops.py::test_from_delayed_is_lazy_and_executor_side)."""
    from .sources.memory import from_map

    def _run(p):
        rows = p.compute() if hasattr(p, "compute") else p()
        return list(rows)

    return from_map(spark, _run, list(parts), schema)


def _collect_partition(arr: NestedArray, i: int) -> list:
    return arr.partition(i).compute()


def to_delayed(arr: NestedArray) -> list:
    """One dask.delayed per partition (reference lib/io/io.py:249-268).
    Requires dask; :func:`~.sources.memory.to_local_iterator` is the
    pure-Spark export."""
    try:
        import dask
    except ImportError as e:  # pragma: no cover — dask absent in container
        raise ImportError(
            "to_delayed requires dask; use to_local_iterator for a "
            "pure-Spark partition-wise export"
        ) from e
    n = arr.to_df().rdd.getNumPartitions()
    return [dask.delayed(_collect_partition)(arr, i) for i in range(n)]


def to_dask_bag(arr: NestedArray):
    """Collection → dask.bag (reference lib/io/io.py:271-282), one bag
    partition per Spark partition."""
    try:
        import dask.bag as db
    except ImportError as e:  # pragma: no cover — dask absent in container
        raise ImportError(
            "to_dask_bag requires dask; use to_local_iterator for a "
            "pure-Spark partition-wise export"
        ) from e
    return db.from_delayed(to_delayed(arr))


def layout_to_jsonschema(x, title: str = "untitled") -> dict:
    """Element type → JSON Schema document (reference lib/io/json.py
    ``layout_to_jsonschema``, which walks the awkward layout; here the
    Spark DataType tree is walked instead). Accepts a NestedArray or a
    DataType."""
    dt = x.dtype if isinstance(x, NestedArray) else x
    return {"title": title, **_dt_jsonschema(dt)}


def _dt_jsonschema(dt) -> dict:
    import pyspark.sql.types as T

    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _dt_jsonschema(dt.elementType)}
    if isinstance(dt, T.StructType):
        return {
            "type": "object",
            "properties": {f.name: _dt_jsonschema(f.dataType) for f in dt.fields},
        }
    if isinstance(dt, T.MapType):
        return {"type": "object", "additionalProperties": _dt_jsonschema(dt.valueType)}
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return {"type": "integer"}
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return {"type": "number"}
    if isinstance(dt, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return {"type": "string", "format": "date-time"}
    if isinstance(dt, T.BinaryType):
        return {"type": "string", "contentEncoding": "base64"}
    return {"type": "string"}
