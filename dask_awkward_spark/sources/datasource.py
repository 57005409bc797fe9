"""Custom IO-function protocol as a Spark Python Data Source.

The reference exposes a pluggable IO protocol (``layers/layers.py:68-155``
``AwkwardInputLayer`` + ``lib/io/columnar.py:54-183``): an IO function
object with ``mock()`` (typed empty array for metadata), ``project()`` /
``prepare_for_projection()`` (column-pruning pushdown into the source) and
``return_report`` (per-partition success/failure records). Its substrate
is ``from_map`` (``lib/io/io.py:528-697``): one task per input descriptor.

The Spark-native re-expression is the Python Data Source API (Spark 4):

- one :class:`InputPartition` per input descriptor == one reference task;
- the declared schema == ``mock()`` (Catalyst has full types before any
  data is read, exactly what the reference's typetracer pass provides);
- :meth:`DataSourceReader.pushFilters` == the projection/pushdown hook —
  Spark hands the reader the query's predicates, the reader keeps the
  ones it can evaluate inside ``read()`` (so rows die at the source,
  never crossing the Python->JVM boundary) and returns the rest for
  Spark to re-apply. That is the exact contract of the reference's
  ``prepare_for_projection``/``project`` pair, for predicates instead of
  buffers;
- the optional report (``push_report=True``) == ``return_report``: the
  reader appends one ``__report__`` JSON column describing the partition
  that produced each row block, which :func:`read_report` splits off.

At scale this is the escape hatch for sources Spark has no native reader
for (bespoke binary formats, REST/paginated APIs, data-lake sidecars):
partitions() declares the parallelism, each read() runs on an executor,
and pushed filters cut the transfer before it happens.
"""

from __future__ import annotations

import base64
import json

from pyspark import cloudpickle as pickle  # serialize fn by value, not by ref
from typing import Any, Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

REPORT_COL = "__report__"


def _dumps_by_value(obj) -> bytes:
    """cloudpickle dump with the IO function's defining module forced to
    by-value serialization when it isn't an installed package — a script
    or test module on the driver doesn't exist on executor workers, so a
    by-reference pickle would raise ModuleNotFoundError there."""
    import sys
    import sysconfig

    fn = obj.get("fn")
    mod = sys.modules.get(getattr(fn, "__module__", "") or "")
    installed = (sysconfig.get_paths()["purelib"], sysconfig.get_paths()["stdlib"])
    mod_file = getattr(mod, "__file__", None)
    force = (
        mod is not None
        and mod.__name__ != "__main__"  # __main__ is by-value already
        and (mod_file is None or not mod_file.startswith(installed))
    )
    if force:
        pickle.register_pickle_by_value(mod)
    try:
        return pickle.dumps(obj)
    finally:
        if force:
            pickle.unregister_pickle_by_value(mod)


class _FnPartition(InputPartition):
    """One input descriptor == one reference IO task (picklable)."""

    def __init__(self, index: int, payload: Any):
        self.index = index
        self.payload = payload


def _filter_predicate(f: Filter, fields: "list[str] | None" = None) -> Callable[[dict], bool] | None:
    """Compile one Catalyst filter to a row-dict predicate, or None if the
    filter class is not supported (Spark then re-applies it itself).

    Declined on purpose (accepted filters are TRUSTED — Spark removes the
    plan's Filter node, so a semantic mismatch silently drops rows):

    - attributes outside ``fields`` (e.g. the synthesized ``__report__``
      column, absent from the row dicts fn produces — evaluating it here
      would null-compare every row away);
    - float-NaN comparison values: Spark SQL's NaN orders above all
      doubles and NaN==NaN is true, Python disagrees on both.
    """
    import math

    col = f.attribute[0] if len(f.attribute) == 1 else None
    if col is None:  # nested attribute paths: decline, Spark re-applies
        return None
    if fields is not None and col not in fields:
        return None
    val = getattr(f, "value", None)
    if isinstance(val, float) and math.isnan(val):
        return None

    def _cmp(op, nan_result: bool = False):
        # nan_result: what the predicate yields when the ROW value is NaN.
        # Spark SQL orders NaN above every double, so NaN > v / NaN >= v
        # are TRUE there while Python returns False — an accepted filter
        # is trusted (Spark drops its Filter node), so we must mirror
        # Spark, not Python.
        def pred(row, _c=col, _v=getattr(f, "value", None)):
            x = row.get(_c)
            if x is None:
                return False
            if isinstance(x, float) and math.isnan(x):
                return nan_result
            return op(x, _v)

        return pred

    if isinstance(f, EqualTo):
        return _cmp(lambda x, v: x == v)
    if isinstance(f, EqualNullSafe):
        return lambda row, _c=col, _v=f.value: row.get(_c) == _v
    if isinstance(f, GreaterThan):
        return _cmp(lambda x, v: x > v, nan_result=True)
    if isinstance(f, GreaterThanOrEqual):
        return _cmp(lambda x, v: x >= v, nan_result=True)
    if isinstance(f, LessThan):
        return _cmp(lambda x, v: x < v)
    if isinstance(f, LessThanOrEqual):
        return _cmp(lambda x, v: x <= v)
    if isinstance(f, In):
        if any(isinstance(v, float) and math.isnan(v) for v in f.value):
            return None  # NaN membership differs between engines
        # a NULL in the IN-list can never make the predicate true in SQL
        # (x IN (.., NULL) is true-or-NULL, and NULL rows are filtered);
        # `None in vals` would wrongly keep null rows
        vals = {v for v in f.value if v is not None}
        return lambda row, _c=col: row.get(_c) in vals
    if isinstance(f, IsNull):
        return lambda row, _c=col: row.get(_c) is None
    if isinstance(f, IsNotNull):
        return lambda row, _c=col: row.get(_c) is not None
    if isinstance(f, StringStartsWith):
        return _cmp(lambda x, v: isinstance(x, str) and x.startswith(v))
    if isinstance(f, StringEndsWith):
        return _cmp(lambda x, v: isinstance(x, str) and x.endswith(v))
    if isinstance(f, StringContains):
        return _cmp(lambda x, v: isinstance(x, str) and v in x)
    return None


class PythonIOReader(DataSourceReader):
    def __init__(self, schema, options):
        spec = pickle.loads(base64.b64decode(options["payload"]))
        self.fn: Callable[[Any], Iterable[Any]] = spec["fn"]
        self.inputs: list[Any] = spec["inputs"]
        self.report: bool = spec["report"]
        self.fields = [f.name for f in schema.fields if f.name != REPORT_COL]
        self.accepted: list[Callable[[dict], bool]] = []

    def pushFilters(self, filters: "list[Filter]") -> "Iterator[Filter]":
        # keep what we can evaluate at the source; hand back the rest —
        # the reference's prepare_for_projection/project contract
        for f in filters:
            pred = _filter_predicate(f, self.fields)
            if pred is None:
                yield f
            else:
                self.accepted.append(pred)

    def partitions(self):
        return [_FnPartition(i, x) for i, x in enumerate(self.inputs)]

    def read(self, partition: _FnPartition):
        n_in = n_out = 0
        out = []
        for row in self.fn(partition.payload):
            n_in += 1
            d = row if isinstance(row, dict) else dict(zip(self.fields, row))
            if all(p(d) for p in self.accepted):
                n_out += 1
                out.append(tuple(d.get(c) for c in self.fields))
        if self.report:
            rep = {
                "partition": partition.index,
                "rows_read": n_in,
                "rows_emitted": n_out,
                "pushed_filters": len(self.accepted),
            }
            if not out:
                # a partition whose rows were all filtered (or whose fn
                # yielded nothing) must still be represented — the
                # reference's return_report records every partition
                # (lib/io/parquet.py:36-61). Carry the report on one
                # all-null sentinel row; read_report drops it from the
                # data side via the sentinel marker.
                yield (None,) * len(self.fields) + (
                    json.dumps({**rep, "sentinel": True}),
                )
            else:
                rep_s = json.dumps(rep)
                for t in out:
                    yield t + (rep_s,)
        else:
            yield from out


class PythonIOStreamReader(DataSourceStreamReader):
    """Streaming twin: the input-descriptor list is an append-only log;
    an offset is an index into it. Each micro-batch covers the
    descriptors between the committed and latest offsets, one
    InputPartition per descriptor — ``fn`` still runs on executors.
    ``batch_size`` throttles descriptors per micro-batch (the
    ``maxFilesPerTrigger`` analogue). Replay of an in-flight batch after
    failure is exact — partitions(start, end) is deterministic in the
    offsets. Progress (``self._pos``) is driver-local, so on a restart
    from checkpoint the fresh reader instance learns the committed
    position from the first partitions()/commit() call and never lets
    latestOffset() regress behind it (a regressed offset would replay
    already-committed descriptors as duplicates)."""

    def __init__(self, schema, options):
        spec = pickle.loads(base64.b64decode(options["payload"]))
        self.fn = spec["fn"]
        self.inputs = spec["inputs"]
        self.batch = int(options.get("batch_size", "1"))
        self.fields = [f.name for f in schema.fields]
        self._pos = 0

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # advance at most batch_size descriptors per trigger — the
        # throttle must live HERE: partitions(start, end) is contractually
        # the exact [start, end) range, so clamping there would drop data
        self._pos = min(self._pos + self.batch, len(self.inputs))
        return {"index": self._pos}

    def partitions(self, start: dict, end: dict):
        # recover from checkpointed offsets: on restart Spark replays the
        # last planned batch / resumes from the committed offset with a
        # FRESH reader whose _pos is 0 — ratchet up so the next
        # latestOffset() continues from there instead of re-emitting
        self._pos = max(self._pos, start["index"], end["index"])
        return [_FnPartition(i, self.inputs[i]) for i in range(start["index"], end["index"])]

    def read(self, partition: _FnPartition):
        for row in self.fn(partition.payload):
            d = row if isinstance(row, dict) else dict(zip(self.fields, row))
            yield tuple(d.get(c) for c in self.fields)

    def commit(self, end: dict) -> None:
        # descriptor list is immutable (nothing to release), but the
        # committed offset is the restart floor — ratchet like partitions()
        self._pos = max(self._pos, end["index"])


class _PartitionResult(WriterCommitMessage):
    """Per-task commit message: whatever the user's write_fn returned."""

    def __init__(self, payload: Any):
        self.payload = payload


class PythonIOWriter(DataSourceWriter):
    """Write face of the protocol — the custom-SINK analogue of the
    reference's to_parquet/to_json partition writers (lib/io/parquet.py
    :515-721): ``write_fn(rows)`` runs once per partition on an executor
    and returns a descriptor (file path, upload id, row count, ...);
    ``commit_fn(descriptors)`` runs exactly once on the driver after ALL
    tasks succeed — the transactional manifest step (speculative/retried
    task attempts each produce a message, but only the committed set
    reaches commit_fn, which is the whole exactly-once contract of the
    API). ``abort_fn`` (optional) sees the partial descriptors on
    failure for cleanup."""

    def __init__(self, options):
        spec = pickle.loads(base64.b64decode(options["payload"]))
        self.write_fn = spec["write_fn"]
        self.commit_fn = spec.get("commit_fn")
        self.abort_fn = spec.get("abort_fn")

    def write(self, rows) -> _PartitionResult:
        return _PartitionResult(self.write_fn(rows))

    def commit(self, messages) -> None:
        if self.commit_fn is not None:
            self.commit_fn([m.payload for m in messages if m is not None])

    def abort(self, messages) -> None:
        if self.abort_fn is not None:
            self.abort_fn([m.payload for m in messages if m is not None])


class PythonIOStreamWriter(DataSourceStreamWriter):
    """Streaming face of the function sink: ``write_fn(rows)`` per task
    per micro-batch; ``commit_fn(descriptors, batch_id)`` once per
    micro-batch on the driver. The batch id is the replay key — a
    restarted query re-runs a batch with the SAME id, so an idempotent
    commit_fn (write manifest ``batch-<id>``, overwrite-same-name) gives
    end-to-end exactly-once to arbitrary external systems, which is
    precisely the foreachBatch/transactional-sink pattern Spark
    documents, expressed as a reusable source."""

    def __init__(self, options):
        spec = pickle.loads(base64.b64decode(options["payload"]))
        self.write_fn = spec["write_fn"]
        self.commit_fn = spec.get("commit_fn")
        self.abort_fn = spec.get("abort_fn")

    def write(self, rows) -> _PartitionResult:
        return _PartitionResult(self.write_fn(rows))

    def commit(self, messages, batchId: int) -> None:
        if self.commit_fn is not None:
            self.commit_fn([m.payload for m in messages if m is not None], batchId)

    def abort(self, messages, batchId: int) -> None:
        if self.abort_fn is not None:
            self.abort_fn([m.payload for m in messages if m is not None], batchId)


class PythonIOSource(DataSource):
    """``spark.read.format("python_io")`` — generic from_map-style source
    (batch + streaming) and function sink (batch + streaming)."""

    @classmethod
    def name(cls) -> str:
        return "python_io"

    def schema(self) -> str:
        return self.options["ddl"]

    def reader(self, schema) -> PythonIOReader:
        return PythonIOReader(schema, self.options)

    def streamReader(self, schema) -> PythonIOStreamReader:
        return PythonIOStreamReader(schema, self.options)

    def writer(self, schema, overwrite: bool) -> PythonIOWriter:
        if overwrite:
            # the function sink has no notion of "truncate the target" —
            # silently treating overwrite as append would break the
            # caller's exactly-once assumptions
            raise ValueError(
                "python_io sink supports mode='append' only; "
                "implement truncation inside commit_fn if needed"
            )
        return PythonIOWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> PythonIOStreamWriter:
        return PythonIOStreamWriter(self.options)


def register(spark: SparkSession) -> None:
    """Idempotent registration of the python_io format on this session."""
    # pushFilters is gated off by default (Spark 4.1) — runtime-settable
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PythonIOSource)


def from_datasource(
    spark: SparkSession,
    fn: Callable[[Any], Iterable[Any]],
    inputs: "list[Any]",
    schema: str,
    report: bool = False,
) -> DataFrame:
    """Read via the registered Python data source: one partition per input
    descriptor, ``fn(descriptor)`` yielding dicts or tuples on executors.

    With ``report=True`` the returned frame is a CARRIER, not a data
    frame: each row carries a ``__report__`` JSON column, and a partition
    that emitted no data rows is represented by one all-null sentinel row
    so the report covers every partition (the reference's
    ``return_report`` records, lib/io/parquet.py:36-61). ALWAYS split a
    carrier with :func:`read_report` before consuming data — counting or
    aggregating the raw carrier includes the sentinels (one per empty
    partition), and the sentinel's null columns bypass source-applied
    predicates by construction."""
    register(spark)
    payload = base64.b64encode(
        _dumps_by_value({"fn": fn, "inputs": list(inputs), "report": report})
    ).decode("ascii")
    ddl = schema if not report else f"{schema}, {REPORT_COL} string"
    return (
        spark.read.format("python_io")
        .option("ddl", ddl)
        .option("payload", payload)
        .load()
    )


def stream_from_datasource(
    spark: SparkSession,
    fn: Callable[[Any], Iterable[Any]],
    inputs: "list[Any]",
    schema: str,
    batch_size: int = 1,
) -> DataFrame:
    """Streaming read over the same fn/descriptor contract: descriptors
    are consumed as an append-only log, ``batch_size`` per micro-batch
    (``maxFilesPerTrigger`` analogue), fn executing on executors."""
    register(spark)
    payload = base64.b64encode(
        _dumps_by_value({"fn": fn, "inputs": list(inputs), "report": False})
    ).decode("ascii")
    return (
        spark.readStream.format("python_io")
        .option("ddl", schema)
        .option("payload", payload)
        .option("batch_size", str(batch_size))
        .load()
    )


def to_datasource(
    df: DataFrame,
    write_fn: Callable[[Any], Any],
    commit_fn: Callable[["list[Any]"], None] | None = None,
    abort_fn: Callable[["list[Any]"], None] | None = None,
) -> None:
    """Write each partition through ``write_fn(rows_iterator) ->
    descriptor`` on executors, then ``commit_fn(descriptors)`` once on
    the driver (the manifest/transaction step). The custom-sink mirror
    of :func:`from_datasource`."""
    spark = df.sparkSession
    register(spark)
    payload = base64.b64encode(
        _dumps_by_value(
            {"fn": write_fn, "write_fn": write_fn, "commit_fn": commit_fn, "abort_fn": abort_fn}
        )
    ).decode("ascii")
    (
        df.write.format("python_io")
        .option("payload", payload)
        .mode("append")
        .save()
    )


def stream_to_datasource(
    df: DataFrame,
    write_fn: Callable[[Any], Any],
    commit_fn: Callable[["list[Any]", int], None] | None = None,
    abort_fn: Callable[["list[Any]", int], None] | None = None,
    checkpoint_dir: str | None = None,
):
    """Drain a streaming frame into the function sink
    (``processAllAvailable`` then stop — availableNow would snapshot the
    source offset ONCE, defeating a source whose latestOffset advances
    per trigger, like our throttled descriptor log). ``commit_fn(
    descriptors, batch_id)`` fires once per micro-batch — make it
    idempotent in batch_id for exactly-once."""
    import shutil
    import tempfile

    spark = df.sparkSession
    register(spark)
    payload = base64.b64encode(
        _dumps_by_value(
            {"fn": write_fn, "write_fn": write_fn, "commit_fn": commit_fn, "abort_fn": abort_fn}
        )
    ).decode("ascii")
    # an ephemeral checkpoint is only correct because this helper drains
    # to completion and stops; callers who want restart-recovery must pass
    # their own durable checkpoint_dir
    ephemeral = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="dakspark_pyio_ckpt_")
    q = (
        df.writeStream.format("python_io")
        .option("payload", payload)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        if ephemeral:
            shutil.rmtree(ckpt, ignore_errors=True)


def read_report(df: DataFrame) -> "tuple[DataFrame, DataFrame]":
    """Split a report-carrying frame into (data, per-partition report).

    Partitions that emitted no data rows are represented by an all-null
    sentinel row (``"sentinel": true`` in the report JSON) so EVERY
    partition appears in the report; the sentinel is excluded from the
    data side here."""
    sentinel = F.get_json_object(F.col(REPORT_COL), "$.sentinel") == "true"
    data = df.filter(~F.coalesce(sentinel, F.lit(False))).drop(REPORT_COL)
    rep_schema = (
        "partition bigint, rows_read bigint, rows_emitted bigint, pushed_filters bigint"
    )
    rep = (
        df.select(F.from_json(REPORT_COL, rep_schema).alias("r"))
        .select("r.*")
        .dropDuplicates(["partition"])
    )
    return data, rep
