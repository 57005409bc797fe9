"""JSON scan/sink (reference lib/io/json.py).

The reference's three partitioning modes collapse onto Spark's json reader:

- line-delimited per-file (``_from_json_files``, :272-321) → default mode
- single-object-per-file (``_from_json_sopf``, :324-361) → ``multiLine``
- byte-chunked (``_from_json_bytes``, :364-424) → automatic file splitting

Schema control mirrors the reference: inference by sampling
(``samplingRatio`` ≈ meta_sample_rows, :462-463) or an explicit schema
(≈ its JSONSchema support, :443-464).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import NestedArray


def from_json(
    spark: SparkSession,
    source: str | list[str],
    line_delimited: bool = True,
    schema: T.StructType | str | None = None,
    sampling_ratio: float | None = None,
    report: bool = False,
):
    """Returns a NestedArray; with ``report=True`` also returns a
    DataFrame of malformed records (the reference's per-partition
    success/failure report, lib/io/io.py:651-695): PERMISSIVE mode routes
    unparsable lines into ``_corrupt_record``."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if sampling_ratio is not None:
        reader = reader.option("samplingRatio", sampling_ratio)
    if not line_delimited:
        reader = reader.option("multiLine", "true")
    df = reader.json(source)
    data_cols = [c for c in df.columns if c != "_corrupt_record"]
    arr = NestedArray(df, F.struct(*[F.col(c) for c in data_cols]))
    if report:
        # Report malformed lines via an independent text scan + from_json
        # probe. (The _corrupt_record column would need df.cache(), and the
        # cached plan then shadows later re-reads of the same path with
        # stale data — a correctness hazard.)
        if line_delimited:
            units = spark.read.text(source)
        else:
            # single-object-per-file mode: validate whole files, not lines
            units = spark.read.text(source, wholetext=True)
        bad = (
            units.filter(F.trim("value") != "")
            .filter(F.try_parse_json(F.col("value")).isNull())
            .select(F.col("value").alias("record"))
        )
        return arr, bad
    return arr


def to_json(data: NestedArray | DataFrame, path: str, compression: str | None = None) -> None:
    """One file per partition (reference lib/io/json.py:644-781)."""
    df = data.to_df() if isinstance(data, NestedArray) else data
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
