"""Text scan (reference lib/io/text.py:54-127 ``from_text``): split files
on a byte delimiter into an array of strings. Spark's text source does the
byte-chunk planning the reference hand-rolls (_bytes_with_sample,
lib/io/io.py:700-855)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..core import NestedArray


def from_text(spark: SparkSession, source: str | list[str], delimiter: str | None = None) -> NestedArray:
    reader = spark.read
    if delimiter is not None:
        reader = reader.option("lineSep", delimiter)
    df = reader.text(source)
    return NestedArray(df, "value")
