"""Type-edge tests: uint64, tagged unions, categorical round trip."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from dask_awkward_spark.types import (
    categorical_decode,
    categorical_encode,
    uint64_to_decimal,
    union_encode,
    union_map,
    union_project,
    union_tag,
)


def test_uint64(spark):
    df = spark.createDataFrame([("18446744073709551615",)], ["s"])  # 2^64-1
    got = df.select(uint64_to_decimal(F.col("s")).alias("u")).collect()[0]["u"]
    assert got == Decimal(2**64 - 1)


def test_union_roundtrip(spark):
    # rows: tag 0 -> long payload, tag 1 -> string payload
    df = spark.createDataFrame(
        [(0, 42, None), (1, None, "hi"), (0, 7, None)], ["tag", "num", "txt"]
    )
    u = union_encode(F.col("tag"), [F.col("num"), F.col("txt")])
    out = df.select(
        union_tag(u).alias("t"),
        union_project(u, 0).alias("v0"),
        union_project(u, 1).alias("v1"),
        union_map(u, [lambda c: (c * 2).cast("string"), lambda c: F.upper(c)]).alias("m"),
    ).collect()
    assert [(r["t"], r["v0"], r["v1"], r["m"]) for r in out] == [
        (0, 42, None, "84"),
        (1, None, "hi", "HI"),
        (0, 7, None, "14"),
    ]


def test_categorical_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "red"), (2, "blue"), (3, "red"), (4, "green")], ["id", "color"]
    )
    coded, dictionary = categorical_encode(df, "color")
    assert dictionary.count() == 3
    codes = {r["value"]: r["code"] for r in dictionary.collect()}
    assert codes == {"blue": 0, "green": 1, "red": 2}  # deterministic by value order
    got = {r["id"]: r["color_code"] for r in coded.collect()}
    assert got == {1: 2, 2: 0, 3: 2, 4: 1}
    back = categorical_decode(coded.drop("color"), dictionary, "color_code", "color")
    assert {r["id"]: r["color"] for r in back.collect()} == {
        1: "red",
        2: "blue",
        3: "red",
        4: "green",
    }


def test_categorical_encode_high_cardinality_dense_codes(spark):
    """Codes are the global dense rank by value even when the dictionary
    spans many range partitions (the scale path: partition-local rank +
    offset prefix-sum, no single-partition sort)."""
    from dask_awkward_spark.types import categorical_encode

    vals = [f"v{i:05d}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals for _ in (0, 1)], "s string")
    coded, dictionary = categorical_encode(df, "s")
    d = {r["value"]: r["code"] for r in dictionary.collect()}
    assert d == {v: i for i, v in enumerate(sorted(vals))}
    got = {(r["s"], r["s_code"]) for r in coded.collect()}
    assert got == {(v, i) for i, v in enumerate(sorted(vals))}


def test_categorical_encode_plan_has_no_unpartitioned_window(spark):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from plan_audit import unpartitioned_windows

    from dask_awkward_spark.types import categorical_encode

    df = spark.createDataFrame([("a",), ("b",), ("a",)], "s string")
    coded, dictionary = categorical_encode(df, "s")
    for frame in (coded, dictionary):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert unpartitioned_windows(plan) == []
