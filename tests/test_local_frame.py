"""session.local_frame — LocalRelation-backed literal frames (round 12).

The optimization claim: a tiny driver-literal frame is a LocalTableScan
(no Python-worker stage per action) whenever its types are in the
verified-exact set, and the values are bit-identical to the classic
pickled-RDD path. Anything outside the set falls back to that exact
classic path, so correctness never depends on the Arrow tier firing.
"""

from __future__ import annotations

import datetime

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StructField,
    StructType,
    TimestampType,
    _parse_datatype_string,
)

from dask_awkward_spark.session import local_frame


def _plan_name(df) -> str:
    return df._jdf.queryExecution().executedPlan().getClass().getSimpleName()


def _classic(spark, rows, schema):
    st = schema if isinstance(schema, StructType) else _parse_datatype_string(schema)
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), st)


def test_local_relation_and_exact_values(spark):
    schema = (
        "id bigint, s string, x double, b binary, ok boolean, "
        "arr array<double>, st struct<a:int,t:string>, m map<string,string>"
    )
    rows = [
        (1, "a", 1.5, b"\x00\xff", True, [1.0, float("nan"), float("-inf")],
         (3, "z"), {"k2": "v2", "k1": "v1"}),
        (None, None, None, None, None, None, None, None),
        (2, "", -0.0, b"", False, [], (None, None), {}),
    ]
    df = local_frame(spark, rows, schema)
    assert _plan_name(df) == "LocalTableScanExec"  # no Python stage
    ref = _classic(spark, rows, schema)
    assert df.schema == ref.schema
    assert [repr(r) for r in df.collect()] == [repr(r) for r in ref.collect()]


def test_empty_frame_any_schema(spark):
    # empty frames have no values to coerce: even a timestamp schema may
    # ride the LocalRelation path (schema equality still enforced)
    schema = "ts timestamp, d date, dec decimal(10,2), s string"
    df = local_frame(spark, [], schema)
    assert df.schema == _parse_datatype_string(schema)
    assert df.count() == 0


def test_timestamp_rows_fall_back_exact(spark):
    # rows + tz-coercing type -> classic pickled path, values exact
    st = StructType([StructField("ts", TimestampType())])
    rows = [(datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),)]
    df = local_frame(spark, rows, st)
    assert df.collect() == _classic(spark, rows, st).collect()
    assert _plan_name(df) != "LocalTableScanExec"  # proves the fallback ran


def test_row_shapes_dict_and_nested(spark):
    st = StructType(
        [
            StructField("k", DoubleType()),
            StructField("v", ArrayType(ArrayType(DoubleType()))),
        ]
    )
    rows_dict = [{"k": 2.0, "v": [[1.0], [2.0, 3.0]]}]
    rows_tup = [(2.0, [[1.0], [2.0, 3.0]])]
    a = local_frame(spark, rows_dict, st).collect()
    b = local_frame(spark, rows_tup, st).collect()
    c = _classic(spark, rows_tup, st).collect()
    assert repr(a) == repr(b) == repr(c)
