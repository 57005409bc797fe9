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


def test_locality_wait_local_master_only():
    """VERDICT r12 item 2: the zero locality wait is a LOCAL-mode-only
    default — a cluster master must keep Spark's delay scheduling
    (data locality on cached/HDFS-local reads); the env override wins
    on any master."""
    from dask_awkward_spark.session import _locality_wait_for

    assert _locality_wait_for("local[32]", None) == "0s"
    assert _locality_wait_for("local[*]", None) == "0s"
    assert _locality_wait_for("local-cluster[2,1,1024]", None) == "0s"
    # real cluster masters: leave spark.locality.wait at Spark's default
    assert _locality_wait_for("spark://host:7077", None) is None
    assert _locality_wait_for("yarn", None) is None
    assert _locality_wait_for("k8s://https://host:443", None) is None
    # explicit env wins everywhere
    assert _locality_wait_for("local[8]", "3s") == "3s"
    assert _locality_wait_for("yarn", "1s") == "1s"


def test_multi_row_local_frame_writes_one_file(spark, tmp_path):
    """VERDICT r12 item 6: a multi-row LocalRelation piped into a
    snapshot write must NOT fan out into one near-empty file per row —
    _stage_files coalesces it to a single task structurally, not by
    caller convention."""
    from dask_awkward_spark.sources.snapshot import snapshot_read, snapshot_write

    p = str(tmp_path / "fanout")
    df = local_frame(
        spark,
        [(i, f"s{i}") for i in range(5)],
        "id bigint, s string",
    )
    assert _plan_name(df) == "LocalTableScanExec"  # precondition: the guard's target
    snapshot_write(df, p)
    import glob

    files = glob.glob(f"{p}/data/*.parquet")
    assert len(files) == 1, files
    got = sorted((r.id, r.s) for r in snapshot_read(spark, p).collect())
    assert got == [(i, f"s{i}") for i in range(5)]
