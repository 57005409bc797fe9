"""Type widening in snapshot schema evolution (VERDICT r5 missing item 4).

merge_schema appends may losslessly WIDEN shared numeric columns —
the integer chain, float->double, sub-long int->double, and decimal
growth (Delta's type-widening semantics). Files written at either
width must read back exactly under the pinned wide schema on BOTH
reader faces; narrowing, renames-as-changes, and lossy casts stay
loudly refused.
"""

from __future__ import annotations

import pytest

# every test in this module runs under BOTH data-plane backends
# (posix hard-link / object-store copy emulation) — VERDICT r6 item 1
pytestmark = pytest.mark.usefixtures("snapshot_storage_backend")
from pyspark.sql import functions as F

from dask_awkward_spark.sources.snapshot import (
    _merge_schemas,
    _widened,
    snapshot_add_constraint,
    snapshot_delete,
    snapshot_read,
    snapshot_versions,
    snapshot_write,
)


def test_widening_lattice():
    assert _widened("int", "bigint") == "bigint"
    assert _widened("bigint", "tinyint") == "bigint"
    assert _widened("smallint", "int") == "int"
    assert _widened("float", "double") == "double"
    assert _widened("double", "float") == "double"
    assert _widened("int", "double") == "double"
    assert _widened("double", "smallint") == "double"
    assert _widened("bigint", "double") is None  # lossy above 2^53
    assert _widened("decimal(5,2)", "decimal(10,4)") == "decimal(10,4)"
    # union keeps both sides' integer AND fraction digits
    assert _widened("decimal(5,2)", "decimal(4,3)") == "decimal(6,3)"
    assert _widened("decimal(38,0)", "decimal(38,10)") is None  # p > 38
    assert _widened("string", "int") is None
    assert _widened("int", "string") is None
    assert _widened("array<int>", "array<bigint>") is None  # nested: exact only


def test_merge_schemas_widens_shared_columns(spark):
    old = spark.createDataFrame([], "a int, b float, c string").schema
    new = spark.createDataFrame([], "a bigint, b double, c string, d int").schema
    merged = _merge_schemas(old, new)
    assert merged.simpleString() == "struct<a:bigint,b:double,c:string,d:int>"
    # narrower NEW side: recorded schema keeps the table's wide types
    merged2 = _merge_schemas(new, old)
    assert merged2.simpleString() == "struct<a:bigint,b:double,c:string,d:int>"


def test_widening_append_lifecycle_jvm_face(spark, tmp_path):
    """v1 written int/float, v2 appends bigint/double under merge_schema:
    the recorded schema widens and BOTH generations' values read back
    exactly (the narrow v1 files upcast under the pinned wide schema)."""
    p = str(tmp_path / "tbl")
    v1 = spark.range(3).select(
        F.col("id").cast("int").alias("k"), F.col("id").cast("float").alias("x")
    )
    snapshot_write(v1, p)
    wide = spark.range(3, 6).select(
        (F.col("id") + 10_000_000_000).alias("k"),  # needs bigint
        (F.col("id") / 4).cast("double").alias("x"),
    )
    snapshot_write(wide, p, mode="append", merge_schema=True)
    head = snapshot_versions(p)[-1]
    assert "k:bigint" in head["schema_ddl"] and "x:double" in head["schema_ddl"]
    got = snapshot_read(spark, p).orderBy("k").collect()
    assert [r.k for r in got] == [0, 1, 2, 10000000003, 10000000004, 10000000005]
    assert got[0].x == 0.0 and got[-1].x == 1.25
    # a plain (exact-schema) append at the wide type now works
    snapshot_write(
        spark.range(6, 7).select(
            F.col("id").alias("k"), F.lit(2.5).alias("x")
        ),
        p,
        mode="append",
    )
    assert snapshot_read(spark, p).count() == 7


def test_narrow_append_into_wide_table(spark, tmp_path):
    """A producer still emitting the OLD narrow type appends into the
    widened table: schema stays wide, narrow files upcast on read."""
    p = str(tmp_path / "tbl")
    snapshot_write(spark.range(2).select(F.col("id").alias("k")), p)  # bigint
    narrow = spark.range(2, 4).select(F.col("id").cast("int").alias("k"))
    snapshot_write(narrow, p, mode="append", merge_schema=True)
    head = snapshot_versions(p)[-1]
    assert "k:bigint" in head["schema_ddl"]
    assert sorted(r.k for r in snapshot_read(spark, p).collect()) == [0, 1, 2, 3]


def test_widening_python_datasource_face(spark, tmp_path):
    """The Python DataSource face (pyarrow executor read) casts the
    mixed-width lineage to the pinned wide schema batch-side."""
    from dask_awkward_spark.sources.snapshot import from_snapshot

    p = str(tmp_path / "tbl")
    snapshot_write(spark.range(3).select(F.col("id").cast("int").alias("k")), p)
    snapshot_write(
        spark.range(3, 5).select((F.col("id") + 2**40).alias("k")),
        p,
        mode="append",
        merge_schema=True,
    )
    got = from_snapshot(spark, p)
    assert got.schema.simpleString() == "struct<k:bigint>"
    assert sorted(r.k for r in got.collect()) == [0, 1, 2, 2**40 + 3, 2**40 + 4]


def test_decimal_widening_lifecycle(spark, tmp_path):
    p = str(tmp_path / "tbl")
    snapshot_write(
        spark.range(2).select(F.col("id").cast("decimal(5,2)").alias("d")), p
    )
    snapshot_write(
        spark.range(2, 4).select(F.col("id").cast("decimal(4,3)").alias("d")),
        p,
        mode="append",
        merge_schema=True,
    )
    head = snapshot_versions(p)[-1]
    assert "d:decimal(6,3)" in head["schema_ddl"]
    vals = sorted(float(r.d) for r in snapshot_read(spark, p).collect())
    assert vals == [0.0, 1.0, 2.0, 3.0]


def test_narrowing_and_lossy_still_refused(spark, tmp_path):
    p = str(tmp_path / "tbl")
    snapshot_write(spark.range(2).select(F.col("id").alias("k")), p)  # bigint
    lossy = spark.range(2).select(F.col("id").cast("double").alias("k"))
    with pytest.raises(ValueError, match="not a lossless numeric widening"):
        snapshot_write(lossy, p, mode="append", merge_schema=True)
    txt = spark.range(2).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="cannot change column"):
        snapshot_write(txt, p, mode="append", merge_schema=True)
    # and WITHOUT merge_schema even a pure widening is a plain mismatch
    narrow = spark.range(2).select(F.col("id").cast("int").alias("k"))
    with pytest.raises(ValueError, match="append schema mismatch"):
        snapshot_write(narrow, p, mode="append")


def test_constraints_validate_on_widened_column(spark, tmp_path):
    """CHECK constraints added before widening still gate appends after
    it — evaluated against the widened staged files."""
    p = str(tmp_path / "tbl")
    snapshot_write(spark.range(1, 4).select(F.col("id").cast("int").alias("k")), p)
    snapshot_add_constraint(spark, p, "k_pos", [("k", ">", 0)])
    ok = spark.range(4, 6).select((F.col("id") + 2**40).alias("k"))
    snapshot_write(ok, p, mode="append", merge_schema=True)
    bad = spark.range(1).select((F.col("id") - 5).alias("k"))
    from dask_awkward_spark.sources.snapshot import SnapshotConstraintViolation

    with pytest.raises(SnapshotConstraintViolation):
        snapshot_write(bad, p, mode="append", merge_schema=True)


def test_dml_and_time_travel_across_widening(spark, tmp_path):
    """DELETE after a widening rewrites mixed-width files consistently,
    and time travel back to the narrow version still reads narrow."""
    p = str(tmp_path / "tbl")
    snapshot_write(
        spark.range(4).select(F.col("id").cast("int").alias("k")), p
    )
    snapshot_write(
        spark.range(4, 8).select((F.col("id") + 2**40).alias("k")),
        p,
        mode="append",
        merge_schema=True,
    )
    snapshot_delete(spark, p, [("k", "=", 1)])
    got = sorted(r.k for r in snapshot_read(spark, p).collect())
    assert got == [0, 2, 3] + [2**40 + i for i in range(4, 8)]
    old = snapshot_read(spark, p, version=1)
    assert old.schema.simpleString() == "struct<k:int>"
    assert sorted(r.k for r in old.collect()) == [0, 1, 2, 3]


def test_widening_a_partition_column(spark, tmp_path):
    """A merge_schema append may widen the PARTITION column itself
    (int -> bigint): the sticky hive layout carries through, old and
    new dirs prune together, and mixed-width partition files read back
    exactly."""
    import dask_awkward_spark.sources.snapshot as snap

    p = str(tmp_path / "tbl")
    snapshot_write(
        spark.range(40).select(
            F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("pk")
        ),
        p,
        partition_by=["pk"],
    )
    snapshot_write(  # widens pk to bigint; layout spec is sticky
        spark.range(40, 60).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("pk")
        ),
        p,
        mode="append",
        merge_schema=True,
    )
    head = snapshot_versions(p)[-1]
    assert "pk:bigint" in head["schema_ddl"] and head["partition_by"] == ["pk"]
    m = snap._read_manifest(p, snap._versions(p)[-1])
    kept, skipped = snap._prune_files(m, [("pk", "=", 1)], None)
    assert skipped > 0 and all("pk=1/" in f for f in kept)
    got = snapshot_read(spark, p, where=[("pk", "=", 1)])
    assert sorted(r.k for r in got.collect()) == [i for i in range(60) if i % 3 == 1]


def test_widened_lineage_streams_and_change_feeds(spark, tmp_path):
    """The CDF batch feed and the streaming face share the executor
    read's cast tail: a widened lineage's narrow files stream back
    upcast, and change feeds spanning the widening read exactly."""
    from dask_awkward_spark.sources.snapshot import (
        snapshot_changes,
        stream_from_snapshot,
        stream_to_snapshot,
    )

    p = str(tmp_path / "tbl")
    snapshot_write(spark.range(3).select(F.col("id").cast("int").alias("k")), p)
    snapshot_write(
        spark.range(3, 5).select((F.col("id") + 2**40).alias("k")),
        p,
        mode="append",
        merge_schema=True,
    )
    snapshot_write(
        spark.range(5, 7).select(F.col("id").cast("int").alias("k")),
        p,
        mode="append",
        merge_schema=True,
    )
    # batch change feed across the widening: values exact at the wide type
    delta = snapshot_changes(spark, p, since=1)
    assert delta.schema["k"].dataType.simpleString() == "bigint"
    assert sorted(r.k for r in delta.collect()) == [5, 6, 2**40 + 3, 2**40 + 4]
    # streaming face over the whole lineage
    dst = str(tmp_path / "dst")
    stream_to_snapshot(
        stream_from_snapshot(spark, p), dst, checkpoint_dir=str(tmp_path / "ck")
    )
    got = sorted(r.k for r in snapshot_read(spark, dst).collect())
    assert got == [0, 1, 2, 5, 6, 2**40 + 3, 2**40 + 4]


def test_merge_upcasts_narrow_source(spark, tmp_path):
    """snapshot_merge implicitly upcasts a source column that losslessly
    widens to the table's type (Delta behavior); lossy drift still
    refused."""
    from dask_awkward_spark.sources.snapshot import snapshot_merge

    p = str(tmp_path / "tbl")
    snapshot_write(
        spark.range(5).select(F.col("id").alias("k"), F.lit(1.0).alias("v")), p
    )
    src = spark.range(3, 8).select(
        F.col("id").cast("int").alias("k"), F.lit(2).cast("int").alias("v")
    )
    res = snapshot_merge(spark, p, src, on=["k"])
    assert res["updated_rows"] == 2 and res["inserted_rows"] == 3
    got = {(r.k, r.v) for r in snapshot_read(spark, p).collect()}
    assert got == {(0, 1.0), (1, 1.0), (2, 1.0)} | {(k, 2.0) for k in range(3, 8)}
    bad = spark.range(1).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("v")
    )
    with pytest.raises(ValueError, match="does not losslessly upcast"):
        snapshot_merge(spark, p, bad, on=["k"])
