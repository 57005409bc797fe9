"""Partition TRANSFORMS (round 10 — Iceberg hidden partitioning,
VERDICT r9 next-item 2): days/month/year/hour/bucket/truncate in
``partition_by=`` and ``SET PARTITION SPEC``, with inverse-image
pruning — a predicate on the RAW column skips files by the transform's
directory value. The transform value lives ONLY in the dir name (the
raw column stays inside every file), so reads never see virtual
columns and mixed layouts keep working."""

from __future__ import annotations

import datetime

import pytest

pytestmark = pytest.mark.usefixtures("snapshot_storage_backend")
from pyspark.sql import functions as F

from dask_awkward_spark.sources.snapshot import (
    _parse_pspec_entry,
    _read_manifest,
    snapshot_delete,
    snapshot_read,
    snapshot_rename_column,
    snapshot_scan_report,
    snapshot_set_partition_spec,
    snapshot_write,
)
from dask_awkward_spark.sources.sqlface import snapshot_sql


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (
            F.to_timestamp(F.lit("2024-05-01 00:00:00")).cast("timestamp_ntz")
            + F.make_interval(hours=F.col("id") % (24 * 10))
        ).alias("ts"),
        F.concat(F.lit("u"), (F.col("id") % 40).cast("string")).alias("uid"),
    )


def test_parse_and_canonicalize():
    assert _parse_pspec_entry("days(ts)") == ("days", None, "ts", "ts_day", "days(ts)")
    assert _parse_pspec_entry(" day( ts ) ")[4] == "days(ts)"
    assert _parse_pspec_entry("bucket(16, uid)") == (
        "bucket", 16, "uid", "uid_bucket_16", "bucket(16, uid)"
    )
    assert _parse_pspec_entry("truncate(100,k)")[4] == "truncate(100, k)"
    assert _parse_pspec_entry("plain") == ("identity", None, "plain", "plain", "plain")
    with pytest.raises(ValueError, match="width"):
        _parse_pspec_entry("bucket(ts)")
    with pytest.raises(ValueError, match="single column"):
        _parse_pspec_entry("days(2, ts)")


def test_days_layout_and_inverse_image_prune(spark, tmp_path):
    p = str(tmp_path / "t")
    snapshot_write(_rows(spark, 0, 600), p, partition_by=["days(ts)"])
    m = _read_manifest(p, 1)
    assert m["partition_by"] == ["days(ts)"]
    assert all("ts_day=" in f for f in m["files"])
    # the virtual column never reaches the read schema
    df = snapshot_read(spark, p)
    assert df.columns == ["k", "ts", "uid"] and df.count() == 600
    # a raw-ts range predicate prunes most days' files
    rep = snapshot_scan_report(p, [("ts", ">=", datetime.datetime(2024, 5, 9))])
    assert rep["skipped"] >= rep["total"] * 0.5, rep
    got = snapshot_read(
        spark, p, where=[("ts", ">=", datetime.datetime(2024, 5, 9))]
    ).count()
    want = 600 - _rows(spark, 0, 600).filter(
        F.col("ts") < F.lit("2024-05-09").cast("timestamp_ntz")
    ).count()
    assert got == want


def test_bucket_equality_prune_beats_footer_stats(spark, tmp_path):
    """The bucket transform's whole point: footer min/max on a spread
    key keeps every file, but hash(v) % n == dir value skips ~ (n-1)/n
    of them for an equality probe."""
    p = str(tmp_path / "t")
    snapshot_write(_rows(spark, 0, 800), p, partition_by=["bucket(8, uid)"])
    rep = snapshot_scan_report(p, [("uid", "=", "u7")])
    assert rep["skipped"] >= rep["total"] * 0.5, rep
    a = sorted(
        r.k for r in snapshot_read(spark, p, where=[("uid", "=", "u7")]).collect()
    )
    b = sorted(
        r.k for r in _rows(spark, 0, 800).filter(F.col("uid") == "u7").collect()
    )
    assert a == b and a
    # IN maps element-wise; range ops on a hashed value derive nothing
    # (correctness unchanged either way)
    assert snapshot_scan_report(p, [("uid", "in", ["u7", "u9"])])["skipped"] > 0
    assert (
        snapshot_read(spark, p, where=[("uid", ">=", "u7")]).count()
        == _rows(spark, 0, 800).filter(F.col("uid") >= "u7").count()
    )


def test_truncate_int_and_month(spark, tmp_path):
    p = str(tmp_path / "t")
    snapshot_write(
        _rows(spark, 0, 500), p, partition_by=["truncate(100, k)", "month(ts)"]
    )
    m = _read_manifest(p, 1)
    assert m["partition_by"] == ["truncate(100, k)", "month(ts)"]
    assert all("k_truncate_100=" in f and "ts_month=" in f for f in m["files"])
    rep = snapshot_scan_report(p, [("k", "<", 100)])
    assert rep["skipped"] >= 1
    assert snapshot_read(spark, p, where=[("k", "<", 100)]).count() == 100
    rep2 = snapshot_scan_report(
        p, [("ts", "<", datetime.datetime(2024, 4, 1))]
    )
    assert rep2["scanned"] == 0, rep2  # whole table is May


def test_spec_evolution_to_transform_mixed_layout(spark, tmp_path):
    p = str(tmp_path / "t")
    snapshot_write(_rows(spark, 0, 200), p)  # unpartitioned v1
    v = snapshot_set_partition_spec(p, ["days(ts)"])
    assert v == 2
    snapshot_write(_rows(spark, 200, 400), p, mode="append")
    m = _read_manifest(p, 3)
    assert any("ts_day=" in f for f in m["files"])
    assert any("ts_day=" not in f for f in m["files"])
    assert snapshot_read(spark, p).count() == 400
    # pruning: new-layout files skip; old files stay (their raw footer
    # stats still prune where tight)
    got = snapshot_read(
        spark, p, where=[("ts", "=", datetime.datetime(2024, 5, 3, 7))]
    ).count()
    want = (
        _rows(spark, 0, 400)
        .filter(F.col("ts") == F.lit("2024-05-03 07:00:00").cast("timestamp_ntz"))
        .count()
    )
    assert got == want


def test_transform_spec_sticky_and_canonical_append(spark, tmp_path):
    p = str(tmp_path / "t")
    snapshot_write(_rows(spark, 0, 100), p, partition_by=["day(ts)"])
    assert _read_manifest(p, 1)["partition_by"] == ["days(ts)"]
    # inherited append; explicit canonical-variant append; changed spec refused
    snapshot_write(_rows(spark, 100, 150), p, mode="append")
    snapshot_write(
        _rows(spark, 150, 200), p, mode="append", partition_by=["days( ts )"]
    )
    with pytest.raises(ValueError, match="only overwrite may repartition"):
        snapshot_write(
            _rows(spark, 200, 220), p, mode="append", partition_by=["month(ts)"]
        )
    assert snapshot_read(spark, p).count() == 200


def test_transform_refusals(spark, tmp_path):
    p = str(tmp_path / "x")
    df = _rows(spark, 0, 10)
    with pytest.raises(ValueError, match="source must be one of"):
        snapshot_write(df, p, partition_by=["days(uid)"])
    with pytest.raises(ValueError, match="source must be one of"):
        snapshot_write(df, p, partition_by=["bucket(4, ts)"])
    with pytest.raises(ValueError, match="not in schema"):
        snapshot_write(df, p, partition_by=["days(nope)"])
    with pytest.raises(ValueError, match="collides"):
        snapshot_write(
            df.withColumn("ts_day", F.lit(1)), p, partition_by=["days(ts)"]
        )
    with pytest.raises(ValueError, match="duplicate"):
        snapshot_write(df, p, partition_by=["days(ts)", "day(ts)"])


def test_dml_on_transform_partitioned_table(spark, tmp_path):
    """DELETE with a raw-column predicate on a days-partitioned table:
    whole-day files drop metadata-only (the dir value records nulls=0
    for the virtual column, keeping the all-match proof alive), and the
    rewrite keeps the transform layout."""
    p = str(tmp_path / "t")
    snapshot_write(_rows(spark, 0, 600), p, partition_by=["days(ts)"])
    out = snapshot_delete(
        spark, p, [("ts", "<", datetime.datetime(2024, 5, 3))]
    )
    assert snapshot_read(spark, p).count() == 600 - _rows(spark, 0, 600).filter(
        F.col("ts") < F.lit("2024-05-03").cast("timestamp_ntz")
    ).count()
    m = _read_manifest(p, out if isinstance(out, int) else out["version"])
    assert all("ts_day=" in f for f in m["files"])


def test_rename_source_column_keeps_transform_spec(spark, tmp_path):
    p = str(tmp_path / "t")
    snapshot_write(_rows(spark, 0, 200), p, partition_by=["days(ts)"])
    snapshot_rename_column(p, "ts", "event_ts")
    m = _read_manifest(p, 2)
    assert m["partition_by"] == ["days(event_ts)"]
    # pruning still works through the rename (stats keyed physical)
    rep = snapshot_scan_report(p, [("event_ts", ">=", datetime.datetime(2024, 5, 9))])
    assert rep["skipped"] >= 1
    assert (
        snapshot_read(
            spark, p, where=[("event_ts", ">=", datetime.datetime(2024, 5, 9))]
        ).count()
        == _rows(spark, 0, 200)
        .filter(F.col("ts") >= F.lit("2024-05-09").cast("timestamp_ntz"))
        .count()
    )
    # dropping the renamed source column is refused (spec names it)
    from dask_awkward_spark.sources.snapshot import snapshot_drop_column

    with pytest.raises(ValueError, match="partition column"):
        snapshot_drop_column(p, "event_ts")


def test_sql_ddl_transform_spec(spark, tmp_path):
    p = str(tmp_path / "t")
    tables = {"t": p}
    snapshot_sql(
        spark,
        f"CREATE TABLE t (k bigint, ts timestamp_ntz, uid string) "
        f"PARTITIONED BY (days(ts), bucket(8, uid)) LOCATION '{p}'",
        tables,
    )
    assert _read_manifest(p, 1)["partition_by"] == ["days(ts)", "bucket(8, uid)"]
    snapshot_write(_rows(spark, 0, 100), p, mode="append")
    assert all(
        "ts_day=" in f and "uid_bucket_8=" in f
        for f in _read_manifest(p, 2)["files"]
    )
    # SHOW CREATE TABLE round-trips the transform spec
    stmt = snapshot_sql(spark, "SHOW CREATE TABLE t", tables).first()[0]
    assert "PARTITIONED BY (days(ts), bucket(8, uid))" in stmt
    # SET PARTITION SPEC with a transform (comma inside parens)
    snapshot_sql(
        spark, "ALTER TABLE t SET PARTITION SPEC (truncate(50, k))", tables
    )
    assert _read_manifest(p, 3)["partition_by"] == ["truncate(50, k)"]


def test_distributed_prune_path_sees_transform_stats(spark, tmp_path, monkeypatch):
    """Force the checkpoint/executor-side prune path and confirm the
    virtual transform columns prune there too (they ride the stats
    sidecar)."""
    import dask_awkward_spark.sources.snapshot as S

    p = str(tmp_path / "t")
    snapshot_write(_rows(spark, 0, 400), p, partition_by=["bucket(8, uid)"])
    monkeypatch.setattr(S, "_DIST_PRUNE_MIN_FILES", 1)
    rels = S._dist_prune_files(
        spark, p, 1, _read_manifest(p, 1), [("uid", "=", "u7"),
                                            ("uid_bucket_8", "=",
                                             __import__("zlib").crc32(b"u7") % 8)]
    )
    m = _read_manifest(p, 1)
    if rels is not None:  # sidecar present (best-effort)
        assert len(rels) < len(m["files"])
    got = snapshot_read(spark, p, where=[("uid", "=", "u7")]).count()
    assert got == _rows(spark, 0, 400).filter(F.col("uid") == "u7").count()


def test_maintain_compacts_fat_transform_partition(spark, tmp_path):
    """snapshot_maintain on a TRANSFORM-partitioned table: the dir
    grouping matches the virtual name (days(ts) -> ts_day=...), the
    fat day compacts through a virtual-column scope, and tight days
    stay untouched (round-10 fix — the grouping silently no-opped on
    transform specs before)."""
    from dask_awkward_spark.sources.snapshot import snapshot_maintain

    p = str(tmp_path / "t")
    # day 1 gets 5 small files (5 appends), day 2 gets one
    one = _rows(spark, 0, 24).filter(
        F.col("ts") < F.lit("2024-05-02").cast("timestamp_ntz")
    ).coalesce(1)
    for i in range(5):
        snapshot_write(one, p, mode="append", partition_by=["days(ts)"])
    two = _rows(spark, 24, 48).filter(
        (F.col("ts") >= F.lit("2024-05-02").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-05-03").cast("timestamp_ntz"))
    ).coalesce(1)
    snapshot_write(two, p, mode="append")
    total = snapshot_read(spark, p).count()
    out = snapshot_maintain(spark, p, max_files_per_partition=2)
    assert out["compacted_partitions"] == [("ts_day=2024-05-01",)], out
    m = _read_manifest(p, out["version"])
    day1 = [f for f in m["files"] if "ts_day=2024-05-01" in f]
    assert len(day1) <= 2, day1
    assert snapshot_read(spark, p).count() == total
    # tight again: no-op
    out2 = snapshot_maintain(spark, p, max_files_per_partition=2)
    assert out2["compacted_partitions"] == []


def test_snapshot_partitions_inventory(spark, tmp_path):
    from dask_awkward_spark.sources.snapshot import (
        snapshot_delete,
        snapshot_partitions,
    )

    p = str(tmp_path / "t")
    snapshot_write(_rows(spark, 0, 200), p)  # unpartitioned v1
    snapshot_set_partition_spec(p, ["days(ts)"])
    snapshot_write(_rows(spark, 200, 400), p, mode="append")
    inv = {r.partition: r for r in snapshot_partitions(spark, p).collect()}
    assert "(unpartitioned)" in inv
    assert any(k.startswith("ts_day=") for k in inv)
    assert sum(r.rows for r in inv.values()) == 400
    # MOR delete shows as deleted_rows in the owning partitions
    snapshot_delete(
        spark, p,
        [("ts", "<", datetime.datetime(2024, 5, 2))],
        strategy="merge-on-read",
    )
    inv2 = {r.partition: r for r in snapshot_partitions(spark, p).collect()}
    assert sum(r.deleted_rows for r in inv2.values()) > 0
    assert sum(r.rows for r in inv2.values()) == snapshot_read(spark, p).count()
    # SQL face
    got = snapshot_sql(spark, "SHOW PARTITIONS t", {"t": p})
    assert got.columns == [
        "partition", "files", "rows", "deleted_rows", "files_without_stats"
    ]
    assert got.count() == len(inv2)


# ---- round-10 review-cycle regressions --------------------------------


def test_bucket_cross_typed_literal_never_prunes_unsoundly(spark, tmp_path):
    """Review finding: a cross-typed literal (int predicate on a STRING
    bucket source) hashes to a different bucket than the rows Spark's
    casting filter matches — derivation must refuse, never skip."""
    p = str(tmp_path / "t")
    df = spark.range(0, 200).select(
        F.col("id").alias("k"),
        F.format_string("%03d", F.col("id") % 50).alias("code"),  # '042'
    )
    snapshot_write(df, p, partition_by=["bucket(4, code)"])
    # int literal 42: Spark casts '042' -> 42 and matches; the derived
    # bucket for str(42)='42' would be a DIFFERENT bucket than '042's
    got = snapshot_read(spark, p, where=[("code", "=", 42)]).count()
    want = df.filter(F.col("code") == 42).count()
    assert got == want and want > 0
    # same-typed literal still prunes
    rep = snapshot_scan_report(p, [("code", "=", "042")])
    assert rep["skipped"] >= 1


def test_transform_spec_case_insensitive_sql(spark, tmp_path):
    p = str(tmp_path / "t")
    snapshot_sql(
        spark,
        f"CREATE TABLE t (k bigint, ts timestamp_ntz) "
        f"PARTITIONED BY (DAYS(ts), TRUNCATE(100, k)) LOCATION '{p}'",
        {"t": p},
    )
    assert _read_manifest(p, 1)["partition_by"] == [
        "days(ts)", "truncate(100, k)"
    ]


def test_add_or_rename_colliding_with_virtual_name_refused(spark, tmp_path):
    """Review finding: a metadata commit that invalidates the table's
    own partition spec (new column named like a transform's virtual
    dir) must refuse up front, not brick every later write."""
    from dask_awkward_spark.sources.snapshot import (
        snapshot_add_columns,
        snapshot_rename_column,
    )

    p = str(tmp_path / "t")
    snapshot_write(_rows(spark, 0, 50), p, partition_by=["days(ts)"])
    with pytest.raises(ValueError, match="no longer validate"):
        snapshot_add_columns(p, "ts_day date")
    with pytest.raises(ValueError, match="no longer validate"):
        snapshot_rename_column(p, "uid", "ts_day")
    # the table still writes fine (nothing committed)
    snapshot_write(_rows(spark, 50, 60), p, mode="append")
    assert snapshot_read(spark, p).count() == 60


def test_residual_batch_search_after_broadcast_cdot(spark, tmp_path):
    """The broadcast-join coarse term (review finding: no literal
    centroid matrix in the plan) still ranks bit-identically to the
    collected path at small rescore_k."""
    import hashlib

    from dask_awkward_spark.functions.pq import pq_train
    from dask_awkward_spark.functions.simindex import ivf_index_add, ivf_search

    DIM, N_CELLS = 16, 4
    cents = [
        [
            1.0 if hashlib.md5(f"t{j}_{d}".encode()).hexdigest()[0] in "89abcdef"
            else -1.0
            for d in range(DIM)
        ]
        for j in range(N_CELLS)
    ]

    def vecs(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda d: F.sin(F.col("id") * 0.7 + d * 1.3),
            ).alias("e"),
        )

    spec = pq_train(vecs(0, 150), m=4, ksub=8, order_col="vec_id",
                    sample_rows=150, iters=5, residual_centroids=cents)
    p = str(tmp_path / "idx")
    ivf_index_add(p, vecs(0, 150), cents, pq_codebook=spec)
    q = vecs(0, 5)
    a = sorted(
        (r.q_id, r.vec_id, r.cos)
        for r in ivf_search(spark, p, q, cents, k=4, nprobe=2, rescore_k=6).collect()
    )
    b = sorted(
        (r.q_id, r.vec_id, r.cos)
        for r in ivf_search(
            spark, p, q, cents, k=4, nprobe=2, rescore_k=6, batch=True
        ).collect()
    )
    assert a == b


def test_pq_encode_cell_with_raw_codebook_refused(spark):
    from dask_awkward_spark.functions.pq import pq_encode, pq_train

    vecs = spark.range(0, 60).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda d: F.sin(F.col("id") + d),
        ).alias("e"),
    )
    raw = pq_train(vecs, m=4, ksub=8, order_col="vec_id", sample_rows=60,
                   iters=3)
    with pytest.raises(ValueError, match="RAW"):
        pq_encode(F.col("e"), raw, cell=F.lit(1))


def test_script_rollback_preserves_caller_tables_dict(spark, tmp_path):
    """Review finding: the compensation's DROP must not pop the table
    out of the CALLER's dict — re-running the fixed script needs it."""
    from dask_awkward_spark.sources.sqlface import snapshot_sql_script

    loc = str(tmp_path / "nt")
    tables = {"nt": loc}
    with pytest.raises(ValueError, match="dropped created table nt"):
        snapshot_sql_script(
            spark,
            "CREATE TABLE nt (k bigint) LOCATION '%s'; "
            "INSERT INTO nt VALUES (1); BROKEN;" % loc,
            tables,
            on_error="rollback",
        )
    assert tables == {"nt": loc}  # caller mapping untouched
    # the fixed script now runs
    out = snapshot_sql_script(
        spark,
        "CREATE TABLE nt (k bigint) LOCATION '%s'; "
        "INSERT INTO nt VALUES (1);" % loc,
        tables,
        on_error="rollback",
    )
    assert len(out) == 2


def test_script_rollback_reports_script_dropped_table(spark, tmp_path):
    from dask_awkward_spark.sources.sqlface import snapshot_sql_script

    p = str(tmp_path / "t")
    snapshot_write(spark.createDataFrame([(1,)], "k bigint"), p)
    with pytest.raises(ValueError, match="dropped it .PURGE is unrecoverable"):
        snapshot_sql_script(
            spark, "DROP TABLE t PURGE; BROKEN;", {"t": p},
            on_error="rollback",
        )


def test_streaming_ingest_into_transform_partitioned_table(spark, tmp_path):
    """stream_to_snapshot into a pre-created transform-partitioned
    table: every micro-batch append inherits the sticky spec, files
    land under the transform dirs, and inverse-image pruning fires on
    the streamed data."""
    from dask_awkward_spark.sources.datasource import stream_from_datasource
    from dask_awkward_spark.sources.snapshot import (
        snapshot_create,
        stream_to_snapshot,
    )

    p = str(tmp_path / "tbl")
    snapshot_create(
        spark, p, "id bigint, ts timestamp_ntz",
        partition_by=["days(ts)"],
    )

    def gen(tag):
        yield {"id": tag, "ts": __import__("datetime").datetime(2024, 5, 1 + tag)}

    stream_to_snapshot(
        stream_from_datasource(
            spark, gen, list(range(4)), "id bigint, ts timestamp_ntz",
            batch_size=1,
        ),
        p,
    )
    m = _read_manifest(p, 5)  # create + 4 batch appends
    assert all("ts_day=2024-05-0" in f for f in m["files"])
    rep = snapshot_scan_report(p, [("ts", ">=", datetime.datetime(2024, 5, 4))])
    assert rep == {"total": 4, "scanned": 1, "skipped": 3}
    assert snapshot_read(spark, p).count() == 4


def test_year_and_hour_transform_layouts(spark, tmp_path):
    """The two remaining temporal transforms end to end: year() (int
    dir values) and hour() (lexicographic-chronological strings)."""
    p = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (
            F.to_timestamp(F.lit("2023-12-31 20:00:00")).cast("timestamp_ntz")
            + F.make_interval(hours=F.col("id"))
        ).alias("ts"),
    )
    snapshot_write(df, p, partition_by=["year(ts)", "hour(ts)"])
    m = _read_manifest(p, 1)
    assert all("ts_year=" in f and "ts_hour=" in f for f in m["files"])
    assert any("ts_year=2023" in f for f in m["files"])
    assert any("ts_year=2024" in f for f in m["files"])
    # inverse image on both: year boundary and an hour range
    rep = snapshot_scan_report(p, [("ts", "<", datetime.datetime(2024, 1, 1))])
    assert rep["scanned"] == 4, rep  # the four 2023 hours
    got = snapshot_read(
        spark, p,
        where=[("ts", ">=", datetime.datetime(2024, 1, 3))],
    ).count()
    assert got == df.filter(
        F.col("ts") >= F.lit("2024-01-03").cast("timestamp_ntz")
    ).count()
