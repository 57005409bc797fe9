"""Z-order clustered parquet sink: verify the layout actually tightens
per-file min/max footer stats in BOTH clustered dimensions — the property
file/row-group skipping derives from — by counting how many files a
selective box query would have to read under each layout."""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dask_awkward_spark.queries.events import _ev
from dask_awkward_spark.sources.parquet import to_zordered_parquet

SF = "/root/testdata/sf0.01"


def _file_ranges(path, cols):
    """Per-file (min, max) of each column from parquet footers."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i, name in enumerate(names):
                if name not in cols:
                    continue
                st = g.column(i).statistics
                if st is None:
                    continue
                lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
        out.append((lo, hi))
    return out


def _files_hit(ranges, preds):
    """How many files intersect a box query {col: (lo, hi)}."""
    n = 0
    for lo, hi in ranges:
        if all(
            lo[c] is not None and not (hi[c] < qlo or lo[c] > qhi)
            for c, (qlo, qhi) in preds.items()
        ):
            n += 1
    return n


def test_zorder_prunes_both_dimensions(spark):
    ev = _ev(spark, SF).select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"), "value"
    )
    u_lo, u_hi = ev.agg(F.min("user_id"), F.max("user_id")).first()
    t_lo, t_hi = ev.agg(F.min("t_us"), F.max("t_us")).first()

    with tempfile.TemporaryDirectory() as d:
        zpath, lpath = os.path.join(d, "z"), os.path.join(d, "linear")
        to_zordered_parquet(ev, zpath, ["user_id", "t_us"], num_files=16, bits=8)
        # baseline: single-column (time) range layout, same file count
        (
            ev.repartitionByRange(16, "t_us")
            .sortWithinPartitions("t_us")
            .write.mode("overwrite")
            .parquet(lpath)
        )
        zr = _file_ranges(zpath, ["user_id", "t_us"])
        lr = _file_ranges(lpath, ["user_id", "t_us"])
        assert len(zr) > 4 and len(lr) > 4

        # row counts preserved
        n_z = spark.read.parquet(zpath).count()
        assert n_z == ev.count()

        # selective user-only box: ~1/8 of the user range
        span = (u_hi - u_lo) // 8 or 1
        upred = {"user_id": (u_lo, u_lo + span)}
        z_hit_u = _files_hit(zr, upred)
        l_hit_u = _files_hit(lr, upred)
        # the time-sorted layout cannot prune on user_id at all
        assert l_hit_u == len(lr)
        assert z_hit_u < l_hit_u

        # combined user+time box: z-order must also beat full scan
        tspan = (t_hi - t_lo) // 8 or 1
        both = {"user_id": (u_lo, u_lo + span), "t_us": (t_lo, t_lo + tspan)}
        assert _files_hit(zr, both) < len(zr)


def test_compact_parquet_collapses_small_files(spark, tmp_path):
    """Many tiny files -> few target-size files, identical row multiset,
    atomic in-place swap."""
    from dask_awkward_spark.sources.parquet import compact_parquet

    p = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("v", F.col("id") % 97)
    # fragment: ~100 rows per file
    df.repartition(4).write.option("maxRecordsPerFile", 100).parquet(p)
    import glob

    n_before = len(glob.glob(f"{p}/**/*.parquet", recursive=True))
    assert n_before > 50

    stats = compact_parquet(spark, p, target_file_bytes=1 << 30)
    assert stats["files_before"] == n_before
    assert stats["files_after"] == 1  # everything fits one target file
    back = spark.read.parquet(p)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]
    assert not glob.glob(f"{p}__compact_*")  # no temp/backup leftovers


def test_compact_parquet_preserves_hive_partitioning(spark, tmp_path):
    from dask_awkward_spark.sources.parquet import compact_parquet

    p = str(tmp_path / "hive")
    df = spark.range(2_000).withColumn("part", (F.col("id") % 3).cast("int"))
    df.repartition(8).write.option("maxRecordsPerFile", 50).partitionBy("part").parquet(p)
    import glob

    assert len(glob.glob(f"{p}/part=1/*.parquet")) > 5
    compact_parquet(spark, p, target_file_bytes=1 << 30, partition_by=["part"])
    assert len(glob.glob(f"{p}/part=1/*.parquet")) == 1  # collapsed per partition
    back = spark.read.parquet(p)
    assert back.count() == 2_000
    # partition pruning still works on the compacted layout
    assert back.filter(F.col("part") == 1).count() == sum(1 for i in range(2_000) if i % 3 == 1)


def test_compact_parquet_self_heals_after_crash(spark, tmp_path):
    """A crash between the two swap renames leaves only the backup dir;
    the next invocation must restore it and proceed."""
    import os
    import shutil

    from dask_awkward_spark.sources.parquet import compact_parquet

    p = str(tmp_path / "ds")
    spark.range(500).write.option("maxRecordsPerFile", 50).parquet(p)
    # simulate: previous run died after os.rename(path, bak)
    os.rename(p, p + "__compact_bak")
    # plus a stale tmp from the same crashed run
    os.makedirs(p + "__compact_tmp")
    stats = compact_parquet(spark, p, target_file_bytes=1 << 30)
    assert stats["files_after"] == 1
    assert spark.read.parquet(p).count() == 500
    import glob

    assert not glob.glob(f"{p}__compact_*")

    # stale bak alongside an intact dataset (crash after forward rename)
    shutil.copytree(p, p + "__compact_bak")
    compact_parquet(spark, p, target_file_bytes=1 << 30)
    assert spark.read.parquet(p).count() == 500
    assert not glob.glob(f"{p}__compact_*")


def test_zorder_on_struct_leaf_tightens_nested_skipping(spark, tmp_path):
    """Z-order clustering on a DOTTED struct leaf composes with round-8
    nested-leaf stats: compacting an unclustered nested table on
    meta.ts makes leaf-predicate file skipping effective."""
    from pyspark.sql import functions as F

    from dask_awkward_spark.sources.snapshot import (
        snapshot_compact,
        snapshot_read,
        snapshot_scan_report,
        snapshot_write,
    )

    p = str(tmp_path / "t")
    df = spark.range(4000).select(
        F.col("id"),
        F.struct(
            # decorrelate ts from id so ingest order gives WIDE ranges
            ((F.col("id") * 2654435761) % 4000).alias("ts"),
        ).alias("meta"),
    )
    snapshot_write(df.repartition(8), p)  # hash layout: no clustering
    before = snapshot_scan_report(p, [("meta.ts", "<", 500)])
    assert before["skipped"] == 0  # every file spans the range
    snapshot_compact(spark, p, target_file_bytes=1 << 12, zorder_by=["meta.ts"])
    after = snapshot_scan_report(p, [("meta.ts", "<", 500)])
    assert after["total"] >= 2 and after["skipped"] >= after["total"] // 2, after
    got = sorted(
        r.id for r in snapshot_read(spark, p, where=[("meta.ts", "<", 500)]).collect()
    )
    want = sorted(
        r.id for r in df.filter(F.col("meta.ts") < 500).collect()
    )
    assert got == want


def test_zorder_bad_nested_path_is_explicit(spark, tmp_path):
    from pyspark.sql import functions as F

    from dask_awkward_spark.sources.parquet import zorder_column

    df = spark.range(5).select(F.col("id"), F.lit("x").alias("s"))
    import pytest

    with pytest.raises(ValueError, match="not a struct field"):
        zorder_column(df, ["s.nope"])
