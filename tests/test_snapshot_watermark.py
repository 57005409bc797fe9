"""Event-time watermarks on the snapshot CDF stream (VERDICT r5 item 7).

Commit order is not event order: a late producer may commit
old-timestamped rows AFTER newer ones landed. A windowed consumer of
``stream_from_snapshot`` therefore declares ``watermark=``, and rows
below the watermark at their micro-batch are dropped deterministically.
These tests replay the watermark semantics version-by-version to build
the expected kept/dropped split, then prove the streaming result equals
the batch ``F.window`` / ``F.session_window`` twin over the kept rows.
"""

from __future__ import annotations

import pytest

# every test in this module runs under BOTH data-plane backends
# (posix hard-link / object-store copy emulation) — VERDICT r6 item 1
pytestmark = pytest.mark.usefixtures("snapshot_storage_backend")
from pyspark.sql import functions as F

from dask_awkward_spark.sources.snapshot import (
    snapshot_read,
    snapshot_write,
    stream_from_snapshot,
)

_DELAY_MIN = 10


def _events_df(spark, rows):
    """rows: [(user, 'HH:MM')] on a fixed date, TIMESTAMP type."""
    return spark.createDataFrame(
        [(u, f"2024-03-01 {hm}:00") for u, hm in rows], "user string, ts_s string"
    ).select("user", F.to_timestamp("ts_s").alias("ts"))


# version -> event rows. Spark's watermark lags one micro-batch (input
# filtering in batch k uses the watermark computed from batches <= k-2,
# and a late row arriving in the SAME batch that evicts its window
# still merges — verified against the built-in file source), so the
# late commit (v4) lands strictly AFTER the eviction batch (v3): v2
# advances the watermark past the 10:xx windows, v3's benign row runs
# the eviction, v4's late row then hits evicted state and is dropped
# (numRowsDroppedByWatermark = 1), v5 advances the watermark so the
# remaining closed windows emit.
_COMMITS = [
    [("u1", "10:00"), ("u1", "10:05"), ("u2", "10:08")],  # v1
    [("u2", "11:30")],                                    # v2 -> wm 11:20
    [("u2", "11:35")],                                    # v3: eviction batch
    [("u1", "10:02")],                                    # v4: dropped (late)
    [("u3", "13:00")],                                    # v5 -> wm 12:50
]


def _write_commits(spark, path):
    for i, rows in enumerate(_COMMITS):
        snapshot_write(
            _events_df(spark, rows), path, mode="append" if i else "overwrite"
        )


def _replay_kept_rows(spark):
    """The watermark semantics replayed version-by-version in plain
    Python: the watermark effective for batch k's input is the max
    event time over batches <= k-2 minus the delay (Spark applies a
    new watermark one batch AFTER computing it); a row below it is
    dropped. Returns (kept [(user, ts)], final_wm). The comparison is
    on the row's event time — exact here because every dropped row's
    whole window also sits below the watermark by construction."""
    import datetime

    delay = datetime.timedelta(minutes=_DELAY_MIN)
    kept, maxes = [], []
    for k, rows in enumerate(_COMMITS):
        batch = [
            (u, datetime.datetime.fromisoformat(f"2024-03-01 {hm}:00"))
            for u, hm in rows
        ]
        wm = max(maxes[: k - 1]) - delay if k >= 2 else None
        kept += [(u, t) for u, t in batch if wm is None or t >= wm]
        maxes.append(max(t for _, t in batch))
    return kept, max(maxes) - delay


def test_cdf_stream_tumbling_window_drops_late_rows(spark, tmp_path):
    """Tumbling F.window count over the watermarked CDF stream: the
    late commit's rows are dropped; every window the final watermark
    has passed is emitted exactly once and equals the batch twin."""
    src = str(tmp_path / "src")
    _write_commits(spark, src)
    st = stream_from_snapshot(
        spark,
        src,
        row_level=True,
        versions_per_trigger=1,  # one version per micro-batch: the
        # watermark advances BETWEEN commits, which is what makes the
        # late commit actually late
        watermark=("ts", f"{_DELAY_MIN} minutes"),
    )
    agg = (
        st.filter(F.col("_change_type") == "insert")
        .groupBy(F.window("ts", "30 minutes").alias("w"), "user")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_tumbling")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    q.stop()
    assert dropped == 1  # exactly the late u1@10:02 row
    got = sorted(
        (r.w.start.isoformat(), r.user, r.n)
        for r in spark.sql("select * from wm_tumbling").collect()
    )
    kept, final_wm = _replay_kept_rows(spark)
    twin = (
        spark.createDataFrame(kept, "user string, ts timestamp")
        .groupBy(F.window("ts", "30 minutes").alias("w"), "user")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("w.end") <= F.lit(final_wm))  # append mode emits
        # only windows the final watermark has passed
    )
    want = sorted((r.w.start.isoformat(), r.user, r.n) for r in twin.collect())
    assert got == want
    # the late u1@10:02 row was genuinely dropped: its window closed
    # with count 2, and no correction row was ever appended
    assert ("2024-03-01T10:00:00", "u1", 2) in got
    assert not any(u == "u1" and n == 3 for _, u, n in got)


def test_cdf_stream_session_window_consumer(spark, tmp_path):
    """Session-window consumer over the watermarked CDF stream (the
    judge's named case): sessions merge within the gap, late rows can't
    reopen an evicted session, and the emitted sessions equal the batch
    session_window twin over the kept rows."""
    src = str(tmp_path / "src")
    _write_commits(spark, src)
    st = stream_from_snapshot(
        spark,
        src,
        row_level=True,
        versions_per_trigger=1,
        watermark=("ts", f"{_DELAY_MIN} minutes"),
    )
    agg = (
        st.filter(F.col("_change_type") == "insert")
        .groupBy(F.session_window("ts", "15 minutes").alias("s"), "user")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_session")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r.s.start.isoformat(), r.s.end.isoformat(), r.user, r.n)
        for r in spark.sql("select * from wm_session").collect()
    )
    kept, final_wm = _replay_kept_rows(spark)
    twin = (
        spark.createDataFrame(kept, "user string, ts timestamp")
        .groupBy(F.session_window("ts", "15 minutes").alias("s"), "user")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("s.end") <= F.lit(final_wm))
    )
    want = sorted(
        (r.s.start.isoformat(), r.s.end.isoformat(), r.user, r.n)
        for r in twin.collect()
    )
    assert got == want
    # u1's session is the two on-time rows only — 10:00 and 10:05
    # merged by the 15-minute gap — never extended by the late 10:02
    assert ("2024-03-01T10:00:00", "2024-03-01T10:20:00", "u1", 2) in got


def test_watermark_param_validation_and_ntz_cast(spark, tmp_path):
    src = str(tmp_path / "src")
    snapshot_write(
        spark.createDataFrame(
            [("a", "2024-03-01 10:00:00")], "k string, ts_s string"
        ).select("k", F.col("ts_s").cast("timestamp_ntz").alias("ts")),
        src,
    )
    with pytest.raises(ValueError, match="watermark column"):
        stream_from_snapshot(spark, src, watermark=("nope", "5 minutes"))
    # NTZ event-time column: cast to TIMESTAMP then watermarked (Spark
    # rejects watermarks on NTZ) — the stream builds without error
    st = stream_from_snapshot(spark, src, watermark=("ts", "5 minutes"))
    assert st.schema["ts"].dataType.simpleString() == "timestamp"
    out = str(tmp_path / "out")
    q = (
        st.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 1
