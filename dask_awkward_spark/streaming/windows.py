"""Structured Streaming operators (capability uplift — SURVEY §2.6 notes
the reference has no streaming at all).

The batch query suite's windowed shapes (ev_tumbling_window,
ev_sessionize) are re-expressed here over ``readStream`` with watermarks;
the memory sink + ``processAllAvailable`` drives a bounded parquet source
to completion synchronously, which is how the smoke tests observe results.
On a real cluster the same code runs against kafka/files with checkpoints.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.events import stream_events as _stream_events  # noqa: F401
from ..sources.tables import load_table


def stream_tumbling_counts(
    spark: SparkSession,
    sf_dir: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling-window counts with a watermark for late data; runs the
    bounded source to completion and returns the batch result table.
    Pass ``slide`` shorter than ``window`` for hopping (overlapping)
    windows — each event then lands in window/slide buckets."""
    agg = (
        _stream_events(spark, sf_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide or window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_c"))
        .select(F.col("w.start").cast("string").alias("w_start"), "event_type", "n", "value_c")
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dakspark_ckpt_"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def sessionized_counts(
    spark: SparkSession, sf_dir: str, gap: str = "30 minutes"
) -> DataFrame:
    """Session windows (gap-based) in streaming — the streaming twin of the
    batch ev_sessionize query."""
    agg = (
        _stream_events(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("string").alias("sess_start"),
            "n_events",
        )
    )
    name = f"stream_sess_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dakspark_ckpt_"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def stream_to_parquet(
    spark: SparkSession, sf_dir: str, out_dir: str, checkpoint_dir: str | None = None
) -> str:
    """Streaming parquet SINK: drain the bounded events source into a
    parquet directory with exactly-once file-sink semantics (the sink's
    transaction log in the checkpoint makes restarts idempotent — the
    cluster-grade way to land a stream as a table). Uses
    ``trigger(availableNow=True)``: process everything currently in the
    source, in rate-limited micro-batches, then stop — the recommended
    bounded-drain pattern. Returns ``out_dir``."""
    q = (
        _stream_events(spark, sf_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option(
            "checkpointLocation",
            checkpoint_dir or tempfile.mkdtemp(prefix="dakspark_sink_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out_dir


def stream_dedup_counts(
    spark: SparkSession, sf_dir: str, watermark: str = "365 days"
) -> DataFrame:
    """Streaming exact deduplication via ``dropDuplicatesWithinWatermark``
    — the scale-correct streaming dedup: state for a (user_id, event_type)
    pair is retained only within the watermark horizon, so state size is
    bounded by the horizon instead of growing forever like plain
    ``dropDuplicates``. Exact against a global-DISTINCT oracle here
    because the bounded test data's time span sits far inside the horizon.
    Downstream per-type counts aggregate the deduplicated stream."""
    ded = (
        _stream_events(spark, sf_dir)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    agg = ded.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dakspark_ckpt_"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment join: decorate each streamed event with a
    dimension row (here: nation, via a synthetic user_id -> nationkey
    mapping) and aggregate per dimension attribute.

    Scale shape: the static side is broadcast to every task — no stream
    state for the join at all (unlike stream-stream joins), and the dim
    table is re-read per micro-batch, so slowly-changing dimensions are
    picked up for free. This is THE pattern for enriching a 100 TB/day
    event stream with reference data."""
    dim = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), "n_name"
    )
    enriched = (
        _stream_events(spark, sf_dir)
        .withColumn("nk", (F.col("user_id") % 25).cast(dim.schema["nk"].dataType))
        .join(F.broadcast(dim), "nk")
    )
    agg = enriched.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_c"),
    )
    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dakspark_ckpt_"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def stream_interval_pairs(
    spark: SparkSession, sf_dir: str, bound: str = "60 seconds"
) -> DataFrame:
    """Stream-stream INTERVAL self-join: pair each event with every later
    event of the same user within ``bound`` (the streaming twin of the
    batch ev_interval_pairs burst detector).

    Scale shape: both sides carry a watermark and the join condition is an
    equi-key (user_id) plus a closed time range, so Spark's symmetric hash
    join keeps only the watermark-bounded window of each side in state —
    the canonical bounded-state stream-stream join. The per-user rollup
    runs on the drained sink table (chaining an aggregation after a
    stream-stream join adds a second stateful operator; the rollup is a
    trivial hash-agg either way)."""
    left = (
        _stream_events(spark, sf_dir)
        .select(
            F.col("user_id").alias("user_a"),
            F.col("event_id").alias("id_a"),
            F.col("ts").alias("ts_a"),
        )
        .withWatermark("ts_a", "10 minutes")
    )
    right = (
        _stream_events(spark, sf_dir)
        .select(
            F.col("user_id").alias("user_b"),
            F.col("event_id").alias("id_b"),
            F.col("ts").alias("ts_b"),
        )
        .withWatermark("ts_b", "10 minutes")
    )
    pairs = left.join(
        right,
        F.expr(
            f"""
            user_a = user_b
            AND ts_b >= ts_a
            AND ts_b <= ts_a + interval {bound}
            AND (ts_a < ts_b OR (ts_a = ts_b AND id_a < id_b))
            """
        ),
    )
    name = f"stream_pairs_{uuid.uuid4().hex[:8]}"
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dakspark_ckpt_"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return (
        spark.table(name)
        .groupBy(F.col("user_a").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
