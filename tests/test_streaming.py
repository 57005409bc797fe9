"""Streaming + events-ingestion regression tests.

The round-3 silent-corruption bug: the streaming source hard-coded
``ts: LongType`` while the driver's parquet had moved to ``timestamp[us]``,
so micros were reinterpreted as nanos and every event collapsed into
January 1970 — plausible-looking output, zero errors. These tests pin the
era of the data so any future encoding drift fails loudly.
"""

from __future__ import annotations

import datetime as dt

import pytest

SF_DIR = "/root/testdata/sf0.001"

# the generator's corpus lives in this era; anything outside means the
# timestamp encoding was misread (e.g. micros treated as nanos -> 1970)
ERA_LO = dt.datetime(2020, 1, 1)
ERA_HI = dt.datetime(2030, 1, 1)


def test_batch_events_ts_era(spark):
    from dask_awkward_spark.sources.events import load_events

    ev = load_events(spark, SF_DIR)
    row = ev.selectExpr("min(ts) AS lo", "max(ts) AS hi").collect()[0]
    lo = row["lo"].replace(tzinfo=None) if row["lo"].tzinfo else row["lo"]
    hi = row["hi"].replace(tzinfo=None) if row["hi"].tzinfo else row["hi"]
    assert ERA_LO <= lo <= hi <= ERA_HI, (lo, hi)


def test_stream_tumbling_era_and_batch_parity(spark):
    """Streaming tumbling windows must land in the data's era AND agree
    with the batch twin (same window expression over a batch read)."""
    from pyspark.sql import functions as F

    from dask_awkward_spark.sources.events import load_events
    from dask_awkward_spark.streaming.windows import stream_tumbling_counts

    out = stream_tumbling_counts(spark, SF_DIR)
    row = out.selectExpr("min(w_start) AS lo", "max(w_start) AS hi").collect()[0]
    assert row["lo"] >= "2020", row["lo"]
    assert row["hi"] < "2030", row["hi"]

    batch = (
        load_events(spark, SF_DIR)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_c"),
        )
        .select(
            F.col("w.start").cast("string").alias("w_start"),
            "event_type",
            "n",
            "value_c",
        )
    )
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want


def test_stream_source_schema_tracks_file(spark):
    """The streaming source derives its schema from the file footer, so an
    encoding change can never silently coerce the timestamp column."""
    from pyspark.sql import types as T

    from dask_awkward_spark.sources.events import events_ingest_schema

    sch = events_ingest_schema(spark, SF_DIR)
    assert isinstance(
        sch["ts"].dataType, (T.TimestampNTZType, T.TimestampType, T.LongType)
    )
    # whatever the file says, the normalized stream carries a watermarkable
    # TIMESTAMP column
    from dask_awkward_spark.sources.events import stream_events

    sdf = stream_events(spark, SF_DIR)
    assert isinstance(sdf.schema["ts"].dataType, T.TimestampType)


def test_stream_parquet_sink_roundtrip(spark, tmp_path):
    """Streaming file sink: draining the bounded source into parquet with
    availableNow yields exactly the batch read (same rows, no dupes),
    proving the exactly-once sink path."""
    from pyspark.sql import functions as F

    from dask_awkward_spark.sources.events import load_events
    from dask_awkward_spark.streaming.windows import stream_to_parquet

    out = str(tmp_path / "out")
    stream_to_parquet(spark, SF_DIR, out)
    got = spark.read.parquet(out)
    want = load_events(spark, SF_DIR)
    assert got.count() == want.count()
    g = got.agg(F.sum("event_id"), F.countDistinct("user_id")).collect()[0]
    w = want.agg(F.sum("event_id"), F.countDistinct("user_id")).collect()[0]
    assert tuple(g) == tuple(w)


def test_legacy_nanos_long_branch(spark, tmp_path):
    """The legacy nanos-as-long branch still converts correctly."""
    import pyspark.sql.functions as F

    from dask_awkward_spark.sources.events import _normalize_ts

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    ns = int(base.timestamp()) * 1_000_000_000 + 123_456_000  # us-aligned nanos
    df = spark.createDataFrame([(1, ns)], "event_id bigint, ts bigint")
    out = _normalize_ts(df)
    from pyspark.sql import types as T

    assert isinstance(out.schema["ts"].dataType, T.TimestampNTZType)
    got = out.select(F.col("ts").cast("string")).collect()[0][0]
    assert got == "2024-03-01 12:00:00.123456", got


def test_stream_static_enrich_matches_batch(spark):
    """Stream-static broadcast join equals the same join done in batch."""
    import pyspark.sql.functions as F

    from dask_awkward_spark.streaming import stream_static_enrich

    SF = "/root/testdata/sf0.001"
    got = {r["n_name"]: (r["n"], r["value_c"]) for r in stream_static_enrich(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    dim = spark.read.parquet(f"{SF}/nation.parquet")
    want = {
        r["n_name"]: (r["n"], r["value_c"])
        for r in ev.withColumn("nk", (F.col("user_id") % 25).cast("int"))
        .join(dim, F.col("nk") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_c"),
        )
        .collect()
    }
    assert got == want and got  # non-empty and exactly the batch join
