"""Incremental dedup (functions/incremental.py): delta-only probing
against a persistent snapshot-table band index, equivalent to a single
batch MinHash-LSH pass over the full corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_awkward_spark.functions.incremental import (
    dedup_probe,
    incremental_dedup,
    minhash_bands,
)

SF = "/root/testdata/sf0.001"


def _elems():
    from dask_awkward_spark.functions import textstats as tx

    return F.array_distinct(tx.tokens(F.lower(F.col("text"))))


def _docs(spark):
    from dask_awkward_spark.sources.tables import load_table

    return load_table(spark, SF, "documents").select("doc_id", "text")


def _batch_verdicts(spark, docs):
    """Ground truth: one pass over everything — doc is a dup iff some
    band bucket holds a smaller id."""
    bands = minhash_bands(docs, _elems())
    v, _ = dedup_probe(None, bands)
    return {r.doc_id: r.dup_of for r in v.collect()}


def test_incremental_chunks_equal_batch(spark, tmp_path):
    """Probing K id-ordered chunks one at a time (appending each delta's
    buckets) yields exactly the verdicts of a single batch pass —
    including chained duplicates whose keeper was itself a duplicate."""
    docs = _docs(spark)
    want = _batch_verdicts(spark, docs)
    assert any(v is not None for v in want.values())  # corpus has dups

    idx = str(tmp_path / "band_index")
    cut1, cut2 = 150, 300
    got = {}
    for lo, hi in [(None, cut1), (cut1, cut2), (cut2, None)]:
        chunk = docs
        if lo is not None:
            chunk = chunk.filter(F.col("doc_id") >= lo)
        if hi is not None:
            chunk = chunk.filter(F.col("doc_id") < hi)
        v = incremental_dedup(spark, idx, chunk, _elems())
        got.update({r.doc_id: r.dup_of for r in v.collect()})
    assert got == want


def test_rerun_same_delta_is_idempotent(spark, tmp_path):
    """Crash-retry story: re-probing an already-applied delta returns
    the same verdicts and does not corrupt later probes."""
    docs = _docs(spark)
    idx = str(tmp_path / "band_index")
    first = docs.filter(F.col("doc_id") < 200)
    v1 = {r.doc_id: r.dup_of for r in incremental_dedup(spark, idx, first, _elems()).collect()}
    v1_again = {r.doc_id: r.dup_of for r in incremental_dedup(spark, idx, first, _elems()).collect()}
    # replayed docs now see themselves in the index: every verdict must
    # be "dup of itself's keeper or kept" — i.e. dup_of unchanged except
    # a kept doc may now resolve to itself, which probe reports as kept
    assert v1_again == v1
    rest = docs.filter(F.col("doc_id") >= 200)
    v2 = {r.doc_id: r.dup_of for r in incremental_dedup(spark, idx, rest, _elems()).collect()}
    want = _batch_verdicts(spark, docs)
    assert {**v1, **v2} == want


def test_empty_docs_never_collide(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "   "), (4, "alpha beta")],
        "doc_id bigint, text string",
    )
    bands = minhash_bands(df, _elems())
    ids = {r.doc_id for r in bands.select("doc_id").distinct().collect()}
    assert ids == {1, 4}  # empty docs produce no bands at all
    v, _ = dedup_probe(None, bands)
    got = {r.doc_id: r.dup_of for r in v.collect()}
    assert got == {1: None, 4: 1}


def test_index_is_a_snapshot_table(spark, tmp_path):
    """The index participates in the snapshot toolchain: versions per
    ingest, change feed works, compaction keeps probes working."""
    from dask_awkward_spark.sources.snapshot import (
        snapshot_changes,
        snapshot_compact,
        snapshot_versions,
    )

    docs = _docs(spark)
    idx = str(tmp_path / "band_index")
    incremental_dedup(spark, idx, docs.filter(F.col("doc_id") < 100), _elems())
    incremental_dedup(spark, idx, docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)), _elems())
    assert [m["op"] for m in snapshot_versions(idx)] == ["overwrite", "append"]
    assert snapshot_changes(spark, idx, since=1).count() > 0
    snapshot_compact(spark, idx)
    v = incremental_dedup(spark, idx, docs.filter(F.col("doc_id") >= 200), _elems())
    assert v.count() > 0


def test_incremental_pipeline_end_to_end(spark, tmp_path):
    """The full incremental story wired together: documents land in a
    snapshot table over three commits; a consumer drains the change feed
    (stream_from_snapshot), probes each micro-batch against the
    persistent band index (incremental_dedup), and appends verdicts to a
    result snapshot table — every hand-off an atomic commit. The
    accumulated verdicts must equal the single-pass batch ground truth."""
    from dask_awkward_spark.sources.snapshot import (
        snapshot_read,
        snapshot_write,
        stream_from_snapshot,
    )

    docs = _docs(spark)
    want = _batch_verdicts(spark, docs)

    tbl = str(tmp_path / "docs")
    idx = str(tmp_path / "band_index")
    out = str(tmp_path / "verdicts")
    snapshot_write(docs.filter(F.col("doc_id") < 150), tbl)
    snapshot_write(
        docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300)), tbl, mode="append"
    )
    snapshot_write(docs.filter(F.col("doc_id") >= 300), tbl, mode="append")

    def consume(batch_df, batch_id):
        v = incremental_dedup(spark, idx, batch_df, _elems())
        snapshot_write(v, out, mode="append" if batch_id else "overwrite")

    q = (
        stream_from_snapshot(spark, tbl, versions_per_trigger=1)
        .writeStream.foreachBatch(consume)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id: r.dup_of for r in snapshot_read(spark, out).collect()}
    assert got == want
