"""Multimodal plumbing: binary columns, frame sampling, resize stub.

The decode kernels are deterministic stubs (no media libs in this
container); what these tests pin down is the Spark-side contract —
schemas, 1->N frame explosion, Arrow batch shapes, byte-exact slicing.
"""

import hashlib
import math

from pyspark.sql import functions as F

from dask_awkward_spark.functions import multimodal as mm


def _media(spark):
    df = spark.createDataFrame(
        [(1, "a" * 700), (2, "xyz"), (3, "b" * 256), (4, "")],
        "doc_id long, text string",
    )
    return mm.attach_binary(df)


def test_sample_frames_matches_python_reference(spark):
    rows = mm.sample_frames(_media(spark), frame_bytes=256, every_n=2).collect()
    texts = {1: b"a" * 700, 2: b"xyz", 3: b"b" * 256, 4: b""}
    expect = []
    for doc_id, payload in texts.items():
        n = math.ceil(len(payload) / 256)
        for idx in range(0, n, 2):
            chunk = payload[idx * 256 : (idx + 1) * 256]
            expect.append((doc_id, n, idx, chunk, hashlib.md5(chunk).hexdigest()))
    got = sorted((r.doc_id, r.n_frames, r.frame_idx, bytes(r.frame), r.frame_md5) for r in rows)
    assert got == sorted(expect)
    # doc 4 (empty payload) emits no rows; doc 1 (3 frames) samples 0 and 2
    assert [g[2] for g in got if g[0] == 1] == [0, 2]


def test_sample_frames_is_pure_expression_plan(spark):
    """The frame explosion must stay inside codegen — no Python nodes."""
    plan = (
        mm.sample_frames(_media(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_resize_media_shapes_and_checksums(spark):
    out = mm.resize_media(_media(spark), 16, 16).collect()
    assert len(out) == 4
    for r in out:
        assert len(bytes(r.media)) == 256
        assert (r.meta.width, r.meta.height) == (16, 16)
        assert r.meta.n_bytes == 256
        assert r.meta.checksum == hashlib.md5(bytes(r.media)).hexdigest()
    # content is truncate-or-pad of the original payload
    m = {r.doc_id: bytes(r.media) for r in out}
    assert m[3] == b"b" * 256
    assert m[2] == b"xyz" + b"\0" * 253
    assert m[1] == b"a" * 256
