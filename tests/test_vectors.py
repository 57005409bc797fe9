"""Public vector API (functions/vectors.py): expression-tier math vs
numpy references, and the no-UDF/no-shuffle plan claims."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_awkward_spark.functions.vectors import (
    cosine_similarity,
    dequantize,
    dot,
    hyperplane_bits,
    l2_normalize,
    norm,
    quantize_int8,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(3)
    rows = [(i, [float(v) for v in rng.normal(size=8)]) for i in range(50)]
    return rows, spark.createDataFrame(rows, "id bigint, e array<double>")


def test_dot_norm_cosine_match_numpy(spark, vecs):
    rows, df = vecs
    pair = df.alias("a").crossJoin(df.alias("b").withColumnRenamed("e", "f")).limit(200)
    got = pair.select(
        F.col("a.id").alias("ia"),
        F.col("b.id").alias("ib"),
        dot(F.col("e"), F.col("f")).alias("d"),
        cosine_similarity(F.col("e"), F.col("f")).alias("c"),
    ).collect()
    by_id = {i: np.array(v) for i, v in rows}
    for r in got:
        a, b = by_id[r.ia], by_id[r.ib]
        assert math.isclose(r.d, float(a @ b), rel_tol=1e-9)
        assert math.isclose(r.c, float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), rel_tol=1e-9)


def test_l2_normalize_unit_norm(spark, vecs):
    _rows, df = vecs
    out = df.select(norm(l2_normalize(F.col("e"))).alias("n")).collect()
    assert all(math.isclose(r.n, 1.0, rel_tol=1e-9) for r in out)


def test_hyperplane_bits_gate_similar_vectors(spark):
    planes = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    df = spark.createDataFrame(
        [(1, [3.0, 2.0]), (2, [2.9, 2.1]), (3, [-3.0, -2.0])], "id bigint, e array<double>"
    )
    out = {r.id: r.b for r in df.select("id", hyperplane_bits(F.col("e"), planes).alias("b")).collect()}
    assert out[1] == out[2]  # near-identical directions share a bucket
    assert out[1] != out[3]  # opposite direction flips every bit
    assert out[1] == 0b111 and out[3] == 0


def test_hyperplane_bits_rejects_too_many_planes(spark):
    with pytest.raises(ValueError, match="63"):
        hyperplane_bits(F.col("e"), [[1.0]] * 64)


def test_quantize_roundtrip_error_bounded(spark, vecs):
    rows, df = vecs
    q, scale = quantize_int8(F.col("e"))
    out = df.select("id", q.alias("q"), scale.alias("s"), dequantize(q, scale).alias("r"), "e").collect()
    for r in out:
        assert all(abs(v) <= 127 for v in r.q)
        # max reconstruction error is half a quantization step
        assert all(abs(a - b) <= r.s / 2 + 1e-12 for a, b in zip(r.e, r.r))


def test_vector_exprs_stay_jvm_side(spark, vecs):
    """No Python evaluation nodes, no exchanges: pure row-local codegen."""
    _rows, df = vecs
    plan = (
        df.select(cosine_similarity(F.col("e"), F.col("e")).alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Exchange"):
        assert bad not in plan


def test_zero_vectors_do_not_abort_under_ansi(spark):
    """A single all-zero embedding (padding row) must not kill the job:
    cosine -> NULL, normalize -> unchanged zeros, quantize -> zeros."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, 4.0])], "id bigint, e array<double>"
    )
    q, s = quantize_int8(F.col("e"))
    out = {
        r.id: r
        for r in df.select(
            "id",
            cosine_similarity(F.col("e"), F.col("e")).alias("c"),
            l2_normalize(F.col("e")).alias("n"),
            q.alias("q"),
            s.alias("s"),
        ).collect()
    }
    assert out[1].c is None and out[1].n == [0.0, 0.0] and out[1].q == [0, 0]
    assert math.isclose(out[2].c, 1.0, rel_tol=1e-9)
    assert math.isclose(out[2].n[0], 0.6, rel_tol=1e-9)


def test_scalar_broadcast_is_once_per_row(spark):
    """The norm/scale aggregate must appear under array_repeat (evaluated
    once per row), never inside the per-element lambda body (O(d^2))."""
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id bigint, e array<double>")
    plan = (
        df.select(l2_normalize(F.col("e")).alias("n"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "array_repeat" in plan
    # exactly one aggregate() over the source column (the norm), not one
    # per element access: lambdafunction body must not contain aggregate
    body = plan.split("zip_with", 1)[1]
    lam = body.split("lambdafunction", 1)[1].split(", lambda", 1)[0]
    assert "aggregate(" not in lam
