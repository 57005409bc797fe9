"""Public vector math over ``array<float|double>`` embedding columns —
pure JVM expression tier (``zip_with`` / ``aggregate`` / ``transform``),
no UDFs, zero shuffles: every function here is a row-local Column
expression that rides whole-stage codegen.

These generalize the oracle-checked similarity queries
(queries/similarity.py) into parameterized library calls: dot/cosine
for scoring, l2-normalization for prep, hyperplane sign-bits for LSH
bucketing, int8 symmetric quantization for the 4x memory-compression
step before ANN at scale. Capability uplift over the reference
(dask-awkward has no vector surface).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sql_double(v: float) -> str:
    f = float(v)
    if f != f:
        return "CAST('NaN' AS DOUBLE)"
    if f == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if f == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(f) + "D"


def array_lit(vals: "list[float]") -> Column:
    """``array<double>`` literal built in ONE expression parse.

    ``F.array(*[F.lit(v) for v in vals])`` costs one py4j round trip
    per element plus one Catalyst node per literal — for a 64-dim
    vector that is ~65 driver⇄JVM calls just to BUILD the expression
    (measured as the dominant cost of the ANN query family at bench
    scale, where the data itself is small). ``repr`` round-trips doubles
    exactly and Spark's parser reads them exactly, so the literal is
    bit-identical to the ``lit()`` form."""
    if not vals:
        return F.expr("cast(array() as array<double>)")
    return F.expr("array(" + ",".join(_sql_double(v) for v in vals) + ")")


def matrix_lit(rows: "list[list[float]]") -> Column:
    """``array<array<double>>`` literal in one parse — centroid / plane
    tables (k x d doubles) as a single driver call instead of k*d."""
    if not rows:
        return F.expr("cast(array() as array<array<double>>)")
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_sql_double(v) for v in r) + ")" for r in rows
        )
        + ")"
    )


def dot(x: Column, y: Column) -> Column:
    """Dot product of two equal-length array columns."""
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(x: Column) -> Column:
    """Euclidean (L2) norm."""
    return F.sqrt(dot(x, x))


def cosine_similarity(x: Column, y: Column) -> Column:
    """Cosine of the angle between two vectors. Zero vectors yield NULL
    (``try_divide`` — a plain division would ABORT the job under Spark
    4's default ANSI mode the first time a padding/all-zero row shows
    up, which in a 100 TB corpus is a certainty)."""
    return F.try_divide(dot(x, y), norm(x) * norm(y))


def _repeat_scalar(s: Column, like: Column) -> Column:
    """``s`` broadcast to an array of ``like``'s length.

    Spark does NO common-subexpression elimination inside higher-order-
    function lambdas: referencing an aggregate like ``norm(x)`` inside a
    ``transform`` lambda re-evaluates the whole O(d) aggregate PER
    ELEMENT (O(d²) per row — ~768× redundant work at embedding dims).
    ``array_repeat`` evaluates its element argument once per row, so
    zipping against the repeated scalar keeps the row O(d)."""
    return F.array_repeat(s, F.size(like))


def l2_normalize(x: Column) -> Column:
    """Unit-length rescale — do this ONCE at ingest so every later cosine
    is a plain dot product (saves two norms per comparison in the
    all-pairs / top-k hot path). Zero vectors pass through unchanged
    (no ANSI divide-by-zero abort)."""
    return F.zip_with(
        x,
        _repeat_scalar(norm(x), x),
        lambda v, n: F.when(n != F.lit(0.0), v / n).otherwise(v),
    )


def hyperplane_bits(x: Column, planes: "list[list[float]]") -> Column:
    """Sign-bit LSH bucket id: one bit per hyperplane (sign of the dot
    product), packed into a BIGINT. Vectors with small angles agree on
    most planes, so equal bucket ids gate candidate generation to an
    equi-join/groupBy — the scale path queries/similarity.py's
    ``sim_lsh_buckets`` uses, parameterized over the caller's planes
    (generate them from any seeded source; <= 63 planes)."""
    if len(planes) > 63:
        raise ValueError(f"at most 63 planes fit a bigint bucket, got {len(planes)}")
    return plane_sign_bucket(x, planes, strict=False)


def plane_sign_bucket(
    x: Column, planes: "list[list[float]]", strict: bool
) -> Column:
    """Shared random-hyperplane bucket core: bit ``i`` set when
    ``<x, plane_i>`` clears zero — ``strict=False`` counts 0 as
    positive (:func:`hyperplane_bits`' contract), ``strict=True``
    requires ``> 0`` (the similarity-query family's contract; the two
    comparators are baked into their respective DuckDB oracle twins, so
    they must stay selectable). One-parse plane matrix + weight array
    (see :func:`array_lit`); the sum folds ``bit_i * 2^i`` in plane
    order, exactly like the historical unrolled loop."""
    if not planes:
        return F.lit(0).cast("bigint")
    weights = F.expr(
        "array(" + ",".join(f"{2 ** i}L" for i in range(len(planes))) + ")"
    )
    bits = F.transform(
        matrix_lit(planes),
        lambda p: F.when(
            dot(x, p) > 0 if strict else dot(x, p) >= 0,
            F.lit(1).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    return F.aggregate(
        F.zip_with(bits, weights, lambda b, w: b * w),
        F.lit(0).cast("bigint"),
        lambda a, v: a + v,
    )


def quantize_int8(x: Column) -> "tuple[Column, Column]":
    """Symmetric int8 scalar quantization: returns ``(q, scale)`` where
    ``q`` is ``array<int>`` of round(x_i/scale) in [-127, 127] and
    ``scale = max(|x_i|)/127`` — the standard 4x memory-compression step
    before ANN (store q as array<tinyint> + one float). Zero vectors
    quantize to zeros (scale 0; no ANSI divide-by-zero abort). The scale
    is evaluated once per row (see :func:`_repeat_scalar`), not per
    element."""
    amax = F.aggregate(x, F.lit(0.0), lambda a, v: F.greatest(a, F.abs(v)))
    scale = amax / F.lit(127.0)
    q = F.zip_with(
        x,
        _repeat_scalar(scale, x),
        lambda v, s: F.when(s != F.lit(0.0), F.round(v / s)).otherwise(F.lit(0.0)).cast("int"),
    )
    return q, scale


def dequantize(q: Column, scale: Column) -> Column:
    """Inverse of :func:`quantize_int8` (lossy)."""
    return F.transform(q, lambda v: v.cast("double") * scale)
