"""Product quantization (PQ) for the IVF index — the IVF-PQ tier.

The int8 SQ tier (:func:`~dask_awkward_spark.functions.vectors
.quantize_int8`) compresses each vector 8x (double -> byte per
dimension). PQ goes further: the vector is split into ``m`` subvectors
and each subvector is replaced by the id of its nearest entry in a
per-subspace codebook of ``ksub`` centroids — ``m`` BYTES per vector
regardless of dimension (d=128 doubles = 1024 bytes -> m=16 bytes, 64x)
plus one stored float for the true norm. Ranking runs by ASYMMETRIC
DISTANCE COMPUTATION (ADC): the query precomputes a lookup table of
``m x ksub`` partial dots (its subvectors against every codebook
entry), and a candidate's approximate dot is then just ``m`` table
lookups summed — no arithmetic against the original vector at all.
This is the classic IVF-PQ design (Jegou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011; FAISS ``IVFPQ``).

Spark mapping, chosen deliberately:

- The HOT path — the ADC scan over every probed candidate — is a pure
  Column expression (:func:`adc_dot`): ``m`` ``element_at`` lookups
  into the query row's LUT array, summed. JVM-side, whole-stage
  codegen, no Python.
- Encoding (ingest-time) and LUT building (query-side, |queries| rows)
  are Arrow-batched pandas UDFs over numpy (:func:`pq_encode`,
  :func:`pq_lut`): the expression form would need ``m x ksub``
  aggregate nodes PER ROW (4096 at the production 16x256 shape), which
  Catalyst cannot codegen sanely, while numpy does each Arrow batch in
  one gemm. This is the same sanctioned Arrow tier as the multimodal
  decode path — off the per-candidate hot loop by construction.
- Training (:func:`pq_train`) is driver-side k-means per subspace on a
  BOUNDED sample (like FAISS, which trains on a sample by default) —
  deterministic init + fixed iterations, so tests and chunked==batch
  equivalences are exact.

Reference parity: dask-awkward has no similarity operators — this is
training-data-pipeline uplift (SURVEY §2 extension), extending the
oracle-checked IVF family (``sim_ivf_topk`` / ``sim_quantized`` /
``sim_pq``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pq_train", "pq_encode", "pq_lut", "adc_dot",
    "pq_code_value", "pq_code_int", "normalize_pq_spec",
    "PQ_TRAIN_MAX_SAMPLE", "PQ_SPEC_FORMAT",
]

#: Driver-side training-sample bound: pq_train collects at most this
#: many vectors (k-means over the sample, numpy). FAISS trains PQ on a
#: sample too — the codebook quality saturates long before the corpus.
PQ_TRAIN_MAX_SAMPLE = 16384

#: Current structured codebook-spec format. Format 1 is the original
#: bare nested list ``codebook[m][ksub][dsub]`` (raw-vector encoding,
#: persisted by round-9 indexes — still readable); format 2 is a dict
#: ``{"format": 2, "residual": bool, "centroids": ..., "codebook": ...}``
#: carrying the IVF coarse centroids when codes are RESIDUAL-encoded
#: (true IVFADC, Jegou et al. §IV: quantize ``x - centroid(cell)``,
#: which concentrates the quantizer's dynamic range — better recall at
#: the same m; exactness at full rescore unaffected, ADC only ranks).
PQ_SPEC_FORMAT = 2


def normalize_pq_spec(obj) -> "dict":
    """A persisted/passed codebook spec, normalized to
    ``{"residual": bool, "codebook": list, "centroids": list | None}``.

    Accepts the format-1 bare nested list (raw encoding, no centroids —
    round-9 indexes keep working unchanged) and the format-2 dict.
    Anything else is refused loudly — codes are meaningless under the
    wrong spec, so an unknown future format must never be ranked with
    this code's decode rules (sticky-spec refusal, VERDICT r9 item 1)."""
    if isinstance(obj, dict):
        fmt = obj.get("format")
        if fmt != PQ_SPEC_FORMAT:
            raise ValueError(
                f"unsupported PQ codebook spec format {fmt!r}: this "
                f"build reads bare-list (format 1) and format "
                f"{PQ_SPEC_FORMAT} specs only — a newer writer's codes "
                "cannot be safely ranked here"
            )
        residual = bool(obj.get("residual", False))
        codebook = obj.get("codebook")
        centroids = obj.get("centroids")
        if codebook is None:
            raise ValueError("PQ spec dict is missing 'codebook'")
        if residual and not centroids:
            raise ValueError(
                "residual PQ spec must carry the IVF 'centroids' the "
                "residuals were taken against — codes are not "
                "decodable without them"
            )
        _check_codebook(codebook)
        return {"residual": residual, "codebook": codebook,
                "centroids": centroids}
    _check_codebook(obj)
    return {"residual": False, "codebook": obj, "centroids": None}


def _check_codebook(codebook) -> "tuple[int, int, int]":
    """(m, ksub, dsub) of a nested-list codebook, validated rectangular."""
    m = len(codebook)
    if m == 0:
        raise ValueError("empty codebook")
    ksub = len(codebook[0])
    dsub = len(codebook[0][0])
    for j, sub in enumerate(codebook):
        if len(sub) != ksub or any(len(c) != dsub for c in sub):
            raise ValueError(
                f"ragged codebook: subspace {j} is not {ksub} x {dsub}"
            )
    if ksub > 256:
        raise ValueError(
            f"ksub={ksub} > 256: codes are stored as one byte each"
        )
    return m, ksub, dsub


def pq_train(
    vecs: DataFrame,
    m: int,
    ksub: int = 256,
    e_col: str = "e",
    order_col: "str | None" = None,
    sample_rows: int = PQ_TRAIN_MAX_SAMPLE,
    iters: int = 12,
    residual_centroids: "list[list[float]] | None" = None,
):
    """Train a PQ codebook: per-subspace k-means over a bounded sample.

    Returns ``codebook[m][ksub][d/m]`` (plain nested lists — JSON-able,
    which is how :func:`~dask_awkward_spark.functions.simindex
    .ivf_index_add` persists it beside the index). Deterministic:
    initial centroids are the sample rows at evenly spaced ranks of the
    subvector norm (no RNG), then ``iters`` Lloyd steps; an emptied
    cluster keeps its previous centroid. Pass ``order_col`` (an id) to
    pin WHICH rows the bounded sample takes — without it the sample is
    whatever ``limit`` yields, fine for quality, not reproducible.

    ``residual_centroids=`` (the IVF coarse centroids) switches to
    RESIDUAL training — true IVFADC: each sample row is assigned its
    coarse cell (argmax dot, the same first-max rule as
    :func:`~dask_awkward_spark.functions.simindex.ivf_cell`) and the
    k-means runs over ``x - centroid(cell)``. Residuals concentrate the
    quantizer's dynamic range around zero, so the same ``m`` bytes buy
    materially better recall at the default ``rescore_k`` (measured:
    ``tools/pq_recall_compare.py``). The return value is then a
    FORMAT-2 spec dict ``{"format": 2, "residual": True, "centroids":
    ..., "codebook": ...}`` — pass it wherever a codebook goes; the
    centroids ride inside because residual codes are not decodable
    without the quantizer they were taken against."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    if not 2 <= ksub <= 256:
        raise ValueError(f"ksub must be in [2, 256], got {ksub}")
    src = vecs.select(F.col(e_col).cast("array<double>").alias("e"))
    if order_col is not None:
        src = vecs.orderBy(order_col).select(
            F.col(e_col).cast("array<double>").alias("e")
        )
    rows = src.limit(sample_rows).collect()
    if len(rows) < ksub:
        raise ValueError(
            f"training sample has {len(rows)} rows < ksub={ksub}"
        )
    X = np.asarray([r.e for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} is not divisible by m={m}")
    dsub = d // m
    cents = None
    if residual_centroids is not None:
        cents = np.asarray(residual_centroids, dtype=np.float64)
        if cents.ndim != 2 or cents.shape[1] != d:
            raise ValueError(
                f"residual_centroids must be (n_cells, {d}), got "
                f"{cents.shape}"
            )
        # first-max argmax matches ivf_cell's array_position(max) rule
        X = X - cents[(X @ cents.T).argmax(axis=1)]
    codebook = []
    for j in range(m):
        Xj = X[:, j * dsub:(j + 1) * dsub]
        # deterministic init: rows at evenly spaced ranks of ||x_sub||
        # (ties broken by row index via stable argsort)
        order = np.argsort(np.linalg.norm(Xj, axis=1), kind="stable")
        picks = order[np.linspace(0, len(order) - 1, ksub).astype(int)]
        C = Xj[picks].copy()
        for _ in range(iters):
            # assign: argmin ||x - c||^2 = argmin ||c||^2 - 2 x.c
            d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (Xj @ C.T)
            a = d2.argmin(axis=1)
            for c in range(ksub):
                mask = a == c
                if mask.any():
                    C[c] = Xj[mask].mean(axis=0)
                # else: emptied cluster keeps its previous centroid
        codebook.append([[float(v) for v in row] for row in C])
    if residual_centroids is not None:
        return {
            "format": PQ_SPEC_FORMAT,
            "residual": True,
            "centroids": [[float(v) for v in row] for row in residual_centroids],
            "codebook": codebook,
        }
    return codebook


def pq_encode(e: Column, codebook, cell: "Column | None" = None) -> Column:
    """PQ codes for an embedding column: ``array<tinyint>`` of length
    ``m`` with the 0-BASED nearest-centroid id per subspace. Signed
    tinyint has no 128..255, so those ids are stored SIGN-WRAPPED
    (``astype(int8)``) and every decode goes through
    :func:`pq_code_value` / :func:`pq_code_int`. Arrow-batched numpy
    under the hood — one distance gemm per subspace per batch; see the
    module docstring for why this is not an expression.

    Under a RESIDUAL spec (format 2), pass the row's 1-based coarse
    ``cell`` column: what gets encoded is ``x - centroid(cell)``. The
    caller supplies the SAME cell expression that lands in the index
    row, so code and stored cell can never disagree (the encode does
    not re-derive the cell — ties in the coarse argmax would otherwise
    be two chances to differ)."""
    from pyspark.sql.functions import pandas_udf

    spec = normalize_pq_spec(codebook)
    m, ksub, dsub = _check_codebook(spec["codebook"])
    C = np.asarray(spec["codebook"], dtype=np.float64)  # (m, ksub, dsub)
    c2 = (C * C).sum(axis=2)  # (m, ksub)
    if spec["residual"] and cell is None:
        raise ValueError(
            "residual PQ spec: pq_encode needs the row's coarse cell "
            "column (codes quantize x - centroid(cell))"
        )
    if not spec["residual"] and cell is not None:
        raise ValueError(
            "cell= was passed with a RAW (non-residual) codebook: raw "
            "codes quantize x itself and would silently ignore the "
            "cell — train with residual_centroids= for residual codes"
        )
    IC = (
        np.asarray(spec["centroids"], dtype=np.float64)
        if spec["residual"] else None
    )

    def _codes(X: "np.ndarray") -> "np.ndarray":
        if X.ndim != 2 or X.shape[1] != m * dsub:
            raise ValueError(
                f"pq_encode: expected dim {m * dsub}, got shape {X.shape}"
            )
        out = np.empty((X.shape[0], m), dtype=np.int8)
        for j in range(m):
            Xj = X[:, j * dsub:(j + 1) * dsub]
            d2 = c2[j][None, :] - 2.0 * (Xj @ C[j].T)
            # ties: argmin takes the LOWEST code id (matches np/FAISS)
            out[:, j] = d2.argmin(axis=1).astype(np.int8)
        return out

    if IC is not None:

        @pandas_udf("array<tinyint>")
        def _enc_res(s, cells):
            import pandas as pd

            X = np.asarray(list(s), dtype=np.float64)  # (n, d)
            # cells are 1-based (ivf_cell's array_position)
            R = X - IC[cells.to_numpy(dtype=np.int64) - 1]
            return pd.Series(list(_codes(R)))

        return _enc_res(e.cast("array<double>"), cell.cast("int"))

    @pandas_udf("array<tinyint>")
    def _enc(s):
        import pandas as pd

        X = np.asarray(list(s), dtype=np.float64)  # (n, d)
        return pd.Series(list(_codes(X)))

    return _enc(e.cast("array<double>"))


def pq_lut(qe: Column, codebook) -> Column:
    """The ADC lookup table for a QUERY embedding column: a flat
    ``array<double>`` of length ``m * ksub`` where slot ``j*ksub + c``
    is ``<q_sub_j, codebook[j][c]>``. Built once per query row (the
    tiny side), then every candidate's approximate dot is ``m``
    lookups (:func:`adc_dot`). Accepts a bare codebook or a spec dict
    (the LUT is over CODEBOOK entries either way — under a residual
    spec the entries are residual centroids, and the caller adds the
    per-(query, cell) coarse term separately)."""
    from pyspark.sql.functions import pandas_udf

    codebook = normalize_pq_spec(codebook)["codebook"]
    m, ksub, dsub = _check_codebook(codebook)
    C = np.asarray(codebook, dtype=np.float64)

    @pandas_udf("array<double>")
    def _lut(s):
        import pandas as pd

        Q = np.asarray(list(s), dtype=np.float64)  # (n, d)
        out = np.empty((Q.shape[0], m * ksub), dtype=np.float64)
        for j in range(m):
            Qj = Q[:, j * dsub:(j + 1) * dsub]
            out[:, j * ksub:(j + 1) * ksub] = Qj @ C[j].T
        return pd.Series(list(out))

    return _lut(qe.cast("array<double>"))


def pq_lut_rows(qe_rows: "list[list[float]]", codebook) -> "list[list[float]]":
    """Driver-side twin of :func:`pq_lut` for the collected search path
    (the query rows are already in hand — no extra Spark job)."""
    codebook = normalize_pq_spec(codebook)["codebook"]
    m, ksub, dsub = _check_codebook(codebook)
    C = np.asarray(codebook, dtype=np.float64)
    Q = np.asarray(qe_rows, dtype=np.float64)
    out = np.empty((Q.shape[0], m * ksub), dtype=np.float64)
    for j in range(m):
        out[:, j * ksub:(j + 1) * ksub] = Q[:, j * dsub:(j + 1) * dsub] @ C[j].T
    return [list(map(float, row)) for row in out]


def pq_code_value(c: Column) -> Column:
    """A stored code byte back as its 0..255 value: codes >= 128 wrap
    negative in a signed tinyint (parquet/Spark have no unsigned byte),
    so every decode site must add 256 mod 256 — with a plain cast,
    ksub > 128 (including the production default 256) would index the
    LUT negatively: silently wrong scores, or a crash at code 255
    (element_at index 0)."""
    return (c.cast("int") + F.lit(256)) % F.lit(256)


def pq_code_int(c: int) -> int:
    """Python-side twin of :func:`pq_code_value` for collected rows."""
    return (int(c) + 256) % 256


def adc_dot(codes: Column, lut: Column, ksub: int) -> Column:
    """Approximate ``<e, q>`` from PQ codes + the query's LUT — the hot
    ADC scan, a pure expression: ``sum_j lut[j*ksub + codes[j]]``.
    ``element_at`` is 1-based; codes are stored 0-based and sign-wrapped
    (:func:`pq_code_value`)."""
    m_idx = F.sequence(F.lit(0), F.size(codes) - 1)
    return F.aggregate(
        F.zip_with(
            codes,
            m_idx,
            lambda c, j: F.element_at(
                lut, (j * F.lit(ksub) + pq_code_value(c) + F.lit(1)).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
