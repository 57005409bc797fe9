"""IVF-PQ tier (functions/pq.py + simindex integration — round 9
continuation): product-quantization codebook training, m-byte codes +
ADC ranking, exact re-scoring, codebook persistence/stickiness."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_awkward_spark.functions.pq import (
    adc_dot,
    pq_encode,
    pq_lut,
    pq_lut_rows,
    pq_train,
)
from dask_awkward_spark.functions.simindex import (
    ivf_index_add,
    ivf_search,
)

DIM = 16
N_CELLS = 4


def _centroids():
    out = []
    for j in range(N_CELLS):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"t{j}_{d}".encode()).hexdigest()
            row.append(1.0 if h[0] in "89abcdef" else -1.0)
        out.append(row)
    return out


def _vecs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: F.sin(F.col("id") * 0.7 + d * 1.3),
        ).alias("e"),
    )


def _rows(df):
    return sorted((r.q_id, r.vec_id, r.cell, r.cos) for r in df.collect())


def _cb(spark, n=200, m=4, ksub=8):
    return pq_train(
        _vecs(spark, 0, n), m=m, ksub=ksub, order_col="vec_id",
        sample_rows=n, iters=6,
    )


# ---- training ---------------------------------------------------------


def test_train_shape_and_determinism(spark):
    cb1 = _cb(spark)
    cb2 = _cb(spark)
    assert cb1 == cb2  # ordered sample + norm-rank init + fixed iters
    assert len(cb1) == 4 and len(cb1[0]) == 8 and len(cb1[0][0]) == DIM // 4


def test_train_refusals(spark):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(_vecs(spark, 0, 50), m=3, ksub=4, sample_rows=50)
    with pytest.raises(ValueError, match="ksub"):
        pq_train(_vecs(spark, 0, 50), m=4, ksub=1)
    with pytest.raises(ValueError, match="rows < ksub"):
        pq_train(_vecs(spark, 0, 4), m=4, ksub=8)


# ---- encode / LUT / ADC -----------------------------------------------


def test_encode_adc_matches_numpy(spark):
    """pq_encode codes and the ADC expression reproduce the numpy
    reference reconstruction exactly (same codebook entries, same
    lookup sums)."""
    cb = _cb(spark)
    C = np.asarray(cb)  # (m, ksub, dsub)
    m, ksub, dsub = C.shape
    vecs = _vecs(spark, 0, 50)
    enc = vecs.select("vec_id", pq_encode(F.col("e"), cb).alias("pqc"), "e").collect()
    qe = [float(np.sin(7 * 0.7 + d * 1.3)) for d in range(DIM)]
    lut = pq_lut_rows([qe], cb)[0]
    Q = np.asarray(qe)
    for r in enc:
        x = np.asarray(r.e)
        for j in range(m):
            d2 = ((C[j] - x[j * dsub:(j + 1) * dsub]) ** 2).sum(axis=1)
            assert r.pqc[j] == int(d2.argmin()), (r.vec_id, j)
        want = sum(
            float(Q[j * dsub:(j + 1) * dsub] @ C[j][r.pqc[j]]) for j in range(m)
        )
        got = sum(lut[j * ksub + r.pqc[j]] for j in range(m))
        assert abs(got - want) < 1e-9
    # the Column-expression ADC agrees with the python lookup sum
    one = (
        vecs.select(pq_encode(F.col("e"), cb).alias("pqc"))
        .withColumn("lut", F.array(*[F.lit(v) for v in lut]))
        .select(adc_dot(F.col("pqc"), F.col("lut"), ksub).alias("s"))
        .collect()
    )
    py = [
        sum(lut[j * ksub + r.pqc[j]] for j in range(m)) for r in enc
    ]
    assert all(abs(a.s - b) < 1e-9 for a, b in zip(one, py))


def test_lut_udf_matches_driver_rows(spark):
    cb = _cb(spark)
    q = _vecs(spark, 5, 9)
    got = {
        r.vec_id: list(r.lut)
        for r in q.select("vec_id", pq_lut(F.col("e"), cb).alias("lut")).collect()
    }
    rows = q.orderBy("vec_id").collect()
    want = pq_lut_rows([list(r.e) for r in rows], cb)
    for r, w in zip(rows, want):
        assert np.allclose(got[r.vec_id], w, atol=1e-12)


# ---- index integration ------------------------------------------------


def test_pq_exactness_at_full_rescore(spark, tmp_path):
    """With rescore_k covering every candidate, the PQ index's answer
    equals the flat index's bit-for-bit (ADC only ranks; survivors are
    re-scored on e) — on BOTH plan paths."""
    cents = _centroids()
    cb = _cb(spark)
    p_flat, p_pq = str(tmp_path / "flat"), str(tmp_path / "pq")
    ivf_index_add(p_flat, _vecs(spark, 0, 200), cents)
    ivf_index_add(p_pq, _vecs(spark, 0, 200), cents, pq_codebook=cb)
    q = _vecs(spark, 0, 4)
    flat = _rows(ivf_search(spark, p_flat, q, cents, k=5, nprobe=2))
    got = _rows(
        ivf_search(spark, p_pq, q, cents, k=5, nprobe=2, rescore_k=10**6)
    )
    assert got == flat
    gotb = _rows(
        ivf_search(
            spark, p_pq, q, cents, k=5, nprobe=2, rescore_k=10**6, batch=True
        )
    )
    assert gotb == flat


def test_pq_chunked_equals_batch_build(spark, tmp_path):
    cents = _centroids()
    cb = _cb(spark)
    p1, p2 = str(tmp_path / "chunked"), str(tmp_path / "one")
    for lo, hi in ((0, 70), (70, 140), (140, 200)):
        ivf_index_add(p1, _vecs(spark, lo, hi), cents, pq_codebook=cb)
    ivf_index_add(p2, _vecs(spark, 0, 200), cents, pq_codebook=cb)
    q = _vecs(spark, 0, 3)
    a = _rows(ivf_search(spark, p1, q, cents, k=5, nprobe=2))
    b = _rows(ivf_search(spark, p2, q, cents, k=5, nprobe=2))
    assert a == b


def test_pq_codebook_sticky_and_persisted(spark, tmp_path):
    cents = _centroids()
    cb = _cb(spark)
    p = str(tmp_path / "pq")
    ivf_index_add(p, _vecs(spark, 0, 100), cents, pq_codebook=cb)
    # a later ingest without the codebook refuses
    with pytest.raises(ValueError, match="sticky tier"):
        ivf_index_add(p, _vecs(spark, 100, 120), cents)
    # ... with a different codebook refuses
    cb2 = [[[x + 1.0 for x in c] for c in s] for s in cb]
    with pytest.raises(ValueError, match="DIFFERENT"):
        ivf_index_add(p, _vecs(spark, 100, 120), cents, pq_codebook=cb2)
    # ... with the original appends fine, and search needs no codebook
    ivf_index_add(p, _vecs(spark, 100, 120), cents, pq_codebook=cb)
    out = ivf_search(spark, p, _vecs(spark, 0, 2), cents, k=3, nprobe=2)
    assert out.count() == 6
    # both tiers at once is refused
    with pytest.raises(ValueError, match="ONE ranking tier"):
        ivf_index_add(
            str(tmp_path / "x"), _vecs(spark, 0, 50), cents,
            quantized=True, pq_codebook=cb,
        )


def test_pq_ranking_scan_prunes_e_column(spark, tmp_path):
    """The ADC ranking tier reads (vec_id, cell, pqc, norm) ONLY — the
    m-bytes-per-vector probe-I/O win depends on e being column-pruned
    out of the scan."""
    from dask_awkward_spark.sources.snapshot import snapshot_read

    cents = _centroids()
    cb = _cb(spark)
    p = str(tmp_path / "pq")
    ivf_index_add(p, _vecs(spark, 0, 200), cents, pq_codebook=cb)
    plan = (
        snapshot_read(spark, p, where=[("cell", "in", [1, 2])])
        .select("vec_id", "cell", "pqc", "norm")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "pqc" in scan and "e:" not in scan, scan


def test_pq_retrain_keeps_codes(spark, tmp_path):
    """ivf_retrain re-assigns coarse cells but carries pqc/norm (per-row
    properties of e, coarse-quantizer-independent); search over the
    retrained index equals a fresh build under the new centroids."""
    from dask_awkward_spark.functions.simindex import ivf_retrain

    cents = _centroids()
    new_cents = [list(reversed(c)) for c in cents]
    cb = _cb(spark)
    p, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    ivf_index_add(p, _vecs(spark, 0, 150), cents, pq_codebook=cb)
    ivf_retrain(spark, p, new_cents)
    ivf_index_add(p2, _vecs(spark, 0, 150), new_cents, pq_codebook=cb)
    q = _vecs(spark, 0, 3)
    assert _rows(ivf_search(spark, p, q, new_cents, k=5, nprobe=2)) == _rows(
        ivf_search(spark, p2, q, new_cents, k=5, nprobe=2)
    )


def test_pq_recall_reasonable_at_default_rescore(spark, tmp_path):
    """At the default rescore margin the PQ top-k overlaps the flat
    top-k substantially (quality floor, not exactness — the dial is
    rescore_k)."""
    cents = _centroids()
    cb = _cb(spark, n=300, m=4, ksub=16)
    p_flat, p_pq = str(tmp_path / "flat"), str(tmp_path / "pq")
    ivf_index_add(p_flat, _vecs(spark, 0, 300), cents)
    ivf_index_add(p_pq, _vecs(spark, 0, 300), cents, pq_codebook=cb)
    q = _vecs(spark, 10, 16)
    flat = set(
        (r.q_id, r.vec_id)
        for r in ivf_search(spark, p_flat, q, cents, k=5, nprobe=4).collect()
    )
    got = set(
        (r.q_id, r.vec_id)
        for r in ivf_search(spark, p_pq, q, cents, k=5, nprobe=4).collect()
    )
    assert len(got & flat) / len(flat) >= 0.6, (len(got & flat), len(flat))


# ---- review-cycle regressions ------------------------------------------


def test_ksub_256_sign_wrap(spark, tmp_path):
    """Codes >= 128 wrap negative in the signed tinyint; the ADC decode
    must mod them back — at ksub=256 (the production default) a plain
    cast would index the LUT negatively (wrong scores) or at 0 (crash
    on code 255)."""
    cents = _centroids()
    cb = pq_train(
        _vecs(spark, 0, 300), m=2, ksub=256, order_col="vec_id",
        sample_rows=300, iters=4,
    )
    p_flat, p_pq = str(tmp_path / "flat"), str(tmp_path / "pq")
    ivf_index_add(p_flat, _vecs(spark, 0, 300), cents)
    ivf_index_add(p_pq, _vecs(spark, 0, 300), cents, pq_codebook=cb)
    from dask_awkward_spark.sources.snapshot import snapshot_read

    # the wrapped region is actually exercised: some stored code is
    # negative (raw id >= 128)
    neg = (
        snapshot_read(spark, p_pq)
        .select(F.explode("pqc").alias("c"))
        .filter(F.col("c") < 0)
        .count()
    )
    assert neg > 0, "test corpus never produced a code >= 128"
    q = _vecs(spark, 0, 4)
    flat = _rows(ivf_search(spark, p_flat, q, cents, k=5, nprobe=2))
    # default rescore must not crash; full rescore must be exact
    ivf_search(spark, p_pq, q, cents, k=5, nprobe=2).collect()
    got = _rows(ivf_search(spark, p_pq, q, cents, k=5, nprobe=2, rescore_k=10**6))
    gotb = _rows(
        ivf_search(spark, p_pq, q, cents, k=5, nprobe=2, rescore_k=10**6, batch=True)
    )
    assert got == flat and gotb == flat


def test_pq_against_existing_flat_index_refused_without_orphan(spark, tmp_path):
    """pq_codebook= against an existing non-PQ index must refuse BEFORE
    persisting the codebook file — an orphaned file would mark the
    table as PQ forever and break every later correct ingest."""
    import os

    cents = _centroids()
    cb = _cb(spark)
    p = str(tmp_path / "flat")
    ivf_index_add(p, _vecs(spark, 0, 100), cents)
    with pytest.raises(ValueError, match="without a PQ tier"):
        ivf_index_add(p, _vecs(spark, 100, 150), cents, pq_codebook=cb)
    assert not os.path.exists(os.path.join(p, "_pq_codebook.json"))
    # the flat index keeps working
    ivf_index_add(p, _vecs(spark, 100, 150), cents)
    assert ivf_search(spark, p, _vecs(spark, 0, 2), cents, k=3, nprobe=2).count() == 6


def test_failed_creating_ingest_cleans_codebook(spark, tmp_path):
    """A failed CREATING PQ ingest (here: vectors of the wrong
    dimension, refused inside the write) must not leave an orphaned
    codebook file claiming the empty path is a PQ index."""
    import os

    cents = _centroids()
    cb = _cb(spark)
    p = str(tmp_path / "fresh")
    bad = spark.range(0, 10).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("e"),  # dim 2 != 16
    )
    with pytest.raises(Exception):
        ivf_index_add(p, bad, cents, pq_codebook=cb)
    assert not os.path.exists(os.path.join(p, "_pq_codebook.json"))
    # the path is reusable for a flat index afterwards
    ivf_index_add(p, _vecs(spark, 0, 50), cents)
    assert ivf_search(spark, p, _vecs(spark, 0, 2), cents, k=3, nprobe=2).count() == 6


def test_recall_harness_sweeps_rescore_k(spark, tmp_path):
    """ivf_recall over a PQ index: recall at a generous rescore_k is >=
    recall at the minimum one (the second quality dial, measured)."""
    from dask_awkward_spark.functions.simindex import ivf_recall

    cents = _centroids()
    cb = _cb(spark, n=300, m=4, ksub=16)
    p = str(tmp_path / "pq")
    ivf_index_add(p, _vecs(spark, 0, 300), cents, pq_codebook=cb)
    q = _vecs(spark, 10, 14)
    tight = ivf_recall(spark, p, q, cents, k=5, nprobes=(4,), rescore_k=5)
    wide = ivf_recall(spark, p, q, cents, k=5, nprobes=(4,), rescore_k=200)
    assert wide[0]["recall_at_k"] >= tight[0]["recall_at_k"]
    assert wide[0]["recall_at_k"] >= 0.9  # near-exhaustive re-score at nprobe=max


def test_time_travel_search(spark, tmp_path):
    """version= searches the index AT a pinned snapshot: results ignore
    later ingests — on both plan paths and through a retrain."""
    from dask_awkward_spark.functions.simindex import ivf_retrain

    cents = _centroids()
    cb = _cb(spark)
    p = str(tmp_path / "pq")
    ivf_index_add(p, _vecs(spark, 0, 150), cents, pq_codebook=cb)  # v1
    q = _vecs(spark, 0, 3)
    at_v1 = _rows(ivf_search(spark, p, q, cents, k=5, nprobe=2))
    ivf_index_add(p, _vecs(spark, 150, 400), cents, pq_codebook=cb)  # v2
    now = _rows(ivf_search(spark, p, q, cents, k=5, nprobe=2))
    assert now != at_v1  # the new vectors changed the neighborhoods
    pinned = _rows(ivf_search(spark, p, q, cents, k=5, nprobe=2, version=1))
    assert pinned == at_v1
    pinned_b = _rows(
        ivf_search(spark, p, q, cents, k=5, nprobe=2, version=1, batch=True)
    )
    assert pinned_b == at_v1
    # a retrain (atomic overwrite) leaves v1 searchable until vacuum
    ivf_retrain(spark, p, [list(reversed(c)) for c in cents])
    assert _rows(ivf_search(spark, p, q, cents, k=5, nprobe=2, version=1)) == at_v1


# ---- residual encoding (round 10 — true IVFADC) ------------------------


def _res_spec(spark, cents, n=200, m=4, ksub=8):
    return pq_train(
        _vecs(spark, 0, n), m=m, ksub=ksub, order_col="vec_id",
        sample_rows=n, iters=6, residual_centroids=cents,
    )


def test_residual_train_spec_shape_and_determinism(spark):
    cents = _centroids()
    s1, s2 = _res_spec(spark, cents), _res_spec(spark, cents)
    assert s1 == s2
    assert s1["format"] == 2 and s1["residual"] is True
    assert s1["centroids"] == [[float(v) for v in c] for c in cents]
    cb = s1["codebook"]
    assert len(cb) == 4 and len(cb[0]) == 8 and len(cb[0][0]) == DIM // 4
    # residual codebook differs from the raw one over the same sample
    assert cb != _cb(spark, m=4, ksub=8)


def test_residual_encode_matches_numpy(spark):
    """Residual codes are argmin over ``x - centroid(cell)`` with the
    SAME cell the index row stores (first-max coarse argmax)."""
    from dask_awkward_spark.functions.simindex import ivf_cell

    cents = _centroids()
    spec = _res_spec(spark, cents)
    C = np.asarray(spec["codebook"])
    m, ksub, dsub = C.shape
    IC = np.asarray(cents)
    rows = (
        _vecs(spark, 0, 60)
        .select(
            "vec_id", "e",
            ivf_cell(F.col("e"), cents).alias("cell"),
            pq_encode(
                F.col("e"), spec, cell=ivf_cell(F.col("e"), cents)
            ).alias("pqc"),
        )
        .collect()
    )
    for r in rows:
        x = np.asarray(r.e)
        assert r.cell == int((x @ IC.T).argmax()) + 1
        res = x - IC[r.cell - 1]
        for j in range(m):
            d2 = ((C[j] - res[j * dsub:(j + 1) * dsub]) ** 2).sum(axis=1)
            assert r.pqc[j] == int(d2.argmin()), (r.vec_id, j)


def test_residual_exactness_at_full_rescore(spark, tmp_path):
    """Full-rescore answers are exact regardless of encoding (ADC only
    ranks) — residual index == flat index on BOTH plan paths."""
    cents = _centroids()
    spec = _res_spec(spark, cents)
    p_flat, p_res = str(tmp_path / "flat"), str(tmp_path / "res")
    ivf_index_add(p_flat, _vecs(spark, 0, 200), cents)
    ivf_index_add(p_res, _vecs(spark, 0, 200), cents, pq_codebook=spec)
    q = _vecs(spark, 0, 4)
    flat = _rows(ivf_search(spark, p_flat, q, cents, k=5, nprobe=2))
    got = _rows(
        ivf_search(spark, p_res, q, cents, k=5, nprobe=2, rescore_k=10**6)
    )
    assert got == flat
    gotb = _rows(
        ivf_search(
            spark, p_res, q, cents, k=5, nprobe=2, rescore_k=10**6, batch=True
        )
    )
    assert gotb == flat


def test_residual_chunked_equals_batch_build(spark, tmp_path):
    cents = _centroids()
    spec = _res_spec(spark, cents)
    p1, p2 = str(tmp_path / "chunked"), str(tmp_path / "one")
    for lo, hi in ((0, 70), (70, 140), (140, 200)):
        ivf_index_add(p1, _vecs(spark, lo, hi), cents, pq_codebook=spec)
    ivf_index_add(p2, _vecs(spark, 0, 200), cents, pq_codebook=spec)
    q = _vecs(spark, 0, 3)
    assert _rows(ivf_search(spark, p1, q, cents, k=5, nprobe=2)) == _rows(
        ivf_search(spark, p2, q, cents, k=5, nprobe=2)
    )


def test_residual_batch_path_matches_collected_at_small_rescore(spark, tmp_path):
    """The per-(query, cell) coarse term is computed driver-side on the
    collected path and as an expression on the batch path — the SAME
    left-to-right fold, so even the APPROXIMATE ranking (small
    rescore_k) agrees between paths bit-for-bit."""
    cents = _centroids()
    spec = _res_spec(spark, cents)
    p = str(tmp_path / "res")
    ivf_index_add(p, _vecs(spark, 0, 200), cents, pq_codebook=spec)
    q = _vecs(spark, 0, 6)
    a = _rows(ivf_search(spark, p, q, cents, k=5, nprobe=3, rescore_k=8))
    b = _rows(
        ivf_search(spark, p, q, cents, k=5, nprobe=3, rescore_k=8, batch=True)
    )
    assert a == b


def test_residual_ingest_centroid_mismatch_refused(spark, tmp_path):
    cents = _centroids()
    spec = _res_spec(spark, cents)
    p = str(tmp_path / "res")
    other = [[v * 2 for v in c] for c in cents]
    with pytest.raises(ValueError, match="DIFFERENT IVF centroids"):
        ivf_index_add(p, _vecs(spark, 0, 50), other, pq_codebook=spec)
    # nothing persisted by the refused creating ingest
    import os

    assert not os.path.exists(p)


def test_residual_retrain_centroid_change_refused(spark, tmp_path):
    """A residual pqc is a property of (e, coarse quantizer) — retrain
    under new centroids would orphan every code. Same-centroid retrain
    (pure compaction-style rewrite) stays legal."""
    from dask_awkward_spark.functions.simindex import ivf_retrain

    cents = _centroids()
    spec = _res_spec(spark, cents)
    p = str(tmp_path / "res")
    ivf_index_add(p, _vecs(spark, 0, 150), cents, pq_codebook=spec)
    with pytest.raises(ValueError, match="RESIDUAL-encoded"):
        ivf_retrain(spark, p, [list(reversed(c)) for c in cents])
    before = _rows(ivf_search(spark, p, _vecs(spark, 0, 3), cents, k=5, nprobe=2))
    ivf_retrain(spark, p, cents)
    after = _rows(ivf_search(spark, p, _vecs(spark, 0, 3), cents, k=5, nprobe=2))
    assert before == after


def test_residual_recall_beats_raw_on_clustered_data(spark, tmp_path):
    """The point of residual encoding: on clustered data the raw
    codebook must span the whole space while the residual one only
    spans within-cluster offsets — better recall at the same m bytes.
    Clusters are the coarse centroids plus small deterministic offsets;
    probing EVERY cell isolates ADC ranking quality from cell recall."""
    cents = _centroids()
    # points = centroid(cluster) + 0.15 * sin offsets (deterministic)
    vecs = spark.range(0, 240).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: F.element_at(
                F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in cents]),
                (F.col("id") % N_CELLS + 1).cast("int"),
            )[d] + 0.15 * F.sin(F.col("id") * 1.1 + d * 0.9),
        ).alias("e"),
    )
    raw = pq_train(vecs, m=4, ksub=8, order_col="vec_id",
                   sample_rows=240, iters=6)
    res = pq_train(vecs, m=4, ksub=8, order_col="vec_id",
                   sample_rows=240, iters=6, residual_centroids=cents)
    from dask_awkward_spark.functions.simindex import ivf_recall

    q = vecs.filter(F.col("vec_id") < 24)
    recalls = {}
    for tag, cb in (("raw", raw), ("res", res)):
        p = str(tmp_path / tag)
        ivf_index_add(p, vecs, cents, pq_codebook=cb)
        recalls[tag] = ivf_recall(
            spark, p, q, cents, k=10, nprobes=(N_CELLS,)
        )[0]["recall_at_k"]
    assert recalls["res"] >= recalls["raw"], recalls


def test_spec_format_refusals(spark):
    from dask_awkward_spark.functions.pq import normalize_pq_spec

    cents = _centroids()
    spec = _res_spec(spark, cents)
    with pytest.raises(ValueError, match="unsupported PQ codebook spec"):
        normalize_pq_spec({**spec, "format": 3})
    with pytest.raises(ValueError, match="missing 'codebook'"):
        normalize_pq_spec({"format": 2, "residual": False})
    with pytest.raises(ValueError, match="centroids"):
        normalize_pq_spec({"format": 2, "residual": True,
                           "codebook": spec["codebook"]})
    # format-1 bare list still normalizes (round-9 indexes readable)
    got = normalize_pq_spec(spec["codebook"])
    assert got["residual"] is False and got["centroids"] is None
    # residual encode without the cell column is refused
    with pytest.raises(ValueError, match="coarse cell"):
        pq_encode(F.col("e"), spec)
