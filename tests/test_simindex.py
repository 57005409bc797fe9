"""Incremental IVF similarity index (functions/simindex.py — VERDICT r5
missing item 5): persistent cell-partitioned snapshot index, O(delta)
ingest, partition-pruned probes, chunked == batch equivalence."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

import dask_awkward_spark.sources.snapshot as snap
from dask_awkward_spark.functions.simindex import (
    ivf_cell,
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
    """Deterministic pseudo-random embeddings: e[d] = f(id, d)."""
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: F.sin(F.col("id") * 0.7 + d * 1.3),
        ).alias("e"),
    )


def _result_rows(df):
    return sorted(
        (r.q_id, r.vec_id, r.cell, r.cos) for r in df.collect()
    )


def test_chunked_equals_batch(spark, tmp_path):
    """An index built over 3 ingest chunks answers every search
    identically to one built in a single batch — cells are fixed by the
    centroids, so ingest order cannot matter."""
    cents = _centroids()
    p_chunk = str(tmp_path / "chunked")
    p_batch = str(tmp_path / "batch")
    for lo, hi in ((0, 40), (40, 70), (70, 100)):
        ivf_index_add(p_chunk, _vecs(spark, lo, hi), cents)
    ivf_index_add(p_batch, _vecs(spark, 0, 100), cents)
    q = _vecs(spark, 0, 3)
    got_c = _result_rows(ivf_search(spark, p_chunk, q, cents, k=5, nprobe=2))
    got_b = _result_rows(ivf_search(spark, p_batch, q, cents, k=5, nprobe=2))
    assert got_c == got_b and len(got_c) == 15  # 3 queries x top-5


def test_probe_prunes_to_probed_cells(spark, tmp_path):
    """The search's index scan is partition-pruned to the probed cells'
    files only — the inverted-file property that makes this the 100 TB
    path (scan ~nprobe/n_cells of the corpus, not all of it)."""
    cents = _centroids()
    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 200), cents)
    m = snap._read_manifest(p, snap._versions(p)[-1])
    cells_on_disk = {int(f.split("cell=")[1].split("/")[0]) for f in m["files"]}
    assert len(cells_on_disk) > 2  # data actually spans cells
    probe = sorted(cells_on_disk)[:2]
    kept, skipped = snap._prune_files(m, [("cell", "in", probe)], None)
    assert skipped > 0
    assert all(any(f"cell={c}/" in f for c in probe) for f in kept)


def test_search_matches_inline_ivf(spark, tmp_path):
    """Index-backed search equals the same IVF computed inline over the
    raw vectors (assign -> probe best-2 cells -> cosine -> top-k)."""
    from dask_awkward_spark.functions.vectors import dot

    cents = _centroids()
    p = str(tmp_path / "idx")
    vecs = _vecs(spark, 0, 150)
    ivf_index_add(p, vecs, cents)
    got = _result_rows(
        ivf_search(spark, p, _vecs(spark, 7, 8), cents, k=4, nprobe=2)
    )
    # inline twin
    assigned = vecs.select("vec_id", "e", ivf_cell(F.col("e"), cents).alias("cell"))
    qrow = assigned.filter(F.col("vec_id") == 7).first()
    import numpy as np

    dots = [float(np.dot(qrow.e, c)) for c in cents]
    order = sorted(range(N_CELLS), key=lambda i: (-dots[i], i))
    probed = {order[0] + 1, order[1] + 1}
    cand = [
        r
        for r in assigned.collect()
        if r.cell in probed and r.vec_id != 7
    ]
    qn = float(np.sqrt(np.dot(qrow.e, qrow.e)))
    scored = sorted(
        (
            round(float(np.dot(r.e, qrow.e)) / (float(np.sqrt(np.dot(r.e, r.e))) * qn), 6),
            r.vec_id,
            r.cell,
        )
        for r in cand
    )
    top = sorted(
        (7, v, c, cos)
        for cos, v, c in sorted(scored, key=lambda t: (-t[0], t[1]))[:4]
    )
    assert got == top


def test_ingest_is_o_delta(spark, tmp_path):
    """An ingest appends exactly the delta's files — no existing index
    file is rewritten or even listed as changed."""
    cents = _centroids()
    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 100), cents)
    before = set(snap._read_manifest(p, snap._versions(p)[-1])["files"])
    ivf_index_add(p, _vecs(spark, 100, 120), cents)
    m2 = snap._read_manifest(p, snap._versions(p)[-1])
    assert before <= set(m2["files"])  # all old files carried verbatim
    assert m2["op"] == "append"


def test_validation(spark, tmp_path):
    cents = _centroids()
    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 10), cents)
    with pytest.raises(ValueError, match="nprobe"):
        ivf_search(spark, p, _vecs(spark, 0, 1), cents, nprobe=0)
    with pytest.raises(ValueError, match="empty"):
        ivf_search(spark, p, _vecs(spark, 0, 0), cents)


def test_bruteforce_guardrail(spark, tmp_path):
    """The brute-force baselines refuse a large query side, pointing at
    the IVF path (VERDICT r5 item 8); small sides pass; knn_bruteforce
    matches an inline top-k."""
    from dask_awkward_spark.functions.simindex import (
        BRUTEFORCE_MAX_QUERY_ROWS,
        guard_bruteforce_query_side,
        knn_bruteforce,
    )

    corpus = _vecs(spark, 0, 300)
    big = _vecs(spark, 0, BRUTEFORCE_MAX_QUERY_ROWS + 50)
    with pytest.raises(ValueError, match="ivf_search"):
        guard_bruteforce_query_side(big)
    with pytest.raises(ValueError, match="ivf_search"):
        knn_bruteforce(corpus, big)
    # exactly at the cap passes (bounded count, not a full scan)
    assert guard_bruteforce_query_side(
        _vecs(spark, 0, BRUTEFORCE_MAX_QUERY_ROWS)
    ) == BRUTEFORCE_MAX_QUERY_ROWS
    with pytest.raises(ValueError, match="empty"):
        knn_bruteforce(corpus, _vecs(spark, 0, 0))
    got = sorted(
        (r.q_id, r.vec_id, r.cos)
        for r in knn_bruteforce(corpus, _vecs(spark, 3, 5), k=3).collect()
    )
    import numpy as np

    rows = corpus.collect()
    want = []
    for qid in (3, 4):
        qe = next(r.e for r in rows if r.vec_id == qid)
        qn = float(np.sqrt(np.dot(qe, qe)))
        scored = sorted(
            (
                -round(float(np.dot(r.e, qe)) / (float(np.sqrt(np.dot(r.e, r.e))) * qn), 6),
                r.vec_id,
            )
            for r in rows
            if r.vec_id != qid
        )[:3]
        want += [(qid, v, -c) for c, v in scored]
    assert got == sorted(want)


def test_string_ids(spark, tmp_path):
    """Non-bigint ids work end to end (the index never assumes a type;
    the search derives q_id's type from the caller's frame)."""
    cents = _centroids()
    p = str(tmp_path / "idx")
    vecs = _vecs(spark, 0, 60).select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"), "e"
    )
    ivf_index_add(p, vecs, cents)
    got = ivf_search(spark, p, vecs.limit(2), cents, k=3, nprobe=2)
    assert got.schema["q_id"].dataType.simpleString() == "string"
    rows = got.collect()
    assert len(rows) == 6 and all(r.q_id.startswith("doc-") for r in rows)


def test_index_compaction_composes(spark, tmp_path):
    """The index is a plain snapshot table: after many small ingests,
    snapshot_compact (full or scoped to one cell) merges the inverted
    lists' files and searches return identical results."""
    from dask_awkward_spark.sources.snapshot import snapshot_compact

    cents = _centroids()
    p = str(tmp_path / "idx")
    for lo in range(0, 100, 20):  # 5 small ingests
        ivf_index_add(p, _vecs(spark, lo, lo + 20), cents)
    q = _vecs(spark, 0, 2)
    before = _result_rows(ivf_search(spark, p, q, cents, k=5, nprobe=2))
    m0 = snap._read_manifest(p, snap._versions(p)[-1])
    cell1 = [f for f in m0["files"] if "cell=1/" in f]
    v = snapshot_compact(spark, p, where=[("cell", "=", 1)])
    m1 = snap._read_manifest(p, v)
    assert len([f for f in m1["files"] if "cell=1/" in f]) < len(cell1)
    snapshot_compact(spark, p)  # then the full table
    after = _result_rows(ivf_search(spark, p, q, cents, k=5, nprobe=2))
    assert after == before


def test_search_plan_is_hash_join_not_bnlj(spark, tmp_path):
    """The candidate join must be a broadcast HASH join on `cell` (one
    exploded (q_id, cell) probe row per query), never a
    BroadcastNestedLoopJoin over an array_contains predicate that
    evaluates queries x candidates pairs (VERDICT r6 item 7)."""
    cents = _centroids()
    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 100), cents)
    plan = (
        ivf_search(spark, p, _vecs(spark, 0, 3), cents, k=3, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def _alt_centroids():
    """A second deterministic quantizer, disjoint from _centroids()."""
    import hashlib as _h

    out = []
    for j in range(N_CELLS):
        row = []
        for d in range(DIM):
            h = _h.md5(f"alt{j}_{d}".encode()).hexdigest()
            row.append(0.5 if h[1] in "89abcdef" else -0.5)
        out.append(row)
    return out


def test_retrain_equals_fresh_build(spark, tmp_path):
    """chunked ingests under quantizer A, then ivf_retrain(B) == a fresh
    single-batch build under B: identical (vec_id, cell) rows and
    identical search results (VERDICT r6 item 5a)."""
    from dask_awkward_spark.functions.simindex import ivf_retrain
    from dask_awkward_spark.sources.snapshot import snapshot_read

    a, b = _centroids(), _alt_centroids()
    p_drift = str(tmp_path / "drift")
    p_fresh = str(tmp_path / "fresh")
    for lo, hi in ((0, 30), (30, 80), (80, 120)):
        ivf_index_add(p_drift, _vecs(spark, lo, hi), a)
    v = ivf_retrain(spark, p_drift, b)
    ivf_index_add(p_fresh, _vecs(spark, 0, 120), b)
    rows_d = sorted(
        (r.vec_id, r.cell) for r in snapshot_read(spark, p_drift).collect()
    )
    rows_f = sorted(
        (r.vec_id, r.cell) for r in snapshot_read(spark, p_fresh).collect()
    )
    assert rows_d == rows_f
    q = _vecs(spark, 5, 8)
    assert _result_rows(ivf_search(spark, p_drift, q, b, k=5, nprobe=2)) == (
        _result_rows(ivf_search(spark, p_fresh, q, b, k=5, nprobe=2))
    )
    # retrain is one atomic overwrite; the old index is time-travelable
    assert snapshot_read(spark, p_drift, version=v - 1).count() == 120
    # ingest continues under the NEW quantizer seamlessly
    ivf_index_add(p_drift, _vecs(spark, 120, 130), b)
    assert snapshot_read(spark, p_drift).count() == 130


def test_maintain_compacts_fat_cells_only(spark, tmp_path):
    """ivf_maintain scoped-compacts exactly the cells whose file count
    exceeds the policy; searches are byte-identical before/after
    (VERDICT r6 item 5b)."""
    from dask_awkward_spark.functions.simindex import ivf_maintain

    cents = _centroids()
    p = str(tmp_path / "idx")
    for i in range(6):  # many small ingests: every touched cell gains files
        ivf_index_add(p, _vecs(spark, i * 20, (i + 1) * 20), cents)
    q = _vecs(spark, 3, 6)
    before = _result_rows(ivf_search(spark, p, q, cents, k=5, nprobe=2))
    head = snap._read_manifest(p, snap._versions(p)[-1])
    per_cell: dict = {}
    for f in head["files"]:
        c = int(f.split("/cell=", 1)[1].split("/", 1)[0])
        per_cell[c] = per_cell.get(c, 0) + 1
    assert max(per_cell.values()) > 3  # the policy has something to do
    out = ivf_maintain(spark, p, max_files_per_cell=3)
    assert out["compacted_cells"] == sorted(
        c for c, n in per_cell.items() if n > 3
    )
    m2 = snap._read_manifest(p, out["version"])
    per_cell2: dict = {}
    for f in m2["files"]:
        c = int(f.split("/cell=", 1)[1].split("/", 1)[0])
        per_cell2[c] = per_cell2.get(c, 0) + 1
    assert all(n <= 3 or c not in out["compacted_cells"] for c, n in per_cell2.items())
    assert all(per_cell2[c] < per_cell[c] for c in out["compacted_cells"])
    after = _result_rows(ivf_search(spark, p, q, cents, k=5, nprobe=2))
    assert after == before
    # tight index: second pass is a metadata-only no-op
    out2 = ivf_maintain(spark, p, max_files_per_cell=3)
    assert out2["compacted_cells"] == [] and out2["version"] == out["version"]


def test_recall_monotone_and_exact_at_full_probe(spark, tmp_path):
    """recall@k grows with nprobe and reaches 1.0 when every cell is
    probed (probing all cells IS brute force) — VERDICT r6 item 5c."""
    from dask_awkward_spark.functions.simindex import ivf_recall

    cents = _centroids()
    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 200), cents)
    q = _vecs(spark, 10, 18)
    rows = ivf_recall(
        spark, p, q, cents, k=5, nprobes=(1, 2, N_CELLS)
    )
    recs = [r["recall_at_k"] for r in rows]
    assert recs == sorted(recs)  # monotone non-decreasing
    assert recs[-1] == 1.0  # full probe == exact
    assert all(r["n_queries"] == 8 for r in rows)


# ---- int8-quantized tier (IVF-flat -> IVF-SQ with exact re-ranking) --


def test_quantized_search_matches_flat(spark, tmp_path):
    """A quantized index returns full-precision results: the int8 tier
    only RANKS candidates; survivors are re-scored on `e`, so cos
    values are exact and (with the default rescore margin) the top-k
    equals the flat index's top-k on this corpus."""
    cents = _centroids()
    p_flat = str(tmp_path / "flat")
    p_q = str(tmp_path / "quant")
    ivf_index_add(p_flat, _vecs(spark, 0, 200), cents)
    ivf_index_add(p_q, _vecs(spark, 0, 200), cents, quantized=True)
    q = _vecs(spark, 0, 4)
    flat = _result_rows(ivf_search(spark, p_flat, q, cents, k=5, nprobe=2))
    quant = _result_rows(ivf_search(spark, p_q, q, cents, k=5, nprobe=2))
    assert quant == flat


def test_quantized_recall_geq_flat(spark, tmp_path):
    """recall@k of quantized-then-rescored search >= flat search minus
    epsilon at every nprobe (the VERDICT r7 item-3 done criterion)."""
    from dask_awkward_spark.functions.simindex import ivf_recall

    cents = _centroids()
    p_flat = str(tmp_path / "flat")
    p_q = str(tmp_path / "quant")
    ivf_index_add(p_flat, _vecs(spark, 0, 300), cents)
    ivf_index_add(p_q, _vecs(spark, 0, 300), cents, quantized=True)
    q = _vecs(spark, 10, 16)
    r_flat = ivf_recall(spark, p_flat, q, cents, k=5, nprobes=(1, 2, 4))
    r_q = ivf_recall(spark, p_q, q, cents, k=5, nprobes=(1, 2, 4))
    for a, b in zip(r_flat, r_q):
        assert b["recall_at_k"] >= a["recall_at_k"] - 0.05, (a, b)
    # full probe is still exact (rescore makes the tier lossless there)
    assert r_q[-1]["nprobe"] == 4


def test_quantized_probe_scan_prunes_e_column(spark, tmp_path):
    """The ranking tier's scan must read the int8 column ONLY — parquet
    column pruning through the snapshot read (the ~8x probe-bytes win);
    and the exact tier's scan must push the survivor-id IN filter."""
    from dask_awkward_spark.sources.snapshot import snapshot_read

    cents = _centroids()
    p = str(tmp_path / "quant")
    ivf_index_add(p, _vecs(spark, 0, 200), cents, quantized=True)
    # stage-1 shape: probed-cells read projected to (vec_id, cell, q)
    plan = (
        snapshot_read(spark, p, where=[("cell", "in", [1, 2])])
        .select("vec_id", "cell", "q")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "q" in scan and "e:" not in scan, scan
    # stage-2 shape (the search's returned DF): IN pushdown on vec_id
    plan2 = (
        ivf_search(spark, p, _vecs(spark, 0, 3), cents, k=3, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan2 and "In(vec_id" in plan2, plan2


def test_quantized_retrain_and_compaction_keep_tier(spark, tmp_path):
    """ivf_retrain re-assigns cells but carries q/scale (per-row
    properties of e, quantizer-independent); search results over the
    retrained quantized index equal a fresh quantized build."""
    from dask_awkward_spark.functions.simindex import ivf_retrain
    from dask_awkward_spark.sources.snapshot import snapshot_read

    a, b = _centroids(), _alt_centroids()
    p_drift = str(tmp_path / "drift")
    p_fresh = str(tmp_path / "fresh")
    for lo, hi in ((0, 50), (50, 120)):
        ivf_index_add(p_drift, _vecs(spark, lo, hi), a, quantized=True)
    ivf_retrain(spark, p_drift, b)
    ivf_index_add(p_fresh, _vecs(spark, 0, 120), b, quantized=True)
    assert set(snapshot_read(spark, p_drift).columns) == {
        "vec_id", "cell", "e", "q", "scale"
    }
    q = _vecs(spark, 5, 8)
    assert _result_rows(ivf_search(spark, p_drift, q, b, k=5, nprobe=2)) == (
        _result_rows(ivf_search(spark, p_fresh, q, b, k=5, nprobe=2))
    )


def test_quantized_tier_is_sticky(spark, tmp_path):
    """Appending a flat delta to a quantized index (or vice versa) is
    refused by the snapshot schema check — a half-quantized index would
    silently rank on missing columns."""
    cents = _centroids()
    p = str(tmp_path / "quant")
    ivf_index_add(p, _vecs(spark, 0, 50), cents, quantized=True)
    with pytest.raises(ValueError, match="schema"):
        ivf_index_add(p, _vecs(spark, 50, 60), cents)


def test_quantized_rescore_k_validated(spark, tmp_path):
    """rescore_k < k would silently truncate results — refused."""
    cents = _centroids()
    p = str(tmp_path / "quant")
    ivf_index_add(p, _vecs(spark, 0, 50), cents, quantized=True)
    with pytest.raises(ValueError, match="rescore_k"):
        ivf_search(spark, p, _vecs(spark, 0, 2), cents, k=5, nprobe=2, rescore_k=3)


# ---- distributed batch path (VERDICT r9 item 1) ----------------------


def test_batch_path_equals_collected(spark, tmp_path):
    """Forced batch == forced collected, flat AND quantized tiers — the
    distributed rework moves planning off the driver without changing a
    single result row."""
    cents = _centroids()
    for quant in (False, True):
        p = str(tmp_path / f"idx_{quant}")
        ivf_index_add(p, _vecs(spark, 0, 200), cents, quantized=quant)
        q = _vecs(spark, 0, 10)
        a = _result_rows(ivf_search(spark, p, q, cents, k=5, nprobe=2, batch=False))
        b = _result_rows(ivf_search(spark, p, q, cents, k=5, nprobe=2, batch=True))
        assert a == b and len(a) == 50, quant


def test_batch_path_small_rescore_equals_collected(spark, tmp_path):
    """With a TRUNCATING rescore_k the two paths must still agree — the
    quantized ranking, the survivor cut, and the exact tier all replay
    identically as distributed plans."""
    cents = _centroids()
    p = str(tmp_path / "quant")
    ivf_index_add(p, _vecs(spark, 0, 200), cents, quantized=True)
    q = _vecs(spark, 0, 6)
    a = _result_rows(
        ivf_search(spark, p, q, cents, k=5, nprobe=2, rescore_k=6, batch=False)
    )
    b = _result_rows(
        ivf_search(spark, p, q, cents, k=5, nprobe=2, rescore_k=6, batch=True)
    )
    assert a == b and len(a) == 30


def test_batch_auto_gate_routes_large_sides(spark, tmp_path, monkeypatch):
    """batch=None counts at most gate+1 rows and routes large query
    sides to the distributed path; results match the forced-collected
    answer either way."""
    import dask_awkward_spark.functions.simindex as si

    cents = _centroids()
    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 150), cents)
    q = _vecs(spark, 0, 12)
    monkeypatch.setattr(si, "IVF_COLLECT_MAX_QUERY_ROWS", 8)
    auto = _result_rows(si.ivf_search(spark, p, q, cents, k=4, nprobe=2))
    forced = _result_rows(
        si.ivf_search(spark, p, q, cents, k=4, nprobe=2, batch=False)
    )
    assert auto == forced and len(auto) == 48


def test_batch_path_never_collects_unbounded(spark, tmp_path, monkeypatch):
    """The distributed path's ONLY driver materialization is the
    distinct probed-cell union — every collect() during the search is
    bounded by the codebook size, never by |queries| (the VERDICT r9
    no-unbounded-driver-collect criterion)."""
    from pyspark.sql.classic.dataframe import DataFrame

    cents = _centroids()
    p = str(tmp_path / "quant")
    ivf_index_add(p, _vecs(spark, 0, 200), cents, quantized=True)
    q = _vecs(spark, 0, 600)  # past the default gate -> auto-batch
    orig = DataFrame.collect
    sizes: list = []

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    out = ivf_search(spark, p, q, cents, k=3, nprobe=2)
    monkeypatch.setattr(DataFrame, "collect", orig)
    # the path gate itself is one limit(IVF_COLLECT_MAX_QUERY_ROWS + 1)
    # collect (it doubles as the probe-row fetch when the side turns
    # out small); every bound stays a CONSTANT — never |queries|
    from dask_awkward_spark.functions.simindex import IVF_COLLECT_MAX_QUERY_ROWS

    assert sizes and max(sizes) <= max(
        N_CELLS, IVF_COLLECT_MAX_QUERY_ROWS + 1
    ), sizes
    rows = out.collect()
    assert len(rows) == 600 * 3


def test_collected_survivor_cap_switches_to_join(spark, tmp_path, monkeypatch):
    """ADVICE r8: the collected path must not materialize |queries| x
    rescore_k survivor pairs on the driver — past the cap the exact
    tier becomes the same distributed join the batch path uses, with
    identical results."""
    import dask_awkward_spark.functions.simindex as si
    from pyspark.sql.classic.dataframe import DataFrame

    cents = _centroids()
    p = str(tmp_path / "quant")
    ivf_index_add(p, _vecs(spark, 0, 200), cents, quantized=True)
    q = _vecs(spark, 0, 4)
    want = _result_rows(si.ivf_search(spark, p, q, cents, k=5, nprobe=2))
    monkeypatch.setattr(si, "IVF_COLLECT_MAX_SURVIVORS", 10)
    orig = DataFrame.collect
    sizes: list = []

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    got_df = si.ivf_search(spark, p, q, cents, k=5, nprobe=2, batch=False)
    monkeypatch.setattr(DataFrame, "collect", orig)
    # the query-side collect (4 rows) happens; the survivor collect must not
    assert sizes and max(sizes) <= 4, sizes
    assert _result_rows(got_df) == want and len(want) == 20


# ---- self-describing index: persisted centroids + ANN SQL (round 11) --


def test_centroids_persist_and_search_without_argument(spark, tmp_path):
    from dask_awkward_spark.functions.simindex import ivf_centroids

    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 200), _centroids())
    want = [[float(v) for v in row] for row in _centroids()]
    assert ivf_centroids(p) == want
    q = _vecs(spark, 0, 1)
    got = ivf_search(spark, p, q, k=5, nprobe=2).collect()
    ref = ivf_search(spark, p, q, _centroids(), k=5, nprobe=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, ref))


def test_ingest_refuses_different_centroids(spark, tmp_path):
    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 50), _centroids())
    other = [[-v for v in row] for row in _centroids()]
    with pytest.raises(ValueError, match="DIFFERENT\\s+IVF centroids"):
        ivf_index_add(p, _vecs(spark, 50, 60), other)


def test_retrain_repins_centroids_atomically(spark, tmp_path):
    """After a retrain, the persisted quantizer is the NEW one at head
    while the OLD version still resolves the old one — a time-travel
    search probes with the quantizer that assigned those cells."""
    from dask_awkward_spark.functions.simindex import (
        ivf_centroids,
        ivf_retrain,
    )

    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 200), _centroids())
    v1 = snap._versions(p)[-1]
    new_c = [row[1:] + row[:1] for row in _centroids()]  # rotated
    ivf_retrain(spark, p, new_c)
    assert ivf_centroids(p) == [[float(v) for v in r] for r in new_c]
    assert ivf_centroids(p, version=v1) == [
        [float(v) for v in r] for r in _centroids()
    ]
    q = _vecs(spark, 3, 4)
    head = ivf_search(spark, p, q, k=5, nprobe=4).collect()
    old = ivf_search(spark, p, q, k=5, nprobe=4, version=v1).collect()
    # full probe: both quantizers cover the corpus, same neighbors
    assert sorted((r.vec_id, r.cos) for r in head) == sorted(
        (r.vec_id, r.cos) for r in old
    )


def test_legacy_index_backfills_on_next_ingest(spark, tmp_path):
    from dask_awkward_spark.functions.simindex import ivf_centroids
    from dask_awkward_spark.sources.snapshot import snapshot_set_properties

    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 50), _centroids())
    # simulate a pre-round-11 index: strip the property
    snapshot_set_properties(
        p, unset=["ivf_centroids"],
        _allow_reserved_props=("ivf_centroids",),  # simulate pre-r11
    )
    assert ivf_centroids(p) is None
    with pytest.raises(ValueError, match="predates centroid persistence"):
        ivf_search(spark, p, _vecs(spark, 0, 1), k=3)
    ivf_index_add(p, _vecs(spark, 50, 80), _centroids())
    assert ivf_centroids(p) is not None
    assert ivf_search(spark, p, _vecs(spark, 0, 1), k=3).count() == 3


def test_ann_sql_statement(spark, tmp_path):
    from dask_awkward_spark.sources.sqlface import snapshot_sql

    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 300), _centroids())
    qe = _vecs(spark, 7, 8).select("e").first().e
    vlit = ", ".join(repr(float(x)) for x in qe)
    rows = snapshot_sql(
        spark,
        f"ANN SEARCH idx QUERY ({vlit}) TOP 5 NPROBE 2 EXCLUDE 7",
        {"idx": p},
    ).collect()
    assert [c for c in rows[0].asDict()] == ["vec_id", "cell", "cos"]
    assert len(rows) == 5 and all(r.vec_id != 7 for r in rows)
    # best-first ordering
    assert [r.cos for r in rows] == sorted(
        (r.cos for r in rows), reverse=True
    )
    # equals the Python face with self-exclusion
    ref = ivf_search(
        spark, p, _vecs(spark, 7, 8), k=5, nprobe=2, exclude_self=True
    ).collect()
    assert sorted((r.vec_id, r.cell, r.cos) for r in rows) == sorted(
        (r.vec_id, r.cell, r.cos) for r in ref
    )
    # no EXCLUDE: the corpus vector itself comes back on top
    top = snapshot_sql(
        spark, f"ANN SEARCH idx QUERY ({vlit}) TOP 3", {"idx": p}
    ).first()
    assert top.vec_id == 7 and top.cos == 1.0


def test_ann_sql_grammar_and_refusals(spark, tmp_path):
    from dask_awkward_spark.sources.sqlface import snapshot_sql

    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 50), _centroids())
    t = {"idx": p}
    with pytest.raises(ValueError, match="ANN SEARCH tail"):
        snapshot_sql(spark, "ANN SEARCH idx QUERY (1.0, 2.0) LIMIT 5", t)
    with pytest.raises(ValueError, match="numeric vector literal"):
        snapshot_sql(spark, "ANN SEARCH idx QUERY ('a', 'b') TOP 5", t)
    with pytest.raises(ValueError, match="vector literal is empty"):
        snapshot_sql(spark, "ANN SEARCH idx QUERY () TOP 5", t)
    # a non-index snapshot table refuses with a pointer
    p2 = str(tmp_path / "plain")
    from dask_awkward_spark.sources.snapshot import snapshot_write

    snapshot_write(spark.createDataFrame([(1,)], "k bigint"), p2)
    with pytest.raises(ValueError, match="not an IVF index"):
        snapshot_sql(
            spark, "ANN SEARCH t QUERY (1.0) TOP 1", {"t": p2}
        )


def test_ann_sql_version_as_of_travels_quantizer(spark, tmp_path):
    """VERSION AS OF must pin BOTH the rows and the quantizer: after a
    retrain, the pinned search still probes with the old centroids."""
    from dask_awkward_spark.functions.simindex import ivf_retrain
    from dask_awkward_spark.sources.sqlface import snapshot_sql

    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 200), _centroids())
    v1 = snap._versions(p)[-1]
    qe = _vecs(spark, 3, 4).select("e").first().e
    vlit = ", ".join(repr(float(x)) for x in qe)
    stmt = f"ANN SEARCH idx QUERY ({vlit}) TOP 5 NPROBE 4 EXCLUDE 3"
    before = snapshot_sql(spark, stmt, {"idx": p}).collect()
    ivf_retrain(spark, p, [row[1:] + row[:1] for row in _centroids()])
    pinned = snapshot_sql(
        spark, stmt + f" VERSION AS OF {v1}", {"idx": p}
    ).collect()
    assert sorted(map(tuple, pinned)) == sorted(map(tuple, before))


def test_ingest_refuses_racing_retrain(spark, tmp_path, monkeypatch):
    """Code-review r11: an ivf_retrain landing between the ingest's
    identity check and its append must NOT be rebased onto silently —
    the head-pinned commit loses, re-checks, and refuses."""
    import dask_awkward_spark.sources.snapshot as snap_mod
    from dask_awkward_spark.functions.simindex import ivf_retrain

    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 100), _centroids())
    new_c = [row[1:] + row[:1] for row in _centroids()]
    real_write = snap_mod.snapshot_write
    state = {"fired": False}

    def racing_write(df, path, **kw):
        # the FIRST pinned append triggers a retrain first (the race)
        if not state["fired"] and kw.get("expect_head") not in (None, 0):
            state["fired"] = True
            ivf_retrain(spark, p, new_c)
        return real_write(df, path, **kw)

    monkeypatch.setattr(snap_mod, "snapshot_write", racing_write)
    with pytest.raises(ValueError, match="DIFFERENT\\s+IVF centroids"):
        ivf_index_add(p, _vecs(spark, 100, 120), _centroids())
    assert state["fired"]
    # the retrained index is intact and self-consistent: no rows were
    # celled under the old quantizer
    from dask_awkward_spark.functions.simindex import ivf_centroids

    assert ivf_centroids(p) == [[float(v) for v in r] for r in new_c]
    assert (
        ivf_search(spark, p, _vecs(spark, 0, 1), k=3).count() == 3
    )


def test_ann_sql_exclude_type_mismatch_is_loud(spark, tmp_path):
    from dask_awkward_spark.sources.sqlface import snapshot_sql

    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 30), _centroids())
    qe = _vecs(spark, 1, 2).select("e").first().e
    vlit = ", ".join(repr(float(x)) for x in qe)
    with pytest.raises(ValueError, match="does not match the index"):
        snapshot_sql(
            spark,
            f"ANN SEARCH idx QUERY ({vlit}) TOP 3 EXCLUDE 'seven'",
            {"idx": p},
        )
    with pytest.raises(ValueError, match="dims but the index"):
        snapshot_sql(
            spark, "ANN SEARCH idx QUERY (1.0, 2.0) TOP 3", {"idx": p}
        )


def test_ann_sql_subquery_batch_form(spark, tmp_path):
    """QUERY (SELECT ...) routes the ids+vectors through the SELECT
    face and equals the Python batch search; EXCLUDE SELF drops each
    query's own id."""
    from dask_awkward_spark.sources.snapshot import snapshot_write
    from dask_awkward_spark.sources.sqlface import snapshot_sql

    p = str(tmp_path / "idx")
    q = str(tmp_path / "qs")
    ivf_index_add(p, _vecs(spark, 0, 300), _centroids())
    snapshot_write(_vecs(spark, 5, 9), q)
    t = {"idx": p, "qs": q}
    rows = snapshot_sql(
        spark,
        "ANN SEARCH idx QUERY (SELECT vec_id, e FROM qs) "
        "TOP 4 NPROBE 2 EXCLUDE SELF",
        t,
    ).collect()
    assert list(rows[0].asDict()) == ["q_id", "vec_id", "cell", "cos"]
    assert len(rows) == 4 * 4
    assert all(r.vec_id != r.q_id for r in rows)
    ref = ivf_search(
        spark, p, _vecs(spark, 5, 9), k=4, nprobe=2, exclude_self=True
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, ref))
    # grammar refusals specific to each form
    with pytest.raises(ValueError, match="EXCLUDE SELF needs query ids"):
        snapshot_sql(
            spark, "ANN SEARCH idx QUERY (1.0, 2.0) TOP 3 EXCLUDE SELF", t
        )
    with pytest.raises(ValueError, match="uses EXCLUDE SELF"):
        snapshot_sql(
            spark,
            "ANN SEARCH idx QUERY (SELECT vec_id, e FROM qs) "
            "TOP 3 EXCLUDE 7",
            t,
        )
    with pytest.raises(ValueError, match="must produce"):
        snapshot_sql(
            spark,
            "ANN SEARCH idx QUERY (SELECT vec_id FROM qs) TOP 3",
            t,
        )


def test_ann_sql_over_pq_index(spark, tmp_path):
    """The ANN statement runs the PQ/ADC tier unchanged: SQL result ==
    Python-face result over a residual-encoded index, and RESCORE wide
    enough makes it exact vs brute force."""
    from dask_awkward_spark.functions.pq import pq_train
    from dask_awkward_spark.functions.simindex import knn_bruteforce
    from dask_awkward_spark.sources.sqlface import snapshot_sql

    p = str(tmp_path / "idx")
    cents = _centroids()
    cb = pq_train(
        _vecs(spark, 0, 200), m=4, ksub=8, order_col="vec_id",
        sample_rows=200, iters=6, residual_centroids=cents,
    )
    ivf_index_add(p, _vecs(spark, 0, 200), cents, pq_codebook=cb)
    qe = _vecs(spark, 3, 4).select("e").first().e
    vlit = ", ".join(repr(float(x)) for x in qe)
    rows = snapshot_sql(
        spark,
        f"ANN SEARCH idx QUERY ({vlit}) TOP 5 NPROBE {N_CELLS} "
        "RESCORE 100000 EXCLUDE 3",
        {"idx": p},
    ).collect()
    ref = ivf_search(
        spark, p, _vecs(spark, 3, 4), k=5, nprobe=N_CELLS,
        rescore_k=100000, exclude_self=True,
    ).collect()
    assert sorted((r.vec_id, r.cell, r.cos) for r in rows) == sorted(
        (r.vec_id, r.cell, r.cos) for r in ref
    )
    # full probe + full rescore over the PQ tier is EXACT
    bf = knn_bruteforce(
        _vecs(spark, 0, 200), _vecs(spark, 3, 4), k=5
    ).collect()
    assert sorted((r.vec_id, r.cos) for r in rows) == sorted(
        (r.vec_id, r.cos) for r in bf
    )


def test_ann_sql_by_catalog_path(spark, tmp_path):
    """tables= as a catalog PATH (the one-string SQL-only consumer):
    the index resolves by registered name, including the subquery's
    query-side table."""
    from dask_awkward_spark.sources.catalog import snapshot_catalog_register
    from dask_awkward_spark.sources.snapshot import snapshot_write
    from dask_awkward_spark.sources.sqlface import snapshot_sql

    cat = str(tmp_path / "cat")
    p = str(tmp_path / "idx")
    q = str(tmp_path / "qs")
    ivf_index_add(p, _vecs(spark, 0, 120), _centroids())
    snapshot_write(_vecs(spark, 2, 4), q)
    snapshot_catalog_register(spark, cat, "idx", p)
    snapshot_catalog_register(spark, cat, "qs", q)
    out = snapshot_sql(
        spark,
        "ANN SEARCH idx QUERY (SELECT vec_id, e FROM qs) "
        "TOP 3 NPROBE 2 EXCLUDE SELF",
        cat,
    )
    assert out.count() == 2 * 3


def test_stream_ingest_equals_batch_and_replays_once(spark, tmp_path):
    """ivf_stream_ingest: the drained index holds exactly a batch
    build's rows (fixed quantizer => streamed == batch), re-running
    the SAME stream over the same checkpoint appends nothing (the
    exactly-once watermark), and the quantizer persisted with the
    creating batch."""
    from dask_awkward_spark.functions.simindex import (
        ivf_centroids,
        ivf_stream_ingest,
    )
    from dask_awkward_spark.sources.snapshot import snapshot_read

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    batch_idx = str(tmp_path / "bidx")
    ckpt = str(tmp_path / "ckpt")
    _vecs(spark, 0, 120).repartition(3).write.parquet(src)

    def stream():
        return (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    ivf_stream_ingest(stream(), idx, _centroids(), checkpoint_dir=ckpt)
    assert len(snap._versions(idx)) >= 2  # multiple micro-batches
    ivf_index_add(batch_idx, _vecs(spark, 0, 120), _centroids())
    got = sorted(
        (r.vec_id, r.cell) for r in snapshot_read(spark, idx).collect()
    )
    want = sorted(
        (r.vec_id, r.cell)
        for r in snapshot_read(spark, batch_idx).collect()
    )
    assert got == want and len(got) == 120
    assert ivf_centroids(idx) == [
        [float(v) for v in row] for row in _centroids()
    ]
    # restart over the SAME checkpoint: nothing new, nothing doubled
    head = snap._versions(idx)[-1]
    ivf_stream_ingest(stream(), idx, _centroids(), checkpoint_dir=ckpt)
    assert snapshot_read(spark, idx).count() == 120
    assert snap._versions(idx)[-1] == head
    # mismatched quantizer refuses BEFORE any batch lands
    other = [[-v for v in row] for row in _centroids()]
    with pytest.raises(ValueError, match="DIFFERENT IVF"):
        ivf_stream_ingest(stream(), idx, other, checkpoint_dir=ckpt)
    # searches over the streamed index work without a quantizer arg
    assert ivf_search(spark, idx, _vecs(spark, 1, 2), k=4).count() == 4


def test_stream_ingest_new_checkpoint_not_swallowed(spark, tmp_path):
    """Review r11: batch ids restart at 0 per checkpoint, so a SECOND
    backfill stream (fresh checkpoint) against an already-ingested
    index must land all its batches — the watermark is scoped by
    checkpoint (app id), not global."""
    from dask_awkward_spark.functions.simindex import ivf_stream_ingest
    from dask_awkward_spark.sources.snapshot import snapshot_read

    idx = str(tmp_path / "idx")

    def run(lo, hi, tag):
        src = str(tmp_path / f"src{tag}")
        _vecs(spark, lo, hi).repartition(2).write.parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        ivf_stream_ingest(
            stream, idx, _centroids(),
            checkpoint_dir=str(tmp_path / f"ckpt{tag}"),
        )

    run(0, 40, "a")
    assert snapshot_read(spark, idx).count() == 40
    run(40, 90, "b")  # NEW checkpoint: batches 0..1 again
    assert snapshot_read(spark, idx).count() == 90  # nothing swallowed
    # and stream_to_snapshot itself has the same contract now
    from dask_awkward_spark.sources.snapshot import (
        snapshot_write,
        stream_to_snapshot,
    )

    t = str(tmp_path / "t")
    s1 = str(tmp_path / "s1")
    spark.range(10).coalesce(2).write.parquet(s1)

    def fstream(src):
        return (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    stream_to_snapshot(fstream(s1), t)
    s2 = str(tmp_path / "s2")
    spark.range(10, 25).coalesce(2).write.parquet(s2)
    stream_to_snapshot(fstream(s2), t)
    from dask_awkward_spark.sources.snapshot import snapshot_read as sread

    assert sread(spark, t).count() == 25


def test_stream_ingest_refuses_midstream_retrain(spark, tmp_path):
    """Review r11: a retrain BEFORE the stream starts trips the entry
    check; one landing MID-STREAM (between the setup check and a
    micro-batch commit) must trip the per-batch in-loop guard — never
    rebase rows celled under the stale quantizer into the retrained
    index."""
    import dask_awkward_spark.sources.snapshot as snap_mod
    from dask_awkward_spark.functions.simindex import (
        ivf_retrain,
        ivf_stream_ingest,
    )
    from dask_awkward_spark.sources.snapshot import snapshot_read

    idx = str(tmp_path / "idx")
    ivf_index_add(idx, _vecs(spark, 0, 60), _centroids())
    src = str(tmp_path / "src")
    _vecs(spark, 60, 120).repartition(3).write.parquet(src)
    new_c = [row[1:] + row[:1] for row in _centroids()]

    # retrain BEFORE the first micro-batch COMMIT but AFTER the
    # stream's setup check: inject via the write path the batch loop
    # calls (ivf_stream_ingest binds snapshot_write at call time, so
    # patching the module first intercepts commit_batch's writes)
    real_write = snap_mod.snapshot_write
    state = {"fired": False}

    def racing_write(df, path, **kw):
        if not state["fired"] and kw.get("stream_batch_id") is not None:
            state["fired"] = True
            ivf_retrain(spark, idx, new_c)  # lands between check & pin
        return real_write(df, path, **kw)

    snap_mod.snapshot_write = racing_write
    try:
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        with pytest.raises(Exception, match="re-quantized"):
            ivf_stream_ingest(
                stream, idx, _centroids(),
                checkpoint_dir=str(tmp_path / "ckpt"),
            )
    finally:
        snap_mod.snapshot_write = real_write
    assert state["fired"]
    # no stale-celled rows landed; the retrained index is intact
    assert snapshot_read(spark, idx).count() == 60
    from dask_awkward_spark.functions.simindex import ivf_centroids

    assert ivf_centroids(idx) == [[float(v) for v in r] for r in new_c]
    # and the plain BEFORE-stream case still refuses at entry
    stream2 = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with pytest.raises(ValueError, match="DIFFERENT IVF"):
        ivf_stream_ingest(
            stream2, idx, _centroids(),
            checkpoint_dir=str(tmp_path / "ckpt2"),
        )


def test_ivf_centroids_property_is_tamperproof(spark, tmp_path):
    """Review r11 (4th pass): ivf_centroids is the index's quantizer
    IDENTITY — interpreted by every search — so the opaque-property
    faces must refuse it like the other engine-owned keys, while the
    engine's own writers keep working."""
    from dask_awkward_spark.sources.snapshot import (
        snapshot_set_properties,
    )
    from dask_awkward_spark.sources.sqlface import snapshot_sql

    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 50), _centroids())
    with pytest.raises(ValueError, match="engine-reserved"):
        snapshot_set_properties(p, {"ivf_centroids": "[[0.0]]"})
    with pytest.raises(ValueError, match="engine-reserved"):
        snapshot_sql(
            spark,
            "ALTER TABLE t SET TBLPROPERTIES ('ivf_centroids'='[[0.0]]')",
            {"t": p},
        )
    with pytest.raises(ValueError, match="engine-reserved"):
        snapshot_sql(
            spark,
            "ALTER TABLE t UNSET TBLPROPERTIES ('ivf_centroids')",
            {"t": p},
        )
    # user keys still merge fine alongside the engine's
    snapshot_set_properties(p, {"owner": "x"})
    # SHOW CREATE omits the engine key so its output stays replayable
    stmt = snapshot_sql(spark, "SHOW CREATE TABLE t", {"t": p}).first()[0]
    assert "'ivf_centroids'" not in stmt and "'owner'" in stmt
    # ... and the index still searches (identity untouched)
    assert ivf_search(spark, p, _vecs(spark, 1, 2), k=3).count() == 3


# ---- hybrid filtered search (round 12 — VERDICT r11 item 2) ----------


def _meta_vecs(spark, lo, hi):
    """_vecs plus payload metadata columns for hybrid filtering."""
    return _vecs(spark, lo, hi).select(
        "vec_id",
        "e",
        F.when(F.col("vec_id") % 3 == 0, "en").otherwise("de").alias("lang"),
        (F.col("vec_id") % 5).cast("double").alias("quality"),
    )


def test_hybrid_where_exact_among_filtered(spark, tmp_path):
    """where= applies INSIDE the candidate scan, before ranking: with
    every cell probed, the result IS the brute-force top-k among rows
    passing the filter — exactly k of them, never an under-filled
    post-filter."""
    import math

    p = str(tmp_path / "idx")
    ivf_index_add(
        p, _meta_vecs(spark, 0, 200), _centroids(),
        meta_cols=["lang", "quality"],
    )
    got = ivf_search(
        spark, p, _vecs(spark, 0, 1), k=5, nprobe=N_CELLS,
        where=[("lang", "=", "en"), ("quality", ">=", 2.0)],
    ).collect()
    assert len(got) == 5
    rows = _meta_vecs(spark, 0, 200).collect()
    qe = rows[0].e

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )

    want = sorted(
        (
            (round(cos(r.e, qe), 6), r.vec_id)
            for r in rows
            if r.vec_id != 0 and r.lang == "en" and r.quality >= 2.0
        ),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    assert [(r.cos, r.vec_id) for r in got] == want


def test_hybrid_where_prunes_files(spark, tmp_path):
    """Cell/file pruning still fires with the filter present: the
    probed-cell prune is unchanged, and a filter triple on a
    stats-carrying metadata column prunes MORE files inside the probed
    cells (the triples are the snapshot layer's own vocabulary)."""
    p = str(tmp_path / "idx")
    # many small files per cell so vec_id stats can exclude whole files
    for lo in range(0, 200, 50):
        ivf_index_add(
            p, _meta_vecs(spark, lo, lo + 50), _centroids(),
            meta_cols=["lang", "quality"],
        )
    m = snap._read_manifest(p, snap._versions(p)[-1])
    cells_on_disk = {int(f.split("cell=")[1].split("/")[0]) for f in m["files"]}
    probe = sorted(cells_on_disk)[:2]
    kept_c, skip_c = snap._prune_files(m, [("cell", "in", probe)], None)
    assert skip_c > 0  # the cell prune fires at all
    kept_f, skip_f = snap._prune_files(
        m, [("cell", "in", probe), ("vec_id", "<", 50)], None
    )
    assert skip_f > skip_c, "the filter must prune files INSIDE probed cells"
    assert set(kept_f) <= set(kept_c)
    # and the filtered search is still correct over the pruned scan
    got = ivf_search(
        spark, p, _vecs(spark, 0, 1), k=3, nprobe=2,
        where=[("vec_id", "<", 50)],
    ).collect()
    assert got and all(r.vec_id < 50 for r in got)


def test_hybrid_where_batch_equals_collected(spark, tmp_path):
    """Both plan shapes return identical rows under the same filter —
    including over a QUANTIZED index (filter before the int8 ranking
    tier, exact re-score among filtered survivors)."""
    p = str(tmp_path / "idx")
    ivf_index_add(
        p, _meta_vecs(spark, 0, 150), _centroids(),
        quantized=True, meta_cols=["lang", "quality"],
    )
    qs = _vecs(spark, 0, 10)
    w = [("lang", "=", "de")]
    a = ivf_search(
        spark, p, qs, k=4, nprobe=2, rescore_k=10_000, where=w, batch=False
    )
    b = ivf_search(
        spark, p, qs, k=4, nprobe=2, rescore_k=10_000, where=w, batch=True
    )
    assert _result_rows(a) == _result_rows(b)
    assert all(r.vec_id % 3 != 0 for r in a.collect())  # de only


def test_hybrid_where_refusals_and_meta_guard(spark, tmp_path):
    p = str(tmp_path / "idx")
    with pytest.raises(ValueError, match="collide with the index"):
        ivf_index_add(
            p, _meta_vecs(spark, 0, 10).withColumnRenamed("lang", "cell"),
            _centroids(), meta_cols=["cell"],
        )
    ivf_index_add(
        p, _meta_vecs(spark, 0, 30), _centroids(), meta_cols=["lang", "quality"]
    )
    with pytest.raises(ValueError, match="internal columns"):
        ivf_search(spark, p, _vecs(spark, 0, 1), k=2, where=[("e", "=", 1)])
    with pytest.raises(ValueError, match="internal columns"):
        ivf_search(spark, p, _vecs(spark, 0, 1), k=2, where=[("cell", "=", 1)])
    # vec_id IS a legal hybrid predicate
    got = ivf_search(
        spark, p, _vecs(spark, 0, 1), k=2, nprobe=N_CELLS,
        where=[("vec_id", "in", [3, 6, 9])],
    ).collect()
    assert len(got) == 2 and {r.vec_id for r in got} <= {3, 6, 9}


def test_ann_sql_where_clause(spark, tmp_path):
    """The SQL spelling: WHERE is the last tail clause, speaks the DML
    predicate grammar, and equals the Python face's where=."""
    from dask_awkward_spark.sources.sqlface import snapshot_sql

    p = str(tmp_path / "idx")
    ivf_index_add(
        p, _meta_vecs(spark, 0, 120), _centroids(), meta_cols=["lang", "quality"]
    )
    qe = _vecs(spark, 0, 1).select("e").first().e
    vlit = ", ".join(repr(float(x)) for x in qe)
    rows = snapshot_sql(
        spark,
        f"ANN SEARCH idx QUERY ({vlit}) TOP 4 NPROBE {N_CELLS} EXCLUDE 0 "
        f"WHERE lang = 'en' AND quality >= 2.0",
        {"idx": p},
    ).collect()
    ref = ivf_search(
        spark, p, _vecs(spark, 0, 1), k=4, nprobe=N_CELLS,
        where=[("lang", "=", "en"), ("quality", ">=", 2.0)],
    ).collect()
    assert sorted((r.vec_id, r.cos) for r in rows) == sorted(
        (r.vec_id, r.cos) for r in ref
    )
    # grammar: WHERE composes with VERSION AS OF (pins first)
    v = snap._versions(p)[-1]
    rows2 = snapshot_sql(
        spark,
        f"ANN SEARCH idx QUERY ({vlit}) TOP 4 NPROBE {N_CELLS} EXCLUDE 0 "
        f"VERSION AS OF {v} WHERE lang = 'en' AND quality >= 2.0",
        {"idx": p},
    ).collect()
    assert sorted((r.vec_id, r.cos) for r in rows2) == sorted(
        (r.vec_id, r.cos) for r in ref
    )
    # malformed vector literals refuse loudly (empty elements)
    with pytest.raises(ValueError, match="empty element"):
        snapshot_sql(spark, "ANN SEARCH idx QUERY (1.0,,2.0) TOP 2", {"idx": p})
    with pytest.raises(ValueError, match="empty element"):
        snapshot_sql(spark, "ANN SEARCH idx QUERY (1.0, 2.0,) TOP 2", {"idx": p})


def test_ann_sql_tag_and_timestamp_as_of(spark, tmp_path):
    """TAG AS OF / TIMESTAMP AS OF parity with the SELECT face (round
    12, VERDICT r11 item 4): a tag minted BEFORE a retrain reproduces
    the old quantizer's answer from one SQL string, and a wall-clock
    pin resolves to the same version."""
    import datetime

    from dask_awkward_spark.functions.simindex import ivf_retrain
    from dask_awkward_spark.sources.snapshot import snapshot_tag
    from dask_awkward_spark.sources.sqlface import snapshot_sql

    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 200), _centroids())
    v1 = snap._versions(p)[-1]
    snapshot_tag(p, "train-v1")
    ts_after_v1 = datetime.datetime.now().isoformat()
    qe = _vecs(spark, 3, 4).select("e").first().e
    vlit = ", ".join(repr(float(x)) for x in qe)
    stmt = f"ANN SEARCH idx QUERY ({vlit}) TOP 5 NPROBE 4 EXCLUDE 3"
    before = snapshot_sql(spark, stmt, {"idx": p}).collect()
    ivf_retrain(spark, p, [row[1:] + row[:1] for row in _centroids()])
    after = snapshot_sql(spark, stmt, {"idx": p}).collect()
    assert sorted(map(tuple, after)) != sorted(map(tuple, before))
    tagged = snapshot_sql(
        spark, stmt + " TAG AS OF 'train-v1'", {"idx": p}
    ).collect()
    assert sorted(map(tuple, tagged)) == sorted(map(tuple, before))
    stamped = snapshot_sql(
        spark, stmt + f" TIMESTAMP AS OF '{ts_after_v1}'", {"idx": p}
    ).collect()
    assert sorted(map(tuple, stamped)) == sorted(map(tuple, before))
    # pins compose with the hybrid filter (WHERE stays the LAST clause)
    both = snapshot_sql(
        spark,
        stmt + " TAG AS OF 'train-v1' WHERE vec_id IN (1, 2, 4, 5, 6)",
        {"idx": p},
    ).collect()
    assert {r.vec_id for r in both} <= {1, 2, 4, 5, 6} and len(both) == 5
    # refusals keep the SELECT face's messages
    with pytest.raises(ValueError, match="not in"):
        snapshot_sql(spark, stmt + " TAG AS OF 'nope'", {"idx": p})
    with pytest.raises(ValueError, match="bad TIMESTAMP AS OF"):
        snapshot_sql(spark, stmt + " TIMESTAMP AS OF 'yesterday'", {"idx": p})


def test_index_dml_staleness_guard(spark, tmp_path):
    """Raw DML on an index table (round 12, VERDICT r11 item 5): writes
    to e or its derived code columns refuse with the recipes; metadata
    DML and DELETE pass and search stays correct afterwards."""
    from dask_awkward_spark.sources.snapshot import (
        snapshot_delete,
        snapshot_merge,
        snapshot_update,
    )
    from dask_awkward_spark.sources.sqlface import snapshot_sql

    p = str(tmp_path / "idx")
    ivf_index_add(
        p, _meta_vecs(spark, 0, 100), _centroids(), meta_cols=["lang", "quality"]
    )
    for col in ("e", "cell"):
        with pytest.raises(ValueError, match="stale"):
            snapshot_update(
                spark, p, [("vec_id", "=", 3)], {col: F.lit(None)}
            )
    # quantized tier columns guard too (on an index that HAS them)
    pq_ = str(tmp_path / "idxq")
    ivf_index_add(pq_, _vecs(spark, 0, 40), _centroids(), quantized=True)
    for col in ("q", "scale"):
        with pytest.raises(ValueError, match="stale"):
            snapshot_update(
                spark, pq_, [("vec_id", "=", 3)], {col: F.lit(None)}
            )
    with pytest.raises(ValueError, match="stale"):
        snapshot_sql(
            spark, "UPDATE t SET cell = 1 WHERE vec_id = 3", {"t": p}
        )
    # full-row MERGE update and ANY insert family write e/cell: refused
    src = _meta_vecs(spark, 0, 5)
    with pytest.raises(ValueError, match="stale"):
        snapshot_merge(spark, p, src, on=["vec_id"], when_matched="update",
                       when_not_matched=None)
    with pytest.raises(ValueError, match="stale"):
        snapshot_merge(spark, p, src, on=["vec_id"], when_matched=None,
                       when_not_matched="insert")
    with pytest.raises(ValueError, match="stale"):
        snapshot_merge(
            spark, p, src, on=["vec_id"],
            when_matched=[(None, "update", None)], when_not_matched=None,
        )
    # metadata writes are the legal hybrid-index maintenance path
    st = snapshot_update(
        spark, p, [("vec_id", "<", 50)], {"quality": F.lit(9.0)}
    )
    assert st["updated_rows"] == 50
    st = snapshot_merge(
        spark, p, src.select("vec_id", F.lit("fr").alias("l2")),
        on=["vec_id"],
        when_matched=[(None, "update", {"lang": "s.l2"})],
        when_not_matched=None,
    )
    assert st["updated_rows"] == 5
    st = snapshot_delete(spark, p, [("vec_id", ">=", 90)])
    assert st["removed_rows"] == 10
    # search over the mutated index: filter sees the DML'd metadata,
    # codes never went stale (only metadata moved)
    got = ivf_search(
        spark, p, _vecs(spark, 0, 1), k=3, nprobe=N_CELLS,
        where=[("lang", "=", "fr")],
    ).collect()
    assert {r.vec_id for r in got} <= {1, 2, 3, 4} and len(got) == 3


def test_recall_single_pass_equals_per_tier_searches(spark, tmp_path):
    """Round 12 (the r9-carried re-scan): the flat index's recall sweep
    is ONE scan with per-prefix windows — provably identical to running
    ivf_search once per nprobe tier."""
    from dask_awkward_spark.functions.simindex import ivf_recall

    cents = _centroids()
    p = str(tmp_path / "idx")
    ivf_index_add(p, _vecs(spark, 0, 180), cents)
    q = _vecs(spark, 0, 6)
    got = ivf_recall(spark, p, q, cents, k=5, nprobes=(1, 2, 4, 2))
    # reference: the per-tier estimator, computed by hand
    import math

    rows = _vecs(spark, 0, 180).collect()
    by_id = {r.vec_id: r.e for r in rows}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(
            d
            / (
                math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(x * x for x in b))
            ),
            6,
        )

    def cell_order(e):
        dots = [
            (sum(x * y for x, y in zip(e, c)), -(i + 1))
            for i, c in enumerate(cents)
        ]
        return [-c for _d, c in sorted(dots, key=lambda t: (-t[0], -t[1]))]

    cells = {vid: cell_order(e)[0] for vid, e in by_id.items()}
    truth = {}
    for qid in range(6):
        qe = by_id[qid]
        scored = sorted(
            ((-cos(by_id[v], qe), v) for v in by_id if v != qid),
        )[:5]
        truth[qid] = {v for _c, v in scored}
    for ent in got:
        np_ = ent["nprobe"]
        recs = []
        for qid in range(6):
            qe = by_id[qid]
            probed = set(cell_order(qe)[:np_])
            scored = sorted(
                (
                    (-cos(by_id[v], qe), v)
                    for v in by_id
                    if v != qid and cells[v] in probed
                )
            )[:5]
            ivf_top = {v for _c, v in scored}
            recs.append(len(ivf_top & truth[qid]) / 5)
        assert ent["recall_at_k"] == round(sum(recs) / len(recs), 4), ent
    # duplicate tier entries report identically, and ordering follows
    # the caller's nprobes tuple
    assert [e["nprobe"] for e in got] == [1, 2, 4, 2]
    assert got[1]["recall_at_k"] == got[3]["recall_at_k"]


def test_stream_ingest_carries_meta_cols_for_hybrid_search(spark, tmp_path):
    """Round 12: a STREAMED index carries payload metadata too, so
    hybrid filtered search works identically over stream and batch
    builds (sticky schema keeps batch/stream mixes consistent)."""
    from dask_awkward_spark.functions.simindex import ivf_stream_ingest
    from dask_awkward_spark.sources.snapshot import snapshot_read

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    bidx = str(tmp_path / "bidx")
    _meta_vecs(spark, 0, 90).repartition(3).write.parquet(src)

    def stream():
        return (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    ivf_stream_ingest(
        stream(), idx, _centroids(), meta_cols=["lang", "quality"]
    )
    ivf_index_add(
        bidx, _meta_vecs(spark, 0, 90), _centroids(),
        meta_cols=["lang", "quality"],
    )
    assert sorted(snapshot_read(spark, idx).columns) == sorted(
        snapshot_read(spark, bidx).columns
    )
    w = [("lang", "=", "en"), ("quality", ">=", 2.0)]
    q = _vecs(spark, 0, 2)
    got = _result_rows(ivf_search(spark, idx, q, k=4, nprobe=N_CELLS, where=w))
    want = _result_rows(ivf_search(spark, bidx, q, k=4, nprobe=N_CELLS, where=w))
    assert got == want and len(got) == 8
    # a batch ingest WITHOUT the meta columns refuses (sticky schema)
    with pytest.raises(ValueError, match="schema|columns"):
        ivf_index_add(idx, _vecs(spark, 100, 110), _centroids())


def test_ivf_train_centroids_deterministic_and_useful(spark, tmp_path):
    """Round 12: driver-side bounded-sample k-means — deterministic
    under order_col (same call, same quantizer), shapes validated, and
    the trained quantizer actually spreads the corpus across cells."""
    from dask_awkward_spark.functions.simindex import (
        ivf_train_centroids,
    )

    vecs = _vecs(spark, 0, 300)
    a = ivf_train_centroids(vecs, 4, order_col="vec_id")
    b = ivf_train_centroids(vecs, 4, order_col="vec_id")
    assert a == b and len(a) == 4 and len(a[0]) == DIM
    p = str(tmp_path / "idx")
    ivf_index_add(p, vecs, a)
    m = snap._read_manifest(p, snap._versions(p)[-1])
    cells = {int(f.split("cell=")[1].split("/")[0]) for f in m["files"]}
    assert len(cells) >= 2, f"trained quantizer collapsed: {cells}"
    with pytest.raises(ValueError, match="n_cells"):
        ivf_train_centroids(vecs, 0)
    with pytest.raises(ValueError, match="at least n_cells"):
        ivf_train_centroids(_vecs(spark, 0, 2), 4)


def test_create_vector_index_sql_lifecycle(spark, tmp_path):
    """Round 12: the SQL-only index lifecycle — CREATE VECTOR INDEX
    (trained form + metadata columns) builds, registers, and is
    immediately searchable with a hybrid WHERE; equals the Python face
    given the same quantizer; DROP TABLE unregisters it."""
    import json as _json

    from dask_awkward_spark.sources.snapshot import snapshot_write
    from dask_awkward_spark.sources.sqlface import snapshot_sql

    src = str(tmp_path / "src")
    loc = str(tmp_path / "idx")
    loc2 = str(tmp_path / "idx2")
    snapshot_write(_meta_vecs(spark, 0, 150), src)
    t = {"src": src}
    v = snapshot_sql(
        spark,
        f"CREATE VECTOR INDEX vidx LOCATION '{loc}' "
        f"WITH ('n_cells' = '4', 'quantized' = 'true') "
        f"AS SELECT vec_id, e, lang, quality FROM src",
        t,
    )
    assert v == 1 and t["vidx"] == loc
    qe = _vecs(spark, 0, 1).select("e").first().e
    vlit = ", ".join(repr(float(x)) for x in qe)
    rows = snapshot_sql(
        spark,
        f"ANN SEARCH vidx QUERY ({vlit}) TOP 4 NPROBE 4 "
        f"RESCORE 100000 EXCLUDE 0 WHERE lang = 'en'",
        t,
    ).collect()
    assert len(rows) == 4 and all(r.vec_id % 3 == 0 for r in rows)
    # explicit-centroids form == the Python face bit-for-bit
    cents = _centroids()
    snapshot_sql(
        spark,
        f"CREATE VECTOR INDEX vidx2 LOCATION '{loc2}' "
        f"WITH ('centroids' = '{_json.dumps(cents)}') "
        f"AS SELECT vec_id, e FROM src",
        t,
    )
    pyidx = str(tmp_path / "pyidx")
    ivf_index_add(pyidx, _vecs(spark, 0, 150), cents)
    got = _result_rows(
        ivf_search(spark, loc2, _vecs(spark, 0, 3), k=4, nprobe=2)
    )
    want = _result_rows(
        ivf_search(spark, pyidx, _vecs(spark, 0, 3), k=4, nprobe=2)
    )
    assert got == want
    # DROP TABLE unregisters the index name like any table
    snapshot_sql(spark, "DROP TABLE vidx2", t)
    assert "vidx2" not in t


def test_describe_vector_index(spark, tmp_path):
    """DESCRIBE VECTOR INDEX: the identity card (quantizer shape,
    tier, metadata columns, counts) from the manifest alone."""
    import json as _json

    from dask_awkward_spark.sources.snapshot import snapshot_write
    from dask_awkward_spark.sources.sqlface import snapshot_sql

    src = str(tmp_path / "src")
    loc = str(tmp_path / "idx")
    snapshot_write(_meta_vecs(spark, 0, 80), src)
    t = {"src": src}
    snapshot_sql(
        spark,
        f"CREATE VECTOR INDEX vidx LOCATION '{loc}' "
        f"WITH ('centroids' = '{_json.dumps(_centroids())}') "
        f"AS SELECT vec_id, e, lang, quality FROM src",
        t,
    )
    kv = {
        r.key: r.value
        for r in snapshot_sql(spark, "DESCRIBE VECTOR INDEX vidx", t).collect()
    }
    assert kv["n_cells"] == str(N_CELLS) and kv["dim"] == str(DIM)
    assert kv["tier"].startswith("ivf-flat")
    assert kv["meta_columns"] == "lang, quality"
    assert kv["rows"] == "80" and kv["vec_id_type"] == "bigint"
    with pytest.raises(ValueError, match="not an IVF index"):
        snapshot_sql(spark, "DESCRIBE VECTOR INDEX src", t)


def test_create_vector_index_pq_tier(spark, tmp_path):
    """CREATE VECTOR INDEX builds the production IVF-PQ tier from pure
    SQL ('pq_m', optional residual IVFADC) — the codebook trains over
    the same deterministic sample as the coarse quantizer, persists
    beside the table, and ANN SEARCH ranks through ADC with exact
    rescore, equal to a Python-face build with the same inputs."""
    import json as _json

    from dask_awkward_spark.functions.pq import pq_train
    from dask_awkward_spark.functions.simindex import _load_pq_codebook
    from dask_awkward_spark.sources.snapshot import snapshot_write
    from dask_awkward_spark.sources.sqlface import snapshot_sql

    src = str(tmp_path / "src")
    loc = str(tmp_path / "idx")
    snapshot_write(_vecs(spark, 0, 150), src)
    t = {"src": src}
    cents = _centroids()
    snapshot_sql(
        spark,
        f"CREATE VECTOR INDEX pidx LOCATION '{loc}' "
        f"WITH ('centroids' = '{_json.dumps(cents)}', 'pq_m' = '4', "
        f"'pq_ksub' = '16', 'pq_residual' = 'true') "
        f"AS SELECT vec_id, e FROM src",
        t,
    )
    assert _load_pq_codebook(loc) is not None
    qe = _vecs(spark, 3, 4).select("e").first().e
    vlit = ", ".join(repr(float(x)) for x in qe)
    rows = snapshot_sql(
        spark,
        f"ANN SEARCH pidx QUERY ({vlit}) TOP 5 NPROBE 4 "
        f"RESCORE 100000 EXCLUDE 3",
        t,
    ).collect()
    assert len(rows) == 5 and all(r.vec_id != 3 for r in rows)
    # equals the Python face given the same codebook + quantizer
    cb = pq_train(
        _vecs(spark, 0, 150), 4, ksub=16, order_col="vec_id",
        sample_rows=10000, residual_centroids=cents,
    )
    pyidx = str(tmp_path / "pyidx")
    ivf_index_add(pyidx, _vecs(spark, 0, 150), cents, pq_codebook=cb)
    want = sorted(
        (r.vec_id, r.cell, r.cos)
        for r in ivf_search(
            spark, pyidx, _vecs(spark, 3, 4), k=5, nprobe=4,
            rescore_k=100000,
        ).collect()
    )
    got = sorted((r.vec_id, r.cell, r.cos) for r in rows)
    assert got == want
    # tier exclusivity refuses
    with pytest.raises(ValueError, match="ONE ranking tier"):
        snapshot_sql(
            spark,
            f"CREATE VECTOR INDEX x LOCATION '{tmp_path}/x' "
            f"WITH ('n_cells' = '2', 'pq_m' = '4', 'quantized' = 'true') "
            f"AS SELECT vec_id, e FROM src",
            t,
        )
