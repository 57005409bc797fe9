"""Similarity search over the embedding column (array<float>).

- Brute-force cosine top-k: the exactness baseline. At scale: broadcast
  the (small) query set, scan the corpus once, per-partition partial
  top-k then global top-k — Spark's TakeOrdered already does this.
- LSH bucketing (random hyperplanes): the scale path — bucket id is a
  pure per-row expression, so candidate generation is a hash shuffle.

Hyperplane weights are derived from md5 in *Python* and embedded as
literals in both the Spark plan and the DuckDB oracle, so no cross-engine
hash agreement is needed.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..sources.tables import load_table

N_PLANES = 8
DIM = 64


def _planes() -> list[list[float]]:
    """Deterministic ±1 hyperplanes: sign from md5(f"{plane}_{dim}")."""
    out = []
    for j in range(N_PLANES):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"{j}_{d}".encode()).hexdigest()
            row.append(1.0 if h[0] in "89abcdef" else -1.0)
        out.append(row)
    return out


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )


from ..functions.vectors import dot as _dot  # noqa: E402  (public vector API)


def sim_topk_bruteforce(spark, sf_dir):
    """Top-10 cosine neighbors of vec_id=0 (excluded) — brute-force scan,
    deterministic tie-break on vec_id.

    BASELINE ONLY: the query side is a guarded broadcast singleton
    (functions.simindex.guard_bruteforce_query_side refuses >128 query
    rows). The scale paths are sim_ivf_topk / sim_incremental
    (functions.simindex.ivf_search) — probe nprobe cells, never the
    whole corpus per query."""
    from ..functions.simindex import guard_bruteforce_query_side

    emb = _emb(spark, sf_dir)
    qside = emb.filter(F.col("vec_id") == 0)
    guard_bruteforce_query_side(qside)
    # squared norms attach per SIDE before the cross join: the array
    # folds are CodegenFallback and re-evaluate per pair when inline —
    # same expressions, same doubles, one O(dim) fold per pair not three
    q = F.broadcast(
        qside.select(
            F.col("e").alias("qe"),
            _dot(F.col("e"), F.col("e")).alias("qe2"),
        )
    )
    cand = emb.filter(F.col("vec_id") != 0).withColumn(
        "e2", _dot(F.col("e"), F.col("e"))
    ).crossJoin(q)
    cos = _dot(F.col("e"), F.col("qe")) / (
        F.sqrt(F.col("e2")) * F.sqrt(F.col("qe2"))
    )
    return (
        cand.select("vec_id", F.round(cos, 6).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(10)
    )


SIM_TOPK_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
), q AS (SELECT e AS qe FROM v WHERE vec_id = 0)
SELECT vec_id,
       round(list_aggregate(list_transform(range(len(e)), i -> e[i+1] * qe[i+1]), 'sum')
             / (sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum'))
                * sqrt(list_aggregate(list_transform(qe, x -> x * x), 'sum'))), 6) AS cos
FROM v, q WHERE vec_id != 0
ORDER BY cos DESC, vec_id LIMIT 10
"""


def sim_knn_per_query(spark, sf_dir):
    """k-NN for a 5-vector query set: broadcast queries × corpus scan,
    per-query top-5 via window — the standard batched-ANN baseline plan.

    BASELINE ONLY: O(queries x corpus), so the query side is guarded
    (functions.simindex.guard_bruteforce_query_side, 128-row cap). A
    large query set belongs on the IVF path — sim_ivf_topk /
    functions.simindex.ivf_search."""
    from ..functions.simindex import guard_bruteforce_query_side

    emb = _emb(spark, sf_dir)
    qside = emb.filter(F.col("vec_id") < 5)
    guard_bruteforce_query_side(qside)
    q = F.broadcast(
        qside.select(
            F.col("vec_id").alias("q_id"),
            F.col("e").alias("qe"),
            _dot(F.col("e"), F.col("e")).alias("qe2"),
        )
    )
    # per-side squared norms (see sim_topk_bruteforce): bit-identical
    cand = emb.filter(F.col("vec_id") >= 5).withColumn(
        "e2", _dot(F.col("e"), F.col("e"))
    ).crossJoin(q)
    cos = _dot(F.col("e"), F.col("qe")) / (
        F.sqrt(F.col("e2")) * F.sqrt(F.col("qe2"))
    )
    scored = cand.select("q_id", "vec_id", F.round(cos, 6).alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("q_id", "vec_id", "cos", F.col("rk").cast("bigint").alias("rk"))
    )


SIM_KNN_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
), q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 5),
scored AS (
  SELECT q_id, vec_id,
         round(list_aggregate(list_transform(range(len(e)), i -> e[i+1] * qe[i+1]), 'sum')
               / (sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum'))
                  * sqrt(list_aggregate(list_transform(qe, x -> x * x), 'sum'))), 6) AS cos
  FROM v, q WHERE vec_id >= 5
)
SELECT q_id, vec_id, cos, CAST(rk AS BIGINT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk
  FROM scored
) WHERE rk <= 5
"""


def bucket_expr(e: F.Column) -> F.Column:
    """8-bit random-hyperplane bucket id as a pure per-row expression —
    shared by sim_lsh_buckets and the LSH-gated near-dup join."""
    from ..functions.vectors import plane_sign_bucket

    # strict comparator (> 0): this query family's oracle twin counts a
    # zero dot as NEGATIVE, unlike hyperplane_bits' >= 0 contract
    return plane_sign_bucket(e, _planes(), strict=True)


def bucket_sql_expr() -> str:
    """DuckDB twin of :func:`bucket_expr` (same md5-derived plane literals)."""
    planes = _planes()
    bits = []
    for j, row in enumerate(planes):
        lit = "[" + ", ".join(str(w) for w in row) + "]"
        bits.append(
            f"CASE WHEN list_aggregate(list_transform(range({DIM}), i -> e[i+1] * ({lit})[i+1]), 'sum') > 0 THEN {2 ** j} ELSE 0 END"
        )
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def sim_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH: 8 sign bits → bucket id per vector; report
    bucket occupancy. Candidate generation at scale = groupBy(bucket)."""
    emb = _emb(spark, sf_dir)
    vb = emb.select("vec_id", bucket_expr(F.col("e")).alias("bucket"))
    return vb.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("vec_id").alias("min_vec"),
        F.max("vec_id").alias("max_vec"),
    )


def _lsh_sql() -> str:
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
), vb AS (
  SELECT vec_id, {bucket_sql_expr()} AS bucket FROM v
)
SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec, max(vec_id) AS max_vec
FROM vb GROUP BY bucket
"""


def sim_label_centroids(spark, sf_dir):
    """Per-label centroid norms — vector aggregate over the corpus
    (posexplode → per-(label,dim) mean → reassemble)."""
    emb = _emb(spark, sf_dir)
    ex = emb.select("label", F.posexplode("e").alias("d", "x"))
    cent = ex.groupBy("label", "d").agg(
        F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n")
    )
    return (
        cent.select("label", "d", (F.round(F.col("sx"), 6) / F.col("n")).alias("c"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_dims"),
            F.round(F.sum(F.col("c") * F.col("c")), 6).alias("norm2"),
        )
    )


SIM_CENTROID_SQL = """
WITH v AS (
  SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
), ex AS (
  SELECT label, i - 1 AS d, e[i] AS x
  FROM v CROSS JOIN range(1, 65) AS t(i)
), cent AS (
  SELECT label, d, round(sum(x), 6) / count(*) AS c
  FROM ex GROUP BY label, d
)
SELECT label, count(*) AS n_dims, round(sum(c * c), 6) AS norm2
FROM cent GROUP BY label
"""


N_CELLS = 8


def _centroids() -> list[list[float]]:
    """Deterministic ±1 coarse-quantizer centroids (md5 sign, salt 'c') —
    a reproducible stand-in for a trained k-means codebook, embedded as
    literals in both engines like the LSH planes."""
    out = []
    for j in range(N_CELLS):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"c{j}_{d}".encode()).hexdigest()
            row.append(1.0 if h[0] in "89abcdef" else -1.0)
        out.append(row)
    return out


def _cell_dots_expr(e: F.Column) -> F.Column:
    # single source of truth for the IVF geometry: sim_ivf_topk,
    # sim_incremental, ivf_index_add and ivf_search must compute
    # bit-identical dot sums/tie-breaks or chunked == batch breaks
    from ..functions.simindex import _cell_dots

    return _cell_dots(e, _centroids())


def sim_ivf_topk(spark, sf_dir):
    """IVF-style ANN: every vector is assigned to its nearest coarse cell
    (argmax dot against N_CELLS fixed centroids — pure per-row expression,
    NO shuffle for assignment); the query probes its best 2 cells and the
    expensive cosine runs ONLY inside those cells (~nprobe/K of the
    corpus); final top-10 is TakeOrdered (per-partition partial top-k, no
    global sort). This is the classic inverted-file scale path next to
    sim_lsh_buckets' hyperplane one."""
    emb = _emb(spark, sf_dir)
    dots = _cell_dots_expr(F.col("e"))
    assigned = emb.select(
        "vec_id",
        "e",
        F.array_position(dots, F.array_max(dots)).cast("int").alias("cell"),
        dots.alias("ds"),
    )
    q = assigned.filter(F.col("vec_id") == 0)
    c1 = F.col("cell")
    masked = F.transform(
        F.col("ds"), lambda x, i: F.when(i + 1 == c1, F.lit(-1e18)).otherwise(x)
    )
    qrow = F.broadcast(
        q.select(
            F.col("e").alias("qe"),
            c1.alias("c1"),
            F.array_position(masked, F.array_max(masked)).cast("int").alias("c2"),
            _dot(F.col("e"), F.col("e")).alias("qe2"),
        )
    )
    # per-side squared norms (see sim_topk_bruteforce): bit-identical
    cand = (
        assigned.drop("ds")
        .filter(F.col("vec_id") != 0)
        .withColumn("e2", _dot(F.col("e"), F.col("e")))
        .crossJoin(qrow)
        .filter((F.col("cell") == F.col("c1")) | (F.col("cell") == F.col("c2")))
    )
    cos = _dot(F.col("e"), F.col("qe")) / (
        F.sqrt(F.col("e2")) * F.sqrt(F.col("qe2"))
    )
    return (
        cand.select("vec_id", "cell", F.round(cos, 6).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(10)
    )


def _ivf_sql(extra_pred: str = "") -> str:
    """The DuckDB batch-IVF twin. ``extra_pred`` ANDs a hybrid filter
    into the candidate set (e.g. ``"AND a.label IN (1, 4, 7)"``) —
    the filtered-search oracle (round 12) shares every other line, so
    any divergence is the filter itself."""
    dots = []
    for row in _centroids():
        lit = "[" + ", ".join(str(w) for w in row) + "]"
        dots.append(
            f"list_aggregate(list_transform(range({DIM}), i -> e[i+1] * ({lit})[i+1]), 'sum')"
        )
    ds = "[" + ", ".join(dots) + "]"
    masked = (
        f"list_transform(range({N_CELLS}), i -> CASE WHEN i + 1 = c1 THEN -1e18 ELSE qds[i+1] END)"
    )
    dot = "list_aggregate(list_transform(range({d}), i -> {a}[i+1] * {b}[i+1]), 'sum')"
    ee = dot.format(d=DIM, a="e", b="e")
    eq = dot.format(d=DIM, a="e", b="qe")
    qq = dot.format(d=DIM, a="qe", b="qe")
    return f"""
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
), dd AS (
  SELECT vec_id, label, e, {ds} AS ds FROM v
), assigned AS (
  SELECT vec_id, label, e, CAST(list_position(ds, list_max(ds)) AS INT) AS cell, ds FROM dd
), q AS (
  SELECT e AS qe, cell AS c1, ds AS qds FROM assigned WHERE vec_id = 0
), q2 AS (
  SELECT qe, c1,
         CAST(list_position({masked}, list_max({masked})) AS INT) AS c2
  FROM q
), cand AS (
  SELECT a.vec_id, a.cell, a.e, q2.qe
  FROM assigned a CROSS JOIN q2
  WHERE a.vec_id <> 0 AND (a.cell = q2.c1 OR a.cell = q2.c2) {extra_pred}
)
SELECT vec_id, cell, round({eq} / (sqrt({ee}) * sqrt({qq})), 6) AS cos
FROM cand
ORDER BY cos DESC, vec_id
LIMIT 10
"""




# ---- int8 scalar quantization ----

def sim_quantize_int8(spark, sf_dir):
    """Symmetric int8 scalar quantization of the embedding column — the
    standard memory-compression step before ANN at scale (4x smaller
    vectors, SIMD-friendly int dot products). Per vector: scale =
    max(|x|)/127, q_i = round(x_i/scale). Emits the quantized checksum
    (integer-exact across engines) and the reconstruction MSE.

    Scale shape: pure row-local expressions — zero shuffle, linear scan;
    the quantized output would be written back as array<tinyint> plus one
    float scale per vector."""
    emb = _emb(spark, sf_dir)
    amax = F.aggregate(
        F.col("e"), F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))
    )
    e2 = emb.select("vec_id", "e", (amax / F.lit(127.0)).alias("scale"))
    q = F.transform(F.col("e"), lambda x: F.round(x / F.col("scale")).cast("int"))
    e3 = e2.select("vec_id", "e", "scale", q.alias("q"))
    mse = (
        F.aggregate(
            F.zip_with(
                F.col("e"),
                F.col("q"),
                lambda a, b: F.pow(a - b.cast("double") * F.col("scale"), F.lit(2.0)),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / F.size(F.col("e"))
    )
    return e3.select(
        "vec_id",
        F.round(F.col("scale") * 1e6).cast("bigint").alias("scale_e6"),
        F.aggregate(F.col("q"), F.lit(0).cast("bigint"), lambda a, x: a + x).alias("q_sum"),
        F.aggregate(
            F.col("q"), F.lit(0).cast("bigint"), lambda a, x: a + F.abs(x)
        ).alias("q_l1"),
        F.round(mse * 1e9).cast("bigint").alias("mse_e9"),
    )


SIM_QUANT_SQL = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) / 127.0 AS scale
  FROM embeddings
), qd AS (
  SELECT vec_id, e, scale,
         list_transform(e, x -> CAST(round(x / scale) AS INT)) AS q
  FROM base
)
SELECT vec_id,
       CAST(round(scale * 1e6) AS BIGINT) AS scale_e6,
       CAST(list_aggregate(q, 'sum') AS BIGINT) AS q_sum,
       CAST(list_aggregate(list_transform(q, x -> abs(x)), 'sum') AS BIGINT) AS q_l1,
       CAST(round(list_aggregate(list_transform(range(1, len(e) + 1), i -> pow(e[i] - q[i] * scale, 2)), 'sum') / len(e) * 1e9) AS BIGINT) AS mse_e9
FROM qd
"""


def sim_incremental(spark, sf_dir):
    """Incremental IVF index (functions/simindex.py) under an oracle:
    the embeddings land in a persistent cell-partitioned snapshot index
    over THREE ingest chunks (each append O(delta) — assignment is a
    per-row argmax-dot expression, the existing index is never read),
    then vec 0's top-10 is answered by probing its best 2 cells — the
    scan partition-prunes to those cells' files alone. The result must
    equal DuckDB's single-pass batch IVF over the raw table: fixed
    centroids make a vector's cell independent of ingest order, so
    chunked == batch exactly (the ANN twin of dedup_incremental)."""
    return _ivf_lifecycle(spark, sf_dir, "simidx")


def _ivf_lifecycle(spark, sf_dir, tag, quantized=False, rescore_k=None,
                   pq=False):
    """Shared chunked-ingest IVF lifecycle for sim_incremental /
    sim_quantized / sim_pq: three O(delta) appends under fixed
    centroids, then vec 0's top-10 via a 2-cell probe. Exactness vs the
    batch IVF twin holds for EVERY tier (fixed centroids make chunked
    == batch; at full rescore the quantized/ADC ranking is re-scored
    exactly). ``pq=True`` trains an 8x16 product-quantization codebook
    (deterministic: ordered sample, norm-rank init, fixed Lloyd steps)
    and ingests through the IVF-PQ tier; ``pq="residual"`` trains the
    same shape on RESIDUALS ``x - centroid(cell)`` (true IVFADC,
    round 10) and ingests through the format-2 spec."""
    import os as _os
    import shutil
    import tempfile

    from ..functions.simindex import ivf_index_add, ivf_search

    sf_tag = _os.path.basename(sf_dir.rstrip("/"))
    path = f"{tempfile.gettempdir()}/dakspark_{tag}_{sf_tag}_{_os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    emb = _emb(spark, sf_dir)
    hi = emb.agg(F.max("vec_id")).first()[0]
    cents = _centroids()
    cb = None
    if pq:
        from ..functions.pq import pq_train

        cb = pq_train(emb, m=8, ksub=16, order_col="vec_id",
                      sample_rows=2048, iters=6,
                      residual_centroids=cents if pq == "residual" else None)
    try:
        cuts = (-1, hi // 3, 2 * hi // 3, hi)
        for lo, up in zip(cuts, cuts[1:]):
            chunk = emb.filter((F.col("vec_id") > lo) & (F.col("vec_id") <= up))
            ivf_index_add(path, chunk, cents, e_col="e", quantized=quantized,
                          pq_codebook=cb)
        out = ivf_search(
            spark, path, emb.filter(F.col("vec_id") == 0), cents,
            k=10, nprobe=2, rescore_k=rescore_k,
        ).select("vec_id", "cell", "cos")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def sim_quantized(spark, sf_dir):
    """Int8-quantized IVF index (round-8 tier) under an oracle: the same
    three-chunk ingest as sim_incremental but with quantized=True (each
    row stores q array<tinyint> + scale beside e), searched through the
    two-tier path — int8 ranking scan (column-pruned to q), then exact
    re-scoring. rescore_k is set high enough to cover every probed
    candidate, so the result is EXACT by construction and must equal
    DuckDB's single-pass batch IVF over the raw table (the same twin as
    sim_incremental — quantization must be invisible in the answer;
    the speed/recall trade at small rescore_k is pytest territory)."""
    return _ivf_lifecycle(spark, sf_dir, "simq", quantized=True,
                          rescore_k=1_000_000)


def sim_pq(spark, sf_dir):
    """IVF-PQ tier (round-9 continuation) under an oracle: the same
    three-chunk ingest as sim_incremental but through product
    quantization — each row stores 8 one-byte codes + one float norm
    beside e (64 doubles), and the ranking scan reads ONLY those two
    columns, scoring candidates by ADC table lookups (pure expressions;
    the codebook trains deterministically driver-side and persists
    beside the index). rescore_k covers every probed candidate, so the
    exact re-scoring tier makes the answer EQUAL DuckDB's single-pass
    batch IVF twin — the 64x-compressed ranking must be invisible in
    the result; the speed/recall trade at small rescore_k is pytest
    territory (tests/test_pq.py)."""
    return _ivf_lifecycle(spark, sf_dir, "simpq", pq=True,
                          rescore_k=1_000_000)


def sim_pq_residual(spark, sf_dir):
    """Residual-encoded IVF-PQ — true IVFADC (round 10, VERDICT r9
    item 1) — under an oracle: the same three-chunk ingest as sim_pq
    but the codebook trains on RESIDUALS ``x - centroid(cell)`` and
    each row's codes quantize its residual against the cell it is
    stored in (the format-2 spec carries the IVF centroids — codes are
    not decodable without the quantizer they were taken against). The
    ADC ranking adds the per-(query, cell) coarse term
    ``<q, centroid(cell)>`` on the tiny probe frame — the hot scan is
    still pure LUT lookups over (pqc, norm). rescore_k covers every
    probed candidate, so the answer must EQUAL the same DuckDB batch
    IVF twin: residual encoding is a recall-per-byte upgrade (measured
    0.364 -> 0.420 recall@10 at probe-all, tools/pq_recall_compare.py)
    that is invisible at full rescore."""
    return _ivf_lifecycle(spark, sf_dir, "simpqr", pq="residual",
                          rescore_k=1_000_000)


N_REPS_BATCH = 21  # 500 base vectors x 21 perturbed reps = 10,500 queries
CORPUS_CAP = 200   # indexed corpus: vec_id < 200 (constant across SF)
QUERY_CAP = 500    # query base:    vec_id < 500 (constant across SF)


def sim_batch_search(spark, sf_dir):
    """Distributed two-tier IVF batch search (VERDICT r9 item 1): a
    10,500-row query side — 20x past the collected-path gate — probes a
    QUANTIZED IVF index entirely as DataFrame plans. Probe cells are a
    COLUMN on the query frame, candidates come from one hash equi-join
    on cell, the quantized survivors stay a DataFrame, and the exact
    tier re-scores them by JOINING the survivor frame back to the
    cell-pruned index — the only driver-side materialization anywhere
    is the distinct probed-cell union (<= n_cells rows). rescore_k
    covers every probed candidate, so the answer must equal DuckDB's
    single-pass batch IVF twin exactly (quantization + distribution
    both invisible in the result). Queries are the first 500 embeddings
    x 21 deterministic element-wise perturbations (+0.001*rep), so the
    batch is genuinely heterogeneous — caps keep the work constant
    across scale factors (the query side is the scaled thing here)."""
    import os as _os
    import shutil
    import tempfile

    from ..functions.simindex import IVF_COLLECT_MAX_QUERY_ROWS, ivf_index_add, ivf_search

    assert QUERY_CAP * N_REPS_BATCH > IVF_COLLECT_MAX_QUERY_ROWS  # batch path
    sf_tag = _os.path.basename(sf_dir.rstrip("/"))
    path = f"{tempfile.gettempdir()}/dakspark_simbatch_{sf_tag}_{_os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    emb = _emb(spark, sf_dir)
    cents = _centroids()
    try:
        ivf_index_add(
            path, emb.filter(F.col("vec_id") < CORPUS_CAP), cents,
            e_col="e", quantized=True,
        )
        qs = emb.filter(F.col("vec_id") < QUERY_CAP).select(
            "vec_id", "e",
            F.explode(F.sequence(F.lit(1), F.lit(N_REPS_BATCH))).alias("rep"),
        ).select(
            # disjoint from corpus ids, so exclude_self never fires and
            # the twin needs no exclusion clause
            (F.lit(1_000_000) + F.col("vec_id") * 100 + F.col("rep")).alias("vec_id"),
            F.transform("e", lambda x: x + F.col("rep") * F.lit(0.001)).alias("e"),
        )
        out = ivf_search(
            spark, path, qs, cents, k=3, nprobe=2, rescore_k=1_000_000,
        ).select("q_id", "vec_id", "cell", "cos")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def _batch_search_sql() -> str:
    """Batch IVF twin: per-query top-2 cells by centroid dot (first-max
    tiebreak = lowest cell, matching _probe_cells_expr's (-dot, cell)
    struct sort), exact cosine inside probed cells, top-3 per query."""
    dots_e, dots_q = [], []
    for row in _centroids():
        lit = "[" + ", ".join(str(w) for w in row) + "]"
        dots_e.append(f"list_dot_product(e, {lit})")
        dots_q.append(f"list_dot_product(qe, {lit})")
    ds_e = "[" + ", ".join(dots_e) + "]"
    ds_q = "[" + ", ".join(dots_q) + "]"
    masked = (
        f"list_transform(range({N_CELLS}), i -> CASE WHEN i + 1 = c1 THEN -1e18 ELSE ds[i+1] END)"
    )
    # native list_dot_product instead of the interpreted range/lambda
    # form the other sim twins use: at 500k candidate pairs the lambda
    # machinery dominates the twin's runtime (~60s vs ~2s). Exactness
    # is preserved — DuckDB's implementation is a strict LEFT FOLD like
    # Spark's F.aggregate(F.zip_with(...)): probed with
    # [1e16, 1, -1e16, 1]-style order-sensitive vectors at several
    # offsets (SIMD-lane or pairwise summation would return a different
    # double) and swept against the lambda form over 10k real pairs —
    # max abs diff exactly 0.0.
    ee = "list_dot_product(e, e)"
    eq = "list_dot_product(e, qe)"
    qq = "list_dot_product(qe, qe)"
    # norms precompute PER ROW (sqrt(dot(x,x)) is pair-independent, so
    # hoisting it out of the 500k-pair join changes no double value —
    # same sequential fold over the same elements)
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
), corpus AS (
  SELECT vec_id, e, CAST(list_position(ds, list_max(ds)) AS INT) AS cell,
         sqrt({ee}) AS en
  FROM (SELECT vec_id, e, {ds_e} AS ds FROM v WHERE vec_id < {CORPUS_CAP})
), q0 AS (
  SELECT 1000000 + v.vec_id * 100 + r AS q_id,
         list_transform(e, x -> x + r * 0.001) AS qe
  FROM v, unnest(range(1, {N_REPS_BATCH} + 1)) AS t(r)
  WHERE v.vec_id < {QUERY_CAP}
), qd AS (
  SELECT q_id, qe, sqrt({qq}) AS qn, {ds_q} AS ds FROM q0
), q2 AS (
  SELECT q_id, qe, qn, c1,
         CAST(list_position({masked}, list_max({masked})) AS INT) AS c2
  FROM (SELECT q_id, qe, qn, ds, CAST(list_position(ds, list_max(ds)) AS INT) AS c1 FROM qd)
), qcells AS (
  SELECT q_id, qe, qn, c1 AS cell FROM q2
  UNION ALL
  SELECT q_id, qe, qn, c2 AS cell FROM q2
), scored AS (
  SELECT q.q_id, c.vec_id, c.cell,
         round({eq} / (c.en * q.qn), 6) AS cos
  FROM qcells q JOIN corpus c USING (cell)
)
SELECT q_id, vec_id, cell, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk
  FROM scored
) WHERE rk <= 3
"""


QUERIES = {
    "sim_topk_bruteforce": sim_topk_bruteforce,
    "sim_quantized": sim_quantized,
    "sim_incremental": sim_incremental,
    "sim_knn_per_query": sim_knn_per_query,
    "sim_lsh_buckets": sim_lsh_buckets,
    "sim_ivf_topk": sim_ivf_topk,
    "sim_label_centroids": sim_label_centroids,
    "sim_quantize_int8": sim_quantize_int8,
    "sim_batch_search": sim_batch_search,
    "sim_pq": sim_pq,
    "sim_pq_residual": sim_pq_residual,
}

ORACLES = {
    "sim_topk_bruteforce": SIM_TOPK_SQL,
    "sim_knn_per_query": SIM_KNN_SQL,
    "sim_lsh_buckets": _lsh_sql(),
    "sim_ivf_topk": _ivf_sql(),
    # chunked == batch: the incremental index must reproduce the
    # single-pass batch IVF answer bit-for-bit
    "sim_incremental": _ivf_sql(),
    # quantized-then-rescored == flat == batch (exact by construction
    # at full rescore): same twin again
    "sim_quantized": _ivf_sql(),
    "sim_label_centroids": SIM_CENTROID_SQL,
    "sim_quantize_int8": SIM_QUANT_SQL,
    # distributed two-tier batch path == single-pass batch IVF (exact
    # at full rescore; quantization and distribution both invisible)
    "sim_batch_search": _batch_search_sql(),
    # PQ-ADC-then-rescored == flat == batch (exact by construction at
    # full rescore — the 64x-compressed ranking is invisible): same twin
    "sim_pq": _ivf_sql(),
    # residual encoding changes the RANKING tier only — at full rescore
    # it too must reproduce the batch IVF twin bit-for-bit
    "sim_pq_residual": _ivf_sql(),
}


# ---- k-means (fixed-iteration Lloyd, driver-held centroids) ----

def sim_kmeans(spark, sf_dir, k: int = 4, iters: int = 2):
    """Two Lloyd iterations with deterministic init (vectors 0..k-1):
    assign -> recompute -> assign -> per-cluster sizes + inertia.

    Scale shape — the canonical Spark k-means: centroids are DRIVER state
    (k x dim doubles, always tiny) embedded as literals, so assignment is
    a pure per-row expression with NO join or shuffle; the recompute is
    one posexplode + hash-agg per iteration. Centroids round to 6dp after
    each recompute so the oracle sees bit-identical inputs; assignment
    ties break to the lowest cluster id (array_position = first min)."""
    emb = _emb(spark, sf_dir)

    from ..functions.vectors import matrix_lit

    def assign_expr(cents):
        # centroid table as ONE 2-D literal (see vectors.matrix_lit):
        # same per-centroid squared-distance fold, bit-identical result
        dists = F.transform(
            matrix_lit(cents),
            lambda c: F.aggregate(
                F.zip_with(F.col("e"), c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, z: a + z,
            ),
        )
        return dists, F.array_position(dists, F.array_min(dists)).cast("int")

    cents = [
        r["e"]
        for r in emb.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    ]
    for _ in range(iters - 1):
        _, cid = assign_expr(cents)
        rows = (
            emb.select(cid.alias("c"), F.posexplode("e").alias("d", "x"))
            .groupBy("c", "d")
            .agg(F.round(F.avg("x"), 6).alias("v"))
            .collect()
        )
        new = {}
        for r in rows:
            new.setdefault(r["c"], {})[r["d"]] = r["v"]
        cents = [
            [new[c][d] for d in sorted(new[c])] if c in new else cents[c - 1]
            for c in range(1, k + 1)
        ]
    dists, cid = assign_expr(cents)
    return (
        emb.select(
            cid.alias("cluster"),
            F.round(F.array_min(dists) * 1e6).cast("bigint").alias("d6"),
        )
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("d6").alias("inertia_e6"))
    )


def _kmeans_sql(k: int = 4) -> str:
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), cent0 AS (
  SELECT vec_id + 1 AS cid, e AS c FROM v WHERE vec_id < {k}
), d1 AS (
  SELECT v.vec_id, v.e, cent0.cid,
         list_aggregate(list_transform(range(1, len(v.e) + 1),
                        i -> pow(v.e[i] - cent0.c[i], 2)), 'sum') AS dist
  FROM v CROSS JOIN cent0
), a1 AS (
  SELECT vec_id, e, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d1
  ) WHERE rn = 1
), cent1 AS (
  SELECT cid, list(v ORDER BY d) AS c FROM (
    SELECT cid, d, round(avg(e[CAST(d AS INT)]), 6) AS v
    FROM a1, unnest(range(1, len(e) + 1)) AS t(d)
    GROUP BY cid, d
  ) GROUP BY cid
), d2 AS (
  SELECT v.vec_id, cent1.cid,
         list_aggregate(list_transform(range(1, len(v.e) + 1),
                        i -> pow(v.e[i] - cent1.c[i], 2)), 'sum') AS dist
  FROM v CROSS JOIN cent1
), a2 AS (
  SELECT vec_id, cid, dist FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d2
  ) WHERE rn = 1
)
SELECT CAST(cid AS INT) AS cluster, count(*) AS n,
       CAST(sum(CAST(round(dist * 1e6) AS BIGINT)) AS BIGINT) AS inertia_e6
FROM a2 GROUP BY cid
"""


QUERIES.update({"sim_kmeans": sim_kmeans})
ORACLES.update({"sim_kmeans": _kmeans_sql()})


def sim_stream_ingest(spark, sf_dir):
    """STREAMING index ingest (round 11): the embeddings corpus is
    re-chunked into 4 parquet files and streamed one-file-per-trigger
    through :func:`~dask_awkward_spark.functions.simindex
    .ivf_stream_ingest` — 4 micro-batches, each ONE atomic snapshot
    commit with its batch id recorded (the exactly-once watermark).
    Because cell assignment is a pure per-row expression under a FIXED
    quantizer, the drained index must equal a batch build exactly, so
    a search over it hash-matches the same DuckDB single-pass IVF twin
    as ``sim_ivf_topk`` — streamed == chunked == batch, proven through
    the driver's correctness gate."""
    import os as _os
    import shutil
    import tempfile

    from ..functions.simindex import ivf_search, ivf_stream_ingest

    sf_tag = _os.path.basename(sf_dir.rstrip("/"))
    base = f"{tempfile.gettempdir()}/dakspark_simstream_{sf_tag}_{_os.getpid()}"
    src, idx = f"{base}/src", f"{base}/idx"
    shutil.rmtree(base, ignore_errors=True)
    emb = _emb(spark, sf_dir)
    try:
        # re-chunk so the file stream yields 4 genuine micro-batches
        emb.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        ivf_stream_ingest(stream, idx, _centroids())
        from ..sources.snapshot import _read_manifest, _versions

        vs = _versions(idx)
        assert len(vs) >= 2, "must ingest as MULTIPLE micro-batch commits"
        assert (
            _read_manifest(idx, vs[-1]).get("stream_batch_id") is not None
        ), "batch watermark must be recorded"
        q = emb.filter(F.col("vec_id") == 0).select("vec_id", "e")
        return (
            ivf_search(spark, idx, q, k=10, nprobe=2, exclude_self=True)
            .select("vec_id", "cell", "cos")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES.update({"sim_stream_ingest": sim_stream_ingest})
ORACLES.update({"sim_stream_ingest": _ivf_sql()})
