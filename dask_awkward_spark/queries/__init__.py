"""Query registry: every entry pairs a Spark DataFrame query with a DuckDB
oracle SQL string over the same parquet tables.

Ordering matters: the round driver grades a fixed-size prefix of this
registry (50 queries in round 1), so the first block below packs one
driver-checkable row for every SURVEY §2 operator family and every
LLM-pipeline component — nested getitem/structure/reducer ops first (the
round-1 review's named queries), then IO round trips, strings, dedup,
similarity, multimodal, streaming, and the end-to-end pipeline. The
relational uplift suite (TPC-H analogs, all driver-green in round 1) and
granular single-op variants of the consolidated family queries follow
after the window.

Float-determinism discipline (so value hashes match the oracle bit-for-bit):

- Sums of whole-number-valued doubles (l_quantity) are exact in IEEE double
  (< 2^53) — safe unrounded, any aggregation order.
- Sums of cent-valued doubles (prices) differ in the last ulp between
  engines/partition orders → wrap in ``round(sum(x), 2)`` or aggregate
  exact cents (``round(x*100)`` as bigint).
- Averages/ratios: derive from exact or rounded components so both engines
  do the same IEEE division.
- Top-k: always order by (metric, unique key) so the selected SET is
  deterministic; the driver's hash is row-order-insensitive.
- Array outputs: serialized to canonical strings (queries/_canon.py) —
  the driver's pandas hasher cannot hash list cells.
"""

from __future__ import annotations

from . import (
    coverage,
    dedup,
    events,
    families,
    hist,
    nested,
    pipeline,
    similarity,
    sketches,
    splits,
    text,
    timeseries,
    tpch,
    tpch2,
)

_MODULES = [
    families, nested, coverage, text, dedup, similarity, events, pipeline,
    tpch, tpch2, timeseries, sketches, hist, splits,
]

# The driver-graded window: one row per §2 operator family / pipeline
# component, most-valuable first. Names must exist in some module above.
_WINDOW = [
    # nested getitem / option / elementwise (round-1 review's named fixes)
    "op_inner_slice",
    "op_inner_filter",
    "op_gather",
    "op_local_index",
    "op_sort_inner",
    "op_argsort_inner",
    "op_pad_clip",
    "op_mask_fill_drop",
    "op_singletons_firsts",
    "op_where",
    "op_arith_broadcast",
    # restructuring / combinatorics / new round-2 ops
    "op_unflatten",
    "op_sum_axis0_jagged",
    "op_combinations4",
    "op_zip_cross_df",
    "op_combinations",
    "op_cartesian",
    "op_argcombinations",
    "op_flatten_explode",
    "op_concat_outer",
    "op_run_lengths",
    "op_cast_close_concat",
    "op_sum_positional_axis1",
    "op_axis2_family",
    # IO round trips through the engine's sinks
    "io_parquet_roundtrip",
    "io_json_roundtrip",
    # remaining reducers + field/shape/nan + uplift stats
    "op_prod_var_std",
    "op_field_shape_nan",
    "op_ravel",
    # strings (§2.8) + text analysis
    "str_kernels_a",
    "str_misc_family",
    "str_predicates",
    "str_regex2",
    "text_analysis_family",
    "doc_stats_by_source",
    # dedup family
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_cluster_canonical",
    # similarity / vector ops (LSH + IVF are the two ANN scale paths)
    "sim_knn_per_query",
    "sim_lsh_buckets",
    "sim_ivf_topk",
    # multimodal / streaming / pipeline / engine surfaces
    "mm_binary_meta",
    "stream_tumbling",
    "stream_stateful_user_stats",
    "pipeline_e2e",
    "op_repartition_sample",
    "ev_sessionize",
    # positions 51+: graded only if the driver widens its window
    "sim_label_centroids",
    "op_minmax_axis0_jagged",
    "q_corr_covar",
    # round-4 uplift, strongest first
    "ev_asof_join",
    "ev_rolling_user_stats",
    "ev_hopping_window",
    "ev_interval_pairs",
    "stream_hopping",
    "text_winnowing",
    "text_repetition",
    "quota_sampling",
    # binned aggregations (dask-histogram companion surface)
    "hist_event_values",
    "hist2d_qty_discount",
    "hist_profile_price_by_qty",
    "hist_jagged_flatten",
    "hist_log_edges",
    # dataset management: splits / reproducible shuffle / budget capping
    "split_train_valid_test",
    "shuffle_head",
    "budget_cap_per_source",
    "stream_static_enrich",
]


def _merged() -> tuple[dict, dict]:
    qs: dict = {}
    orc: dict = {}
    for m in _MODULES:
        qs.update(m.QUERIES)
        orc.update(m.ORACLES)
    return qs, orc


def all_queries():
    qs, _ = _merged()
    missing = [n for n in _WINDOW if n not in qs]
    if missing:  # fail loudly at import, not in the driver
        raise KeyError(f"window names missing from registry: {missing}")
    out = {n: qs[n] for n in _WINDOW}
    for n, f in qs.items():
        if n not in out:
            out[n] = f
    return out


def all_oracles():
    qs, orc = _merged()
    out = {n: orc[n] for n in _WINDOW if n in orc}
    for n, s in orc.items():
        if n not in out:
            out[n] = s
    return out
