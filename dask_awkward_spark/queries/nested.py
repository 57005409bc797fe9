"""Nested-operator query suite — SURVEY §2.2-2.7 coverage on real tables.

Each query builds jagged data from ``lineitem`` (per-order lists, ordered by
``l_linenumber`` so both engines see identical list contents), applies one
engine operator from ``dask_awkward_spark``, and returns flat/array-of-
primitive columns the driver can hash against the DuckDB oracle.

Scale note: the nested build is ONE shuffle (hash by l_orderkey); every
operator after it is a row-local Column expression (no further shuffle),
so the whole suite scales linearly with partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import NestedArray
from ..operators import reducers as red
from ..operators import structure as st
from ..sources.tables import load_table
from ._canon import arr_micro, arr_str, sql_arr_micro, sql_arr_str

# Shared CTE for the DuckDB side: per-order quantity/price lists ordered by
# line number.
NESTED_CTE = """
WITH nested AS (
  SELECT l_orderkey,
         list(l_quantity ORDER BY l_linenumber, l_quantity) AS qs,
         list(l_extendedprice ORDER BY l_linenumber, l_extendedprice) AS ps
  FROM lineitem GROUP BY l_orderkey
)
"""


def _nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order jagged lists (the groups-as-arrays round trip of SURVEY
    §2.6: collect_list ↔ explode).

    Each list is its OWN aggregate expression (not fields of one shared
    struct): Catalyst prunes whole unused aggregate expressions, so a
    query touching only ``qs`` reads only (l_orderkey, l_linenumber,
    l_quantity) from the scan — struct fields inside one collect_list
    would defeat that (see tests/test_plans.py). Sort keys are
    (l_linenumber, value): (orderkey, linenumber) is not unique in the
    data, but equal sort keys imply equal values, so each list is still
    deterministic."""
    li = load_table(spark, sf_dir, "lineitem")

    def ordered(col: str) -> F.Column:
        pair = F.array_sort(
            F.collect_list(F.struct(F.col("l_linenumber").alias("ln"), F.col(col).alias("v")))
        )
        return F.transform(pair, lambda s: s["v"])

    return li.groupBy("l_orderkey").agg(
        ordered("l_quantity").alias("qs"),
        ordered("l_extendedprice").alias("ps"),
    )


def _arr(df: DataFrame, col: str) -> NestedArray:
    return NestedArray(df, col)


# ---- num / count / lengths ----

def op_num(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    return df.select("l_orderkey", st.num(qs, axis=1).col.cast("bigint").alias("n_items"))


OP_NUM_SQL = NESTED_CTE + "SELECT l_orderkey, CAST(len(qs) AS BIGINT) AS n_items FROM nested"


# ---- reducers at axis=1 (per-list regime: no shuffle) ----

def op_sum_axis1(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    return df.select("l_orderkey", red.sum(qs, axis=1).col.alias("qty_sum"))


OP_SUM_AXIS1_SQL = NESTED_CTE + (
    "SELECT l_orderkey, CAST(list_aggregate(qs, 'sum') AS DOUBLE) AS qty_sum FROM nested"
)


def op_min_max_axis1(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    return df.select(
        "l_orderkey",
        red.min(qs, axis=1).col.alias("qty_min"),
        red.max(qs, axis=1).col.alias("qty_max"),
        red.ptp(qs, axis=1).col.alias("qty_ptp"),
    )


OP_MIN_MAX_SQL = NESTED_CTE + """
SELECT l_orderkey,
       CAST(list_aggregate(qs, 'min') AS DOUBLE) AS qty_min,
       CAST(list_aggregate(qs, 'max') AS DOUBLE) AS qty_max,
       CAST(list_aggregate(qs, 'max') - list_aggregate(qs, 'min') AS DOUBLE) AS qty_ptp
FROM nested
"""


def op_any_all_count(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    big = qs > 40.0
    return df.select(
        "l_orderkey",
        red.any(big, axis=1).col.alias("any_big"),
        red.all(big, axis=1).col.alias("all_big"),
        red.count(qs, axis=1).col.cast("bigint").alias("n_vals"),
        red.count_nonzero(qs, axis=1).col.cast("bigint").alias("n_nonzero"),
    )


OP_ANY_ALL_SQL = NESTED_CTE + """
SELECT l_orderkey,
       len(list_filter(qs, x -> x > 40.0)) > 0 AS any_big,
       len(list_filter(qs, x -> NOT (x > 40.0))) = 0 AS all_big,
       CAST(len(list_filter(qs, x -> x IS NOT NULL)) AS BIGINT) AS n_vals,
       CAST(len(list_filter(qs, x -> x IS NOT NULL AND x != 0)) AS BIGINT) AS n_nonzero
FROM nested
"""


def op_mean_axis1(spark, sf_dir):
    """mean = exact sum of whole-number doubles / exact count → identical
    IEEE division in both engines."""
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    return df.select("l_orderkey", red.mean(qs, axis=1).col.alias("qty_mean"))


OP_MEAN_SQL = NESTED_CTE + (
    "SELECT l_orderkey, CAST(list_aggregate(qs, 'sum') AS DOUBLE)"
    " / len(list_filter(qs, x -> x IS NOT NULL)) AS qty_mean FROM nested"
)


def op_argminmax_axis1(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    return df.select(
        "l_orderkey",
        red.argmin(qs, axis=1).col.cast("bigint").alias("i_min"),
        red.argmax(qs, axis=1).col.cast("bigint").alias("i_max"),
    )


OP_ARGMINMAX_SQL = NESTED_CTE + """
SELECT l_orderkey,
       CAST(list_position(qs, list_aggregate(qs, 'min')) - 1 AS BIGINT) AS i_min,
       CAST(list_position(qs, list_aggregate(qs, 'max')) - 1 AS BIGINT) AS i_max
FROM nested
"""


# ---- global reductions (axis=None: per-row partial + global combine) ----

def op_sum_none(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    return red.sum(qs, axis=None).to_df().select(F.col("v").alias("total_qty"))


OP_SUM_NONE_SQL = "SELECT CAST(sum(l_quantity) AS DOUBLE) AS total_qty FROM lineitem"


# ---- getitem family ----

def op_firsts(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    return df.select("l_orderkey", st.firsts(qs, axis=1).col.alias("first_qty"))


OP_FIRSTS_SQL = NESTED_CTE + "SELECT l_orderkey, qs[1] AS first_qty FROM nested"


def op_inner_slice(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    sliced = qs[:, :2]  # first two items of every list
    return df.select("l_orderkey", arr_micro(sliced.col).alias("first2"))


OP_INNER_SLICE_SQL = NESTED_CTE + (
    f"SELECT l_orderkey, {sql_arr_micro('qs[1:2]')} AS first2 FROM nested"
)


def op_inner_filter(spark, sf_dir):
    """Boolean mask at depth 1: keep quantities > 25 inside each list."""
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    return df.select("l_orderkey", arr_micro(qs[qs > 25.0].col).alias("big_qtys"))


OP_INNER_FILTER_SQL = NESTED_CTE + (
    f"SELECT l_orderkey, {sql_arr_micro('list_filter(qs, x -> x > 25.0)')} AS big_qtys FROM nested"
)


def op_gather(spark, sf_dir):
    """Integer-array gather per list: reverse each list via indices."""
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    n = st.num(qs, axis=1)
    rev_idx = (n - 1) - st.local_index(qs, axis=1)  # broadcast: depth0 - depth1
    return df.select("l_orderkey", arr_micro(qs[rev_idx].col).alias("rev_qs"))


OP_GATHER_SQL = NESTED_CTE + (
    f"SELECT l_orderkey, {sql_arr_micro('list_reverse(qs)')} AS rev_qs FROM nested"
)


def op_row_filter(spark, sf_dir):
    """Outer boolean mask (row filter) driven by a nested reduction."""
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    keep = red.sum(qs, axis=1) > 100.0
    kept = NestedArray(df, "l_orderkey")[keep]
    return kept.to_df("l_orderkey")


OP_ROW_FILTER_SQL = NESTED_CTE + (
    "SELECT l_orderkey FROM nested WHERE list_aggregate(qs, 'sum') > 100.0"
)


# ---- structure ops ----

def op_local_index(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    return df.select(
        "l_orderkey",
        arr_str(st.local_index(qs, axis=1).col.cast("array<bigint>")).alias("idx"),
    )


OP_LOCAL_INDEX_SQL = NESTED_CTE + (
    f"SELECT l_orderkey, {sql_arr_str('range(len(qs))')} AS idx FROM nested"
)


def op_sort_inner(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    return df.select(
        "l_orderkey",
        arr_micro(st.sort(qs, axis=1).col).alias("qs_asc"),
        arr_micro(st.sort(qs, axis=1, ascending=False).col).alias("qs_desc"),
    )


OP_SORT_SQL = NESTED_CTE + (
    f"SELECT l_orderkey, {sql_arr_micro('list_sort(qs)')} AS qs_asc, "
    f"{sql_arr_micro('list_reverse_sort(qs)')} AS qs_desc FROM nested"
)


def op_argsort_inner(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    return df.select(
        "l_orderkey",
        arr_str(st.argsort(qs, axis=1).col.cast("array<bigint>")).alias("order_idx"),
    )


# stable argsort: sort (value, index) pairs, project index
_ARGSORT_LIST = (
    "list_transform(list_sort(list_transform(range(len(qs)), "
    "i -> struct_pack(v := qs[i+1], i := i))), s -> s.i)"
)
OP_ARGSORT_SQL = NESTED_CTE + (
    f"SELECT l_orderkey, {sql_arr_str(_ARGSORT_LIST)} AS order_idx FROM nested"
)


def op_pad_clip(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    return df.select(
        "l_orderkey", arr_micro(st.pad_none(qs, 5, clip=True).col).alias("padded")
    )


# qs[i] is NULL out of bounds in DuckDB -> exactly pad_none+clip
OP_PAD_CLIP_SQL = NESTED_CTE + (
    f"SELECT l_orderkey, {sql_arr_micro('list_transform(range(1, 6), i -> qs[i])')} AS padded FROM nested"
)


def op_mask_fill_drop(spark, sf_dir):
    """mask → fill_none → drop_none round trip (option-type handling)."""
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    masked = st.mask(qs, qs < 25.0)  # None where q >= 25
    # axis=1 (element-level): axis=None would also drop null ROWS, which
    # re-bases the DataFrame and can't be embedded in this wider select
    return df.select(
        "l_orderkey",
        arr_micro(st.fill_none(masked, -1.0, axis=1).col).alias("filled"),
        arr_micro(st.drop_none(masked, axis=1).col).alias("dropped"),
        red.sum(st.drop_none(masked, axis=1), axis=1).col.alias("kept_sum"),
    )


OP_MASK_SQL = NESTED_CTE + f"""
SELECT l_orderkey,
       {sql_arr_micro("list_transform(qs, x -> CASE WHEN x < 25.0 THEN x ELSE -1.0 END)")} AS filled,
       {sql_arr_micro("list_filter(qs, x -> x < 25.0)")} AS dropped,
       CAST(coalesce(list_aggregate(list_filter(qs, x -> x < 25.0), 'sum'), 0) AS DOUBLE) AS kept_sum
FROM nested
"""


def op_is_none_count(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    masked = st.mask(qs, qs < 25.0)
    nones = st.is_none(masked, axis=1)
    n_none = red.sum(st.values_astype(nones, "bigint"), axis=1)
    return df.select("l_orderkey", n_none.col.cast("bigint").alias("n_masked"))


OP_IS_NONE_SQL = NESTED_CTE + (
    "SELECT l_orderkey, CAST(len(list_filter(qs, x -> NOT (x < 25.0))) AS BIGINT) AS n_masked FROM nested"
)


def op_singletons_firsts(spark, sf_dir):
    """singletons ∘ firsts round trip on an option column."""
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    first = st.firsts(qs, axis=1)  # None for empty lists
    single = st.singletons(first, axis=0)
    return df.select("l_orderkey", arr_micro(single.col).alias("singleton"))


OP_SINGLETONS_SQL = NESTED_CTE + (
    "SELECT l_orderkey, "
    + sql_arr_micro("CASE WHEN qs[1] IS NULL THEN CAST([] AS DOUBLE[]) ELSE [qs[1]] END")
    + " AS singleton FROM nested"
)


def op_where(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    out = st.where(qs > 25.0, qs, -1.0)
    return df.select("l_orderkey", arr_micro(out.col).alias("clipped"))


OP_WHERE_SQL = NESTED_CTE + (
    "SELECT l_orderkey, "
    + sql_arr_micro("list_transform(qs, x -> CASE WHEN x > 25.0 THEN x ELSE -1.0 END)")
    + " AS clipped FROM nested"
)


def op_arith_broadcast(spark, sf_dir):
    """Ufunc arithmetic with depth-0 ↔ depth-1 broadcasting:
    discount-share of each item = p_i / sum(p)."""
    df = _nested(spark, sf_dir)
    ps = _arr(df, "ps")
    share = ps / red.sum(ps, axis=1)  # depth1 / depth0 broadcast
    rounded = st.values_astype(share * 10000.0, "double")
    floor2 = NestedArray(df, F.transform(rounded.col, lambda x: F.floor(x).cast("bigint")))
    return df.select("l_orderkey", arr_str(floor2.col).alias("share_bp"))


OP_ARITH_SQL = NESTED_CTE + (
    "SELECT l_orderkey, "
    + sql_arr_str(
        "list_transform(ps, x -> CAST(floor(x / list_aggregate(ps, 'sum') * 10000.0) AS BIGINT))"
    )
    + " AS share_bp FROM nested"
)


def op_zip_project(spark, sf_dir):
    """zip → field projection round trip (zip/unzip, with_field family)."""
    df = _nested(spark, sf_dir)
    qs, ps = _arr(df, "qs"), _arr(df, "ps")
    z = st.zip({"q": qs, "p": ps})
    value = z["q"] * z["p"]
    return df.select("l_orderkey", red.sum(value, axis=1).col.alias("dot_qp"))


OP_ZIP_SQL = NESTED_CTE + """
SELECT l_orderkey,
       CAST(list_aggregate(list_transform(range(len(qs)), i -> qs[i+1] * ps[i+1]), 'sum') AS DOUBLE) AS dot_qp
FROM nested
"""


def op_combinations(spark, sf_dir):
    """n=2 combinations per list, exploded to flat pairs."""
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    pairs = st.combinations(qs, 2, fields=["q0", "q1"])
    ex = df.select("l_orderkey", F.explode(pairs.col).alias("pr"))
    return ex.select("l_orderkey", F.col("pr.q0").alias("q0"), F.col("pr.q1").alias("q1"))


OP_COMBINATIONS_SQL = NESTED_CTE + """
SELECT l_orderkey, pr.q0 AS q0, pr.q1 AS q1 FROM (
  SELECT l_orderkey,
         unnest(flatten(list_transform(range(len(qs)),
           i -> list_transform(range(i + 1, len(qs)),
             j -> {'q0': qs[i+1], 'q1': qs[j+1]})))) AS pr
  FROM nested
)
"""


def op_cartesian(spark, sf_dir):
    """Per-row cartesian of two lists, exploded flat."""
    df = _nested(spark, sf_dir)
    qs, ps = _arr(df, "qs"), _arr(df, "ps")
    prod = st.cartesian([qs, ps])
    ex = df.select("l_orderkey", F.explode(prod.col).alias("pr"))
    return ex.select("l_orderkey", F.col("pr.0").alias("q"), F.col("pr.1").alias("p"))


OP_CARTESIAN_SQL = """
SELECT a.l_orderkey AS l_orderkey, a.l_quantity AS q, b.l_extendedprice AS p
FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
"""
# full per-order product is order-insensitive as a multiset -> plain self-join


def op_argcombinations(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    pairs = st.argcombinations(qs, 2, fields=["i0", "i1"])
    ex = df.select("l_orderkey", F.explode(pairs.col).alias("pr"))
    return ex.select(
        "l_orderkey",
        F.col("pr.i0").cast("bigint").alias("i0"),
        F.col("pr.i1").cast("bigint").alias("i1"),
    )


OP_ARGCOMBINATIONS_SQL = NESTED_CTE + """
SELECT l_orderkey, pr.i0 AS i0, pr.i1 AS i1 FROM (
  SELECT l_orderkey,
         unnest(flatten(list_transform(range(len(qs)),
           i -> list_transform(range(i + 1, len(qs)),
             j -> {'i0': CAST(i AS BIGINT), 'i1': CAST(j AS BIGINT)})))) AS pr
  FROM nested
)
"""


def op_flatten_explode(spark, sf_dir):
    """flatten at axis=1 == explode back to the flat table."""
    df = _nested(spark, sf_dir)
    return df.select("l_orderkey", F.explode("qs").alias("q"))


OP_FLATTEN_SQL = "SELECT l_orderkey, l_quantity AS q FROM lineitem"


def op_concat_inner(spark, sf_dir):
    """axis=1 concatenate: per-row list concatenation."""
    df = _nested(spark, sf_dir)
    qs, ps = _arr(df, "qs"), _arr(df, "ps")
    both = st.concatenate([qs, ps], axis=1)
    return df.select("l_orderkey", arr_micro(both.col).alias("q_then_p"))


OP_CONCAT_INNER_SQL = NESTED_CTE + (
    f"SELECT l_orderkey, {sql_arr_micro('list_concat(qs, ps)')} AS q_then_p FROM nested"
)


def op_concat_outer(spark, sf_dir):
    """axis=0 concatenate: ordered union-all of two row sets. The key rides
    inside the value struct so the op itself carries everything."""
    df = _nested(spark, sf_dir)
    rec = F.struct(F.col("l_orderkey").alias("k"), F.col("qs").alias("qs"))
    lo = NestedArray(df.filter(F.col("l_orderkey") % 2 == 0), rec)
    hi = NestedArray(df.filter(F.col("l_orderkey") % 2 == 1), rec)
    cat = st.concatenate([lo, hi], axis=0)
    return cat.to_df().select(
        F.col("v.k").alias("l_orderkey"), arr_micro(F.col("v.qs")).alias("qs")
    )


OP_CONCAT_OUTER_SQL = NESTED_CTE + (
    f"SELECT l_orderkey, {sql_arr_micro('qs')} AS qs FROM nested"
)


def op_run_lengths(spark, sf_dir):
    """Run lengths of the quantity sequence per order (gaps-and-islands)."""
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    rl = st.run_lengths(qs, axis=1)
    ex = df.select("l_orderkey", F.explode(rl.col).alias("run_len"))
    return ex.select("l_orderkey", F.col("run_len").cast("bigint").alias("run_len"))


OP_RUN_LENGTHS_SQL = """
SELECT l_orderkey, CAST(count(*) AS BIGINT) AS run_len
FROM (
  SELECT l_orderkey, l_linenumber,
         sum(CASE WHEN prev IS NOT NULL AND prev = l_quantity THEN 0 ELSE 1 END)
           OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity, l_extendedprice) AS gid
  FROM (
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           lag(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity, l_extendedprice) AS prev
    FROM lineitem
  )
)
GROUP BY l_orderkey, gid
"""


def op_astype(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs = _arr(df, "qs")
    return df.select(
        "l_orderkey", arr_str(st.values_astype(qs, "bigint").col).alias("qs_int")
    )


OP_ASTYPE_SQL = NESTED_CTE + (
    "SELECT l_orderkey, "
    + sql_arr_str("list_transform(qs, x -> CAST(x AS BIGINT))")
    + " AS qs_int FROM nested"
)


def op_isclose_nan(spark, sf_dir):
    df = _nested(spark, sf_dir)
    qs, ps = _arr(df, "qs"), _arr(df, "ps")
    unit = ps / qs
    close = st.isclose(unit * qs, ps, rtol=1e-9)
    n_close = red.sum(st.values_astype(close, "bigint"), axis=1)
    return df.select("l_orderkey", n_close.col.cast("bigint").alias("n_close"))


OP_ISCLOSE_SQL = NESTED_CTE + """
SELECT l_orderkey,
       CAST(len(list_filter(range(len(qs)),
            i -> abs((ps[i+1] / qs[i+1]) * qs[i+1] - ps[i+1]) <= 1e-8 + 1e-9 * abs(ps[i+1])))
            AS BIGINT) AS n_close
FROM nested
"""


# ---- depth-2 (two list levels) ----

def _nested2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer list of per-order quantity lists (depth 2), fully
    deterministic ordering at both levels."""
    orders = load_table(spark, sf_dir, "orders")
    inner = _nested(spark, sf_dir).join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    pair = F.array_sort(
        F.collect_list(F.struct(F.col("o_orderkey").alias("ok"), F.col("qs").alias("qs")))
    )
    return inner.groupBy("o_custkey").agg(
        F.transform(pair, lambda s: s["qs"]).alias("qss")
    )


NESTED2_CTE = """
WITH nested AS (
  SELECT l_orderkey,
         list(l_quantity ORDER BY l_linenumber, l_quantity) AS qs
  FROM lineitem GROUP BY l_orderkey
), nested2 AS (
  SELECT o_custkey, list(qs ORDER BY o_orderkey) AS qss
  FROM nested JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey
)
"""


def op_num_axis2(spark, sf_dir):
    df = _nested2(spark, sf_dir)
    a = _arr(df, "qss")
    return df.select(
        "o_custkey",
        arr_str(st.num(a, axis=2).col.cast("array<bigint>")).alias("inner_sizes"),
    )


OP_NUM_AXIS2_SQL = NESTED2_CTE + (
    "SELECT o_custkey, "
    + sql_arr_str("list_transform(qss, x -> CAST(len(x) AS BIGINT))")
    + " AS inner_sizes FROM nested2"
)


def op_flatten_axis2(spark, sf_dir):
    df = _nested2(spark, sf_dir)
    a = _arr(df, "qss")
    return df.select("o_custkey", arr_micro(st.flatten(a, axis=2).col).alias("all_qs"))


OP_FLATTEN_AXIS2_SQL = NESTED2_CTE + (
    f"SELECT o_custkey, {sql_arr_micro('flatten(qss)')} AS all_qs FROM nested2"
)


def op_sum_axis2(spark, sf_dir):
    df = _nested2(spark, sf_dir)
    a = _arr(df, "qss")
    return df.select(
        "o_custkey", arr_micro(red.sum(a, axis=2).col).alias("per_order_sums")
    )


OP_SUM_AXIS2_SQL = NESTED2_CTE + (
    "SELECT o_custkey, "
    + sql_arr_micro("list_transform(qss, x -> CAST(list_aggregate(x, 'sum') AS DOUBLE))")
    + " AS per_order_sums FROM nested2"
)


def op_unflatten(spark, sf_dir):
    """unflatten: regroup the flat quantity stream into per-order lists
    using counts — exact inverse of explode (reference lib/structure.py:898)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 600)
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )
    flat = NestedArray(li, "l_quantity")
    counts_df = (
        li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("c")).orderBy("l_orderkey")
    )
    counts = NestedArray(counts_df, "c")
    regrouped = st.unflatten(flat, counts)
    return regrouped.to_df("qs").select(arr_micro(F.col("qs")).alias("qs"))


OP_UNFLATTEN_SQL = (
    "SELECT "
    + sql_arr_micro("list(l_quantity ORDER BY l_linenumber, l_quantity, l_extendedprice)")
    + " AS qs FROM lineitem WHERE l_orderkey < 600 GROUP BY l_orderkey"
)


QUERIES = {
    "op_num": op_num,
    "op_sum_axis1": op_sum_axis1,
    "op_min_max_axis1": op_min_max_axis1,
    "op_any_all_count": op_any_all_count,
    "op_mean_axis1": op_mean_axis1,
    "op_argminmax_axis1": op_argminmax_axis1,
    "op_sum_none": op_sum_none,
    "op_firsts": op_firsts,
    "op_inner_slice": op_inner_slice,
    "op_inner_filter": op_inner_filter,
    "op_gather": op_gather,
    "op_row_filter": op_row_filter,
    "op_local_index": op_local_index,
    "op_sort_inner": op_sort_inner,
    "op_argsort_inner": op_argsort_inner,
    "op_pad_clip": op_pad_clip,
    "op_mask_fill_drop": op_mask_fill_drop,
    "op_is_none_count": op_is_none_count,
    "op_singletons_firsts": op_singletons_firsts,
    "op_where": op_where,
    "op_arith_broadcast": op_arith_broadcast,
    "op_zip_project": op_zip_project,
    "op_combinations": op_combinations,
    "op_cartesian": op_cartesian,
    "op_argcombinations": op_argcombinations,
    "op_flatten_explode": op_flatten_explode,
    "op_concat_inner": op_concat_inner,
    "op_concat_outer": op_concat_outer,
    "op_run_lengths": op_run_lengths,
    "op_astype": op_astype,
    "op_isclose": op_isclose_nan,
    "op_num_axis2": op_num_axis2,
    "op_flatten_axis2": op_flatten_axis2,
    "op_sum_axis2": op_sum_axis2,
    "op_unflatten": op_unflatten,
}

ORACLES = {
    "op_num": OP_NUM_SQL,
    "op_sum_axis1": OP_SUM_AXIS1_SQL,
    "op_min_max_axis1": OP_MIN_MAX_SQL,
    "op_any_all_count": OP_ANY_ALL_SQL,
    "op_mean_axis1": OP_MEAN_SQL,
    "op_argminmax_axis1": OP_ARGMINMAX_SQL,
    "op_sum_none": OP_SUM_NONE_SQL,
    "op_firsts": OP_FIRSTS_SQL,
    "op_inner_slice": OP_INNER_SLICE_SQL,
    "op_inner_filter": OP_INNER_FILTER_SQL,
    "op_gather": OP_GATHER_SQL,
    "op_row_filter": OP_ROW_FILTER_SQL,
    "op_local_index": OP_LOCAL_INDEX_SQL,
    "op_sort_inner": OP_SORT_SQL,
    "op_argsort_inner": OP_ARGSORT_SQL,
    "op_pad_clip": OP_PAD_CLIP_SQL,
    "op_mask_fill_drop": OP_MASK_SQL,
    "op_is_none_count": OP_IS_NONE_SQL,
    "op_singletons_firsts": OP_SINGLETONS_SQL,
    "op_where": OP_WHERE_SQL,
    "op_arith_broadcast": OP_ARITH_SQL,
    "op_zip_project": OP_ZIP_SQL,
    "op_combinations": OP_COMBINATIONS_SQL,
    "op_cartesian": OP_CARTESIAN_SQL,
    "op_argcombinations": OP_ARGCOMBINATIONS_SQL,
    "op_flatten_explode": OP_FLATTEN_SQL,
    "op_concat_inner": OP_CONCAT_INNER_SQL,
    "op_concat_outer": OP_CONCAT_OUTER_SQL,
    "op_run_lengths": OP_RUN_LENGTHS_SQL,
    "op_astype": OP_ASTYPE_SQL,
    "op_isclose": OP_ISCLOSE_SQL,
    "op_num_axis2": OP_NUM_AXIS2_SQL,
    "op_flatten_axis2": OP_FLATTEN_AXIS2_SQL,
    "op_sum_axis2": OP_SUM_AXIS2_SQL,
    "op_unflatten": OP_UNFLATTEN_SQL,
}


def op_sum_positional_axis1(spark, sf_dir):
    """Non-innermost-axis reduction: ak.sum(axis=1) on depth-2 lists is a
    positional combine across sublists (reference §1.3 two-regime split —
    this is the jagged-broadcasting case)."""
    df = _nested2(spark, sf_dir)
    a = _arr(df, "qss")
    return df.select("o_custkey", arr_micro(red.sum(a, axis=1).col).alias("pos_sums"))


_POS_SUMS_LIST = (
    "list_transform(range(CAST(coalesce(list_aggregate(list_transform(qss, x -> len(x)),"
    " 'max'), 0) AS BIGINT)), i -> CAST(list_aggregate(list_transform(list_filter(qss,"
    " l -> len(l) > i), l -> l[i+1]), 'sum') AS DOUBLE))"
)
OP_SUM_POSITIONAL_SQL = NESTED2_CTE + (
    f"SELECT o_custkey, {sql_arr_micro(_POS_SUMS_LIST)} AS pos_sums FROM nested2"
)

QUERIES["op_sum_positional_axis1"] = op_sum_positional_axis1
ORACLES["op_sum_positional_axis1"] = OP_SUM_POSITIONAL_SQL
