"""Randomized differential testing: generate simple filter/group/agg
queries from a seeded grammar, run each BOTH as a Spark DataFrame plan
and as SQL on DuckDB over the same parquet, and hash-compare the results
(same normalization as check_correctness). Catches engine-semantics
drift the fixed query suite doesn't — null ordering, cast edges, empty
groups, predicate simplification.

Usage: python tools/fuzz_differential.py [N_QUERIES] [SEED]
Exit code 1 if any query mismatches; prints each failing recipe so it
can be replayed verbatim.
"""

from __future__ import annotations

import os
import random
import sys

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_correctness import table_hash  # noqa: E402

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")

# (table, numeric cols, string cols, int-key cols)
TABLES = {
    "lineitem": (
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        ["l_returnflag", "l_linestatus"],
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    ),
    "orders": (
        ["o_totalprice"],
        ["o_orderstatus", "o_orderpriority"],
        ["o_orderkey", "o_custkey"],
    ),
    "customer": (
        ["c_acctbal"],
        ["c_mktsegment", "c_name"],
        ["c_custkey", "c_nationkey"],
    ),
    "documents": ([], ["lang", "source"], ["doc_id", "n_chars"]),
}

CMP = ["<", "<=", ">", ">=", "=", "!="]


def gen_query(rng: random.Random):
    """One random recipe → (description, spark_builder, sql)."""
    table = rng.choice(list(TABLES))
    nums, strs, keys = TABLES[table]
    preds = []
    for _ in range(rng.randint(0, 2)):
        kind = rng.choice(["num", "key", "str"] if nums else ["key", "str"])
        if kind == "num":
            c, op, v = rng.choice(nums), rng.choice(CMP), round(rng.uniform(0, 1000), 2)
            preds.append(f"{c} {op} {v}")
        elif kind == "key":
            c, op, v = rng.choice(keys), rng.choice(CMP), rng.randint(0, 5000)
            preds.append(f"{c} {op} {v}")
        else:
            c = rng.choice(strs)
            preds.append(f"{c} IS NOT NULL")
    where = " AND ".join(preds)
    grp = rng.choice(strs + [None])
    aggs = ["count(*) AS n"]
    for c in rng.sample(keys, min(len(keys), rng.randint(0, 2))):
        fn = rng.choice(["min", "max", "sum"])
        aggs.append(f"CAST({fn}({c}) AS BIGINT) AS {fn}_{c}")
    sel = (f"{grp}, " if grp else "") + ", ".join(aggs)
    sql = f"SELECT {sel} FROM {table}"
    if where:
        sql += f" WHERE {where}"
    if grp:
        sql += f" GROUP BY {grp}"
    return table, where, grp, aggs, sql


def spark_run(spark, table, where, grp, aggs):
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
    if where:
        df = df.filter(where)  # Spark accepts the same SQL predicate text
    cols = []
    for a in aggs:
        if a.startswith("count(*)"):
            cols.append(F.count(F.lit(1)).alias("n"))
        else:
            # "CAST(fn(c) AS BIGINT) AS fn_c"
            inner = a.split("CAST(", 1)[1].split(" AS BIGINT", 1)[0]
            fn, c = inner.split("(", 1)
            c = c.rstrip(")")
            cols.append(getattr(F, fn)(c).cast("bigint").alias(f"{fn}_{c}"))
    if grp:
        out = df.groupBy(grp).agg(*cols)
    else:
        out = df.agg(*cols)
    return out


JOINS = [
    # (left, right, left key, right key)
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
]


def gen_join_query(rng: random.Random):
    """Equi-join + group + agg recipe."""
    lt, rt, lk, rk = rng.choice(JOINS)
    lnums, lstrs, lkeys = TABLES[lt]
    rnums, rstrs, rkeys = TABLES[rt]
    grp = rng.choice(lstrs + rstrs)
    where = ""
    if rng.random() < 0.6:
        c, op, v = rng.choice(lkeys), rng.choice(CMP), rng.randint(0, 5000)
        where = f"{c} {op} {v}"
    agg_key = rng.choice(lkeys + rkeys)
    fn = rng.choice(["min", "max", "sum"])
    sql = (
        f"SELECT {grp}, count(*) AS n, CAST({fn}({agg_key}) AS BIGINT) AS agg_v "
        f"FROM {lt} JOIN {rt} ON {lk} = {rk}"
        + (f" WHERE {where}" if where else "")
        + f" GROUP BY {grp}"
    )
    return lt, rt, lk, rk, where, grp, fn, agg_key, sql


def spark_run_join(spark, lt, rt, lk, rk, where, grp, fn, agg_key):
    from pyspark.sql import functions as F

    left = spark.read.parquet(f"{SF_DIR}/{lt}.parquet")
    right = spark.read.parquet(f"{SF_DIR}/{rt}.parquet")
    df = left.join(right, F.col(lk) == F.col(rk))
    if where:
        df = df.filter(where)
    return df.groupBy(grp).agg(
        F.count(F.lit(1)).alias("n"),
        getattr(F, fn)(agg_key).cast("bigint").alias("agg_v"),
    )


# tables with a UNIQUE key — required for deterministic window ordering
UNIQ = {"orders": "o_orderkey", "customer": "c_custkey", "documents": "doc_id"}


def gen_window_query(rng: random.Random):
    """Window-function recipe: row_number + running sum + lag over a
    string partition key, totally ordered by the table's unique key so
    both engines see the identical frame sequence. Catches frame-bound,
    null-ordering, and running-agg drift the groupBy grammar can't."""
    t = rng.choice(list(UNIQ))
    uk = UNIQ[t]
    _nums, strs, keys = TABLES[t]
    grp = rng.choice(strs)
    val = rng.choice(keys)
    k = rng.randint(2, 8)
    desc = rng.random() < 0.5
    order = f"{uk} DESC" if desc else uk
    sql = (
        f"SELECT {grp} AS g, {uk} AS uk, rn, rsum, lg FROM ("
        f"SELECT {grp}, {uk}, row_number() OVER w AS rn, "
        f"CAST(sum({val}) OVER (PARTITION BY {grp} ORDER BY {order} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rsum, "
        f"CAST(coalesce(lag({val}) OVER w, -1) AS BIGINT) AS lg "
        f"FROM {t} WINDOW w AS (PARTITION BY {grp} ORDER BY {order})"
        f") WHERE rn <= {k}"
    )
    return t, grp, uk, val, k, desc, sql


def spark_run_window(spark, t, grp, uk, val, k, desc):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
    okey = F.col(uk).desc() if desc else F.col(uk)
    w = Window.partitionBy(grp).orderBy(okey)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df.select(
        F.col(grp).alias("g"),
        F.col(uk).alias("uk"),
        F.row_number().over(w).alias("rn"),
        F.sum(val).over(wf).cast("bigint").alias("rsum"),
        F.coalesce(F.lag(val).over(w), F.lit(-1)).cast("bigint").alias("lg"),
    )
    return out.filter(F.col("rn") <= k)


def gen_sort_limit_query(rng: random.Random):
    """Global ORDER BY + LIMIT over a unique key (deterministic top-k) —
    exercises Spark's TakeOrdered rewrite against DuckDB's sort."""
    t = rng.choice(list(UNIQ))
    uk = UNIQ[t]
    _nums, strs, keys = TABLES[t]
    proj = rng.choice(strs)
    k = rng.randint(1, 50)
    desc = rng.random() < 0.5
    where = ""
    if rng.random() < 0.5:
        c, op, v = rng.choice(keys), rng.choice(CMP), rng.randint(0, 5000)
        where = f"{c} {op} {v}"
    sql = (
        f"SELECT {uk} AS uk, {proj} AS p FROM {t}"
        + (f" WHERE {where}" if where else "")
        + f" ORDER BY {uk} {'DESC' if desc else 'ASC'} LIMIT {k}"
    )
    return t, uk, proj, k, desc, where, sql


def spark_run_sort_limit(spark, t, uk, proj, k, desc, where):
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
    if where:
        df = df.filter(where)
    okey = F.col(uk).desc() if desc else F.col(uk)
    return (
        df.select(F.col(uk).alias("uk"), F.col(proj).alias("p"))
        .orderBy(okey)
        .limit(k)
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    rng = random.Random(seed)

    from dask_awkward_spark.session import get_spark

    spark = get_spark("fuzz", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    fails = 0
    for i in range(n):
        r = rng.random()
        if r < 0.25:
            lt, rt, lk, rk, where, grp, fn, agg_key, sql = gen_join_query(rng)
            sdf = spark_run_join(spark, lt, rt, lk, rk, where, grp, fn, agg_key)
        elif r < 0.45:
            t, grp, uk, val, k, desc, sql = gen_window_query(rng)
            sdf = spark_run_window(spark, t, grp, uk, val, k, desc)
        elif r < 0.6:
            t, uk, proj, k, desc, where, sql = gen_sort_limit_query(rng)
            sdf = spark_run_sort_limit(spark, t, uk, proj, k, desc, where)
        else:
            table, where, grp, aggs, sql = gen_query(rng)
            sdf = spark_run(spark, table, where, grp, aggs)
        scols = sdf.columns
        # empty-group aggregates: Spark yields None where DuckDB's pandas
        # path yields NaN — same value, two spellings; unify before hashing
        nan = float("nan")
        srows = [tuple(nan if v is None else v for v in r) for r in sdf.collect()]
        rel = con.sql(sql)
        odf = rel.df()
        orows = [
            tuple(nan if v is None else v for v in r)
            for r in odf.itertuples(index=False, name=None)
        ]
        sh = table_hash(scols, srows)
        oh = table_hash(list(odf.columns), orows)
        if sh != oh or len(srows) != len(orows):
            fails += 1
            print(f"MISMATCH #{i}: {sql}")
            print(f"  spark {len(srows)} rows {sh} | duckdb {len(orows)} rows {oh}")
        if (i + 1) % 50 == 0:
            print(f"  ... {i + 1}/{n}, {fails} mismatches", flush=True)
    print(f"{n - fails}/{n} agree (seed={seed})")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
