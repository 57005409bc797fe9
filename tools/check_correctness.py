"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at sf0.01,
compare row count, column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [name_filter ...]
Set CHECK_SF_DIR to grade another scale (e.g. sf0.001 for empty-group
edge cases, sf0.1 for partition-order/overflow robustness).
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def norm_cell(v):
    # unwrap numpy scalars / pandas timestamps from the .df() path so they
    # hash identically to the plain-Python objects Spark's collect() yields
    if hasattr(v, "item") and type(v).__module__.startswith(("numpy", "pandas")):
        try:
            v = v.item()
        except Exception:
            pass
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.6f}"
    except Exception:
        pass
    return repr(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    filters = sys.argv[1:]
    import __spark_entry__ as entry_mod
    from dask_awkward_spark.session import get_spark

    spark = get_spark(cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = []
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        import pyspark.sql.types as T

        try:
            sdf = fn(spark, SF_DIR)
            # The driver canonicalizes with pandas, which cannot hash
            # list/struct cells — flag nested output types from the lazy
            # schema BEFORE paying for the collect.
            nested_cols = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType))
            ]
            if nested_cols:
                print(f"FAIL {name}: nested output columns {nested_cols} (driver can't hash)")
                results.append((name, "nested_output"))
                continue
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            results.append((name, "spark_error"))
            continue
        if name not in oracles:
            print(f"okNO {name}: rows={len(srows)} (no oracle, rows-only)")
            results.append((name, "rows_only"))
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            # go through pandas like the driver does: HUGEINT (e.g. a bare
            # sum() over BIGINT) becomes float64 there, which hashes as
            # "33.000000" vs Spark's int "33" — fetchall() would hide that.
            odf = rel.df()
            orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            results.append((name, "duckdb_error"))
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            hs, ho = table_hash(scols, srows), table_hash(ocols, orows)
            if hs != ho:
                problems.append("value hash mismatch")
                # show first differing row for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in srows)
                lo = sorted("|".join(norm_cell(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        print(f"  spark : {a[:300]}")
                        print(f"  duckdb: {b[:300]}")
                        break
        dt = time.time() - t0
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}  ({dt:.1f}s)")
            results.append((name, "mismatch"))
        else:
            print(f"PASS {name}  rows={len(srows)} ({dt:.1f}s)")
            results.append((name, "pass"))
    n_pass = sum(1 for _, s in results if s in ("pass", "rows_only"))
    print(f"\n{n_pass}/{len(results)} pass")
    spark.stop()
    if not results:
        print("no queries matched the given filters", file=sys.stderr)
        return 1
    return 0 if n_pass == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
