#!/usr/bin/env python
"""Round-start guard against silent testdata re-encodings.

The round driver regenerates ``/root/testdata`` between rounds and has
changed parquet encodings without notice (``events.ts``:
TIMESTAMP(NANOS) -> ``timestamp[us]`` before round 3 — every streaming
query silently went red). This tool makes the next re-encoding a LOUD
failure instead of a silent one:

    python tools/schema_guard.py            # check all sf dirs, exit 1 on drift
    python tools/schema_guard.py --update   # re-pin expectations to current files

It diffs the parquet *footer* schema (pyarrow — no JVM startup) of every
table in every ``/root/testdata/sf*`` dir against the committed
``tools/schema_expectations.json`` and classifies each column:

- ``ok``      exact footer match;
- ``adapted`` a re-encoding that ``dask_awkward_spark.sources.tables``
              normalizes automatically (timestamp re-encodings,
              numeric-width / list-element drift) — WARN, exit 0;
- ``drift``   anything else (missing column, incompatible type) — exit 1.

Run this first thing each round, before trusting any query output.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
EXPECTATIONS = os.path.join(HERE, "schema_expectations.json")
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")

_TS_RE = re.compile(r"^(timestamp\[|date32|date64)")
_NUM_RE = re.compile(r"^(u?int(8|16|32|64)|float|double|halffloat|decimal)")
_STR_RE = re.compile(r"^(string|large_string)$")


def footer_schema(path: str) -> dict[str, str]:
    return {f.name: str(f.type) for f in pq.read_schema(path)}


def classify(expected: str, actual: str) -> str:
    """ok / adapted / drift for one column, mirroring sources/tables.py."""
    if expected == actual:
        return "ok"
    if _STR_RE.match(expected) and _STR_RE.match(actual):
        return "ok"  # string vs large_string: identical after ingest
    if _TS_RE.match(expected):
        # any timestamp re-encoding the adaptive loader handles:
        # nanos-as-long (int64), other timestamp units/zones, dates, ISO strings
        if actual == "int64" or _TS_RE.match(actual) or _STR_RE.match(actual):
            return "adapted"
        return "drift"
    if _NUM_RE.match(expected) and _NUM_RE.match(actual):
        return "adapted"
    if expected.startswith("list<") and actual.startswith("list<"):
        return "adapted"
    if _STR_RE.match(expected):
        return "adapted"  # anything casts to string
    return "drift"


def scan() -> dict[str, dict[str, str]]:
    out: dict[str, dict[str, str]] = {}
    for sf_dir in sorted(glob.glob(os.path.join(TESTDATA, "sf*"))):
        for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
            table = os.path.splitext(os.path.basename(path))[0]
            out[f"{os.path.basename(sf_dir)}/{table}"] = footer_schema(path)
    return out


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--update", action="store_true", help="re-pin expectations")
    args = ap.parse_args(argv)

    current = scan()
    if args.update:
        # expectations are per-TABLE (all sf dirs must agree); refuse to pin
        # if sf dirs disagree with each other
        tables: dict[str, dict[str, str]] = {}
        for key, schema in current.items():
            table = key.split("/", 1)[1]
            if table in tables and tables[table] != schema:
                print(f"DRIFT between sf dirs for {table}; not updating", file=sys.stderr)
                return 1
            tables[table] = schema
        with open(EXPECTATIONS, "w") as f:
            json.dump(tables, f, indent=1, sort_keys=True)
        print(f"pinned {len(tables)} table schemas -> {EXPECTATIONS}")
        return 0

    with open(EXPECTATIONS) as f:
        expected_tables = json.load(f)

    n_ok = n_adapted = n_drift = 0
    for key, actual in sorted(current.items()):
        table = key.split("/", 1)[1]
        expected = expected_tables.get(table)
        if expected is None:
            print(f"NEW TABLE {key} (not in expectations): {actual}")
            continue
        missing = set(expected) - set(actual)
        if missing:
            n_drift += 1
            print(f"DRIFT {key}: missing columns {sorted(missing)}")
            continue
        for col, exp_type in expected.items():
            verdict = classify(exp_type, actual[col])
            if verdict == "ok":
                n_ok += 1
            elif verdict == "adapted":
                n_adapted += 1
                print(f"ADAPTED {key}.{col}: {exp_type} -> {actual[col]} (loader normalizes)")
            else:
                n_drift += 1
                print(f"DRIFT {key}.{col}: {exp_type} -> {actual[col]} (NOT normalizable)")
    print(f"schema_guard: {n_ok} ok, {n_adapted} adapted, {n_drift} drift")
    return 1 if n_drift else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
