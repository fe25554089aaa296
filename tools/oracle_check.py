#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB with every harness table
registered as a view. Compares: column names (sorted), row count, and
cell-exact values on rows sorted by all columns. Reports per-query PASS /
FAIL with a diff sample, so oracle-SQL mismatches are caught before the
driver runs.
"""
import decimal
import json
import math
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Normalize numeric types so the same column materialized as
    # Decimal/float/int on the two sides builds identical sort keys
    # (else rows misalign and equal values compare as diffs).
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            # Mirror the NaN sentinel; int(inf) would raise OverflowError.
            return "Infinity" if v > 0 else "-Infinity"
        if abs(v) < 2**53 and v == int(v):
            return int(v)  # collapse 3.0 vs 3 (and -0.0 vs 0.0)
        return v + 0.0
    return v


def sortkey(row):
    # bool is an int subclass in Python; rank it as its own kind so
    # True doesn't interleave with 1.
    def kind(x):
        if isinstance(x, bool):
            return "bool"
        if isinstance(x, (int, float)):
            return "num"
        return str(type(x))

    def val(x):
        if not isinstance(x, bool) and isinstance(x, (int, float)):
            return float(x)
        return str(x)

    return tuple((x is None, kind(x), val(x), str(x)) for x in row)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    # Oracle-cost budget: a slow oracle is as fatal as a wrong one — it
    # blows the driver's per-round correctness budget and silently zeroes
    # the WHOLE round's signal (rounds 5–6 proved this: two oracles at
    # 166 s / 477 s made CORRECTNESS_r0{5,6} come back empty). Gate it
    # here so a regression fails the local check before the driver runs.
    budget_each = float(os.environ.get("ORACLE_BUDGET_EACH_S", "30"))
    budget_total = float(os.environ.get("ORACLE_BUDGET_TOTAL_S", "300"))
    oracle_secs = {}

    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        try:
            sdf = con.execute(
                f"SELECT * FROM '{spark_glob}'").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={sdf.num_rows})")
            continue
        try:
            t0 = time.monotonic()
            odf = con.execute(oracles[name]).fetch_arrow_table()
            oracle_secs[name] = time.monotonic() - t0
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue

        scols, ocols = sorted(sdf.column_names), sorted(odf.column_names)
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        srows = [tuple(norm(row[c]) for c in scols)
                 for row in sdf.to_pylist()]
        orows = [tuple(norm(row[c]) for c in scols)
                 for row in odf.to_pylist()]
        srows.sort(key=sortkey)
        orows.sort(key=sortkey)
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: first diff at sorted-row {i} (cols {scols})")
            print(f"  spark : {a}")
            print(f"  oracle: {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(names) - n_pass - n_fail} no-oracle")

    total = sum(oracle_secs.values())
    slow = sorted(((s, n) for n, s in oracle_secs.items()), reverse=True)
    print(f"oracle cost: total {total:.1f}s over {len(oracle_secs)} oracles; "
          f"slowest: " + ", ".join(f"{n} {s:.1f}s" for s, n in slow[:5]))
    n_budget = 0
    for s, n in slow:
        if s > budget_each:
            print(f"BUDGET {n}: oracle took {s:.1f}s > {budget_each:.0f}s cap")
            n_budget += 1
    if total > budget_total:
        print(f"BUDGET total: {total:.1f}s > {budget_total:.0f}s cap")
        n_budget += 1
    return 1 if (n_fail or n_budget) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
