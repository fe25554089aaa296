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
            odf = con.execute(oracles[name]).fetch_arrow_table()
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
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
