#!/usr/bin/env python3
"""Diff a bench artifact against the clean per-query reference.

Usage: python3 tools/bench_diff.py BENCH_rN.json [--update]

Separates ambient drift from real regressions without re-deriving it
from round-over-round history:

  * reads tools/bench_baseline.json (per-query clean reference seconds
    at sf0.1 — the min over prior clean runs);
  * prints queries slower than max(1.5x, +0.5s) of reference, worst
    first, plus the artifact's probe_ms / reruns fields when present
    (a probe_ms pair far above ~40ms on this box means the run itself
    was load-contaminated — suspect the box before the code);
  * with --update, folds the artifact's times into the baseline
    (per-query min — a faster clean run tightens the reference, a slow
    contaminated one never loosens it).

The artifact may be a full bench_last.json line or a driver-captured
tail fragment ({"tail": "..."}).
"""
import json
import re
import sys


def query_map(path):
    with open(path) as f:
        d = json.load(f)
    extra = {k: d.get(k) for k in ("probe_ms", "reruns", "failed") if k in d}
    if "queries" in d and isinstance(d["queries"], dict):
        return {k: float(v) for k, v in d["queries"].items()}, extra
    pairs = re.findall(r'"([A-Za-z0-9_]+)":([0-9.eE+-]+)', d.get("tail", ""))
    skip = {"sf", "n", "value"}
    return {k: float(v) for k, v in pairs if k not in skip}, extra


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    artifact = sys.argv[1]
    update = "--update" in sys.argv[2:]
    base_path = "tools/bench_baseline.json"
    with open(base_path) as f:
        base = json.load(f)
    ref = base["queries"]
    got, extra = query_map(artifact)

    if "probe_ms" in extra:
        print(f"probe_ms: {extra['probe_ms']}  "
              "(pair >> ~40ms => run was load-contaminated)")
    if extra.get("reruns"):
        print(f"reruns ({len(extra['reruns'])}): best-of-2 engaged for: "
              + ", ".join(sorted(extra["reruns"])))
    if extra.get("failed"):
        print(f"FAILED: {extra['failed']}")

    rows = []
    for name, t in got.items():
        r = ref.get(name)
        if r is None:
            rows.append((name, t, None, None))
        elif t > max(1.5 * r, r + 0.5):
            rows.append((name, t, r, t / r))
    regressions = sorted((x for x in rows if x[3]), key=lambda x: -x[3])
    new = [x for x in rows if x[2] is None]
    if regressions:
        print(f"\n{len(regressions)} queries above max(1.5x, +0.5s) of reference:")
        for name, t, r, ratio in regressions:
            print(f"  {name:40s} {t:7.2f}s  ref {r:6.2f}s  {ratio:5.2f}x")
    else:
        print("\nno regressions vs reference")
    if new:
        print(f"\n{len(new)} queries with no reference yet: "
              + ", ".join(sorted(n for n, *_ in new)))

    if update:
        for name, t in got.items():
            r = ref.get(name)
            ref[name] = round(min(r, t) if r is not None else t, 3)
        base["queries"] = dict(sorted(ref.items()))
        with open(base_path, "w") as f:
            json.dump(base, f, indent=1)
        print(f"\nbaseline updated: {len(ref)} entries")


if __name__ == "__main__":
    main()
