#!/usr/bin/env python3
"""Diff a bench artifact against the clean per-query reference.

Usage: python3 tools/bench_diff.py BENCH_rN.json [--update]
       python3 tools/bench_diff.py --age BENCH_rA.json BENCH_rB.json ...

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

STALENESS RULE (--age, over >= AGE_K historical artifacts in round
order): a reference that is a one-off lucky-window minimum flags every
honest run forever (tx14's 0.33s, q209's 0.74s). A reference ages out
when AGE_K consecutive artifacts each measured the query CLEAN (its
timing window did not probe hot) and still could not get within 1.5x —
— it is then REPLACED by the median
of those clean observations, with provenance recorded under
baseline["aged"] (old value, observations, artifacts). Minima stay
minima for every reference that any recent clean run can still reach.
"""
import json
import re
import statistics
import sys

AGE_K = 3


def query_map(path):
    with open(path) as f:
        d = json.load(f)
    keys = ("probe_ms", "reruns", "failed", "probe_by_query")
    extra = {k: d.get(k) for k in keys if k in d}
    if "queries" in d and isinstance(d["queries"], dict):
        return {k: float(v) for k, v in d["queries"].items()}, extra
    # Tail fallback: ONLY the region after the '"queries":{' marker is a
    # per-query seconds map. A truncated driver artifact (BENCH_rN.json
    # keeps the LAST 2000 chars) whose tail starts inside probe_by_query
    # would otherwise serve per-query PROBE MILLISECONDS as seconds —
    # this is exactly how the r10-r12 aged history got 50-second
    # "observations" for sub-second queries. Refuse instead of guessing;
    # the committed BENCH_rN_full.json artifacts carry the real map.
    tail = d.get("tail", "")
    marker = tail.find('"queries":{')
    if marker < 0:
        # Round-15 artifacts place a bounded "slow" map in the tail:
        # every query over its reference threshold as name:[t, ref,
        # probe_ms]. That is exactly the adjudication set — a truncated
        # driver artifact can still name its own regressions. probes
        # feed hot_windows via a synthetic probe_by_query.
        sm = tail.find('"slow":{')
        if sm >= 0:
            region = tail[sm + len('"slow":{'):]
            region = region[:region.find("}")] if "}" in region else region
            trips = re.findall(
                r'"([A-Za-z0-9_]+)":\[([0-9.eE+-]+),([0-9.eE+-]+),'
                r'([0-9.eE+-]+)\]', region)
            # An EMPTY slow map is a CLEAN run — adjudicate "no
            # regressions", don't refuse the artifact (the map was
            # added precisely to rescue truncated tails, and a clean
            # one is the best possible outcome).
            extra.setdefault("probe_by_query",
                             {k: float(p) for k, _, _, p in trips})
            pm = re.search(r'"probe_ms":\[([0-9.eE+-]+),([0-9.eE+-]+)\]',
                           tail)
            if pm:
                extra.setdefault(
                    "probe_ms", [float(pm.group(1)), float(pm.group(2))])
            extra["slow_only"] = True
            # slow_n = total over-threshold count Bench measured; if it
            # exceeds what the bounded map carries, the map itself was
            # truncated and the missing names are unadjudicable here.
            sn = re.search(r'"slow_n":(\d+)', tail)
            if sn and int(sn.group(1)) > len(trips):
                print(f"{path}: WARNING — slow map carries {len(trips)} "
                      f"of {sn.group(1)} over-threshold queries; the "
                      "rest are only in BENCH_rN_full.json")
            print(f"{path}: truncated tail — adjudicating from its "
                  f"'slow' map ({len(trips)} over-threshold queries; "
                  "full map only in BENCH_rN_full.json)")
            return {k: float(t) for k, t, _, _ in trips}, extra
        # Round-17: the slow map is uncapped and severity-ASCENDING, so
        # a front-truncated tail can lose the '"slow":{' marker while
        # the WORST flags (map end, next to slow_n) survive. Parse the
        # bare triplets: a partial map that names the worst regressions
        # still beats refusing the artifact.
        trips = re.findall(
            r'"([A-Za-z0-9_]+)":\[([0-9.eE+-]+),([0-9.eE+-]+),'
            r'([0-9.eE+-]+)\]', tail)
        if trips and re.search(r'"slow_n":(\d+)', tail):
            sn = int(re.search(r'"slow_n":(\d+)', tail).group(1))
            extra.setdefault("probe_by_query",
                             {k: float(p) for k, _, _, p in trips})
            pm = re.search(r'"probe_ms":\[([0-9.eE+-]+),([0-9.eE+-]+)\]',
                           tail)
            if pm:
                extra.setdefault(
                    "probe_ms", [float(pm.group(1)), float(pm.group(2))])
            extra["slow_only"] = True
            print(f"{path}: WARNING — marker-less partial slow map: "
                  f"{len(trips)} of {sn} over-threshold queries survived "
                  "tail truncation (the WORST flags — map is "
                  "severity-ascending); the rest are only in "
                  "BENCH_rN_full.json")
            return {k: float(t) for k, t, _, _ in trips}, extra
        sys.exit(f"{path}: no complete queries map (truncated tail without "
                 'a "queries":{ region) — use the BENCH_rN_full.json '
                 "artifact for per-query numbers")
    region = tail[marker + len('"queries":{'):]
    region = region[:region.find("}")] if "}" in region else region
    pairs = re.findall(r'"([A-Za-z0-9_]+)":([0-9.eE+-]+)', region)
    return {k: float(v) for k, v in pairs}, extra


def hot_windows(extra):
    """Queries whose adjacent CPU probe ran hot: probe_by_query maps each
    query to the calibration-probe ms measured right after it (scaled to
    the 20M-iteration reference loop). The run's own MINIMUM probe is the
    box's clean speed for this run — anything >1.3x it means the query's
    timing window shared the box with other load, so its wall time says
    nothing about the plan."""
    probes = extra.get("probe_by_query") or {}
    if not probes:
        return set(), None
    floor = min(list(probes.values())
                + [p for p in (extra.get("probe_ms") or []) if p])
    return {q for q, p in probes.items() if p > 1.3 * floor}, floor


def age_refs(base_path, artifacts):
    """Apply the staleness rule over historical artifacts (round order)."""
    with open(base_path) as f:
        base = json.load(f)
    ref = base["queries"]
    if len(artifacts) < AGE_K:
        sys.exit(f"--age needs at least {AGE_K} artifacts (got {len(artifacts)})")
    runs = []
    extras = {}
    for a in artifacts:
        got, extra = query_map(a)
        hot, _ = hot_windows(extra)
        runs.append((a, got, hot))
        extras[a] = extra
    aged = base.setdefault("aged", {})
    replaced = []
    for name, r in sorted(ref.items()):
        # The trailing AGE_K CLEAN-WINDOW measurements: a hot-window
        # timing says nothing about the plan either way, so it neither
        # counts toward the streak nor breaks it (the rule is "K
        # consecutive clean-window runs can't get within 1.5x").
        # SLOW-ONLY artifacts (truncated driver tails adjudicated from
        # their bounded slow map) carry only over-threshold queries:
        # a query ABSENT from one was measured CLEAN that run — it
        # must count as a sub-1.5x observation that BREAKS the streak,
        # not be skipped as missing (skipping would age a ref whose
        # reachability a slow-only run just proved).
        tail = [(a, got[name] if name in got else r)
                for a, got, hot in runs
                if (name in got or
                    (extras[a].get("slow_only") and name not in hot))
                and name not in hot][-AGE_K:]
        if len(tail) < AGE_K:
            continue
        # Pure 1.5x (no absolute floor): aging a tiny query's
        # noise-inflated ref is harmless — the FLAG rule's own +0.5s
        # floor keeps regression sensitivity unchanged either way —
        # while an absolute floor here would block exactly the
        # lucky-window refs this rule exists to retire.
        if all(t > 1.5 * r for a, t in tail):
            new = round(statistics.median(t for _, t in tail), 3)
            aged[name] = {
                "was": r,
                "observations": [round(t, 3) for _, t in tail],
                "artifacts": [a for a, _ in tail],
            }
            ref[name] = new
            replaced.append((name, r, new))
    if replaced:
        base["queries"] = dict(sorted(ref.items()))
        with open(base_path, "w") as f:
            json.dump(base, f, indent=1)
        print(f"{len(replaced)} stale references aged out "
              f"({AGE_K} consecutive clean misses at >1.5x):")
        for name, old, new in replaced:
            print(f"  {name:40s} {old:6.3f}s -> {new:6.3f}s")
    else:
        print("no stale references (every ref reachable by a recent clean run)")


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    if sys.argv[1] == "--age":
        age_refs("tools/bench_baseline.json", sys.argv[2:])
        return
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

    hot, floor = hot_windows(extra)
    if floor is not None:
        print(f"probe floor this run: {floor:.1f}ms; "
              f"{len(hot)} queries timed in a hot window")

    rows = []
    for name, t in got.items():
        r = ref.get(name)
        if r is None:
            rows.append((name, t, None, None))
        elif t > max(1.5 * r, r + 0.5):
            rows.append((name, t, r, t / r))
    over = sorted((x for x in rows if x[3]), key=lambda x: -x[3])
    # AUTO-DISCOUNT: an over-reference query whose own timing window
    # probed hot is box contamination, not a plan regression — report
    # it separately so the regression list carries signal only.
    regressions = [x for x in over if x[0] not in hot]
    discounted = [x for x in over if x[0] in hot]
    new = [x for x in rows if x[2] is None]
    if regressions:
        print(f"\n{len(regressions)} queries above max(1.5x, +0.5s) of reference:")
        for name, t, r, ratio in regressions:
            print(f"  {name:40s} {t:7.2f}s  ref {r:6.2f}s  {ratio:5.2f}x")
    else:
        print("\nno regressions vs reference")
    if discounted:
        print(f"\n{len(discounted)} over-reference but DISCOUNTED "
              "(timing window probed hot — box load, not the plan):")
        for name, t, r, ratio in discounted:
            print(f"  {name:40s} {t:7.2f}s  ref {r:6.2f}s  {ratio:5.2f}x")
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
