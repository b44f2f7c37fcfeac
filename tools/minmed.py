#!/usr/bin/env python3
"""Aggregate matched-pair sweeps into per-query min-of-medians.

Usage: python3 tools/minmed.py <sweep_dir> [out.json]

Reads spark_sweep*.json (graft.Bench output: {"queries": {name: median_s}})
and duckdb_sweep*.json (tools/bench_duckdb.py output, same shape) from
<sweep_dir>, takes the per-query MINIMUM of the per-sweep medians for each
engine (the BASELINE.md estimator for "true cost without co-tenant
noise"), and writes {"spark": {...}, "duckdb": {...}, "meta": {...}}.
A query missing from some sweeps (e.g. added mid-morning) uses the sweeps
that have it; the meta block records per-query sweep counts < the max so
partial coverage is visible, not silent.
"""
import sys, os, json, glob


def load(pattern):
    sweeps = []
    for p in sorted(glob.glob(pattern)):
        with open(p) as f:
            d = json.load(f)
        qs = {k: v for k, v in d.get("queries", {}).items() if v >= 0}
        sweeps.append((os.path.basename(p), qs, d.get("load_before"), d.get("load_after")))
    return sweeps


def minmed(sweeps):
    out, counts = {}, {}
    for _, qs, _, _ in sweeps:
        for k, v in qs.items():
            out[k] = min(out.get(k, float("inf")), v)
            counts[k] = counts.get(k, 0) + 1
    return out, counts


def main():
    d = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(d, "minmed.json")
    spark = load(os.path.join(d, "spark_sweep*.json"))
    duck = load(os.path.join(d, "duckdb_sweep*.json"))
    s_mm, s_n = minmed(spark)
    q_mm, q_n = minmed(duck)
    max_s, max_q = len(spark), len(duck)
    # iterate the UNION of keys so a query swept by only one engine
    # (count 0 on the other) is flagged, not silently dropped from the
    # common set with no trace
    partial = sorted(
        k for k in set(s_mm) | set(q_mm)
        if s_n.get(k, 0) < max_s or q_n.get(k, 0) < max_q)
    meta = {
        "spark_sweeps": [{"file": f, "load_before": lb, "load_after": la}
                         for f, _, lb, la in spark],
        "duckdb_sweeps": [{"file": f, "load_before": lb, "load_after": la}
                          for f, _, lb, la in duck],
        "partial_coverage": partial,
    }
    common = sorted(set(s_mm) & set(q_mm))
    summed = {"spark": sum(s_mm[k] for k in common),
              "duckdb": sum(q_mm[k] for k in common),
              "n_common": len(common)}
    dd = [k for k in common if q_mm[k] >= 0.15]
    summed["data_dominated"] = {
        "spark": sum(s_mm[k] for k in dd),
        "duckdb": sum(q_mm[k] for k in dd),
        "n": len(dd)}
    with open(out_path, "w") as f:
        json.dump({"spark": s_mm, "duckdb": q_mm, "meta": meta,
                   "summed": summed}, f, indent=1, sort_keys=True)
    r = summed
    if r["n_common"] == 0 or r["duckdb"] <= 0:
        print(f"common={r['n_common']} — no comparable pair "
              f"(wrong directory, or sweeps share no queries?)")
        return
    print(f"common={r['n_common']} summed spark={r['spark']:.1f}s duckdb={r['duckdb']:.1f}s "
          f"ratio={r['spark']/r['duckdb']:.2f}x")
    d2 = r["data_dominated"]
    if d2["duckdb"] > 0:
        print(f"data-dominated (duckdb>=0.15s, n={d2['n']}): spark={d2['spark']:.1f}s "
              f"duckdb={d2['duckdb']:.1f}s ratio={d2['spark']/d2['duckdb']:.2f}x")
    if partial:
        print("partial coverage:", ", ".join(partial))


if __name__ == "__main__":
    main()
