#!/usr/bin/env python3
"""Summarize the round-11 sf0.1→sf1 matched-pair sweeps.

Usage: python3 tools/sf1_report.py [sweep_dir]

Reads spark/duckdb sweeps at both SFs from <sweep_dir> (default
bench_sweeps_r11), aggregates per-query min-of-medians per engine per
SF (the BASELINE estimator), and prints a markdown table: per-query
spark sf0.1, spark sf1, scale factor (sf1/sf0.1 on 10x data), duckdb
sf1, and the sf1 ratio. Flags scale factors > 10 (superlinear past the
10x data growth) for root-causing.
"""
import sys, json, glob, statistics


def minmed(pattern):
    per = {}
    for p in sorted(glob.glob(pattern)):
        qs = json.load(open(p))["queries"]
        for k, v in qs.items():
            if v is not None and v >= 0:
                per.setdefault(k, []).append(v)
    return {k: min(vs) for k, vs in per.items()}


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "bench_sweeps_r11"
    s01 = minmed(f"{d}/spark_sf01_sweep*.json")
    s1 = minmed(f"{d}/spark_sf1_sweep*.json")
    d01 = minmed(f"{d}/duckdb_sf01_sweep*.json")
    d1 = minmed(f"{d}/duckdb_sf1_sweep*.json")
    keys = sorted(set(s01) & set(s1))
    print("| query | spark sf0.1 | spark sf1 | scale× | duckdb sf1 | sf1 ratio |")
    print("|---|---|---|---|---|---|")
    sum01 = sum1 = sumd1 = 0.0
    flagged = []
    for k in keys:
        a, b = s01[k], s1[k]
        dd = d1.get(k)
        scale = b / a if a > 0 else float("nan")
        sum01 += a; sum1 += b
        mark = " **superlinear**" if scale > 10 else ""
        if scale > 10:
            flagged.append(k)
        # `dd is not None`, not truthiness: a 0.00s duckdb min-median is
        # a real measurement, not a missing one (round-11 advice)
        if dd is not None:
            sumd1 += dd
            ratio = b / dd if dd > 0 else float("inf")
            print(f"| {k} | {a:.2f} | {b:.2f} | {scale:.1f}×{mark} | "
                  f"{dd:.2f} | {ratio:.2f}× |")
        else:
            print(f"| {k} | {a:.2f} | {b:.2f} | {scale:.1f}×{mark} | - | - |")
    line = (f"\nsums: spark sf0.1 {sum01:.1f}s, spark sf1 {sum1:.1f}s "
            f"({sum1/sum01:.2f}x on 10x data), duckdb sf1 {sumd1:.1f}s")
    if sumd1 > 0:
        line += f", sf1 summed ratio {sum1/sumd1:.2f}x"
    print(line)
    # data-dominated cut at sf1: duckdb >= 1.5s (10x the sf0.1 cutoff)
    dd_keys = [k for k in keys if d1.get(k, 0) >= 1.5]
    if dd_keys:
        a = sum(s1[k] for k in dd_keys); b = sum(d1[k] for k in dd_keys)
        print(f"data-dominated at sf1 (duckdb>=1.5s, {len(dd_keys)} queries): "
              f"spark {a:.1f}s vs duckdb {b:.1f}s = {a/b:.2f}x")
    if flagged:
        print("superlinear (>10x on 10x data):", ", ".join(flagged))


if __name__ == "__main__":
    main()
