#!/usr/bin/env python3
"""DuckDB side of the BASELINE.md matched pair.

Usage: python3 tools/bench_duckdb.py <oracle_sql.json> <sf_dir> [out.json]

Times every oracle SQL over <sf_dir>/*.parquet views with 32 threads:
one warm pass, then median-of-N, mirroring graft.Bench's protocol. N
comes from GRAFT_BENCH_RUNS (default 5 — the SAME default as
graft.Bench.Runs, so the matched pair rejects outliers symmetrically).
Records /proc/loadavg before/after so contended runs are visible after
the fact (same quiet-machine contract as graft.Bench). Run this ALONE —
never concurrently with sbt or the Spark bench.
"""
import sys, os, json, time, statistics
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def loadavg():
    try:
        return float(open("/proc/loadavg").read().split()[0])
    except Exception:
        return -1.0


def main():
    oracle_path, sf_dir = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "baseline_duckdb.json"
    load_before = loadavg()
    con = duckdb.connect()
    con.sql("SET threads TO 32")
    # sf10 sweeps spill (d2/d6 build multi-GB intermediates); without a
    # temp_directory DuckDB dies on memory_limit instead of degrading
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # multi-file layout (row-group probe)
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(oracle_path))
    runs = int(os.environ.get("GRAFT_BENCH_RUNS", "5"))
    only = os.environ.get("BENCH_QUERIES")
    if only:
        keep = {q.strip() for q in only.split(",")}
        oracles = {k: v for k, v in oracles.items() if k in keep}
    else:
        # mirror graft.Bench.TeachingQueries: q18 (deliberate ×4
        # replication demo) and q20 (salting overhead case on the gate's
        # mild skew — r12) are excluded from the headline set on BOTH
        # sides so the matched-pair sums stay comparable
        oracles.pop("q18_salted_join", None)
        oracles.pop("q20_hotkey_salted_join", None)
    # BENCH_SKIP_WARM=1 (r16, sf1000 decade): at the fifth row-decade a
    # single DuckDB pass over d2/d9 runs ~45-60 min; the warm pass would
    # double a multi-hour sweep for no information (the 26 GB corpus
    # fits page cache, and graft's matched run is timed from the same
    # disclosed cold state). The receipt records runs + skip_warm.
    skip_warm = os.environ.get("BENCH_SKIP_WARM") == "1"
    results = {}
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            if not skip_warm:
                con.sql(sql).fetchall()  # warm
            times = []
            for _ in range(runs):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                times.append(time.perf_counter() - t0)
            results[name] = statistics.median(times)
        except Exception as e:
            print(f"[bench_duckdb] {name} failed: {e}", file=sys.stderr)
            results[name] = -1.0
    total = sum(v for v in results.values() if v >= 0)
    out = {"metric": "total", "value": total, "unit": "sec",
           "queries": results, "sf": sf_dir, "threads": 32, "runs": runs,
           "skip_warm": skip_warm,
           "load_before": load_before, "load_after": loadavg()}
    line = json.dumps(out)
    print(line)
    with open(out_path, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
