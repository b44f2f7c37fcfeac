#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <verify_out_dir>/<name> parquet result, runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sf_dir>/*.parquet views,
and compares as an order-insensitive multiset with column names sorted.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def fetch(rel):
    """Round-trip through pandas exactly like the driver's gate: DuckDB
    HUGEINT (e.g. sum() over integers) becomes float64 here, so an oracle
    that forgets CAST(... AS BIGINT) fails locally too, not just in CI."""
    df = rel.df()
    cols = [c.lower() for c in df.columns]
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    return cols, rows


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        # the driver's pandas hasher throws on array cells — so do we
        raise TypeError(f"array-typed cell (driver's gate errors on these): {v!r}")
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # out-of-core safety at the bigger SFs: an in-memory duckdb cannot
    # spill without a temp_directory, so a heavy oracle dies on the
    # memory_limit instead of degrading to disk. GRAFT_CHECK_THREADS
    # shrinks the concurrent spill working set for oracles whose
    # intermediates outgrow the scratch disk at full parallelism (x5's
    # per-character expansion at sf10 spills >78 GB on 32 threads but
    # fits on 8 — same results, just less in flight at once).
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    threads = os.environ.get("GRAFT_CHECK_THREADS")
    if threads:
        con.sql(f"SET threads TO {int(threads)}")
        con.sql("SET preserve_insertion_order=false")
    # DuckDB's default memory_limit is 80% of PHYSICAL RAM, blind to
    # other residents — run concurrently with a big Spark JVM and the
    # kernel OOM-kills python before DuckDB's own limiter engages
    # (observed r14: d3's sf100 oracle at 82 GB RSS beside a 51 GB
    # verify JVM). A hard cap makes DuckDB spill to temp_directory
    # instead of dying.
    mem = os.environ.get("GRAFT_CHECK_MEMORY")
    if mem:
        con.sql(f"SET memory_limit='{mem}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    # A query that threw in graft.Verify produces no result dir; count it
    # as a failure instead of silently omitting it (round-1 review item).
    qlist_path = f"{out_dir}/queries.json"
    if os.path.exists(qlist_path):
        expected = set(json.load(open(qlist_path)))
        found = {os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                 if os.path.isdir(d)}
        for name in sorted(expected - found):
            if only and name not in only:
                continue
            print(f"FAIL {name}: no result written (query threw in Verify)")
            n_fail += 1
    for d in sorted(glob.glob(f"{out_dir}/*")):
        name = os.path.basename(d)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        gcols, grows = fetch(con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')"))
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(grows)} rows")
            n_skip += 1
            continue
        try:
            wcols, wrows = fetch(con.sql(oracles[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: columns {sorted(gcols)} != {sorted(wcols)}")
            n_fail += 1
            continue
        try:
            a, b = norm_rows(gcols, grows), norm_rows(wcols, wrows)
        except TypeError as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rowcount {len(a)} != {len(b)}")
            n_fail += 1
        elif a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(a)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
