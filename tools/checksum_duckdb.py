#!/usr/bin/env python3
"""DuckDB mirror of graft.ChecksumVerify — the checksum gate for
results too large to materialize through the parquet compare (q25).

Computes the identical fingerprint triple over the q25 oracle SQL
(read from <verify_out_dir>/oracle_sql.json so both engines verify the
same text): row count + two modular sums accumulated in HUGEINT.

Usage: python3 tools/checksum_duckdb.py <verify_out_dir> <sf_dir>
Env: GRAFT_CHECK_THREADS (optional thread cap for spill control).
"""
import sys, os, json, time
import duckdb

A1, M1 = 2654435761, 1000000007
A2, M2 = 40503, 998244353

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    threads = os.environ.get("GRAFT_CHECK_THREADS")
    if threads:
        con.sql(f"SET threads TO {int(threads)}")
        con.sql("SET preserve_insertion_order=false")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))["q25_range_join"]
    t0 = time.time()
    # window_id mod-reduced before the multiply, mirroring
    # ChecksumVerify.scala (r15): (w%M)*A ≡ w*A (mod M) and the product
    # stays under 2^63, so neither engine's BIGINT path can overflow at
    # any decade; fingerprint values are unchanged.
    n, fp1, fp2 = con.sql(
        f"SELECT count(*), "
        f"SUM((((window_id % {M1}) * {A1} + event_id) % {M1})::HUGEINT), "
        f"SUM((((window_id % {M2}) * {A2} + event_id) % {M2})::HUGEINT) "
        f"FROM ({oracle}) t").fetchone()
    sec = time.time() - t0
    print(json.dumps({"query": "q25_range_join", "engine": "duckdb",
                      "sf_dir": sf_dir, "n": int(n),
                      "fp1": str(fp1), "fp2": str(fp2),
                      "sec": round(sec, 3)}))


if __name__ == "__main__":
    main()
