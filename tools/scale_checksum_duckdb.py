#!/usr/bin/env python3
"""DuckDB mirror of graft.ScaleChecksum — the generalized fingerprint
gate for decade-scale outputs (round 18: t6/t11 at sf1000, whose
150M/50M-row results are too large for the row-level parquet compare).

Runs the SAME oracle SQL the sf0.01 gate runs (read from a Verify
dump's oracle_sql.json) and folds each key's canonical column list
through the identical Horner chain mod two primes, summing in HUGEINT;
floats are carried as the separate 1e-6-scaled third fingerprint, so a
last-ulp libm divergence between engines shows up as a float-only
mismatch, never as a discrete-gate failure.

Canonical column lists MUST mirror graft.ScaleChecksum.canon in Horner
order; strings hash via ('0x' || substr(md5(c),1,15))::BIGINT — the
same md5-prefix value graft computes with conv(substring(md5(c),1,15)).

Usage: python3 tools/scale_checksum_duckdb.py <verify_out_dir> <sf_dir> <key> [key ...]
Env: GRAFT_CHECK_THREADS (thread cap for spill control),
     GRAFT_CHECK_MEMORY (duckdb memory_limit, e.g. '40GB').
"""
import sys, os, json, time
import duckdb

A1, M1 = 2654435761, 1000000007
A2, M2 = 40503, 998244353

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def str_hash(c):
    return f"(('0x' || substr(md5({c}), 1, 15))::BIGINT)"


# Mirrors graft.ScaleChecksum.canon: (gate columns in Horner order,
# optional float column).
CANON = {
    "t6_tfidf": (["doc_id", str_hash("term"), "tf", "df", "rk"], "tfidf"),
    "t11_novelty": (["doc_id", "n_bigrams", "novel_bigrams"], "novelty_ratio"),
}


def horner(cols, a, m):
    h = "0"
    for c in cols:
        # pmod: oracle columns here are non-negative, but mirror
        # graft's pmod anyway so the chains stay textually parallel
        h = f"((({h}) * {a} + ((({c})::BIGINT % {m}) + {m}) % {m}) % {m})"
    return h


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    unknown = [k for k in keys if k not in CANON]
    if unknown:
        sys.exit(f"no canonical fingerprint for: {','.join(unknown)}")
    con = duckdb.connect()
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    threads = os.environ.get("GRAFT_CHECK_THREADS")
    if threads:
        con.sql(f"SET threads TO {int(threads)}")
        con.sql("SET preserve_insertion_order=false")
    mem = os.environ.get("GRAFT_CHECK_MEMORY")
    if mem:
        con.sql(f"SET memory_limit='{mem}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    for key in keys:
        gate, fcol = CANON[key]
        f6 = (f"round(({fcol}) * 1000000)::BIGINT % {M1}" if fcol else "0")
        t0 = time.time()
        n, fp1, fp2, fpf = con.sql(
            f"SELECT count(*), "
            f"SUM(({horner(gate, A1, M1)})::HUGEINT), "
            f"SUM(({horner(gate, A2, M2)})::HUGEINT), "
            f"SUM(({f6})::HUGEINT) "
            f"FROM ({oracle[key]}) t").fetchone()
        sec = time.time() - t0
        print(json.dumps({"query": key, "engine": "duckdb",
                          "sf_dir": sf_dir, "n": int(n),
                          "fp1": str(fp1), "fp2": str(fp2),
                          "fpf": str(fpf), "sec": round(sec, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
