#!/usr/bin/env python3
"""Disk-lean DuckDB mirror for x5_image_near_dup at the big decades.

The gate oracle expands one row PER CHARACTER to build the 72-cell
dHash grid — ~10G intermediate rows at sf100, whose group-by spill
outgrows this box's ~50 GB scratch disk even at 8 threads (measured:
IO Error, round 14). The expansion only feeds a per-(doc_id, cell)
aggregate, so this mirror computes that aggregate in doc_id chunks —
each chunk re-runs the ORACLE'S OWN TEXT (the `eligible`/`ch`/`cell`
CTEs, with a chunk predicate string-injected into the eligible filter)
and appends to an accumulator table; the rest of the oracle (bit, sig,
bands, pair join) then runs verbatim against the accumulated cells.
Same SQL, same semantics — only the evaluation order differs, exactly
like GRAFT_CHECK_THREADS=8 was the sf10 answer to the same spill.

Usage: python3 tools/check_x5.py <verify_out_dir> <sf_dir> [chunks=32]
Env: GRAFT_CHECK_THREADS, GRAFT_CHECK_MEMORY (as tools/check.py).
"""
import sys, os, json, time
import duckdb


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    con = duckdb.connect()
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    threads = os.environ.get("GRAFT_CHECK_THREADS")
    if threads:
        con.sql(f"SET threads TO {int(threads)}")
        con.sql("SET preserve_insertion_order=false")
    mem = os.environ.get("GRAFT_CHECK_MEMORY")
    if mem:
        con.sql(f"SET memory_limit='{mem}'")
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")

    sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))["x5_image_near_dup"]
    cut = sql.index("bit AS")
    cell_ctes = sql[:cut].rstrip().rstrip(",")          # WITH eligible, ch, cell
    rest = sql[cut:]                                     # bit AS (...) ... final SELECT
    marker = "WHERE octet_length(encode(text)) >= 72"
    assert marker in cell_ctes, "oracle text changed — update the chunk marker"

    t0 = time.time()
    con.sql("CREATE TABLE cellacc (doc_id BIGINT, k BIGINT, sv HUGEINT, cv BIGINT)")
    for i in range(chunks):
        t1 = time.time()
        chunked = cell_ctes.replace(
            marker, marker + f" AND doc_id % {chunks} = {i}")
        con.sql(f"INSERT INTO cellacc {chunked} SELECT * FROM cell")
        print(f"[x5] chunk {i + 1}/{chunks} ({time.time() - t1:.1f}s)", flush=True)

    # Stage the remainder: sig is only one row per doc, so materialize
    # it and DROP the 360M-row cell accumulator before the pair join —
    # holding both is what pushed the single-query form past the
    # scratch disk (the bit self-join's build side alone is cell-sized).
    sig_cut = rest.index("bands AS")
    sig_ctes = rest[:sig_cut].rstrip().rstrip(",")      # bit AS (...), sig AS (...)
    pair_rest = rest[sig_cut:]                           # bands AS (...) ... SELECT
    con.sql("CREATE TABLE sigacc AS WITH cell AS (SELECT * FROM cellacc), "
            + sig_ctes + " SELECT * FROM sig")
    con.sql("DROP TABLE cellacc")
    print(f"[x5] sig materialized: "
          f"{con.sql('SELECT count(*) FROM sigacc').fetchone()[0]} docs", flush=True)
    final = "WITH sig AS (SELECT * FROM sigacc),\n" + pair_rest
    con.sql("CREATE TABLE expect AS " + final)
    n_exp = con.sql("SELECT count(*) FROM expect").fetchone()[0]
    n_got = con.sql(
        f"SELECT count(*) FROM '{out_dir}/x5_image_near_dup/*.parquet'").fetchone()[0]
    diff = con.sql(f"""
        SELECT count(*) FROM (
          (SELECT a, b, hamming FROM expect
           EXCEPT SELECT a, b, hamming FROM '{out_dir}/x5_image_near_dup/*.parquet')
          UNION ALL
          (SELECT a, b, hamming FROM '{out_dir}/x5_image_near_dup/*.parquet'
           EXCEPT SELECT a, b, hamming FROM expect))""").fetchone()[0]
    if n_exp == n_got and diff == 0:
        print(f"PASS x5_image_near_dup: {n_got} rows "
              f"({chunks} chunks, {time.time() - t0:.1f}s total)")
    else:
        print(f"FAIL x5_image_near_dup: rows graft={n_got} duckdb={n_exp}, "
              f"symmetric diff={diff}")
        sys.exit(1)


if __name__ == "__main__":
    main()
