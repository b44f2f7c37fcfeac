#!/usr/bin/env bash
# Round-16 fifth row-decade receipts (VERDICT r15 item 5): the
# data-dominated pack at sf1000 (500M docs-scale corpus: 50M documents,
# 1B events; ~26 GB parquet), matched against DuckDB on the same files.
#
# Protocol notes (disclosed in BASELINE.md):
# - RUNS=1 both sides (a single graft sweep is ~30 min; DuckDB's d2/d9
#   run ~45-60 min EACH at this decade). graft.Bench still runs its
#   untimed warmup pass first; the DuckDB side sets BENCH_SKIP_WARM=1 —
#   at 26 GB the corpus fits page cache and stays warm from graft's
#   pass over the same files.
# - The pack is the documents+events subset of the r14 sf100 pack
#   protocol: only those two tables are generated at sf1000 (the
#   lineitem queries' scaling story is told by the sf100 full gate;
#   disk on this host cannot hold a 108 GB sf1000 lineitem besides).
# - d6/d8 run on the graft side only; their DuckDB mirror
#   (tools/check_cc.py) is a multi-hour contraction loop at this decade
#   and is run separately (correctness, not timing).
set -euo pipefail
cd "$(dirname "$0")/.."
SF=scale_sf1000
OUT=bench_sweeps_r16
mkdir -p "$OUT"

PACK_GRAFT="c1_curation,d2_minhash_pairs,d6_dup_groups,d8_dedup_apply,d9_incremental_dedup,q31_sliding_dau,q32_retention"
PACK_DUCK="c1_curation,d2_minhash_pairs,d9_incremental_dedup,q31_sliding_dau,q32_retention"

echo "=== graft pack @ $SF ($(date -u +%H:%M:%S)) ==="
env SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 GRAFT_BENCH_RUNS=1 \
    SPARK_GRAFT_QUERIES="$PACK_GRAFT" SPARK_DRIVER_MEM=48g \
    tools/run_graft.sh graft.Bench 2>"$OUT/graft_sf1000_pack.err" \
  | tail -1 >> "$OUT/graft_sf1000_pack.jsonl"
tail -1 "$OUT/graft_sf1000_pack.jsonl"

echo "=== duckdb pack @ $SF ($(date -u +%H:%M:%S)) ==="
env GRAFT_BENCH_RUNS=1 BENCH_SKIP_WARM=1 BENCH_QUERIES="$PACK_DUCK" \
    python3 tools/bench_duckdb.py "$OUT/oracle_sql.json" "$SF" \
    "$OUT/duckdb_sf1000_pack.json" 2>"$OUT/duckdb_sf1000_pack.err"
tail -1 "$OUT/duckdb_sf1000_pack.json"

echo "=== events layout probe @ $SF ($(date -u +%H:%M:%S)) ==="
env SPARK_GRAFT_CPUS=32 GRAFT_BENCH_RUNS=3 SPARK_DRIVER_MEM=48g \
    tools/run_graft.sh graft.sources.EventsLayoutProbe "$SF" \
    > "$OUT/events_layout_sf1000.txt" 2>"$OUT/events_layout_sf1000.err"
tail -6 "$OUT/events_layout_sf1000.txt"
echo "=== done ($(date -u +%H:%M:%S)) ==="
