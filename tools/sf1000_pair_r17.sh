#!/usr/bin/env bash
# Round-17 verdict item 4: SAME-protocol interleaved q31/q32 pair at
# sf1000. The r16 table carried two protocols for q31/q32 flat (in-pack
# 136.2/36.2 s vs solo fresh-JVM 48.9/50.9 s) that disagree by JVM and
# page-cache state. This script pins ONE number per cell:
#   G1 -> D1 -> G2 -> D2, every leg a fresh process, RUNS=1,
#   GRAFT_BENCH_ISOLATE=1 (one JVM per query on the graft side).
# Leg 1 of each engine fills the page cache (disclosed); leg 2 is the
# matched warm pair BASELINE reports. Then one EventsLayoutProbe run
# re-receipts the bucketed layout under the same window.
set -euo pipefail
cd "$(dirname "$0")/.."
SF=scale_sf1000
OUT=bench_sweeps_r17
KEYS=q31_sliding_dau,q32_retention
ORACLE=verify_sf100_3yr/oracle_sql.json
mkdir -p "$OUT"

for leg in 1 2; do
  echo "=== graft leg $leg ($(date -u +%H:%M:%S)) ==="
  env SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 GRAFT_BENCH_RUNS=1 \
      GRAFT_BENCH_ISOLATE=1 SPARK_GRAFT_QUERIES="$KEYS" SPARK_DRIVER_MEM=48g \
      GRAFT_BENCH_OUT="$OUT/graft_sf1000_pair_leg$leg.json" \
      tools/run_graft.sh graft.Bench 2>"$OUT/graft_sf1000_pair_leg$leg.err" \
    | tail -1
  echo "=== duckdb leg $leg ($(date -u +%H:%M:%S)) ==="
  env GRAFT_BENCH_RUNS=1 BENCH_SKIP_WARM=1 BENCH_QUERIES="$KEYS" \
      python3 tools/bench_duckdb.py "$ORACLE" "$SF" \
      "$OUT/duckdb_sf1000_pair_leg$leg.json" \
      2>"$OUT/duckdb_sf1000_pair_leg$leg.err"
  tail -1 "$OUT/duckdb_sf1000_pair_leg$leg.json"
done

echo "=== events layout probe ($(date -u +%H:%M:%S)) ==="
env SPARK_GRAFT_CPUS=32 GRAFT_BENCH_RUNS=1 SPARK_DRIVER_MEM=48g \
    tools/run_graft.sh graft.sources.EventsLayoutProbe "$SF" \
    > "$OUT/events_layout_sf1000_r17.txt" 2>"$OUT/events_layout_sf1000_r17.err"
tail -8 "$OUT/events_layout_sf1000_r17.txt"
echo "=== done ($(date -u +%H:%M:%S)) ==="
