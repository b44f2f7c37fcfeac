#!/bin/bash
# Shuffle-geometry sweep for the events-pack perf flags (VERDICT r12 §wrong-1).
# Varies SPARK_GRAFT_SHUFFLE_PARTITIONS (and one AQE initial-partitions
# config) over q31/q32 at sf10, then probes the four perf-weak queries at
# sf100 with the winning vs pinned geometry. Appends labeled JSON lines to
# bench_sweeps_r14/geom_sweep.jsonl. Run ALONE (quiet machine).
set -u
cd /root/repo
OUT=bench_sweeps_r14/geom_sweep.jsonl
mkdir -p bench_sweeps_r14

run_cfg() {  # label, sfdir, queries, runs, extra env as K=V pairs...
  local label="$1" sfdir="$2" queries="$3" runs="$4"; shift 4
  echo "[sweep] $label starting $(date -u +%H:%M:%S)" >&2
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 \
      GRAFT_BENCH_RUNS="$runs" SPARK_GRAFT_QUERIES="$queries" "$@" \
      sbt -batch "runMain graft.Bench" 2>&1 \
    | grep -E '^\[info\] \{' | sed -E "s/^\[info\] /{\"cfg\":\"$label\",\"bench\":/; s/$/}/" >> "$OUT"
}

# --- sf10: the events pack across shuffle-partition counts (judge's knob) ---
for sp in 32 64 128 256; do
  run_cfg "sf10_sp${sp}" /root/repo/scale_sf10 \
    q1_agg,q15_events_window,q31_sliding_dau,q32_retention 3 \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=$sp
done
# AQE start-wide-coalesce-down geometry (initialPartitionNum=256, advisory 64MB)
run_cfg "sf10_aqe256" /root/repo/scale_sf10 \
  q1_agg,q15_events_window,q31_sliding_dau,q32_retention 3 \
  SPARK_GRAFT_INITIAL_PARTITIONS=256

# --- sf100: the four perf-weak queries, pinned vs scaled geometry ---
for sp in 32 128 256; do
  run_cfg "sf100_sp${sp}" /root/repo/scale_sf100 \
    q1_agg,q15_events_window,q31_sliding_dau,q32_retention 2 \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=$sp
done
run_cfg "sf100_aqe512" /root/repo/scale_sf100 \
  q1_agg,q15_events_window,q31_sliding_dau,q32_retention 2 \
  SPARK_GRAFT_INITIAL_PARTITIONS=512

echo "[sweep] done $(date -u +%H:%M:%S)" >&2
