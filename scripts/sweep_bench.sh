#!/bin/bash
# Headline-bench config sweep — one child process per config with retries
# (relay backend hangs nondeterministically; bench.py self-retries too).
# Usage: bash scripts/sweep_bench.sh
cd "$(dirname "$0")/.."
CONFIGS=(
  ""                                                        # baseline 64/64 16p8a1e
  "BENCH_BIN_SIZE=32 BENCH_CBIN=128"
  "BENCH_AZ_TILE=4 BENCH_EL_TILE=2"
  "BENCH_AZ_TILE=16 BENCH_POSES_PER_TILE=8"
  "BENCH_BIN_SIZE=32 BENCH_CBIN=96 BENCH_AZ_TILE=4 BENCH_EL_TILE=2"
  # bins_per_super sweep: trades level-0 test count (n_super) against the
  # level-1 top_k key count (c_super*S) — the cull phase's dominant sort
  "BENCH_BPS=32"
  "BENCH_BPS=16"
  # 3-level cull: candidate sets PROVEN identical to 2-level at cm=32 on
  # this workload (CPU-checked), with 3.4x fewer level-1 top_k keys and
  # 3.4x fewer level-1 box tests — adopt as default if it wins here
  "BENCH_CMID=32"
  "BENCH_CMID=32 BENCH_BIN_SIZE=32 BENCH_CBIN=128"
  # CPU-measured pair-work minimum (TPU_NOTES: B=64 8p16a has 1.24x fewer
  # pairs than the 16p8a baseline, at G=16 hoisting overhead)
  "BENCH_AZ_TILE=16 BENCH_POSES_PER_TILE=8 BENCH_BIN_SIZE=32 BENCH_CBIN=128"
)
for cfg in "${CONFIGS[@]}"; do
  echo "--- config: ${cfg:-baseline}"
  env $cfg BENCH_ATTEMPTS=2 BENCH_TIMEOUT=840 python bench.py
done
