#!/bin/bash
# Round-5 CPU-tier sweep (host baselines for the new datasets).
# Pure CPU (KMB_PLATFORM=cpu): safe to run alongside the chip chain.
# Subprocess mode gives each variant a watchdog — the float16 safe-
# sqdists path at D=784 is legitimately infeasible on this host and
# records a .failed instead of stalling the sweep.
set -u
cd /root/repo
LOG=artifacts/r05_sweep_cpu.log
export KMB_PLATFORM=cpu
sweep() {
  name="$1"; shift
  echo "=== SWEEP ${name} $(date +%T)" >> "$LOG"
  nice -n 5 python -u run.py --dataset "${name}" --hardware CPU \
    --timeout 1500 "$@" >> "$LOG" 2>&1
  echo "=== DONE ${name} rc=$? $(date +%T)" >> "$LOG"
}
sweep attention-sphere-D3-E1-M1000-N1000-exponential
sweep attention-sphere-D3-E1-M2000-N2000-exponential
sweep attention-sphere-D3-E1-M5000-N5000-exponential
sweep attention-sphere-D3-E1-M10000-N10000-exponential
sweep product-cube-kde-D3-E1-M10000-N10000-gaussian
sweep attention-normal-D64-E8-M10000-N10000-exponential
sweep solver-normal-D784-E1-M5000-N5000-gaussian
sweep product-normal-D784-E1-M10000-N10000-gaussian
sweep product-normal-D256-E16-M20000-N20000-absolute-exponential
sweep product-cube-D3-E1-M50000-N50000-gaussian
# Scale rows: the streaming float64 oracle is the meaningful CPU
# baseline (a materialized bruteforce K at M >= 131072 exceeds RAM and
# a dense LAPACK solve at M >= 50000 exceeds any budget; solver-cube-
# M50000 has no feasible CPU algorithm and is chip-only).
sweep product-cube-D3-E1-M131072-N131072-gaussian --algorithm native-product
sweep attention-cube-D3-E1-M262144-N262144-exponential --algorithm native-product
echo "=== B ALL DONE $(date +%T)" >> "$LOG"
