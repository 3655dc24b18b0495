#!/bin/bash
# Round-5 chip sweep, phase A1: attention families + D784 solver.
# One TPU process at a time; 80s grant-hygiene gap between processes.
# CPU-tier algorithms are excluded here (phase B runs them on the host
# with KMB_PLATFORM=cpu, off the chip clock).
set -u
cd /root/repo
LOG=artifacts/r05_sweep_tpu.log
sweep() {
  name="$1"; shift
  echo "=== SWEEP ${name} $(date +%T)" >> "$LOG"
  python -u run.py --local --dataset "${name}" \
    --exclude bruteforce-product-blas --exclude bruteforce-solver-blas \
    --exclude native-product "$@" >> "$LOG" 2>&1
  echo "=== DONE ${name} rc=$? $(date +%T)" >> "$LOG"
  sleep 80
}
sweep attention-sphere-D3-E1-M1000-N1000-exponential
sweep attention-sphere-D3-E1-M2000-N2000-exponential
sweep attention-sphere-D3-E1-M5000-N5000-exponential
sweep attention-sphere-D3-E1-M10000-N10000-exponential
sweep attention-normal-D64-E8-M10000-N10000-exponential
sweep solver-normal-D784-E1-M5000-N5000-gaussian
sweep attention-cube-D3-E1-M262144-N262144-exponential
echo "=== A1 ALL DONE $(date +%T)" >> "$LOG"
