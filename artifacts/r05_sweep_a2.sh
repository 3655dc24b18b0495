#!/bin/bash
# Round-5 chip sweep, phase A2: product families + GloVe-geometry RFF
# retry + (if its ground truth exists) the 2^20 x 2^20 attention config.
# Launch AFTER r05_sweep_a1.sh completes.  One TPU process at a time;
# 80s grant-hygiene gap.
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
sweep product-cube-kde-D3-E1-M10000-N10000-gaussian
sweep product-normal-D784-E1-M10000-N10000-gaussian
sweep product-normal-D256-E16-M20000-N20000-absolute-exponential
# Single chip: the device-sweep run-group needs 8 devices (rows come
# from the committed CPU-mesh sweep), so sharded is excluded here.
sweep product-cube-D3-E1-M50000-N50000-gaussian --exclude tpu-sharded-product
sweep product-cube-D3-E1-M131072-N131072-gaussian --exclude tpu-sharded-product
sweep solver-cube-D3-E1-M50000-N50000-gaussian --exclude tpu-sharded-solver-cg
# GloVe-geometry retry: streaming RFF + serialized build states land the
# rows that OOM'd in round 4 (rank-2048 Nystrom stays legitimately
# infeasible: two 8 GB factor sets never coexist now, but one build plus
# staged data still peaks past HBM with the N-side factors).
sweep attention-normal-D25-E1-M1048576-N10000-exponential --algorithm tpu-rff-product
sweep attention-normal-D25-E1-M1048576-N10000-exponential --algorithm tpu-nystrom-product
if [ -f data/attention-normal-D25-E1-M1048576-N1048576-exponential.hdf5 ]; then
  sweep attention-normal-D25-E1-M1048576-N1048576-exponential
fi
echo "=== A2 ALL DONE $(date +%T)" >> "$LOG"
