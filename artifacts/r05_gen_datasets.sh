#!/bin/bash
# Round-5 dataset generation queue (CPU only; float64 ground truth via
# the native oracle).  Small datasets first so harness sweeps can start
# while the big ones cook.
set -u
cd /root/repo
export KMB_PLATFORM=cpu
LOG=artifacts/r05_gen.log
gen() {
  name="$1"
  if [ -f "data/${name}.hdf5" ]; then
    echo "SKIP ${name} (exists)" >> "$LOG"
    return
  fi
  echo "GEN ${name} $(date +%T)" >> "$LOG"
  nice -n 10 python -u create_dataset.py --dataset "${name}" >> "$LOG" 2>&1
  echo "DONE ${name} rc=$? $(date +%T)" >> "$LOG"
}
gen attention-sphere-D3-E1-M1000-N1000-exponential
gen attention-sphere-D3-E1-M2000-N2000-exponential
gen attention-sphere-D3-E1-M5000-N5000-exponential
gen attention-sphere-D3-E1-M10000-N10000-exponential
gen product-cube-kde-D3-E1-M10000-N10000-gaussian
gen attention-normal-D64-E8-M10000-N10000-exponential
gen solver-normal-D784-E1-M5000-N5000-gaussian
gen product-normal-D784-E1-M10000-N10000-gaussian
gen product-normal-D256-E16-M20000-N20000-absolute-exponential
gen product-cube-D3-E1-M50000-N50000-gaussian
gen solver-cube-D3-E1-M50000-N50000-gaussian
gen attention-cube-D3-E1-M262144-N262144-exponential
# The 2^20 x 2^20 GT is ~1.1e12 float64 pairs (~hours at 2 cores): last.
gen attention-normal-D25-E1-M1048576-N1048576-exponential
echo "ALL DONE $(date +%T)" >> "$LOG"
