#!/bin/bash
# Round-5 presentation refresh: per-dataset Pareto PNGs for every stored
# results dir, REPORT_ALL.md snapshot, and the static website.
# CPU-only (KMB_PLATFORM=cpu).
set -u
cd /root/repo
export KMB_PLATFORM=cpu
LOG=artifacts/r05_finalize.log
for d in results/*/; do
  name=$(basename "$d")
  [ -f "data/${name}.hdf5" ] || continue
  nice -n 5 python plot.py --dataset "$name" >> "$LOG" 2>&1 \
    || echo "PLOT FAILED: $name" >> "$LOG"
done
nice -n 5 python report.py --dataset '*' --format markdown \
  > artifacts/scale/REPORT_ALL.md 2>> "$LOG" || echo "REPORT FAILED" >> "$LOG"
rm -rf website && nice -n 5 python create_website.py --outputdir website \
  --latex >> "$LOG" 2>&1 || echo "WEBSITE FAILED" >> "$LOG"
echo "FINALIZE DONE $(date +%T)" >> "$LOG"
