#!/usr/bin/env bash
# Run the full benchmark sweep and build the website (the reference's
# create_website_local.sh analog — same shape: run everything, plot, site).
#
# Usage: ./run_all.sh [extra run.py flags, e.g. --hardware TPU --runs 3]
set -euo pipefail

DATASETS=$(python - <<'EOF'
from kmb_tpu.datasets import DATASETS
for name in DATASETS:
    if "M131072" in name or "M50000" in name or "M60000" in name:
        continue  # large-scale entries: run explicitly, not in the sweep
    print(name)
EOF
)

for dataset in $DATASETS; do
  echo "=== $dataset ==="
  python run.py --dataset "$dataset" --local "$@" || echo "FAILED: $dataset"
  python plot.py --dataset "$dataset" || true
done

python create_website.py --outputdir website --latex
echo "Sweep complete: results/ and website/ are populated."
