#!/usr/bin/env bash
# One-command end-to-end smoke: install -> tests -> run -> plot -> website.
#
# The local equivalent of .github/workflows/benchmarks.yml (reference
# benchmarks.yml:9-37): exercises the full pipeline from a clean checkout
# on the smallest dataset, on a virtual CPU mesh so it needs no TPU.
#
# Usage:  ./smoke.sh [workdir]
# Artifacts (data/, results/, *.png, website/) land in workdir
# (default: a fresh temp dir), never in the repo.
set -euo pipefail

REPO="$(cd "$(dirname "$0")" && pwd)"
WORK="${1:-$(mktemp -d /tmp/kmb_smoke.XXXXXX)}"
DATASET="product-sphere-D3-E1-M1000-N1000-inverse-distance"

# Append (don't overwrite) PYTHONPATH: some environments register jax
# backend plugins through a sitecustomize module reachable only via the
# inherited PYTHONPATH — clobbering it silently unregisters the backend.
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# KMB_PLATFORM forces the jax backend at import time (JAX_PLATFORMS is
# ignored by builds that pin jax_platforms in site customization).
export KMB_PLATFORM="${KMB_PLATFORM:-cpu}"

echo "== smoke: workdir=$WORK dataset=$DATASET"
mkdir -p "$WORK"
cd "$WORK"

echo "== 1/5 install (native lib + algorithm imports)"
python "$REPO/install.py" --skip-jax

echo "== 2/5 unit tests (virtual 8-device CPU mesh)"
python -m pytest "$REPO/tests/" -x -q

echo "== 3/5 benchmark run (5 algorithms, incl. disabled dummies)"
python "$REPO/run.py" --local --runs 2 --timeout 300 --run-disabled \
    --max-n-algorithms 5 --dataset "$DATASET"

echo "== 4/5 plot"
python "$REPO/plot.py" --dataset "$DATASET"

echo "== 5/5 website"
python "$REPO/create_website.py" --outputdir website --latex

test -s "results/$DATASET.png"
test -s website/index.html
echo "== smoke OK: $(ls results/"$DATASET" | wc -l) algorithm dirs," \
     "plot + website built under $WORK"
