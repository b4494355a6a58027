#!/bin/sh
# Single-image demo wrapper (reference demo/run_demo_FiveK.sh:3):
#   sh scripts/run_demo_fivek.sh <img> <run_dir> <request words...>
set -e
IMG="$1"; RUN_DIR="$2"; shift 2
cd "$(dirname "$0")/.."
python -m t2onet_tpu.cli.demo --img "$IMG" --run_dir "$RUN_DIR" \
    --request "$*"
