#!/usr/bin/env bash
# KTH 64x64 prediction (reference: training_scripts.sh KTH row). Expects the
# converted HDF5 tree from: python tools/convert_dataset.py kth --in KTH_raw --out KTH64_h5
set -euo pipefail
DATA=${1:-datasets/KTH64_h5}
EXP=${2:-exp/kth64_big}

python main.py --config configs/kth64_big.yml \
    --data_path "$DATA" --exp "$EXP" --ni
