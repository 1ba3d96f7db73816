#!/usr/bin/env bash
# Download BAIR robot pushing (TFRecords) and convert (pure-python reader,
# no TensorFlow). Reference analog: datasets/bair_download.sh
set -euo pipefail
T=${1:?Usage: bair.sh TARGET_DIR}
mkdir -p "$T"
wget -c http://rail.eecs.berkeley.edu/datasets/bair_robot_pushing_dataset_v0.tar -P "$T"
tar -xvf "$T/bair_robot_pushing_dataset_v0.tar" -C "$T"
for split in train test; do
    python "$(dirname "$0")/../convert_dataset.py" bair \
        --in "$T/softmotion30_44k" --out "$T/BAIR_h5" --split "$split"
done
