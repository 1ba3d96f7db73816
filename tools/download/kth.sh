#!/usr/bin/env bash
# Download raw KTH actions and convert to the sharded h5 layout.
# Usage: tools/download/kth.sh TARGET_DIR   (needs network; see
# tools/get_datasets.md for sources — reference analog: datasets/kth_download.sh)
set -euo pipefail
T=${1:?Usage: kth.sh TARGET_DIR}
mkdir -p "$T/raw"
for c in walking jogging running handwaving handclapping boxing; do
    wget -c "http://www.nada.kth.se/cvap/actions/${c}.zip" -P "$T/raw"
    mkdir -p "$T/raw/$c"
    unzip -o "$T/raw/${c}.zip" -d "$T/raw/$c"
    rm "$T/raw/${c}.zip"
done
# flatten: the converter scans for person*_<class>_*.avi
find "$T/raw" -name '*.avi' -exec mv {} "$T/raw/" \;
python "$(dirname "$0")/../convert_dataset.py" kth --in "$T/raw" --out "$T/KTH64_h5"
