#!/usr/bin/env bash
# Download UCF-101 + official splits and convert.
# Reference analog: datasets/ucf101_download.sh
set -euo pipefail
T=${1:?Usage: ucf101.sh TARGET_DIR}
mkdir -p "$T"
wget -c --no-check-certificate https://www.crcv.ucf.edu/data/UCF101/UCF101.rar -P "$T"
wget -c --no-check-certificate https://www.crcv.ucf.edu/data/UCF101/UCF101TrainTestSplits-RecognitionTask.zip -P "$T"
unrar x -o+ "$T/UCF101.rar" "$T/"
unzip -o "$T/UCF101TrainTestSplits-RecognitionTask.zip" -d "$T"
python "$(dirname "$0")/../convert_dataset.py" ucf101 \
    --in "$T/UCF-101" --splits "$T/ucfTrainTestlist" --out "$T/UCF101_64_h5"
