#!/usr/bin/env bash
# MNIST idx files for (Stochastic)MovingMNIST synthesis (no conversion step:
# the synthesizer reads idx directly; synthetic sprites are used if absent).
set -euo pipefail
T=${1:?Usage: mnist.sh TARGET_DIR}
mkdir -p "$T"
for f in train-images-idx3-ubyte t10k-images-idx3-ubyte; do
    wget -c "https://ossci-datasets.s3.amazonaws.com/mnist/${f}.gz" -P "$T"
    gunzip -kf "$T/${f}.gz"
done
