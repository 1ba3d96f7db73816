#!/usr/bin/env bash
# Cityscapes leftImg8bit_sequence requires a (free) account login:
#   https://www.cityscapes-dataset.com/downloads/  -> leftImg8bit_sequence_trainvaltest.zip
# After downloading manually:
#   unzip leftImg8bit_sequence_trainvaltest.zip -d RAW
#   python tools/convert_dataset.py cityscapes --in RAW/leftImg8bit_sequence \
#       --out Cityscapes128_h5 --split train --image_size 128
echo "Cityscapes requires authenticated download; see comments in this script." >&2
exit 1
