#!/usr/bin/env python
"""Dataset conversion CLI (reference: datasets/*_convert.py standalone CLIs).

    python tools/convert_dataset.py kth --in /path/KTH --out /path/KTH64_h5
    python tools/convert_dataset.py bair --in /path/BAIR --out /path/BAIR_h5 --split train
    python tools/convert_dataset.py cityscapes --in /path/CS --out /path/CS_h5 --split train
    python tools/convert_dataset.py ucf101 --in /path/UCF-101 --splits /path/ucfTrainTestlist --out /path/UCF_h5
"""

import argparse
import sys

sys.path.insert(0, ".")

from mcvd_tpu.data import converters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=["kth", "bair", "cityscapes", "ucf101"])
    p.add_argument("--in", dest="in_dir", required=True)
    p.add_argument("--out", dest="out_dir", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--splits", default=None, help="ucf101 trainlist/testlist dir")
    p.add_argument("--force", action="store_true")
    args = p.parse_args()

    if args.dataset == "kth":
        n = converters.kth_convert(args.in_dir, args.out_dir,
                                   image_size=args.image_size or 64, force=args.force)
    elif args.dataset == "bair":
        n = converters.bair_convert(args.in_dir, args.out_dir, split=args.split,
                                    force=args.force)
    elif args.dataset == "cityscapes":
        n = converters.cityscapes_convert(args.in_dir, args.out_dir, split=args.split,
                                          image_size=args.image_size or 128,
                                          force=args.force)
    else:
        assert args.splits, "--splits required for ucf101"
        n = converters.ucf101_convert(args.in_dir, args.splits, args.out_dir,
                                      image_size=args.image_size or 64,
                                      force=args.force)
    print("converted:", n)


if __name__ == "__main__":
    main()
