#!/usr/bin/env python
"""CLI entry point — same public surface as the reference (main.py:20-70):

    python main.py --config configs/smmnist_DDPM_big5.yml --data_path DATA \\
        --exp EXP [--train|--video_gen|--sample|--test|--fast_fid] \\
        [--config_mod sampling.subsample=100 model.ngf=64 ...]

Config YAML -> nested namespace; `--config_mod section.key=value` typed
overrides; experiment dirs with config snapshots.
"""

import argparse
import logging
import os
import shutil
import sys
import traceback

import yaml

from mcvd_tpu.config import (
    apply_config_mods,
    clone_config,
    dict2namespace,
    namespace2dict,
    save_config,
    validate_config,
)


def parse_args_and_config():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, required=True, help="Path to the config file")
    parser.add_argument("--data_path", type=str, default="datasets", help="Path to the dataset")
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--exp", type=str, default="exp", help="Experiment directory")
    parser.add_argument("--comment", type=str, default="")
    parser.add_argument("--verbose", type=str, default="info")
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--sample", action="store_true")
    parser.add_argument("--video_gen", action="store_true")
    parser.add_argument("--fast_fid", action="store_true")
    parser.add_argument("--resume_training", action="store_true")
    parser.add_argument("-i", "--image_folder", type=str, default="images")
    parser.add_argument("-v", "--video_folder", type=str, default="videos")
    parser.add_argument("--ckpt", type=int, default=None,
                        help="Checkpoint # to load from (sample/video_gen/test/fast_fid)")
    parser.add_argument("--end_ckpt", type=int, default=None,
                        help="Checkpoint # to sweep until (test/fast_fid)")
    parser.add_argument("--freq", type=int, default=None,
                        help="Checkpoint sweep frequency (test/fast_fid)")
    parser.add_argument("--start_at", type=int, default=0)
    parser.add_argument("--subsample", type=int, default=None,
                        help="Override config.sampling.subsample")
    parser.add_argument("--final_only", type=eval, default=None,
                        choices=[True, False],
                        help="Save only the final image vs all sampling steps")
    parser.add_argument("--no_ema", action="store_true",
                        help="Don't use the EMA weights for eval")
    parser.add_argument("--fid_num_samples", type=int, default=None,
                        help="Override config.fast_fid.num_samples")
    parser.add_argument("--fid_batch_size", type=int, default=None,
                        help="Override config.fast_fid.batch_size")
    parser.add_argument("--no_pr", action="store_true",
                        help="Skip precision/recall in fast_fid (FID only)")
    parser.add_argument("--pr_nn_k", type=int, default=None,
                        help="Override config.fast_fid.pr_nn_k")
    parser.add_argument("--feats_dir", type=str, default=None,
                        help="Dir with precomputed real Inception features (.npy)")
    parser.add_argument("--stats_dir", type=str, default=None,
                        help="Dir with precomputed FID stats (.npz: mu, sigma)")
    parser.add_argument("--ni", action="store_true", help="No interaction")
    parser.add_argument("--interact", action="store_true", help="(no-op, parity)")
    parser.add_argument("--config_mod", nargs="*", default=[],
                        help="Overrides: section.key=value ...")
    args = parser.parse_args()

    with open(args.config, "r") as f:
        config = dict2namespace(yaml.safe_load(f))
    config = apply_config_mods(config, args.config_mod)
    # flag-level overrides (reference: main.py:129-151 semantics)
    if args.subsample is not None:
        config.sampling.subsample = args.subsample
    if args.final_only is not None:
        config.sampling.final_only = args.final_only
    if args.no_ema:
        config.model.ema = False
    if args.fid_num_samples is not None:
        config.fast_fid.num_samples = args.fid_num_samples
    if args.fid_batch_size is not None:
        config.fast_fid.batch_size = args.fid_batch_size
    if args.pr_nn_k is not None:
        config.fast_fid.pr_nn_k = args.pr_nn_k
    config = validate_config(config)

    args.log_path = os.path.join(args.exp, "logs")
    os.makedirs(args.log_path, exist_ok=True)
    args.image_folder = os.path.join(args.exp, "image_samples", args.image_folder)
    args.video_folder = os.path.join(args.exp, "video_samples", args.video_folder)

    # snapshot config + args next to logs (reference: main.py:156-160)
    save_config(config, os.path.join(args.log_path, "config.yml"))
    with open(os.path.join(args.log_path, "args.yml"), "w") as f:
        yaml.safe_dump({k: v for k, v in vars(args).items() if isinstance(v, (str, int, float, bool, list))}, f)

    level = getattr(logging, args.verbose.upper(), logging.INFO)
    handlers = [logging.StreamHandler(), logging.FileHandler(os.path.join(args.log_path, "stdout.txt"))]
    logging.basicConfig(
        level=level,
        format="%(levelname)s - %(filename)s - %(asctime)s - %(message)s",
        handlers=handlers,
    )
    return args, config


def snapshot_code(exp_dir: str) -> str:
    """Self-archive the full source tree to <exp>/code/ at train start
    (reference: copy_scripts, main.py:333-356): package + configs + root
    scripts, plus the git SHA and dirty diff when available, so any
    experiment can be reproduced from its own directory."""
    import subprocess

    root = os.path.dirname(os.path.abspath(__file__))
    dst = os.path.join(exp_dir, "code")
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(dst, exist_ok=True)
    ignore = shutil.ignore_patterns("__pycache__", "*.pyc", "*.so", ".git")
    for name in ("mcvd_tpu", "configs", "tools"):
        src = os.path.join(root, name)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(dst, name), ignore=ignore)
    for name in ("main.py", "bench.py", "load_model_from_ckpt.py",
                 "quick_sample.py", "__graft_entry__.py"):
        if os.path.isfile(os.path.join(root, name)):
            shutil.copy2(os.path.join(root, name), dst)
    try:
        run = lambda *cmd: subprocess.run(
            cmd, cwd=root, capture_output=True, text=True, timeout=10).stdout
        sha = run("git", "rev-parse", "HEAD").strip()
        if sha:
            with open(os.path.join(dst, "GIT_STATE"), "w") as f:
                f.write(f"commit: {sha}\n")
                diff = run("git", "diff", "HEAD")
                if diff:
                    f.write("\n# uncommitted diff at launch:\n" + diff)
    except Exception:
        pass
    return dst


def main():
    args, config = parse_args_and_config()
    logging.info("args: %s", {k: v for k, v in vars(args).items()})

    from mcvd_tpu.utils import maybe_init_distributed, setup_jax

    setup_jax()
    if maybe_init_distributed():
        import jax

        logging.info("distributed: process %d/%d, %d global devices",
                     jax.process_index(), jax.process_count(),
                     len(jax.devices()))
    from mcvd_tpu.runners import Runner

    try:
        is_train = not (args.video_gen or args.sample or args.test
                        or args.fast_fid)
        if is_train:
            import jax

            if jax.process_index() == 0:
                logging.info("code snapshot: %s", snapshot_code(args.exp))
        runner = Runner(args, config, clone_config(config))
        if args.video_gen:
            runner.video_gen(ckpt=args.ckpt)
        elif args.sample:
            runner.sample(ckpt=args.ckpt)
        elif args.test:
            runner.test(begin_ckpt=args.ckpt, end_ckpt=args.end_ckpt,
                        freq=args.freq)
        elif args.fast_fid:
            runner.fast_fid()
        else:
            runner.train()
    except Exception:
        logging.error(traceback.format_exc())
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
