"""Shared entry-script plumbing: config init with work_dir derivation."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucod_dpl_tpu.config import load_config  # noqa: E402


def init_cfg(args, mode: str):
    cfg = load_config(args.config, overrides=args.opts or None)
    cfg.mode = mode
    cfg.dataset_cfg.valset_cfg.keep_size = mode != "train"
    # load_from/refiner_path flow to the Runner constructors directly (the
    # entry scripts pass args.*) — mirroring them into dead cfg keys here
    # would mislead config authors into expecting a cfg-driven load path
    if args.resume:
        cfg.train_cfg.resume = args.resume  # consumed by TrainLoop._resume
    # work_dir derived from the config path, as the reference does
    # (scripts/train.py:14-18)
    cfg_dir = os.path.dirname(os.path.abspath(args.config))
    try:
        rel = os.path.relpath(cfg_dir, os.path.abspath("./configs"))
    except ValueError:
        rel = os.path.basename(cfg_dir)
    if rel.startswith(".."):
        rel = os.path.basename(cfg_dir)
    cfg.work_dir = os.path.join(
        args.work_dir, rel, os.path.splitext(os.path.basename(args.config))[0]
    )
    os.makedirs(cfg.work_dir, exist_ok=True)
    # logs/checkpoints live under the derived work_dir — the reference
    # overwrites log_cfg.log_path from work_dir unconditionally
    # (runner.py:133-140), so a base-config DEFAULT must not defeat
    # --work_dir.  An EXPLICIT --opts log_cfg.log_path override, however,
    # is the user speaking and wins.
    if "log_cfg.log_path" not in (args.opts or []):
        cfg.log_cfg.log_path = os.path.join(cfg.work_dir, "logs")
    return cfg
