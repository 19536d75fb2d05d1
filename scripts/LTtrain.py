"""CORAL stage-2 (UDLR refiner) training entry point.

Counterpart of reference ``scripts/LTtrain.py`` — note the reference's
stage-2 training loop was never released (loop_CORAL.py:38-39 is a stub);
this framework completes it with the shipped IoU-weighted distillation loss
(see engine/coral_loop.LocalRefineTrainLoop).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.args import parse_args
from scripts.common import init_cfg


def main():
    args = parse_args("CORAL stage-2 training")
    cfg = init_cfg(args, mode="train")

    from ucod_dpl_tpu.engine.runner import LocalRefineRunner
    from ucod_dpl_tpu.utils import set_random_seed
    from ucod_dpl_tpu.utils.profiling import maybe_profile

    set_random_seed(42)
    with maybe_profile(args.profile, os.path.join(cfg.work_dir, "profile")):
        runner = LocalRefineRunner(
            cfg, mode="train", load_from=args.load_from, refiner_path=args.refiner_path
        )
        runner.launch_train()


if __name__ == "__main__":
    main()
