"""Stage-1 UCOD-DPL training entry point (counterpart of scripts/train.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.args import parse_args
from scripts.common import init_cfg


def main():
    args = parse_args("UCOD-DPL stage-1 training")
    cfg = init_cfg(args, mode="train")

    import os

    from ucod_dpl_tpu.engine import Runner
    from ucod_dpl_tpu.utils import set_random_seed
    from ucod_dpl_tpu.utils.profiling import maybe_profile

    set_random_seed(42)
    runner = Runner(cfg, mode="train", load_from=args.load_from)
    with maybe_profile(args.profile, os.path.join(cfg.work_dir, "profile")):
        runner.launch_train()


if __name__ == "__main__":
    main()
