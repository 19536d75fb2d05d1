"""Stage-1 evaluation over the standard COD test sets with LookTwice.

Counterpart of reference ``scripts/eval.py``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.args import parse_args
from scripts.common import init_cfg

DEFAULT_DATASETS = ["CHAMELEON", "TE-CAMO", "TE-COD10K", "NC4K"]


def main():
    args = parse_args("UCOD-DPL stage-1 eval (LookTwice)")
    cfg = init_cfg(args, mode="eval")
    datasets = args.datasets.split(",") if args.datasets else DEFAULT_DATASETS

    import os

    from ucod_dpl_tpu.engine import Runner
    from ucod_dpl_tpu.utils import set_random_seed
    from ucod_dpl_tpu.utils.profiling import maybe_profile

    set_random_seed(42)
    results = {}
    fe = None  # built by the first Runner, shared by the rest: the backbone
    # and its jitted programs are dataset-independent, and rebuilding them
    # per test set multiplies the compile/trace startup cost by 4
    with maybe_profile(args.profile, os.path.join(cfg.work_dir, "profile")):
        for dataset in datasets:
            cfg.dataset_cfg.valset_cfg.DATASET = dataset
            print(f"running {dataset}")
            runner = Runner(
                cfg, mode="eval", load_from=args.load_from, feature_extractor=fe
            )
            fe = runner.feature_extractor
            results[dataset] = runner.launch_val_look_twice()
    for name, res in results.items():
        print(name, {k: round(v, 4) for k, v in res.items()})


if __name__ == "__main__":
    main()
