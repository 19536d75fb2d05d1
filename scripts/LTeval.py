"""CORAL stage-2 evaluation (UDLR refinement) over the COD test sets.

Counterpart of reference ``scripts/LTeval.py``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.args import parse_args
from scripts.common import init_cfg

DEFAULT_DATASETS = ["CHAMELEON", "TE-CAMO", "TE-COD10K", "NC4K"]


def main():
    args = parse_args("CORAL stage-2 eval (UDLR)")
    cfg = init_cfg(args, mode="eval")
    datasets = args.datasets.split(",") if args.datasets else DEFAULT_DATASETS

    from ucod_dpl_tpu.engine.runner import LocalRefineRunner
    from ucod_dpl_tpu.utils import set_random_seed

    from ucod_dpl_tpu.utils.profiling import maybe_profile

    set_random_seed(42)
    results = {}
    fe = None  # shared across test sets (see scripts/eval.py)
    with maybe_profile(args.profile, os.path.join(cfg.work_dir, "profile")):
        for dataset in datasets:
            cfg.dataset_cfg.valset_cfg.DATASET = dataset
            print(f"running {dataset}")
            runner = LocalRefineRunner(
                cfg, mode="eval", load_from=args.load_from,
                refiner_path=args.refiner_path, feature_extractor=fe,
            )
            fe = runner.feature_extractor
            results[dataset] = runner.launch_val()
    for name, res in results.items():
        print(name, {k: round(v, 4) for k, v in res.items()})


if __name__ == "__main__":
    main()
