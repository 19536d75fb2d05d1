"""Offline dir-vs-dir COD metric computation.

CLI wrapper over ``ucod_dpl_tpu.utils.metrics.calculate_cod_metrics`` — the
counterpart of the reference's standalone ``calculate_cod_metrics``
(``engine/utils/metrics/metric.py:76-122``): score a directory of predicted
masks against ground truth without re-running the model.

    python scripts/compute_metrics.py --gt-dir data/CHAMELEON/gt \\
        --pred-dir work/logs/preds/CHAMELEON [--json out.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gt-dir", required=True)
    ap.add_argument("--pred-dir", required=True)
    ap.add_argument("--json", default=None, help="also write the result dict here")
    args = ap.parse_args()

    from ucod_dpl_tpu.utils.metrics import calculate_cod_metrics

    result = calculate_cod_metrics(args.gt_dir, args.pred_dir)
    for k, v in result.items():
        print(f"{k}: {v:.4f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({k: round(float(v), 6) for k, v in result.items()}, f, indent=2)


if __name__ == "__main__":
    main()
