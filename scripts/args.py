"""CLI argument parsing (same public flags as the reference scripts/args.py)."""

import argparse


def parse_args(description: str = "ucod-dpl-tpu"):
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--config", "-c", help="config file path", required=True)
    parser.add_argument("--work_dir", type=str, default="work_dir", help="work dir")
    parser.add_argument("--resume", type=str, default=None, help="resume from checkpoint")
    parser.add_argument("--load_from", type=str, default=None, help="load from checkpoint")
    parser.add_argument(
        "--refiner_path", type=str, default=None, help="load refiner checkpoint"
    )
    parser.add_argument(
        "--datasets",
        type=str,
        default=None,
        help="comma-separated eval dataset names (overrides the default list)",
    )
    parser.add_argument(
        "--profile",
        action="store_true",
        help="capture a jax.profiler trace under <work_dir>/profile",
    )
    parser.add_argument(
        "--opts",
        nargs=argparse.REMAINDER,
        default=[],
        help="dotted-key config overrides: key value [key value ...]",
    )
    return parser.parse_args()
