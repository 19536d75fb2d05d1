"""CLI argument parsing (same public flags as the reference scripts/args.py).

Thin re-export: the implementation lives in :mod:`ucod_dpl_tpu.cli` so the
installed console commands and these repo scripts share one surface.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucod_dpl_tpu.cli import parse_args  # noqa: E402,F401
