"""Shared entry-script plumbing: config init with work_dir derivation.

Thin re-export: the implementation lives in :mod:`ucod_dpl_tpu.cli` so the
installed console commands and these repo scripts share one surface.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucod_dpl_tpu.cli import init_cfg  # noqa: E402,F401
