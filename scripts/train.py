"""Stage-1 UCOD-DPL training entry point (counterpart of scripts/train.py).

Delegates to :func:`ucod_dpl_tpu.cli.train_main` (also installed as the
``ucod-train`` console command).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucod_dpl_tpu.cli import train_main as main  # noqa: E402

if __name__ == "__main__":
    main()
