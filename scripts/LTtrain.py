"""CORAL stage-2 (UDLR refiner) training entry point.

Counterpart of reference ``scripts/LTtrain.py`` — note the reference's
stage-2 training loop was never released (loop_CORAL.py:38-39 is a stub);
this framework completes it (see engine/coral_loop.LocalRefineTrainLoop).
Delegates to :func:`ucod_dpl_tpu.cli.lt_train_main` (also installed as
``ucod-lt-train``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucod_dpl_tpu.cli import lt_train_main as main  # noqa: E402

if __name__ == "__main__":
    main()
