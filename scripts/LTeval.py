"""CORAL stage-2 evaluation (UDLR refinement) over the COD test sets.

Counterpart of reference ``scripts/LTeval.py``; delegates to
:func:`ucod_dpl_tpu.cli.lt_eval_main` (also installed as ``ucod-lt-eval``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucod_dpl_tpu.cli import lt_eval_main as main  # noqa: E402

if __name__ == "__main__":
    main()
