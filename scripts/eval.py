"""Stage-1 evaluation over the standard COD test sets with LookTwice.

Counterpart of reference ``scripts/eval.py``; delegates to
:func:`ucod_dpl_tpu.cli.eval_main` (also installed as ``ucod-eval``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucod_dpl_tpu.cli import eval_main as main  # noqa: E402

if __name__ == "__main__":
    main()
