"""Pseudo-label generation CLI (counterpart of generate_pseudo_label.py).

Delegates to :func:`ucod_dpl_tpu.cli.generate_pseudo_label_main` (also
installed as ``ucod-generate-pseudo-label``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucod_dpl_tpu.cli import generate_pseudo_label_main as main  # noqa: E402

if __name__ == "__main__":
    main()
