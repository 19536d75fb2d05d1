"""Deterministic seeding (counterpart of ``engine/utils/seed.py:6-14``).

JAX randomness is explicit (PRNG keys), so unlike the torch reference we only
need to seed Python/NumPy for the host-side pipeline and export the base key.
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_random_seed(seed: int = 42):
    """Seed python / numpy and return a jax PRNG key.

    PYTHONHASHSEED is exported for CHILD processes only — hash
    randomisation of the running interpreter is fixed at startup and
    cannot be changed here.  Nothing on our live paths iterates
    hash-ordered containers non-deterministically (file lists are
    sorted; dicts preserve insertion order), so this is belt-and-braces
    for user-spawned subprocesses, not a determinism guarantee for the
    current process."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    import jax

    return jax.random.PRNGKey(seed)
