"""Shared file-precondition helpers (reference overwrite protection).

One implementation of the ``-f``/``--force`` gate (GCI.py:196-197 et al.)
for the pipeline, the report writers and the BED emitters — multi-host
aware: the primary host's view of the filesystem decides, the decision is
broadcast, and EVERY process exits together.  (If only the primary exited,
the surviving processes would hang in the next SPMD collective.)
"""
from __future__ import annotations

import os
import sys


def require_writable(path: str, force: bool) -> None:
    """``sys.exit`` (on all processes) when ``path`` exists and not ``force``."""
    from gci_tpu.parallel.distributed import process_count

    blocked = os.path.exists(path) and not force
    if process_count() > 1:
        import numpy as np
        from jax.experimental import multihost_utils

        # primary's filesystem is authoritative (it is the only writer)
        blocked = bool(
            multihost_utils.broadcast_one_to_all(np.asarray(blocked))
        )
    if blocked:
        sys.exit(
            f'ERROR!!! The file "{path}" exists\nPlease use "-f" or "--force" to rewrite'
        )
