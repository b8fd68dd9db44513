"""Event-space interval extraction: O(reads), no per-base materialization.

Per-base depth is the prefix sum of read-interval deltas, hence piecewise
constant between event positions.  Issue intervals (``leftmost < d <=
rightmost`` over the flank-trimmed scan window, with the reference's exact
emission quirks, GCI.py:356-390) are therefore computable from the
O(#reads) sorted event list alone — no 3 Gbp array needs to exist.  This
powers whole-genome runs whose wall-clock budget cannot afford
materializing and rescanning per-base arrays (the per-base device path
remains available and is oracle-tested against this).

The heavy lifting lives in :class:`gci_tpu.depth.eventspace.DepthEvents`;
this module keeps the functional entry point used by interval-calling code.

All positions here are *local* to one target.
"""
from __future__ import annotations

import numpy as np

from gci_tpu.depth.eventspace import DepthEvents


def collapse_depth_runs_from_events(
    starts: np.ndarray,
    stops: np.ndarray,
    length: int,
    leftmost: float = -1,
    rightmost: float = 0,
    flank_len: int = 15,
    start_pos: int = 0,
) -> list[tuple[int, int]]:
    """Reference-exact collapse computed from read events (GCI.py:356-390).

    ``starts``/``stops`` are clamped increment slots (stop exclusive), i.e.
    the slots of ``depth[s:e] += 1``.
    """
    return DepthEvents.from_reads(starts, stops, length).collapse(
        leftmost, rightmost, flank_len, start_pos
    )
