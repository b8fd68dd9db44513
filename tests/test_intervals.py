"""Unit tests for interval collapse/merge/complement.

The collapse oracle below is a direct state-machine transcription of the
documented reference scan semantics (GCI.py:356-390) and exists only to
cross-check the vectorized implementation on randomized inputs.
"""
import numpy as np
import pytest

from gci_tpu.intervals import (
    collapse_depth_runs,
    complement_intervals,
    distance_merge,
)


def oracle_collapse(depth_list, leftmost, rightmost, flank_len, start_pos):
    out = []
    start_flag = 0
    end_flag = 1
    chr_len = len(depth_list)
    start = None
    for i, depth in enumerate(depth_list[flank_len : chr_len - flank_len]):
        if leftmost < depth <= rightmost:
            if start_flag == 0:
                start = i + flank_len
                start_flag = 1
                end_flag = 0
            if i == (chr_len - flank_len * 2 - 1):
                end = i + flank_len + 1
                out.append((start + start_pos, end + start_pos))
        else:
            if end_flag == 0:
                if i > flank_len:
                    end = i + flank_len
                    out.append((start + start_pos, end + start_pos))
                end_flag = 1
                start_flag = 0
    return out


@pytest.mark.parametrize("flank_len", [0, 1, 3, 15])
@pytest.mark.parametrize("threshold", [0, 2])
def test_collapse_matches_oracle_random(rng, flank_len, threshold):
    for trial in range(40):
        n = int(rng.integers(0, 200))
        depth = rng.integers(0, 4, size=n)
        got = collapse_depth_runs(depth, -1, threshold, flank_len, 7)
        want = oracle_collapse(list(depth), -1, threshold, flank_len, 7)
        assert got == want, (trial, n, flank_len, threshold, list(depth))


def test_collapse_drops_early_terminating_run():
    # run ends (first out-of-range index) at scan index <= flank_len: dropped
    flank = 5
    depth = np.ones(40, dtype=np.int64)
    depth[5:8] = 0  # scan indices 0..2, terminates at 3 <= 5 -> dropped
    assert collapse_depth_runs(depth, -1, 0, flank, 0) == []
    depth2 = np.ones(40, dtype=np.int64)
    depth2[5:12] = 0  # terminates at scan idx 7 > 5 -> kept
    assert collapse_depth_runs(depth2, -1, 0, flank, 0) == [(5, 12)]


def test_collapse_final_position_closure():
    flank = 2
    depth = np.ones(20, dtype=np.int64)
    depth[10:] = 0  # run to final scanned index -> end = L - flank
    assert collapse_depth_runs(depth, -1, 0, flank, 0) == [(10, 18)]


def test_collapse_empty_and_short():
    assert collapse_depth_runs(np.zeros(0, dtype=int), -1, 0, 15, 0) == []
    assert collapse_depth_runs(np.zeros(30, dtype=int), -1, 0, 15, 0) == []
    assert collapse_depth_runs(np.zeros(31, dtype=int), -1, 0, 15, 0) == [(15, 16)]


def test_collapse_range_band():
    # (leftmost, rightmost] band semantics used by the plot shading path
    depth = np.array([0, 1, 2, 3, 2, 1, 0], dtype=np.int64)
    assert collapse_depth_runs(depth, 0, 2, 0, 0) == [(1, 3), (4, 6)]


def test_distance_merge_seed_and_tail():
    # seed (start,start) is emitted when first interval is far away
    out = distance_merge([(50, 60)], length=1000, dist_percent=0.001, flank_len=5)
    assert out == [(5, 5), (50, 60)]
    # close leading interval merges into the edge seed
    out = distance_merge([(6, 10)], length=1000, dist_percent=0.005, flank_len=5)
    assert out == [(5, 10)]
    # tail absorption to end
    out = distance_merge([(990, 993)], length=1000, dist_percent=0.005, flank_len=5)
    assert out == [(5, 5), (990, 995)]


def test_distance_merge_chains():
    out = distance_merge(
        [(100, 110), (112, 120), (400, 410)], length=1000, dist_percent=0.005, flank_len=0
    )
    # dist = 5; (0,0)+(100,110) gap 100 > 5; 112-110 <= 5 merges; 400-120 > 5
    # tail: 1000-410 > 5
    assert out == [(0, 0), (100, 120), (400, 410)]


def test_complement_basic():
    assert complement_intervals([], 100, 10) == [80]
    assert complement_intervals([(20, 30)], 100, 10) == [10, 60]
    assert complement_intervals([(10, 30), (40, 50)], 100, 10) == [10, 40]
    # zero-length leading seed interval produces no gap
    assert complement_intervals([(10, 10), (20, 30)], 100, 10) == [10, 60]


def test_complement_explicit_window():
    assert complement_intervals([(25, 30)], 0, 0, start=20, end=40) == [5, 10]


def test_event_space_collapse_matches_per_base(rng):
    from gci_tpu.depth.eventspace import DepthEvents

    def collapse_depth_runs_from_events(s, e, L, lo, hi, flank, start_pos):
        return DepthEvents.from_reads(s, e, L).collapse(lo, hi, flank, start_pos)

    for trial in range(60):
        L = int(rng.integers(1, 300))
        n = int(rng.integers(0, 40))
        s = rng.integers(0, L, size=n)
        e = np.minimum(s + rng.integers(1, 80, size=n), L)
        depth = np.zeros(L, dtype=np.int64)
        for a, b in zip(s, e):
            depth[a:b] += 1
        for flank in (0, 2, 15):
            for thr in (0, 1):
                want = collapse_depth_runs(depth, -1, thr, flank, 5)
                got = collapse_depth_runs_from_events(s, e, L, -1, thr, flank, 5)
                assert got == want, (trial, L, flank, thr, list(s), list(e))
