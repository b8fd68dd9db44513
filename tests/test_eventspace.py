"""Oracle tests for the event-space depth representation.

Every DepthEvents op must equal the corresponding per-base numpy
computation exactly (the per-base form is the reference semantics:
GCI.py:302-306 increments, :315-329 gap mask, :332-353 two-type max,
:356-390 collapse).
"""
import numpy as np
import pytest

from gci_tpu.depth.eventspace import DepthEvents
from gci_tpu.intervals.collapse import collapse_depth_runs


@pytest.fixture
def rng():
    return np.random.default_rng(20260817)


def random_reads(rng, L, n):
    s = rng.integers(0, max(L, 1), size=n)
    e = np.minimum(s + rng.integers(1, 80, size=n), L)
    return s, e


def per_base(s, e, L):
    d = np.zeros(L, dtype=np.int64)
    for a, b in zip(s, e):
        d[a:b] += 1
    return d


def test_from_reads_matches_per_base(rng):
    for _ in range(40):
        L = int(rng.integers(1, 400))
        s, e = random_reads(rng, L, int(rng.integers(0, 50)))
        ev = DepthEvents.from_reads(s, e, L)
        np.testing.assert_array_equal(ev.materialize(), per_base(s, e, L))
        # canonical form: ascending boundaries, no equal-adjacent values
        assert ev.boundaries[0] == 0
        assert np.all(np.diff(ev.boundaries) > 0)
        assert np.all(ev.values[1:] != ev.values[:-1]) or ev.values.shape[0] <= 1


def test_from_array_round_trip(rng):
    for _ in range(20):
        L = int(rng.integers(1, 300))
        d = rng.integers(0, 4, size=L).astype(np.int64)
        ev = DepthEvents.from_array(d)
        np.testing.assert_array_equal(ev.materialize(), d)


def test_mask_intervals_matches_per_base(rng):
    for _ in range(30):
        L = int(rng.integers(10, 300))
        s, e = random_reads(rng, L, 30)
        d = per_base(s, e, L)
        n_gaps = int(rng.integers(0, 4))
        gs = rng.integers(0, L, size=n_gaps)
        ge = np.minimum(gs + rng.integers(1, 40, size=n_gaps), L)
        gaps = sorted(zip(gs.tolist(), ge.tolist()))
        want = d.copy()
        for a, b in gaps:
            want[a:b] = 0
        got = DepthEvents.from_reads(s, e, L).mask_intervals(gaps)
        np.testing.assert_array_equal(got.materialize(), want)


def test_maximum_matches_per_base(rng):
    for _ in range(30):
        L = int(rng.integers(1, 300))
        s1, e1 = random_reads(rng, L, 25)
        s2, e2 = random_reads(rng, L, 25)
        a = DepthEvents.from_reads(s1, e1, L)
        b = DepthEvents.from_reads(s2, e2, L)
        np.testing.assert_array_equal(
            a.maximum(b).materialize(),
            np.maximum(per_base(s1, e1, L), per_base(s2, e2, L)),
        )


def test_collapse_matches_per_base(rng):
    for _ in range(40):
        L = int(rng.integers(1, 300))
        s, e = random_reads(rng, L, int(rng.integers(0, 40)))
        ev = DepthEvents.from_reads(s, e, L)
        d = per_base(s, e, L)
        for flank in (0, 2, 15):
            for thr in (0, 1):
                assert ev.collapse(-1, thr, flank, 5) == collapse_depth_runs(
                    d, -1, thr, flank, 5
                )


def test_collapse_float_thresholds(rng):
    # plot shading uses (threshold, depth_min*mean] with float bounds
    for _ in range(20):
        L = int(rng.integers(30, 300))
        s, e = random_reads(rng, L, 40)
        ev = DepthEvents.from_reads(s, e, L)
        d = per_base(s, e, L)
        mean = d.mean()
        lo, hi = 0.0, 0.1 * mean
        assert ev.collapse(lo, hi, 15, 0) == collapse_depth_runs(d, lo, hi, 15, 0)


def test_slice_matches_per_base(rng):
    for _ in range(30):
        L = int(rng.integers(10, 300))
        s, e = random_reads(rng, L, 30)
        d = per_base(s, e, L)
        a = int(rng.integers(0, L))
        b = int(rng.integers(a, L + 1))
        got = DepthEvents.from_reads(s, e, L).slice(a, b)
        np.testing.assert_array_equal(got.materialize(), d[a:b])
        assert got.length == b - a


def test_total_and_run_lengths(rng):
    L = 200
    s, e = random_reads(rng, L, 30)
    ev = DepthEvents.from_reads(s, e, L)
    d = per_base(s, e, L)
    assert ev.total() == int(d.sum())
    vals, counts = ev.run_lengths()
    assert int(counts.sum()) == L
    np.testing.assert_array_equal(np.repeat(vals, counts), d)


def test_empty_and_degenerate():
    ev = DepthEvents.from_reads(np.empty(0, np.int64), np.empty(0, np.int64), 50)
    np.testing.assert_array_equal(ev.materialize(), np.zeros(50, np.int64))
    assert ev.collapse(-1, 0, 15, 0) == [(15, 35)]
    # zero-length reads contribute nothing
    ev2 = DepthEvents.from_reads(np.array([5, 7]), np.array([5, 7]), 20)
    assert ev2.total() == 0


def test_mask_intervals_many_gaps_one_pass(rng):
    """10^4 gaps (fragmented draft assembly shape): oracle parity and
    O((runs+gaps) log) cost — the old per-interval rebuild was
    O(gaps*runs) and would take minutes here."""
    import time

    L = 2_000_000
    s, e = random_reads(rng, L, 5_000)
    d = per_base(s, e, L)
    n_gaps = 10_000
    gs = rng.integers(0, L - 50, size=n_gaps)
    ge = gs + rng.integers(1, 50, size=n_gaps)
    gaps = list(zip(gs.tolist(), ge.tolist()))  # unsorted, overlapping
    want = d.copy()
    for a, b in gaps:
        want[a:b] = 0
    ev = DepthEvents.from_reads(s, e, L)
    t0 = time.perf_counter()
    got = ev.mask_intervals(gaps)
    elapsed = time.perf_counter() - t0
    np.testing.assert_array_equal(got.materialize(), want)
    assert elapsed < 8.0, f"mask_intervals took {elapsed:.2f}s for 1e4 gaps"  # generous: shared-VM wall clock


def test_mask_intervals_edge_cases():
    ev = DepthEvents.from_reads(
        np.array([0, 10], np.int64), np.array([20, 30], np.int64), 40
    )
    # empty list, zero-length interval, interval past the end, full cover
    np.testing.assert_array_equal(
        ev.mask_intervals([]).materialize(), ev.materialize()
    )
    np.testing.assert_array_equal(
        ev.mask_intervals([(5, 5)]).materialize(), ev.materialize()
    )
    want = ev.materialize()
    want[35:] = 0
    np.testing.assert_array_equal(
        ev.mask_intervals([(35, 100)]).materialize(), want
    )
    np.testing.assert_array_equal(
        ev.mask_intervals([(0, 40)]).materialize(), np.zeros(40, np.int64)
    )
