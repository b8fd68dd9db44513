"""Fused pallas scan kernel vs numpy oracle (interpret mode on CPU)."""
import numpy as np
import pytest

from gci_tpu.depth.pallas_scan import LANES, fused_depth_scan


@pytest.mark.parametrize("rows", [8, 16])
@pytest.mark.parametrize("n_chunks", [1, 3])
def test_fused_scan_matches_numpy(rng, rows, n_chunks):
    total = n_chunks * rows * LANES
    delta = rng.integers(-2, 3, size=total).astype(np.int32)
    valid = (rng.random(total) < 0.8).astype(np.int8)
    depth, rise, fall = fused_depth_scan(
        delta, valid, -1, 0, rows=rows, interpret=True
    )
    want_depth = np.cumsum(delta).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(depth), want_depth)
    m = (want_depth > -1) & (want_depth <= 0) & (valid != 0)
    prev = np.concatenate(([False], m[:-1]))
    np.testing.assert_array_equal(np.asarray(rise) != 0, m & ~prev)
    np.testing.assert_array_equal(np.asarray(fall) != 0, ~m & prev)


def test_fused_scan_chunk_boundary_run(rng):
    # a run spanning a chunk boundary must not produce spurious edges
    rows = 8
    total = 2 * rows * LANES
    delta = np.zeros(total, dtype=np.int32)
    # depth stays 0 everywhere -> one run over all valid positions
    valid = np.ones(total, dtype=np.int8)
    depth, rise, fall = fused_depth_scan(delta, valid, -1, 0, rows=rows, interpret=True)
    assert np.asarray(rise).sum() == 1 and np.asarray(rise)[0] == 1
    assert np.asarray(fall).sum() == 0


def test_fused_scan_large_magnitude_deltas(rng):
    # pins the MXU lane-scan's 16-bit hi/lo split: deltas large enough that
    # the within-row cumsum crosses the 2^16 boundary both ways and the
    # (hi << 16) + lo recombination must wrap exactly like int32 cumsum
    rows = 8
    total = 2 * rows * LANES
    delta = rng.integers(-(2**23), 2**23, size=total).astype(np.int32)
    valid = np.ones(total, dtype=np.int8)
    depth, rise, fall = fused_depth_scan(delta, valid, -1, 0, rows=rows, interpret=True)
    np.testing.assert_array_equal(np.asarray(depth), np.cumsum(delta).astype(np.int32))
