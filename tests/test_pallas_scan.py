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


@pytest.mark.skipif(
    __import__("os").environ.get("GCI_TPU_TESTS") != "1",
    reason="compiled-kernel exactness needs a real TPU; set GCI_TPU_TESTS=1",
)
def test_fused_scan_large_magnitude_deltas_compiled_tpu(tmp_path):
    """The hi/lo 16-bit split exactness on the COMPILED kernel (not
    interpret mode): the riskiest part of the MXU lane-scan runs on real
    hardware.  Opt-in because the test session pins JAX to CPU and a cold
    Mosaic compile can take minutes; run in a clean subprocess that keeps
    the environment's default (TPU) platform."""
    import os
    import subprocess
    import sys

    script = tmp_path / "tpu_check.py"
    script.write_text(
        "import numpy as np\n"
        "from gci_tpu.utils.jaxcache import enable_compile_cache\n"
        "from gci_tpu.depth.pallas_scan import LANES, fused_depth_scan\n"
        "enable_compile_cache()\n"
        "rng = np.random.default_rng(7)\n"
        "rows = 8\n"
        "total = 2 * rows * LANES\n"
        "delta = rng.integers(-(2**23), 2**23, size=total).astype(np.int32)\n"
        "valid = np.ones(total, dtype=np.int8)\n"
        "depth, rise, fall = fused_depth_scan(delta, valid, -1, 0, rows=rows)\n"
        "np.testing.assert_array_equal(\n"
        "    np.asarray(depth), np.cumsum(delta).astype(np.int32))\n"
        "# the packed production kernel, compiled, vs its XLA oracle\n"
        "from gci_tpu.depth.pallas_scan import (\n"
        "    fused_depth_scan_flags, fused_depth_scan_flags_xla)\n"
        "flags = ((rng.random(total) < 0.1).astype(np.int8)\n"
        "         + (rng.random(total) < 0.9).astype(np.int8) * 2)\n"
        "d2, o2 = fused_depth_scan_flags(delta, flags, -1, 0, rows=rows)\n"
        "dw, ow = fused_depth_scan_flags_xla(delta, flags, -1, 0)\n"
        "np.testing.assert_array_equal(np.asarray(d2), np.asarray(dw))\n"
        "np.testing.assert_array_equal(np.asarray(o2), np.asarray(ow))\n"
        "# the folded-input packed-word kernel, compiled, vs its XLA twin\n"
        "from gci_tpu.depth.pallas_scan import (\n"
        "    fused_depth_scan_packed, fused_depth_scan_packed_xla)\n"
        "word = np.zeros(total, np.int32)\n"
        "sidx = np.sort(rng.integers(0, total - 64, 40))\n"
        "np.add.at(word, sidx, 1 << 2)\n"
        "np.add.at(word, sidx + rng.integers(1, 64, 40), -(1 << 2))\n"
        "word[0] += 1  # valid everywhere\n"
        "word[100] += 2\n"
        "word[400] -= 2  # one gap interval\n"
        "d3, o3 = fused_depth_scan_packed(word, -1, 0, rows=rows)\n"
        "dp, op = fused_depth_scan_packed_xla(word, -1, 0)\n"
        "np.testing.assert_array_equal(np.asarray(d3), np.asarray(dp))\n"
        "np.testing.assert_array_equal(np.asarray(o3), np.asarray(op))\n"
        "print('TPU_COMPILED_OK')\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, str(script)], env=env, cwd=repo,
        capture_output=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr.decode(errors="replace")[-3000:]
    assert b"TPU_COMPILED_OK" in r.stdout


def test_fused_scan_flags_matches_xla(rng):
    """Packed-stream kernel (gap+valid in one byte; rise/fall/change bits
    in one byte) vs the XLA oracle, randomized."""
    from gci_tpu.depth.pallas_scan import (
        fused_depth_scan_flags,
        fused_depth_scan_flags_xla,
    )

    rows = 8
    for trial in range(6):
        n_chunks = int(rng.integers(1, 4))
        total = n_chunks * rows * LANES
        delta = np.zeros(total, np.int32)
        idx = rng.integers(0, total, 500)
        np.add.at(delta, idx, 1)
        np.add.at(delta, np.minimum(idx + rng.integers(1, 300, 500), total - 1), -1)
        flags = (
            (rng.random(total) < 0.1).astype(np.int8)  # gaps
            + (rng.random(total) < 0.9).astype(np.int8) * 2  # valid
        )
        lo, hi = -1, int(rng.integers(0, 3))
        got = fused_depth_scan_flags(
            delta, flags, lo, hi, rows=rows, interpret=True
        )
        want = fused_depth_scan_flags_xla(delta, flags, lo, hi)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
        np.testing.assert_array_equal(
            np.asarray(got[1]), np.asarray(want[1]), err_msg=f"trial {trial}"
        )


def test_fused_scan_flags_equivalent_to_masked(rng):
    """The packed kernel's bits decode to exactly the unpacked kernel's
    three streams (same math, fewer streams)."""
    from gci_tpu.depth.pallas_scan import (
        fused_depth_scan_flags,
        fused_depth_scan_masked,
    )

    rows = 8
    total = 3 * rows * LANES
    delta = np.zeros(total, np.int32)
    idx = rng.integers(0, total, 800)
    np.add.at(delta, idx, 1)
    np.add.at(delta, np.minimum(idx + 120, total - 1), -1)
    gap = (rng.random(total) < 0.08).astype(np.int8)
    valid = (rng.random(total) < 0.95).astype(np.int8)
    flags = gap + valid * 2
    d1, r1, f1, c1 = fused_depth_scan_masked(
        delta, gap, valid, -1, 0, rows=rows, interpret=True
    )
    d2, out = fused_depth_scan_flags(delta, flags, -1, 0, rows=rows, interpret=True)
    out = np.asarray(out)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(r1), out & 1)
    np.testing.assert_array_equal(np.asarray(f1), (out >> 1) & 1)
    np.testing.assert_array_equal(np.asarray(c1), (out >> 2) & 1)


def _random_disjoint_events(rng, total, n, max_len):
    """(starts, stops) of sorted DISJOINT intervals (the packed word's
    precondition: event prefix sums stay in {0, 1})."""
    cuts = np.sort(rng.choice(total, size=2 * n, replace=False))
    return cuts[0::2], cuts[1::2]


def test_fused_scan_packed_matches_xla(rng):
    """Folded-input packed-word kernel vs its XLA twin, randomized."""
    from gci_tpu.depth.pallas_scan import (
        fused_depth_scan_packed,
        fused_depth_scan_packed_xla,
    )

    rows = 8
    for trial in range(6):
        n_chunks = int(rng.integers(1, 4))
        total = n_chunks * rows * LANES
        word = np.zeros(total, np.int32)
        idx = rng.integers(0, total, 500)
        np.add.at(word, idx, 1 << 2)
        np.add.at(
            word, np.minimum(idx + rng.integers(1, 300, 500), total - 1),
            -(1 << 2),
        )
        gs, ge = _random_disjoint_events(rng, total, 12, 200)
        np.add.at(word, gs, 2)
        np.add.at(word, ge, -2)
        vs, ve = _random_disjoint_events(rng, total, 8, 400)
        np.add.at(word, vs, 1)
        np.add.at(word, ve, -1)
        lo, hi = -1, int(rng.integers(0, 3))
        got = fused_depth_scan_packed(word, lo, hi, rows=rows, interpret=True)
        want = fused_depth_scan_packed_xla(word, lo, hi)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
        np.testing.assert_array_equal(
            np.asarray(got[1]), np.asarray(want[1]), err_msg=f"trial {trial}"
        )


def test_fused_scan_packed_equivalent_to_flags(rng):
    """The packed word's outputs decode to exactly the r4 flags kernel's
    streams (same math, one fewer input stream), bit3 = the gap indicator."""
    from gci_tpu.depth.pallas_scan import (
        fused_depth_scan_flags,
        fused_depth_scan_packed,
    )

    rows = 8
    total = 3 * rows * LANES
    delta = np.zeros(total, np.int32)
    idx = rng.integers(0, total, 800)
    np.add.at(delta, idx, 1)
    np.add.at(delta, np.minimum(idx + 120, total - 1), -1)
    gs, ge = _random_disjoint_events(rng, total, 10, 150)
    vs, ve = _random_disjoint_events(rng, total, 6, 500)
    gd = np.zeros(total, np.int32)
    np.add.at(gd, gs, 1)
    np.add.at(gd, ge, -1)
    vd = np.zeros(total, np.int32)
    np.add.at(vd, vs, 1)
    np.add.at(vd, ve, -1)
    gap = (np.cumsum(gd) > 0).astype(np.int8)
    valid = (np.cumsum(vd) > 0).astype(np.int8)
    word = (delta << 2) + gd * 2 + vd

    d1, o1 = fused_depth_scan_flags(
        delta, gap + valid * 2, -1, 0, rows=rows, interpret=True
    )
    d2, o2 = fused_depth_scan_packed(word, -1, 0, rows=rows, interpret=True)
    o2 = np.asarray(o2)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(o1), o2 & 7)
    np.testing.assert_array_equal(gap, (o2 >> 3) & 1)
