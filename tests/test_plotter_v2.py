import os

import numpy as np
import pytest

from gci_tpu.viz.plotter_v2 import (
    depth_region_masks,
    parse_fai,
    plot_sequence_v2,
    windowed_stats,
)


def test_windowed_stats_segments():
    d = np.array([0, 5, 5, 5, 5, 0, 3, 3, 3, 0, 0, 9], dtype=np.int64)
    means, starts, ends = windowed_stats(d, window_size=2)
    # segment [1,5): windows [1,2],[3,4]; segment [6,9): [6,7],[8,8]; [11,12): [11,11]
    np.testing.assert_array_equal(starts, [1, 3, 6, 8, 11])
    np.testing.assert_array_equal(ends, [2, 4, 7, 8, 11])
    np.testing.assert_allclose(means, [5, 5, 3, 3, 9])


def test_region_masks():
    d = np.array([0, 0, 2, 3, 10, 0, 1], dtype=np.int64)
    masks = depth_region_masks(d, min_safe_depth=5)
    assert masks["zero"] == [(0, 1), (5, 5)]
    assert masks["low"] == [(2, 3), (6, 6)]


def test_parse_fai(tmp_path):
    p = tmp_path / "x.fai"
    p.write_text("chr1\t1000\t6\t60\t61\nchr2\t500\t1100\t60\t61\n")
    assert parse_fai(str(p)) == {"chr1": 1000, "chr2": 500}


def test_plot_sequence_v2(tmp_path, rng):
    hifi = rng.integers(0, 40, size=5000).astype(np.int64)
    ont = rng.integers(0, 30, size=5000).astype(np.int64)
    hifi[100:300] = 0
    out = plot_sequence_v2(
        "chrT", hifi, ont, window_size=200, output_dir=str(tmp_path),
        output_format="png",
    )
    assert out.endswith("chrT.png") and os.path.getsize(out) > 10000
    # length mismatch must raise
    with pytest.raises(ValueError):
        plot_sequence_v2("chrT", hifi, ont[:100], output_dir=str(tmp_path))


def test_plotter_v2_cli(tmp_path, rng):
    from gci_tpu.io.depth_file import write_depth_gz
    from gci_tpu.tools.plotter_v2 import main

    depths = {"c1": rng.integers(0, 30, size=3000).astype(np.int64)}
    dp = str(tmp_path / "h.depth.gz")
    write_depth_gz(dp, depths)
    fai = str(tmp_path / "r.fai")
    with open(fai, "w") as f:
        f.write("c1\t3000\t4\t60\t61\n")
    outdir = str(tmp_path / "imgs")
    main(["-r", fai, "--hifi", dp, "-o", outdir, "-f", "png", "-w", "100"])
    assert os.path.exists(f"{outdir}/c1.png")
    main([
        "-r", fai, "--hifi", dp, "-o", outdir, "-f", "png", "-w", "100",
        "--region", "c1:500-1500",
    ])
    assert os.path.exists(f"{outdir}/c1_500-1500.png")


def test_cap_depth_u16():
    from gci_tpu.viz.plotter_v2 import cap_depth_u16

    d = np.array([0, 5, 65535, 70000, 123456], dtype=np.int64)
    got = cap_depth_u16(d)
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, [0, 5, 65535, 65535, 65535])
    # reference DepthParser drops negatives (depth_plotter_v2.py:99-101)
    np.testing.assert_array_equal(
        cap_depth_u16(np.array([3, -1, 7], np.int64)), [3, 7]
    )


def test_iter_depth_targets_streaming(tmp_path, rng):
    from gci_tpu.io.depth_file import (
        iter_depth_targets,
        read_depth_gz,
        write_depth_gz,
    )

    depths = {
        "a": rng.integers(0, 80000, size=5000).astype(np.int64),
        "b": np.zeros(0, np.int64),
        "c": rng.integers(0, 9, size=3001).astype(np.int64),
    }
    p = str(tmp_path / "d.depth.gz")
    write_depth_gz(p, depths)
    want, _ = read_depth_gz(p)
    # tiny chunks force header/value splits across chunk boundaries
    got = dict(iter_depth_targets(p, chunk_bytes=777))
    assert list(got) == list(want)
    for t in want:
        np.testing.assert_array_equal(got[t], want[t])


def test_synchronized_reader_early_exit(tmp_path, rng):
    from gci_tpu.io.depth_file import write_depth_gz
    from gci_tpu.viz.plotter_v2 import SynchronizedDepthReader

    h = {t: rng.integers(0, 70000, size=2000).astype(np.int64) for t in "abcd"}
    o = {t: rng.integers(0, 50, size=2000).astype(np.int64) for t in "abcd"}
    ph, po = str(tmp_path / "h.depth.gz"), str(tmp_path / "o.depth.gz")
    write_depth_gz(ph, h)
    write_depth_gz(po, o)

    reader = SynchronizedDepthReader(ph, po, target_sequences={"a", "b"})
    seen = []
    for seq_id, hd, od in reader.read_sequences():
        seen.append(seq_id)
        assert hd.dtype == np.uint16 and od.dtype == np.uint16
        np.testing.assert_array_equal(hd, np.minimum(h[seq_id], 65535))
        np.testing.assert_array_equal(od, o[seq_id])
    # early exit: c and d were never produced (nor inflated)
    assert seen == ["a", "b"]

    # single-file mode
    reader = SynchronizedDepthReader(hifi_file=ph)
    assert [s for s, _, _ in reader.read_sequences()] == list("abcd")


def test_merge_consecutive_windows_anchor_semantics():
    """Reference depth_plotter_v2.py:236-266 — NOTE it is dead code there
    (defined, never called by the drawing path); kept for library-surface
    parity.  Anchor semantics: windows compare against the run's FIRST
    depth, so drifting +0.06/window breaks the run only at cumulative 0.1."""
    import numpy as np

    from gci_tpu.viz.plotter_v2 import merge_consecutive_windows

    pos = np.array([0, 10, 20, 30, 40])
    dep = np.array([1.00, 1.06, 1.12, 1.18, 2.0])
    # run1 anchor 1.00: 1.06 in (<0.1), 1.12 out -> run ends at 10
    # run2 anchor 1.12: 1.18 in, 2.0 out; run3 = [40]
    regions, vals = merge_consecutive_windows(pos, dep)
    assert regions == [(0, 10), (20, 30), (40, 40)]
    assert vals == [1.00, 1.12, 2.0]
    assert merge_consecutive_windows(np.array([]), np.array([])) == ([], [])
