import gzip

import pytest

import numpy as np

from gci_tpu.io.depth_file import (
    decode_depth_text,
    encode_depth_text,
    read_depth_gz,
    write_depth_gz,
)


def test_roundtrip(tmp_path, rng):
    depths = {
        "chrA": rng.integers(0, 70000, size=1000).astype(np.int64),
        "chrB": rng.integers(0, 5, size=333).astype(np.int64),
        "empty": np.zeros(0, dtype=np.int64),
    }
    path = str(tmp_path / "x.depth.gz")
    write_depth_gz(path, depths)
    got, lengths = read_depth_gz(path)
    assert list(got) == ["chrA", "chrB", "empty"]
    for k in depths:
        np.testing.assert_array_equal(got[k], depths[k])
    assert lengths == {"chrA": 1000, "chrB": 333, "empty": 0}


def test_text_format_is_reference_layout():
    text = encode_depth_text({"t1": np.array([0, 12, 345])})
    assert text == b">t1\n0\n12\n345\n"


def test_decode_tolerates_concatenated_members(tmp_path):
    # the reference writes per-chunk gzip members concatenated with `cat`
    path = tmp_path / "m.depth.gz"
    with open(path, "wb") as f:
        f.write(gzip.compress(b">a\n1\n2\n"))
        f.write(gzip.compress(b"3\n>b\n9\n"))
    got, lengths = read_depth_gz(str(path))
    np.testing.assert_array_equal(got["a"], [1, 2, 3])
    np.testing.assert_array_equal(got["b"], [9])


def test_decode_large_values():
    got = decode_depth_text(b">x\n1234567\n0\n99\n")
    np.testing.assert_array_equal(got["x"], [1234567, 0, 99])


def test_events_write_roundtrip_and_gzip_compat(tmp_path, rng):
    """Streamed fused write (DepthEvents) == per-base write, and a plain
    gzip reader (the reference's access pattern) sees identical text."""
    from gci_tpu.depth.eventspace import DepthEvents

    arrs = {
        "c1": rng.integers(0, 70, size=5000).astype(np.int64),
        "c2": np.concatenate([np.zeros(17, np.int64), rng.integers(0, 3, size=999)]),
        "void": np.zeros(0, dtype=np.int64),
    }
    events = {}
    for k, a in arrs.items():
        if a.size:
            b = np.flatnonzero(np.diff(a) != 0) + 1
            bounds = np.concatenate(([0], b))
            events[k] = DepthEvents(bounds, a[bounds], int(a.size))
        else:
            events[k] = DepthEvents(np.zeros(1, np.int64), np.zeros(1, np.int64), 0)

    p1 = str(tmp_path / "a.depth.gz")
    p2 = str(tmp_path / "b.depth.gz")
    write_depth_gz(p1, arrs)
    write_depth_gz(p2, events)
    with gzip.open(p1, "rb") as f:
        t1 = f.read()
    with gzip.open(p2, "rb") as f:
        t2 = f.read()
    assert t1 == t2  # decompressed text identical across the two writers
    got, _ = read_depth_gz(p2)
    for k, a in arrs.items():
        np.testing.assert_array_equal(got[k], a)


def test_rle_codec_levels_and_range_sharding(rng):
    """The RLE token codec (level 1) and libdeflate (level 6) produce
    different compressed bytes but identical text; disjoint block ranges
    concatenate to exactly the whole-stream bytes (the distributed-writer
    contract, format GCI.py:113-117)."""
    pytest.importorskip("gci_tpu.native")
    from gci_tpu.native import (
        bgzf_eof_native,
        depth_runs_bgzf_nblocks_native,
        depth_runs_to_bgzf_native,
        depth_runs_to_bgzf_range_native,
    )

    hdr = b">tgt\n"
    for trial in range(3):
        n = int(rng.integers(1, 3000))
        vals = rng.integers(0, 10 ** int(rng.integers(1, 7)), n).astype(np.int64)
        counts = rng.integers(1, 5000, n).astype(np.int64)
        expected = b"".join(
            [hdr] + [b"%d\n" % v * c for v, c in zip(vals.tolist(), counts.tolist())]
        )
        for level in (1, 6):
            blob = depth_runs_to_bgzf_native(vals, counts, hdr, level, 2)
            assert gzip.decompress(blob + bgzf_eof_native()) == expected
            nb = depth_runs_bgzf_nblocks_native(vals, counts, len(hdr))
            parts = []
            for h in range(3):
                lo = nb * h // 3
                hi = nb * (h + 1) // 3 if h < 2 else nb
                parts.append(
                    depth_runs_to_bgzf_range_native(
                        vals, counts, hdr, lo, hi, level, 2
                    )
                )
            assert b"".join(parts) == blob


def test_rle_codec_long_runs_cross_blocks():
    """Runs spanning many BGZF blocks (block-cache + CRC-ladder paths):
    every phase alignment of the repeated line against the 0xff00 block
    boundary must inflate back exactly."""
    pytest.importorskip("gci_tpu.native")
    from gci_tpu.native import bgzf_eof_native, depth_runs_to_bgzf_native

    hdr = b">t\n"
    vals = np.array([7, 123, 0, 45678, 9], dtype=np.int64)
    counts = np.array([400_000, 130_001, 65_280, 99_999, 1], dtype=np.int64)
    expected = b"".join(
        [hdr] + [b"%d\n" % v * c for v, c in zip(vals.tolist(), counts.tolist())]
    )
    blob = depth_runs_to_bgzf_native(vals, counts, hdr, 1, 3)
    assert gzip.decompress(blob + bgzf_eof_native()) == expected
