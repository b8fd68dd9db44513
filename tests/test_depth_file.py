import gzip

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
