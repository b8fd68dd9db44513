"""Golden-file parity: reproduce the reference example outputs bit-exactly.

The reference repo ships the MH63 rice example outputs (example/MH63.depth.gz,
MH63.0.depth.bed, MH63.gci, README.md:166-179).  The depth checkpoint is the
pipeline's resume boundary (SURVEY.md §5), so scoring it must reproduce the
issue BED and .gci byte-for-byte — the same contract utility/GCI_score.py
fulfills.  (MH63 is a gapless T2T assembly: the example .depth.bed/.gci pair
is derived from this exact depth file with no gap masking.)
"""
import os

import numpy as np
import pytest

GOLDEN_DIR = "/root/reference/example"
CACHE = os.path.join(os.path.dirname(__file__), ".cache", "mh63_depth.npz")

pytestmark = pytest.mark.golden


@pytest.fixture(scope="module")
def mh63_depths():
    if not os.path.exists(os.path.join(GOLDEN_DIR, "MH63.depth.gz")):
        pytest.skip("reference example data not present")
    if os.path.exists(CACHE):
        loaded = np.load(CACHE)
        return {k: loaded[k] for k in loaded.files}
    from gci_tpu.io.depth_file import read_depth_gz

    depths, _ = read_depth_gz(os.path.join(GOLDEN_DIR, "MH63.depth.gz"))
    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    np.savez(CACHE, **{k: v.astype(np.int32) for k, v in depths.items()})
    return depths


def test_mh63_issue_bed_and_gci_parity(mh63_depths, tmp_path, capsys):
    from gci_tpu.reports import emit_issue_bed
    from gci_tpu.score.report import compute_continuity_report

    depths = {k: np.asarray(v) for k, v in mh63_depths.items()}
    targets_length = {k: int(v.shape[0]) for k, v in depths.items()}
    assert len(depths) == 12
    assert sum(targets_length.values()) == 395765488

    d = str(tmp_path)
    merged = emit_issue_bed(depths, "MH63", 0, 15, d, False, "HiFi")
    with open(f"{d}/MH63.0.depth.bed", "rb") as f:
        got_bed = f.read()
    with open(f"{GOLDEN_DIR}/MH63.0.depth.bed", "rb") as f:
        want_bed = f.read()
    assert got_bed == want_bed

    compute_continuity_report(
        targets_length,
        "MH63",
        d,
        False,
        [merged],
        ["HiFi"],
        flank_len=15,
        dist_percent=0.005,
    )
    with open(f"{d}/MH63.gci", "rb") as f:
        got_gci = f.read()
    with open(f"{GOLDEN_DIR}/MH63.gci", "rb") as f:
        want_gci = f.read()
    assert got_gci == want_gci


def _gzip_streams_equal(path_a: str, path_b: str, chunk: int = 1 << 23) -> bool:
    """Chunked decompressed-byte equality (no O(genome) buffers held twice)."""
    import gzip

    with gzip.open(path_a, "rb") as fa, gzip.open(path_b, "rb") as fb:
        while True:
            a = fa.read(chunk)
            b = fb.read(chunk)
            if a != b:
                return False
            if not a:
                return True


def test_mh63_checkpoint_write_parity(mh63_depths, tmp_path):
    """Re-encoding the golden checkpoint reproduces its decompressed text.

    Write-side bit parity for the resume boundary (format: GCI.py:113-117):
    both production encoders — the per-base-array text path and the
    event-space RLE->BGZF path run_gci's default backend uses — must emit a
    checkpoint whose decompressed bytes equal the reference's own file.
    """
    from gci_tpu.depth.eventspace import DepthEvents
    from gci_tpu.io.depth_file import write_depth_gz

    golden = os.path.join(GOLDEN_DIR, "MH63.depth.gz")

    arrays = {k: np.asarray(v) for k, v in mh63_depths.items()}
    out_arr = str(tmp_path / "arr.depth.gz")
    write_depth_gz(out_arr, arrays)
    assert _gzip_streams_equal(out_arr, golden)
    os.unlink(out_arr)

    events = {k: DepthEvents.from_array(v) for k, v in arrays.items()}
    out_ev = str(tmp_path / "ev.depth.gz")
    write_depth_gz(out_ev, events)
    assert _gzip_streams_equal(out_ev, golden)
