import gzip

from gci_tpu.io.fasta import mask_gaps_in_depths, read_fasta_lengths, scan_fasta_gaps
import numpy as np


def write_fasta(path, records, width=7):
    with open(path, "w") as f:
        for rid, seq in records:
            f.write(f">{rid} some description\n")
            for i in range(0, len(seq), width):
                f.write(seq[i : i + width] + "\n")


def test_lengths_and_gaps(tmp_path):
    p = str(tmp_path / "r.fa")
    write_fasta(
        p,
        [
            ("c1", "ACGTNNNACGTnACGT"),
            ("c2", "NNACGTACGTACGTNN"),
            ("c3", "ACGTACGT"),
        ],
    )
    assert read_fasta_lengths(p) == {"c1": 16, "c2": 16, "c3": 8}
    gaps = scan_fasta_gaps(p)
    assert gaps == {
        "c1": [(4, 7), (11, 12)],
        "c2": [(0, 2), (14, 16)],
    }


def test_gap_run_across_line_wrap(tmp_path):
    p = str(tmp_path / "r.fa")
    write_fasta(p, [("c1", "ACGNN" + "NNNNA")], width=5)  # N-run spans the wrap
    assert scan_fasta_gaps(p) == {"c1": [(3, 9)]}


def test_no_gaps_returns_none(tmp_path):
    p = str(tmp_path / "r.fa")
    write_fasta(p, [("c1", "ACGT")])
    assert scan_fasta_gaps(p) is None


def test_gzipped_fasta(tmp_path):
    p = str(tmp_path / "r.fa.gz")
    with gzip.open(p, "wt") as f:
        f.write(">c1\nACNNGT\n")
    assert read_fasta_lengths(p) == {"c1": 6}
    assert scan_fasta_gaps(p) == {"c1": [(2, 4)]}


def test_mask_gaps():
    depths = {"c1": np.arange(10, dtype=np.int64)}
    out = mask_gaps_in_depths(depths, {"c1": [(2, 5)], "absent": [(0, 1)]})
    np.testing.assert_array_equal(out["c1"], [0, 1, 0, 0, 0, 5, 6, 7, 8, 9])
    assert mask_gaps_in_depths(depths, None) is depths
