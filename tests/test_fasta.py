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


# ---------------------------------------------------------------------------
# native single-pass scanner vs the numpy reference implementation
# ---------------------------------------------------------------------------

def _random_fasta_text(rng, crlf=False, trailing_newline=True):
    lines = []
    n_rec = int(rng.integers(1, 5))
    for r in range(n_rec):
        lines.append(f">rec{r} desc with words")
        L = int(rng.integers(0, 60))
        seq = "".join(rng.choice(list("ACGTNacgtn"), size=L))
        width = int(rng.integers(1, 12))
        for i in range(0, len(seq), width):
            lines.append(seq[i : i + width])
        if L == 0 and rng.integers(0, 2):
            pass  # empty record body
    sep = "\r\n" if crlf else "\n"
    text = sep.join(lines)
    if trailing_newline:
        text += sep
    return text


def test_native_scan_matches_python_randomized(tmp_path):
    from gci_tpu.io.fasta import scan_fasta

    rng = np.random.default_rng(42)
    for trial in range(30):
        crlf = bool(trial % 3 == 1)
        trailing = bool(trial % 4 != 0)
        text = _random_fasta_text(rng, crlf=crlf, trailing_newline=trailing)
        p = str(tmp_path / f"t{trial}.fa")
        with open(p, "w", newline="") as f:
            f.write(text)
        want = (read_fasta_lengths(p), scan_fasta_gaps(p))
        got = scan_fasta(p)
        assert got[0] == want[0], (trial, text)
        assert (got[1] or None) == (want[1] or None), (trial, text)


def test_native_scan_gzip_input(tmp_path):
    from gci_tpu.io.fasta import scan_fasta

    p = str(tmp_path / "g.fa.gz")
    with gzip.open(p, "wt") as f:
        f.write(">c1\nACNNGT\n>c2 x\nNNNN\n")
    lengths, gaps = scan_fasta(p)
    assert lengths == {"c1": 6, "c2": 4}
    assert gaps == {"c1": [(2, 4)], "c2": [(0, 4)]}
