"""End-to-end pipeline runs on synthetic data, cross-checked with the oracle."""
import gzip
import os

import numpy as np
import pytest

from gci_tpu.io.bam import read_bam
from gci_tpu.io.depth_file import read_depth_gz
from gci_tpu.io.paf import read_paf
from gci_tpu.pipeline import run_gci
from tests.fixtures import make_bam, make_fasta, make_paf, random_reads
from tests.oracle_gci import oracle_filter

REFS = ["chrA", "chrB"]
LENS = [30000, 20000]
TARGETS = dict(zip(REFS, LENS))


def _make_ref_fasta(path, rng, gap_at=None):
    recs = []
    for r, L in zip(REFS, LENS):
        seq = "".join(rng.choice(list("ACGT"), size=L))
        if gap_at and r in gap_at:
            s, e = gap_at[r]
            seq = seq[:s] + "N" * (e - s) + seq[e:]
        recs.append((r, seq))
    make_fasta(path, recs)


def test_single_type_run(tmp_path, rng):
    ref = str(tmp_path / "ref.fa")
    _make_ref_fasta(ref, rng, gap_at={"chrA": (1000, 1200)})
    bam = str(tmp_path / "hifi.bam")
    make_bam(bam, REFS, LENS, random_reads(rng, REFS, LENS, 500))
    out = str(tmp_path / "out")
    run_gci(hifi=[bam], reference=ref, directory=out, prefix="T")

    for f in ["T.depth.gz", "T.0.depth.bed", "T.gci", "T.gaps.bed"]:
        assert os.path.exists(f"{out}/{f}"), f

    # depth checkpoint written BEFORE gap masking (reference order)
    depths, tl = read_depth_gz(f"{out}/T.depth.gz")
    want = oracle_filter([], [read_bam(bam)], TARGETS)
    assert tl == TARGETS
    for t in TARGETS:
        np.testing.assert_array_equal(depths[t], want[t])

    with open(f"{out}/T.gaps.bed") as f:
        assert f.read() == "chrA\t1000\t1200\n"

    # issue bed reflects gap-masked depths
    masked = {t: v.copy() for t, v in want.items()}
    masked["chrA"][1000:1200] = 0
    from gci_tpu.intervals import collapse_depth_dict

    expected_bed = collapse_depth_dict(masked, -1, 0, 15, 0)
    got_rows = open(f"{out}/T.0.depth.bed").read().splitlines()
    want_rows = [
        f"{t}\t{s}\t{e}" for t, segs in expected_bed.items() for s, e in segs
    ]
    assert got_rows == want_rows
    assert open(f"{out}/T.gci").read().startswith("HiFi:\n")


def test_dual_type_run(tmp_path, rng):
    ref = str(tmp_path / "ref.fa")
    _make_ref_fasta(ref, rng)
    hifi_bam = str(tmp_path / "hifi.bam")
    nano_bam = str(tmp_path / "nano.bam")
    hifi_paf = str(tmp_path / "hifi.paf")
    make_bam(hifi_bam, REFS, LENS, random_reads(rng, REFS, LENS, 400, name_prefix="h"))
    make_bam(nano_bam, REFS, LENS, random_reads(rng, REFS, LENS, 400, name_prefix="n"))
    rows = []
    for k in range(150):
        t = REFS[k % 2]
        qlen = 5000
        ts = (k * 97) % (TARGETS[t] - 5000)
        rows.append((f"h{k}", qlen, 0, 4800, "+", t, TARGETS[t], ts, ts + 4800, 4700, 4800, 60))
    make_paf(hifi_paf, rows)
    out = str(tmp_path / "out")
    run_gci(hifi=[hifi_bam, hifi_paf], nano=[nano_bam], reference=ref, directory=out, prefix="D")

    for f in [
        "D_hifi.depth.gz", "D_nano.depth.gz", "D_two_type.depth.gz",
        "D_hifi.0.depth.bed", "D_nano.0.depth.bed", "D_two_type.0.depth.bed",
        "D.gci",
    ]:
        assert os.path.exists(f"{out}/{f}"), f

    hifi_want = oracle_filter([read_paf(hifi_paf)], [read_bam(hifi_bam)], TARGETS)
    got, _ = read_depth_gz(f"{out}/D_hifi.depth.gz")
    for t in TARGETS:
        np.testing.assert_array_equal(got[t], hifi_want[t])

    nano_want = oracle_filter([], [read_bam(nano_bam)], TARGETS)
    # two-type = per-base max AFTER gap masking of each (no gaps here)
    two_got, _ = read_depth_gz(f"{out}/D_two_type.depth.gz")
    for t in TARGETS:
        np.testing.assert_array_equal(
            two_got[t], np.maximum(hifi_want[t], nano_want[t])
        )

    gci_text = open(f"{out}/D.gci").read()
    assert gci_text.startswith("HiFi:\n")
    assert "\nNano:\n" in gci_text and "\nHiFi + Nano:\n" in gci_text
    assert gci_text.count("Genome\t") == 3


def test_regions_and_threshold(tmp_path, rng):
    ref = str(tmp_path / "ref.fa")
    _make_ref_fasta(ref, rng)
    bam = str(tmp_path / "h.bam")
    make_bam(bam, REFS, LENS, random_reads(rng, REFS, LENS, 400))
    regions = str(tmp_path / "regions.bed")
    with open(regions, "w") as f:
        f.write("chrA\t5000\t15000\nchrB\t0\t9000\n")
    out = str(tmp_path / "out")
    run_gci(
        hifi=[bam], reference=ref, directory=out, prefix="R",
        regions=regions, threshold=2,
    )
    assert os.path.exists(f"{out}/R.2.depth.bed")
    text = open(f"{out}/R.regions.gci").read()
    assert text.startswith("Chromosome\tStart\tEnd\tHiFi\n")
    assert "All_regions\t*\t*\t" in text


def test_force_protection(tmp_path, rng):
    ref = str(tmp_path / "ref.fa")
    _make_ref_fasta(ref, rng)
    bam = str(tmp_path / "h.bam")
    make_bam(bam, REFS, LENS, random_reads(rng, REFS, LENS, 50))
    out = str(tmp_path / "out")
    run_gci(hifi=[bam], reference=ref, directory=out, prefix="F")
    with pytest.raises(SystemExit):
        run_gci(hifi=[bam], reference=ref, directory=out, prefix="F")
    # force=True rewrites cleanly
    run_gci(hifi=[bam], reference=ref, directory=out, prefix="F", force=True)
