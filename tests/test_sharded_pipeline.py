"""run_gci(depth_backend="sharded") end-to-end on the virtual 8-device mesh.

The sharded backend (gci_tpu.depth.sharded) is the user-reachable multi-chip
path: genome axis gp-sharded, reads dp-parallel, gap-mask / two-type /
interval extraction on device, O(runs) checkpoint readback.  Every output
file must be byte-identical to the events-backend run (which is itself
golden-pinned against the reference).
"""
import gzip
import os

import numpy as np
import pytest

from gci_tpu.pipeline import run_gci
from tests.fixtures import make_bam, make_fasta, make_paf, random_reads

REFS = ["chrA", "chrB", "chrC"]
LENS = [30000, 20000, 4096]


def _make_ref(path, rng, gap_at=None):
    recs = []
    for r, L in zip(REFS, LENS):
        seq = "".join(rng.choice(list("ACGT"), size=L))
        if gap_at and r in gap_at:
            s, e = gap_at[r]
            seq = seq[:s] + "N" * (e - s) + seq[e:]
        recs.append((r, seq))
    make_fasta(path, recs)


def _diff_outputs(d1, d2, names):
    for name in names:
        p1, p2 = os.path.join(d1, name), os.path.join(d2, name)
        if name.endswith(".gz"):
            with gzip.open(p1, "rb") as a, gzip.open(p2, "rb") as b:
                assert a.read() == b.read(), name
        else:
            with open(p1, "rb") as a, open(p2, "rb") as b:
                assert a.read() == b.read(), name


@pytest.fixture(scope="module")
def inputs(tmp_path_factory):
    rng = np.random.default_rng(0x5AD)
    d = tmp_path_factory.mktemp("sharded_inputs")
    ref = str(d / "ref.fa")
    _make_ref(ref, rng, gap_at={"chrA": (12000, 12400), "chrC": (0, 64)})
    hifi_bam = str(d / "hifi.bam")
    nano_bam = str(d / "nano.bam")
    make_bam(hifi_bam, REFS, LENS, random_reads(rng, REFS, LENS, 900, name_prefix="h"))
    make_bam(nano_bam, REFS, LENS, random_reads(rng, REFS, LENS, 700, name_prefix="n"))
    regions = str(d / "regions.bed")
    with open(regions, "w") as f:
        f.write("chrA\t1000\t15000\nchrB\t0\t20000\n")
    return ref, hifi_bam, nano_bam, regions


def test_sharded_single_type_matches_events(inputs, tmp_path):
    ref, hifi_bam, _, _ = inputs
    d_ev = str(tmp_path / "ev")
    d_sh = str(tmp_path / "sh")
    run_gci(hifi=[hifi_bam], reference=ref, directory=d_ev, prefix="S",
            depth_backend="events")
    run_gci(hifi=[hifi_bam], reference=ref, directory=d_sh, prefix="S",
            depth_backend="sharded", mesh="2,4")
    _diff_outputs(d_ev, d_sh, ["S.depth.gz", "S.0.depth.bed", "S.gci", "S.gaps.bed"])


def test_sharded_dual_type_with_regions_matches_events(inputs, tmp_path):
    ref, hifi_bam, nano_bam, regions = inputs
    d_ev = str(tmp_path / "ev")
    d_sh = str(tmp_path / "sh")
    kw = dict(hifi=[hifi_bam], nano=[nano_bam], reference=ref, prefix="D",
              regions=regions, threshold=1)
    run_gci(directory=d_ev, depth_backend="events", **kw)
    run_gci(directory=d_sh, depth_backend="sharded", mesh="2,4", **kw)
    _diff_outputs(
        d_ev, d_sh,
        ["D_hifi.depth.gz", "D_nano.depth.gz", "D_two_type.depth.gz",
         "D_hifi.1.depth.bed", "D_nano.1.depth.bed", "D_two_type.1.depth.bed",
         "D.gci", "D.regions.gci", "D.gaps.bed"],
    )


def test_sharded_with_paf_curation_matches_events(inputs, tmp_path):
    """Multi-file curation upstream of the sharded depth (join on host,
    depth on mesh) — outputs still byte-identical."""
    ref, hifi_bam, _, _ = inputs
    rng = np.random.default_rng(0xF00)
    rows = []
    for k in range(300):
        ri = int(rng.integers(0, len(REFS)))
        L = LENS[ri]
        s = int(rng.integers(0, L - 100))
        e = int(s + rng.integers(50, min(L - s, 5000)))
        qlen = int((e - s) * rng.uniform(1.0, 1.3))
        nm = int((e - s) * rng.uniform(0.85, 1.0))
        rows.append(
            (f"h{k}", qlen, 0, e - s, "+", REFS[ri], L, s, e, nm, e - s,
             int(rng.choice([0, 30, 60])))
        )
    paf = str(tmp_path / "hifi.paf")
    make_paf(paf, rows)

    d_ev = str(tmp_path / "ev")
    d_sh = str(tmp_path / "sh")
    kw = dict(hifi=[hifi_bam, paf], reference=ref, prefix="P")
    run_gci(directory=d_ev, depth_backend="events", **kw)
    run_gci(directory=d_sh, depth_backend="sharded", mesh="auto", **kw)
    _diff_outputs(d_ev, d_sh, ["P.depth.gz", "P.0.depth.bed", "P.gci"])


def test_sharded_plot_smoke(inputs, tmp_path):
    """Plot path consumes the sharded depth via its event-space host view."""
    ref, hifi_bam, _, _ = inputs
    d = str(tmp_path / "plot")
    run_gci(hifi=[hifi_bam], reference=ref, directory=d, prefix="V",
            depth_backend="sharded", mesh="2,4", plot=True, window_size=500)
    images = os.listdir(os.path.join(d, "images"))
    assert any(i.endswith(".png") for i in images)
