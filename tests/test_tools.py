"""Side-car CLI tools: score-resume, plot-only, convert, filter-bam export."""
import gzip
import os
import struct
import zlib

import numpy as np
import pytest

from gci_tpu.pipeline import run_gci
from tests.fixtures import make_bam, make_fasta, make_paf, random_reads

REFS = ["chrA", "chrB"]
LENS = [30000, 20000]
TARGETS = dict(zip(REFS, LENS))


@pytest.fixture()
def dataset(tmp_path, rng):
    ref = str(tmp_path / "ref.fa")
    recs = []
    for r, L in zip(REFS, LENS):
        seq = "".join(rng.choice(list("ACGT"), size=L))
        recs.append((r, seq))
    make_fasta(ref, recs)
    bam = str(tmp_path / "hifi.bam")
    make_bam(bam, REFS, LENS, random_reads(rng, REFS, LENS, 600))
    out = str(tmp_path / "out")
    run_gci(hifi=[bam], reference=ref, directory=out, prefix="X")
    return dict(ref=ref, bam=bam, out=out, tmp=str(tmp_path))


def test_score_resume_matches_pipeline(dataset):
    from gci_tpu.tools.score_only import run_score

    d2 = dataset["tmp"] + "/score_out"
    run_score(
        hifi=f'{dataset["out"]}/X.depth.gz',
        reference=dataset["ref"],
        directory=d2,
        prefix="X",
    )
    got = open(f"{d2}/X.gci").read()
    want = open(f'{dataset["out"]}/X.gci').read()
    assert got == want
    got_bed = open(f"{d2}/X.0.depth.bed").read()
    want_bed = open(f'{dataset["out"]}/X.0.depth.bed').read()
    assert got_bed == want_bed


def test_score_bed_mode(dataset):
    from gci_tpu.tools.score_only import run_score

    d2 = dataset["tmp"] + "/score_bed_out"
    run_score(
        hifi=f'{dataset["out"]}/X.0.depth.bed',
        reference=dataset["ref"],
        directory=d2,
        prefix="X",
        bed_input=True,
    )
    got = open(f"{d2}/X.gci").read()
    want = open(f'{dataset["out"]}/X.gci').read()
    assert got == want


def test_plot_only_tool(dataset):
    from gci_tpu.tools.plot_only import run_plot

    d2 = dataset["tmp"] + "/plot_out"
    run_plot(
        reference=dataset["ref"],
        hifi=f'{dataset["out"]}/X.depth.gz',
        directory=d2,
        prefix="P",
        window_size=1000,
    )
    for t in REFS:
        assert os.path.exists(f"{d2}/P.{t}.png")
    # region mode plots regions only, directly into the directory
    regions = dataset["tmp"] + "/regions.bed"
    with open(regions, "w") as f:
        f.write("chrA\t100\t5000\n")
    d3 = dataset["tmp"] + "/plot_out_regions"
    run_plot(
        reference=dataset["ref"],
        hifi=f'{dataset["out"]}/X.depth.gz',
        directory=d3,
        prefix="P",
        window_size=1000,
        regions=regions,
        depth_mean="12.5",
    )
    assert os.path.exists(f"{d3}/P.chrA:100-5000.png")
    assert not os.path.exists(f"{d3}/P.chrA.png")


def test_convert_depth(tmp_path):
    from gci_tpu.io.depth_file import read_depth_gz
    from gci_tpu.tools.convert_depth import convert

    src = str(tmp_path / "samtools.depth")
    with open(src, "w") as f:
        for chrom, vals in [("c1", [3, 4, 5]), ("c2", [0, 7])]:
            for i, v in enumerate(vals):
                f.write(f"{chrom}\t{i+1}\t{v}\n")
    convert(src, str(tmp_path / "conv"))
    depths, tl = read_depth_gz(str(tmp_path / "conv.depth.gz"))
    np.testing.assert_array_equal(depths["c1"], [3, 4, 5])
    np.testing.assert_array_equal(depths["c2"], [0, 7])


def test_filter_bam_export(tmp_path, rng):
    from gci_tpu.io.bam import read_bam
    from gci_tpu.tools.filter_bam import run_filter_bam

    bam = str(tmp_path / "in.bam")
    reads = [
        dict(name="keep1", ref="chrA", pos=100, mapq=60, cigar="500M", nm=5),
        dict(name="keep2", ref="chrB", pos=50, mapq=60, cigar="300M", nm=0),
        dict(name="lowmq", ref="chrA", pos=900, mapq=10, cigar="500M", nm=5),
        dict(name="clipped", ref="chrA", pos=2000, mapq=60, cigar="300S500M", nm=5),
        dict(name="badiden", ref="chrA", pos=3000, mapq=60, cigar="500M", nm=200),
    ]
    make_bam(bam, REFS, LENS, reads)
    outs = run_filter_bam([bam], directory=str(tmp_path), prefix=["flt"], force=True)
    assert outs == [f"{tmp_path}/flt.bam"]
    out_bam = read_bam(outs[0])
    assert sorted(out_bam.names) == [b"keep1", b"keep2"]
    assert os.path.exists(outs[0] + ".bai")

    # validate BAI: virtual offsets decode back to the right records
    with open(outs[0] + ".bai", "rb") as f:
        bai = f.read()
    assert bai[:4] == b"BAI\x01"
    (n_ref,) = struct.unpack_from("<i", bai, 4)
    assert n_ref == 2
    with open(outs[0], "rb") as f:
        blob = f.read()
    off = 8
    found_names = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", bai, off)
        off += 4
        for _ in range(n_bin):
            _bin, n_chunk = struct.unpack_from("<Ii", bai, off)
            off += 8
            for _ in range(n_chunk):
                vo_s, vo_e = struct.unpack_from("<QQ", bai, off)
                off += 16
                coff, uoff = vo_s >> 16, vo_s & 0xFFFF
                # decompress the BGZF block at coff and read the record there
                xlen = blob[coff + 10] | (blob[coff + 11] << 8)
                bsize = None
                q = coff + 12
                while q + 4 <= coff + 12 + xlen:
                    slen = blob[q + 2] | (blob[q + 3] << 8)
                    if blob[q] == 66 and blob[q + 1] == 67:
                        bsize = (blob[q + 4] | (blob[q + 5] << 8)) + 1
                    q += 4 + slen
                payload = zlib.decompress(
                    blob[coff + 12 + xlen : coff + bsize - 8], -15
                )
                rec = payload[uoff:]
                l_read_name = rec[12]
                name = rec[36 : 36 + l_read_name - 1]
                found_names.append(name)
        (n_intv,) = struct.unpack_from("<i", bai, off)
        off += 4 + 8 * n_intv
    assert set(found_names) == {b"keep1", b"keep2"}


def test_filter_bam_snapshot(tmp_path, rng):
    from gci_tpu.tools.filter_bam import run_filter_bam

    ref = str(tmp_path / "ref.fa")
    make_fasta(ref, [(r, "A" * L) for r, L in zip(REFS, LENS)])
    bam = str(tmp_path / "in.bam")
    make_bam(bam, REFS, LENS, random_reads(rng, REFS, LENS, 100))
    run_filter_bam(
        [bam], directory=str(tmp_path), prefix=["flt", "snap"], force=True,
        plot=True, reference=ref, region="chrA:100-2000",
    )
    assert os.path.exists(f"{tmp_path}/snap.png")


def test_score_dual_and_two_type_branches(dataset, rng, tmp_path):
    """7-way branch coverage: hifi+nano+two_type resume."""
    import numpy as np

    from gci_tpu.io.depth_file import read_depth_gz, write_depth_gz
    from gci_tpu.tools.score_only import run_score

    depths, tl = read_depth_gz(f'{dataset["out"]}/X.depth.gz')
    nano = {t: np.maximum(v - 1, 0) for t, v in depths.items()}
    two = {t: np.maximum(depths[t], nano[t]) for t in depths}
    np_path = str(tmp_path / "n.depth.gz")
    tt_path = str(tmp_path / "t.depth.gz")
    write_depth_gz(np_path, nano)
    write_depth_gz(tt_path, two)

    d2 = dataset["tmp"] + "/score3_out"
    run_score(
        hifi=f'{dataset["out"]}/X.depth.gz',
        nano=np_path,
        two_type=tt_path,
        reference=dataset["ref"],
        directory=d2,
        prefix="X",
        force=True,
    )
    text = open(f"{d2}/X.gci").read()
    assert text.startswith("HiFi:\n")
    assert "\nNano:\n" in text and "\nHiFi + Nano:\n" in text
    assert text.count("Genome\t") == 3
    # the bed written last wins the shared filename (reference quirk)
    assert "X.0.depth.bed" in __import__("os").listdir(d2)


def test_score_regions(dataset):
    from gci_tpu.tools.score_only import run_score

    regions = dataset["tmp"] + "/sregions.bed"
    with open(regions, "w") as f:
        f.write("chrA\t1000\t9000\nchrB\t0\t5000\n")
    d2 = dataset["tmp"] + "/score_regions_out"
    run_score(
        hifi=f'{dataset["out"]}/X.depth.gz',
        reference=dataset["ref"],
        directory=d2,
        prefix="XR",
        regions=regions,
    )
    text = open(f"{d2}/XR.regions.gci").read()
    assert text.startswith("Chromosome\tStart\tEnd\tHiFi\n")
    assert "All_regions\t*\t*\t" in text
    rows = [l for l in text.splitlines() if l.startswith("chr")]
    assert len(rows) == 2
