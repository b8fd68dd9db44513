"""Full-pipeline parity: depth_backend="events" vs "numpy".

Every product file (.depth.gz, .gaps.bed, .{ts}.depth.bed, .gci,
.regions.gci) must be byte-identical between the per-base numpy backend and
the O(reads) event-space backend.
"""
import filecmp
import os

import numpy as np
import pytest

from gci_tpu.pipeline import run_gci
from tests.fixtures import make_bam, make_fasta, make_paf, random_reads

REFS = ["chrA", "chrB"]
LENS = [30000, 20000]
TARGETS = dict(zip(REFS, LENS))


def _make_inputs(tmp_path, rng):
    recs = []
    for r, L in zip(REFS, LENS):
        seq = "".join(rng.choice(list("ACGT"), size=L))
        if r == "chrA":
            seq = seq[:1500] + "N" * 300 + seq[1800:]
        recs.append((r, seq))
    ref = str(tmp_path / "ref.fa")
    make_fasta(ref, recs)
    hifi_bam = str(tmp_path / "hifi.bam")
    nano_bam = str(tmp_path / "nano.bam")
    make_bam(hifi_bam, REFS, LENS, random_reads(rng, REFS, LENS, 400, name_prefix="h"))
    make_bam(nano_bam, REFS, LENS, random_reads(rng, REFS, LENS, 400, name_prefix="n"))
    hifi_paf = str(tmp_path / "hifi.paf")
    rows = []
    for k in range(120):
        t = REFS[k % 2]
        ts = (k * 131) % (TARGETS[t] - 5000)
        rows.append((f"h{k}", 5000, 0, 4800, "+", t, TARGETS[t], ts, ts + 4800, 4700, 4800, 60))
    make_paf(hifi_paf, rows)
    regions = str(tmp_path / "regions.bed")
    with open(regions, "w") as f:
        f.write("chrA\t2000\t9000\nchrB\t100\t5000\n")
    return ref, hifi_bam, nano_bam, hifi_paf, regions


def test_events_backend_bytes_identical(tmp_path, rng):
    ref, hifi_bam, nano_bam, hifi_paf, regions = _make_inputs(tmp_path, rng)
    outs = {}
    for backend in ("numpy", "events"):
        out = str(tmp_path / backend)
        run_gci(
            hifi=[hifi_bam, hifi_paf], nano=[nano_bam], reference=ref,
            directory=out, prefix="P", regions=regions,
            depth_backend=backend,
        )
        outs[backend] = out

    files = sorted(os.listdir(outs["numpy"]))
    assert files == sorted(os.listdir(outs["events"]))
    assert any(f.endswith(".depth.gz") for f in files)
    for f in files:
        a, b = f"{outs['numpy']}/{f}", f"{outs['events']}/{f}"
        if f.endswith(".gz"):
            import gzip

            assert gzip.open(a).read() == gzip.open(b).read(), f
        else:
            assert filecmp.cmp(a, b, shallow=False), f


def test_events_backend_single_type(tmp_path, rng):
    ref, hifi_bam, _, _, _ = _make_inputs(tmp_path, rng)
    outs = {}
    for backend in ("numpy", "events"):
        out = str(tmp_path / ("s_" + backend))
        run_gci(hifi=[hifi_bam], reference=ref, directory=out, prefix="S",
                depth_backend=backend)
        outs[backend] = out
    for f in sorted(os.listdir(outs["numpy"])):
        a, b = f"{outs['numpy']}/{f}", f"{outs['events']}/{f}"
        if f.endswith(".gz"):
            import gzip

            assert gzip.open(a).read() == gzip.open(b).read(), f
        else:
            assert filecmp.cmp(a, b, shallow=False), f
