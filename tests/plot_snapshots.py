"""Rendered-figure snapshot fixtures for the plotting path.

``plot_target`` deliberately mirrors the reference's figure constants
(GCI.py:742-834: geometry, zorders, legend layout) so the figures are
visually identical — which also makes it the most transliterated function
in the repo.  Nothing upstream pins the rendered output, so a silently
dropped shading band or moved axis would pass every numeric test.  These
snapshots hash the rendered PNGs for a fixed synthetic input (rendering is
deterministic in this pinned container; the fixture records the matplotlib
version and the check skips on a different one).

Regenerate after an INTENTIONAL visual change:

    python -m tests.plot_snapshots
"""
from __future__ import annotations

import hashlib
import json
import os

import numpy as np

SNAPSHOT_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".snapshots", "plot_hashes.json"
)


def render_canonical_figures(directory: str) -> dict[str, str]:
    """Render the canonical figure set; returns {figure_name: png_path}.

    Covers: single-type with issue shading, dual-type (HiFi+Nano), a
    region slice, and an event-space-backed render (the post-streamed-run
    plotting path).
    """
    from gci_tpu.depth.eventspace import DepthEvents
    from gci_tpu.viz.plot import plot_depth_files

    lens = {"cA": 4000, "cB": 2500}
    rng = np.random.default_rng(0xF1D0)
    hifi = {
        t: rng.integers(0, 40, size=L).astype(np.int64) for t, L in lens.items()
    }
    nano = {
        t: rng.integers(0, 30, size=L).astype(np.int64) for t, L in lens.items()
    }
    # zero stretches -> issue shading bands
    hifi["cA"][300:500] = 0
    nano["cA"][300:450] = 0
    hifi["cB"][100:140] = 0

    out: dict[str, str] = {}

    d1 = os.path.join(directory, "single")
    os.makedirs(os.path.join(d1, "images"), exist_ok=True)
    plot_depth_files(
        [hifi], targets_length=lens, window_size=100, directory=d1,
        prefix="S", force=True, regions_bed={"cA": [(200, 3000)]},
    )
    out["single.cA"] = os.path.join(d1, "images", "S.cA.png")
    out["single.cB"] = os.path.join(d1, "images", "S.cB.png")
    out["single.region"] = os.path.join(d1, "images", "S.cA:200-3000.png")

    d2 = os.path.join(directory, "dual")
    os.makedirs(os.path.join(d2, "images"), exist_ok=True)
    plot_depth_files(
        [hifi, nano], targets_length=lens, window_size=100, directory=d2,
        prefix="D", force=True,
    )
    out["dual.cA"] = os.path.join(d2, "images", "D.cA.png")
    out["dual.cB"] = os.path.join(d2, "images", "D.cB.png")

    d3 = os.path.join(directory, "events")
    os.makedirs(os.path.join(d3, "images"), exist_ok=True)
    plot_depth_files(
        [{t: DepthEvents.from_array(a) for t, a in hifi.items()}],
        targets_length=lens, window_size=100, directory=d3, prefix="E",
        force=True,
    )
    out["events.cA"] = os.path.join(d3, "images", "E.cA.png")

    # bamsnap-style alignment snapshot: reference base track + strand-
    # colored pileup + red mismatch ticks (gci_tpu.viz.snap)
    from gci_tpu.viz.snap import snapshot_regions
    from tests.fixtures import make_bam, make_fasta

    d4 = os.path.join(directory, "snap")
    os.makedirs(d4, exist_ok=True)
    ref_seq = "".join(rng.choice(list("ACGT"), size=400))
    make_fasta(os.path.join(d4, "ref.fa"), [("cS", ref_seq)])
    reads = []
    for k in range(14):
        pos = int(rng.integers(0, 250))
        seq = "".join(rng.choice(list("ACGT"), size=100))
        reads.append(
            dict(name=f"s{k}", ref="cS", pos=pos, mapq=60, cigar="100M",
                 nm=0, flag=16 if k % 3 == 0 else 0, seq_len=100)
        )
    bam = os.path.join(d4, "s.bam")
    make_bam(bam, ["cS"], [400], reads)
    # panel titles embed the given paths: render from inside d4 with
    # relative names so the hash is independent of the temp directory
    cwd = os.getcwd()
    os.chdir(d4)
    try:
        snapshot_regions(
            ["s.bam"], ["s.bam"], "ref.fa", ["cS:50-350"],
            directory=".", prefix="SNAP", force=True,
        )
    finally:
        os.chdir(cwd)
    out["snap.region"] = os.path.join(d4, "SNAP.png")
    return out


def hash_figures(paths: dict[str, str]) -> dict[str, str]:
    return {
        name: hashlib.sha256(open(p, "rb").read()).hexdigest()
        for name, p in paths.items()
    }


def main() -> None:
    import tempfile

    import matplotlib

    with tempfile.TemporaryDirectory() as d:
        hashes = hash_figures(render_canonical_figures(d))
    os.makedirs(os.path.dirname(SNAPSHOT_FILE), exist_ok=True)
    with open(SNAPSHOT_FILE, "w") as f:
        json.dump(
            {"matplotlib": matplotlib.__version__, "figures": hashes},
            f, indent=2, sort_keys=True,
        )
    print(f"wrote {len(hashes)} figure hashes to {SNAPSHOT_FILE}")


if __name__ == "__main__":
    main()
