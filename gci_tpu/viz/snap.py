"""Native alignment snapshots — replacement for the reference's shelled-out
`bamsnap` (utility/filter_bam.py:215-256).

For each region, stacks one panel per BAM (original and filtered
interleaved, like the reference's -bam ordering): a coverage track plus read
segments colored by strand (forward #2ca25f / reverse #3C5488).
"""
from __future__ import annotations

import os
import sys

import numpy as np


def _parse_region(region: str) -> tuple[str, int | None, int | None]:
    if ":" not in region:
        return region, None, None
    chrom, rng = region.rsplit(":", 1)
    if "-" in rng:
        s, e = rng.split("-")
        return chrom, int(s), int(e)
    p = int(rng)
    return chrom, max(p - 500, 0), p + 500


def snapshot_regions(
    original_bams: list[str],
    filtered_bams: list[str],
    reference: str | None,
    regions: list[str],
    directory: str = ".",
    prefix: str = "bamsnap",
    force: bool = False,
) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.collections import LineCollection

    from gci_tpu.io.bam import read_bam

    files = []
    for orig, filt in zip(original_bams, filtered_bams):
        files.append(orig)
        files.append(filt)

    multi = len(regions) > 1
    if multi:
        outdir = f"{directory}/{prefix}"
        os.makedirs(outdir, exist_ok=True)
    else:
        out = f"{directory}/{prefix}.png"
        if os.path.exists(out) and not force:
            print(
                f'ERROR!!! The file "{out}" exists\nPlease using "-f" or '
                '"--force" to rewrite',
                file=sys.stderr,
            )
            raise SystemExit

    bams = [read_bam(f, keep_names=False) for f in files]
    for region in regions:
        chrom, start, end = _parse_region(region)
        fig, axes = plt.subplots(
            len(files), 1, figsize=(16, 2.2 * len(files)), sharex=True, squeeze=False
        )
        for k, (path, bam) in enumerate(zip(files, bams)):
            ax = axes[k][0]
            try:
                rid = bam.references.index(chrom)
            except ValueError:
                ax.set_title(f"{path} (no {chrom})", fontsize=8)
                continue
            L = bam.lengths[rid]
            s = 0 if start is None else start
            e = L if end is None else min(end, L)
            c = bam.columns
            sel = (
                (c["ref_id"] == rid)
                & ((c["flag"] & 4) == 0)
                & (c["pos"] < e)
                & (c["ref_end"] > s)
            )
            idx = np.flatnonzero(sel)
            # bamsnap-style pileup layout: reads sorted by start, each
            # packed greedily into the first row whose last read ends
            # before it (real alignment rows, not a modulo wrap)
            order = idx[np.argsort(c["pos"][idx], kind="stable")]
            cov = np.zeros(e - s + 1, dtype=np.int32)
            segs = []
            colors = []
            row_ends: list[int] = []
            max_rows = 80
            overflow = 0
            for i in order.tolist():
                a = max(int(c["pos"][i]), s)
                b = min(int(c["ref_end"][i]), e)
                cov[a - s : b - s] += 1
                row = next(
                    (r for r, re_ in enumerate(row_ends) if re_ < a), None
                )
                if row is None:
                    if len(row_ends) >= max_rows:
                        overflow += 1
                        continue
                    row = len(row_ends)
                    row_ends.append(b)
                else:
                    row_ends[row] = b
                y = -1 - row
                segs.append([(a, y), (b, y)])
                colors.append("#3C5488" if c["flag"][i] & 16 else "#2ca25f")
            ax.fill_between(np.arange(s, e + 1), cov, step="mid", color="#bdbdbd")
            if segs:
                ax.add_collection(LineCollection(segs, colors=colors, lw=1.2))
                ax.set_ylim(
                    -min(len(row_ends), max_rows) - 2, max(cov.max() + 2, 5)
                )
            if overflow:
                ax.text(
                    0.99, 0.02, f"+{overflow} reads not drawn",
                    transform=ax.transAxes, ha="right", fontsize=6,
                    color="#666666",
                )
            ax.set_title(f'"{path}"', fontsize=8, loc="left")
            ax.set_xlim(s, e)
        axes[-1][0].set_xlabel(f"{chrom} position (bp)")
        plt.tight_layout()
        if multi:
            plt.savefig(f"{outdir}/{chrom}_{start}_{end}.png", dpi=150)
        else:
            plt.savefig(f"{directory}/{prefix}.png", dpi=150)
        plt.close()
