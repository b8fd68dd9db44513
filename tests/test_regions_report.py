"""Regions .gci sub-report vs a literal transcription of the reference
semantics (GCI.py:610-657), on randomized depth data."""
import os
from math import log2

import numpy as np
import pytest

from gci_tpu.score.report import compute_continuity_report


def oracle_regions_report(path, regions_bed, depths_list, type_list, threshold, dist_percent):
    """Direct state-machine transcription of the reference region loop."""

    def collapse(depths, leftmost, rightmost, flank_len, start_pos):
        out = []
        start_flag, end_flag = 0, 1
        chr_len = len(depths)
        start = None
        for i, depth in enumerate(depths[flank_len : chr_len - flank_len]):
            if leftmost < depth <= rightmost:
                if start_flag == 0:
                    start = i + flank_len
                    start_flag, end_flag = 1, 0
                if i == (chr_len - flank_len * 2 - 1):
                    out.append((start + start_pos, i + flank_len + 1 + start_pos))
            else:
                if end_flag == 0:
                    if i > flank_len:
                        out.append((start + start_pos, i + flank_len + start_pos))
                    end_flag, start_flag = 1, 0
        return out

    def complement(bed, start, end):
        out = []
        n = len(bed)
        if n == 0:
            return [end - start]
        last = start
        for i, seg in enumerate(bed):
            if seg[0] > last:
                out.append(seg[0] - last)
            if i != n - 1:
                last = seg[1]
            else:
                if end > seg[1]:
                    out.append(end - seg[1])
        return out

    def dmerge(bed, length, start, end):
        dist = length * dist_percent
        out = []
        cur = (start, start)
        for seg in bed:
            if (seg[0] - cur[1]) <= dist:
                cur = (cur[0], seg[1])
            else:
                out.append(cur)
                cur = seg
        if (end - cur[1]) <= dist:
            cur = (cur[0], end)
        out.append(cur)
        return out

    def n50(lengths):
        lengths = sorted(lengths, reverse=True)
        if not lengths:
            return 0
        cum = np.cumsum(lengths)
        for i, number in enumerate(cum):
            if number >= cum[-1] / 2:
                return lengths[i]
        return 0

    with open(path, "w") as f:
        f.write("Chromosome\tStart\tEnd\t" + "\t".join(type_list) + "\n")
    all_lengths = []
    all_obs_len = [[] for _ in depths_list]
    all_obs_ctg = [0 for _ in depths_list]
    for target, segments in regions_bed.items():
        for segment in segments:
            start, end = segment
            exp_n50 = end - start
            if exp_n50 > 0:
                all_lengths.append(exp_n50)
            gci_row = []
            for i, depthss in enumerate(depths_list):
                d = depthss[target][start:end]
                bed = collapse(d, -1, threshold, 0, start)
                obs_lens = complement(bed, start, end)
                obs_n50 = n50(obs_lens)
                if exp_n50 > 0:
                    all_obs_len[i] += obs_lens
                merged = dmerge(bed, exp_n50, start, end)
                obs_ctg = len(complement(merged, start, end))
                if exp_n50 > 0:
                    all_obs_ctg[i] += obs_ctg
                if obs_ctg == 0:
                    gci_row.append(0)
                else:
                    gci_row.append(
                        round(100 * log2(obs_n50 / exp_n50 + 1) / log2(obs_ctg / 1 + 1), 4)
                    )
            with open(path, "a") as f:
                f.write(
                    f"{target}\t{segment[0]}\t{segment[1]}\t"
                    + "\t".join(map(str, gci_row))
                    + "\n"
                )
    exp_all = n50(all_lengths)
    row = []
    for i in range(len(depths_list)):
        if all_obs_ctg[i] == 0:
            row.append(0)
        else:
            row.append(
                round(
                    100 * log2(n50(all_obs_len[i]) / exp_all + 1)
                    / log2(all_obs_ctg[i] / len(all_lengths) + 1),
                    4,
                )
            )
    with open(path, "a") as f:
        f.write("-" * 136 + "\n\n\n")
        f.write("All_regions\t*\t*\t" + "\t".join(map(str, row)) + "\n")


@pytest.mark.parametrize("threshold", [0, 2])
def test_regions_report_matches_oracle(tmp_path, rng, threshold):
    targets = {"cA": 9000, "cB": 7000}
    depths_a = {t: rng.integers(0, 4, size=L).astype(np.int64) for t, L in targets.items()}
    depths_b = {t: rng.integers(0, 4, size=L).astype(np.int64) for t, L in targets.items()}
    regions = {"cA": [(100, 4000), (4500, 8000)], "cB": [(0, 7000)]}
    beds = [
        {t: [] for t in targets},
        {t: [] for t in targets},
    ]
    got_dir = str(tmp_path / "got")
    os.makedirs(got_dir)
    compute_continuity_report(
        targets, "R", got_dir, False, beds, ["HiFi", "Nano"], 15, 0.005,
        regions, [depths_a, depths_b], threshold, [],
    )
    want_path = str(tmp_path / "want.regions.gci")
    oracle_regions_report(
        want_path, regions, [depths_a, depths_b], ["HiFi", "Nano"], threshold, 0.005
    )
    got = open(f"{got_dir}/R.regions.gci").read()
    want = open(want_path).read()
    assert got == want
