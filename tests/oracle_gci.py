"""Test-only oracle: a literal per-record transcription of the documented
reference filter/curation/depth semantics (GCI.py:146-169, 172-312), built on
python dicts exactly as the reference behaves.  Used to cross-check the
vectorized production path on randomized synthetic inputs.
"""
from __future__ import annotations

import numpy as np

from gci_tpu.io.bam import BamData
from gci_tpu.io.paf import PafData


def oracle_bam_dict(bam: BamData, targets, map_qual, clip_percent, iden_percent, mq_cutoff):
    """Mirror of read_sam over a whole file: (samfile_dict, high_qual_set)."""
    d = {}
    hq = set()
    c = bam.columns
    for k in range(bam.n_records):
        rid = int(c["ref_id"][k])
        if rid < 0 or rid >= len(bam.references):
            continue
        ref = bam.references[rid]
        if ref not in targets:
            continue
        flag = int(c["flag"][k])
        if flag & 4 or flag & 256 or flag & 2048:
            continue
        if int(c["mapq"][k]) < map_qual:
            continue
        M, I, D, S = (int(c[x][k]) for x in ("m", "i", "d", "s"))
        eq, X, NM = (int(c[x][k]) for x in ("eq", "x", "nm"))
        mm = NM - (I + D)
        if S / (M + eq + X + I + S) <= clip_percent and (M + eq + X - mm) / (
            M + eq + X + I + D
        ) >= iden_percent:
            name = bam.names[k]
            d[name] = (ref, int(c["pos"][k]), int(c["ref_end"][k]), int(c["qlen"][k]))
            if int(c["mapq"][k]) >= mq_cutoff:
                hq.add(name)
    return d, hq


def _merge_props(alns, x, y):
    bed = sorted([a[x], a[y]] for a in alns)
    blocks = []
    mapped = 0
    lo, hi = bed[0]
    for idx, (s, e) in enumerate(bed):
        if hi >= s:
            if hi < e:
                hi = e
        else:
            blocks.append((hi - lo, lo, hi))
            mapped += hi - lo
            lo, hi = bed[idx]
    blocks.append((hi - lo, lo, hi))
    mapped += hi - lo
    blocks = sorted(blocks, key=lambda b: b[0], reverse=True)
    return mapped, blocks[0][1], blocks[0][2]


def oracle_paf_elections(pafs: list[PafData], targets, map_qual, iden_percent, mq_cutoff):
    """Mirror of the PAF branch: ([paf_lines per file], high_qual_set)."""
    synteny: dict = {}
    hq = set()
    paf_lines = [dict() for _ in pafs]
    for i, paf in enumerate(pafs):
        for k in range(paf.n_records):
            target = paf.targets[k]
            if target not in targets:
                continue
            identity = int(paf.nmatch[k]) / int(paf.alnlen[k])
            if int(paf.mapq[k]) >= map_qual and identity >= iden_percent:
                q = paf.names[k]
                synteny.setdefault(q, {}).setdefault(target, []).append(
                    (
                        int(paf.qlen[k]), int(paf.qstart[k]), int(paf.qend[k]),
                        int(paf.tstart[k]), int(paf.tend[k]), identity,
                    )
                )
                if int(paf.mapq[k]) >= mq_cutoff:
                    hq.add(q)
        for q in synteny:
            results = {}
            for target, alns in synteny[q].items():
                mapped, _, _ = _merge_props(alns, 1, 2)
                qlen = alns[0][0]
                rate = mapped / qlen
                avg = sum(a[-1] for a in alns) / len(alns)
                _, lo, hi = _merge_props(alns, 3, 4)
                results[target] = (avg * rate, lo, hi, qlen)
            primary = sorted(results, key=lambda t: (results[t][0], t), reverse=True)[0]
            r = results[primary]
            paf_lines[i][q] = (primary, r[1], r[2], r[3])
    return paf_lines, hq


def oracle_curate(files: list[dict], high_qual: set, ovlp_percent):
    """Mirror of the cross-file fold (GCI.py:272-301)."""
    if len(files) == 1:
        return dict(files[0])
    sets = [set(f.keys()) for f in files]
    comm = set.intersection(*sets)
    final = high_qual | comm
    file1 = {q: seg for q, seg in files[0].items() if q in final}
    for f in files[1:]:
        for q, seg in f.items():
            if q in file1:
                seg1 = file1[q]
                if seg[0] == seg1[0]:
                    ovlp = min(seg[2], seg1[2]) - max(seg[1], seg1[1])
                    if ovlp / seg[-1] < ovlp_percent:
                        del file1[q]
                    else:
                        file1[q] = (seg1[0], max(seg[1], seg1[1]), min(seg[2], seg1[2]))
                else:
                    del file1[q]
            elif q in high_qual:
                file1[q] = (seg[0], seg[1], seg[2])
    return file1


def oracle_depths(curated: dict, targets_length: dict, flank_len):
    depths = {t: np.zeros(l, dtype=np.int64) for t, l in targets_length.items()}
    for seg in curated.values():
        depths[seg[0]][seg[1] + flank_len : seg[2] - flank_len + 1] += 1
    return depths


def oracle_filter(pafs, bams, targets_length, map_qual=30, mq_cutoff=50,
                  iden_percent=0.9, clip_percent=0.1, ovlp_percent=0.9,
                  flank_len=15):
    """Whole filter(): returns the per-target depth dict."""
    paf_lines, hq = oracle_paf_elections(
        pafs, targets_length, map_qual, iden_percent, mq_cutoff
    )
    bam_dicts = []
    for bam in bams:
        d, h = oracle_bam_dict(
            bam, targets_length, map_qual, clip_percent, iden_percent, mq_cutoff
        )
        bam_dicts.append(d)
        hq |= h
    curated = oracle_curate(paf_lines + bam_dicts, hq, ovlp_percent)
    return oracle_depths(curated, targets_length, flank_len)
