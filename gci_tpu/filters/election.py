"""PAF primary-target election.

Behavioral contract (reference GCI.py:213-254): alignments that pass the
mapq/identity mask are grouped per (query, target); for each query the
primary target maximizes ``average_identity * align_rate`` where

* align_rate = (union length of merged query-coordinate blocks) / query_length
  with query_length taken from the group's *first-inserted* alignment;
* average_identity = plain insertion-order ``sum/len`` of per-block
  identities (float summation order preserved for bit parity);
* ties break toward the lexicographically *larger* target name
  (``sorted(..., key=(score, name), reverse=True)[0]``);
* the elected extent is the longest merged target-coordinate block (first
  one, in ascending-start order, on ties).

The accumulator is cumulative across PAF files: after file *i* the election
re-runs for every query seen in files 0..i (GCI.py:215, 241) — a documented
reference quirk that cross-file curation observes, reproduced here.
"""
from __future__ import annotations

import numpy as np

from gci_tpu.io.paf import PafData


def _union_blocks(pairs: list[tuple[int, int]]) -> tuple[int, list[tuple[int, int, int]]]:
    """Union-merge intervals; return (total_merged_length, blocks).

    Blocks are (length, lo, hi) in ascending-lo order; touching intervals
    (hi == next lo) merge (GCI.py:83-93 semantics).
    """
    srt = sorted(pairs)
    blocks: list[tuple[int, int, int]] = []
    total = 0
    lo, hi = srt[0]
    for s, e in srt[1:]:
        if hi >= s:
            if e > hi:
                hi = e
        else:
            blocks.append((hi - lo, lo, hi))
            total += hi - lo
            lo, hi = s, e
    blocks.append((hi - lo, lo, hi))
    total += hi - lo
    return total, blocks


def _longest_block(blocks: list[tuple[int, int, int]]) -> tuple[int, int]:
    """(lo, hi) of the longest block; first in ascending-lo order on ties."""
    best = max(range(len(blocks)), key=lambda k: (blocks[k][0], -k))
    return blocks[best][1], blocks[best][2]


class PafElection:
    """Cumulative per-(query, target) accumulator + elector."""

    def __init__(self) -> None:
        # query name -> target name -> list of (qlen, qstart, qend, tstart, tend, identity)
        self._synteny: dict[bytes, dict[str, list[tuple]]] = {}

    def add_file(self, paf: PafData, mask: np.ndarray) -> None:
        idx = np.flatnonzero(mask)
        qlen = paf.qlen
        qs, qe = paf.qstart, paf.qend
        ts, te = paf.tstart, paf.tend
        nmatch, alnlen = paf.nmatch, paf.alnlen
        with np.errstate(divide="ignore", invalid="ignore"):
            identity = nmatch.astype(np.float64) / alnlen.astype(np.float64)
        for k in idx.tolist():
            q = paf.names[k]
            per_q = self._synteny.setdefault(q, {})
            per_q.setdefault(paf.targets[k], []).append(
                (int(qlen[k]), int(qs[k]), int(qe[k]), int(ts[k]), int(te[k]), identity[k])
            )

    def elect(self) -> dict[bytes, tuple[str, int, int, int]]:
        """query -> (primary_target, extent_start, extent_end, query_length)."""
        out: dict[bytes, tuple[str, int, int, int]] = {}
        for query, per_target in self._synteny.items():
            best_key = None
            best_val = None
            for target, alns in per_target.items():
                mapped, _ = _union_blocks([(a[1], a[2]) for a in alns])
                query_length = alns[0][0]
                align_rate = mapped / query_length
                avg_identity = sum(a[5] for a in alns) / len(alns)
                score = avg_identity * align_rate
                key = (score, target)
                if best_key is None or key > best_key:
                    _, tblocks = _union_blocks([(a[3], a[4]) for a in alns])
                    lo, hi = _longest_block(tblocks)
                    best_key = key
                    best_val = (target, lo, hi, query_length)
            out[query] = best_val
        return out


def elect_primary_targets(
    paf_files_data: list[tuple[PafData, np.ndarray]],
) -> list[dict[bytes, tuple[str, int, int, int]]]:
    """Run the cumulative election: one elected dict per PAF file.

    ``paf_files_data`` is [(PafData, pass_mask), ...] in CLI file order.
    Entry *i* of the result covers every query seen in files 0..i
    (reference cumulative-synteny quirk, GCI.py:215-254).
    """
    acc = PafElection()
    out = []
    for paf, mask in paf_files_data:
        acc.add_file(paf, mask)
        out.append(acc.elect())
    return out
