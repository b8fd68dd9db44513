"""Synthetic FASTA/BAM/PAF generators for tests.

The reference repo ships no test inputs (SURVEY.md §4), so these build small
but adversarial alignment sets: boundary-hugging reads, flank-sized
alignments (negative-stop slice quirk), duplicate names, multi-target PAF
queries, clip/identity threshold edges.
"""
from __future__ import annotations

import numpy as np

from gci_tpu.io.bam_writer import build_record, write_bam


def make_fasta(path, records, width=60):
    with open(path, "w") as f:
        for rid, seq in records:
            f.write(f">{rid}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i : i + width] + "\n")


def make_bam(path, references, lengths, reads):
    """reads: list of dicts with keys name, ref (name), pos, mapq, cigar,
    optional flag, nm, seq_len."""
    ref_ids = {r: i for i, r in enumerate(references)}
    recs = []
    for rd in reads:
        recs.append(
            build_record(
                rd["name"],
                ref_ids[rd["ref"]] if rd.get("ref") is not None else -1,
                rd.get("pos", 0),
                rd.get("mapq", 60),
                rd.get("cigar", "100M"),
                flag=rd.get("flag", 0),
                nm=rd.get("nm", 0),
                seq_len=rd.get("seq_len"),
                seq=rd.get("seq"),
            )
        )
    # coordinate order like a sorted BAM
    order = sorted(
        range(len(reads)),
        key=lambda k: (
            ref_ids.get(reads[k].get("ref"), 1 << 30),
            reads[k].get("pos", 0),
        ),
    )
    # level 1: fixture BAMs are write-once scratch data, favor speed
    write_bam(path, references, lengths, [recs[k] for k in order], level=1)


def make_paf(path, rows):
    """rows: (qname, qlen, qstart, qend, strand, target, tlen, tstart, tend,
    nmatch, alnlen, mapq)"""
    with open(path, "w") as f:
        for r in rows:
            f.write("\t".join(map(str, r)) + "\n")


def random_reads(rng, references, lengths, n, name_prefix="r", mapq_choices=(0, 20, 30, 50, 60)):
    reads = []
    for k in range(n):
        ri = int(rng.integers(0, len(references)))
        L = lengths[ri]
        pos = int(rng.integers(0, max(L - 50, 1)))
        span = int(rng.integers(20, min(max(L - pos, 21), 30000)))
        m = span
        s = int(rng.integers(0, max(m // 5, 1)))
        i_len = int(rng.integers(0, 5))
        d_len = int(rng.integers(0, 5))
        nm = i_len + d_len + int(rng.integers(0, max(m // 20, 1)))
        cigar = ""
        if s:
            cigar += f"{s}S"
        cigar += f"{m}M"
        if i_len:
            cigar += f"{i_len}I"
        if d_len:
            cigar += f"{d_len}D"
        reads.append(
            dict(
                name=f"{name_prefix}{int(rng.integers(0, max(n, 2)))}",
                ref=references[ri],
                pos=pos,
                mapq=int(rng.choice(mapq_choices)),
                cigar=cigar,
                flag=int(rng.choice([0, 0, 0, 16, 256, 2048, 4])),
                nm=nm,
            )
        )
    return reads
