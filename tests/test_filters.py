"""Vectorized cascade vs the per-record oracle on randomized inputs."""
import numpy as np
import pytest

from gci_tpu.depth import GenomeLayout, accumulate_depth_numpy, depth_dict_from_flat
from gci_tpu.filters import (
    CurationInput,
    bam_filter_mask,
    curate_files,
    dedup_last_wins,
    elect_primary_targets,
    paf_filter_mask,
)
from gci_tpu.filters.cascade import high_qual_keys
from gci_tpu.io.bam import read_bam
from gci_tpu.io.names import hash_names
from gci_tpu.io.paf import read_paf
from tests.fixtures import make_bam, make_paf, random_reads
from tests.oracle_gci import oracle_filter

REFS = ["chrA", "chrB", "chrC"]
LENS = [40000, 25000, 10000]
TARGETS = dict(zip(REFS, LENS))


def _vector_filter(pafs, bams, targets_length, flank_len=15, **kw):
    """Production path: masks + election + curation + depth (numpy)."""
    map_qual = kw.get("map_qual", 30)
    mq_cutoff = kw.get("mq_cutoff", 50)
    iden = kw.get("iden_percent", 0.9)
    clip = kw.get("clip_percent", 0.1)
    ovlp = kw.get("ovlp_percent", 0.9)
    target_ids = {t: i for i, t in enumerate(targets_length)}
    layout = GenomeLayout.from_targets(targets_length)
    hq_parts = []
    inputs = []
    paf_masked = []
    for paf in pafs:
        in_t = np.array([t in target_ids for t in paf.targets], dtype=bool)
        mask = in_t & paf_filter_mask(paf.mapq, paf.nmatch, paf.alnlen, map_qual, iden)
        paf_masked.append((paf, mask))
        hq_parts.append(high_qual_keys(paf.name_keys, mask, paf.mapq, mq_cutoff))
    for elected in elect_primary_targets(paf_masked):
        names = list(elected.keys())
        vals = list(elected.values())
        inputs.append(
            CurationInput(
                hash_names(names),
                np.array([target_ids[v[0]] for v in vals], dtype=np.int32),
                np.array([v[1] for v in vals], dtype=np.int64),
                np.array([v[2] for v in vals], dtype=np.int64),
                np.array([v[3] for v in vals], dtype=np.int64),
            )
        )
    for bam in bams:
        l2g = np.full(len(bam.references) + 1, -1, dtype=np.int32)
        for k, name in enumerate(bam.references):
            if name in target_ids:
                l2g[k] = target_ids[name]
        rid = bam.columns["ref_id"]
        gtid = np.where(
            (rid >= 0) & (rid < len(bam.references)), l2g[np.clip(rid, 0, None)], -1
        )
        mask = (gtid >= 0) & bam_filter_mask(bam.columns, map_qual, clip, iden)
        hq_parts.append(high_qual_keys(bam.name_keys, mask, bam.columns["mapq"], mq_cutoff))
        surv = dedup_last_wins(bam.name_keys, mask)
        inputs.append(
            CurationInput(
                bam.name_keys[surv],
                gtid[surv],
                bam.columns["pos"][surv].astype(np.int64),
                bam.columns["ref_end"][surv].astype(np.int64),
                bam.columns["qlen"][surv].astype(np.int64),
            )
        )
    non_empty = [p for p in hq_parts if p.size]
    hq = (
        np.unique(np.concatenate(non_empty))
        if non_empty
        else np.empty(0, dtype=[("a", np.uint64), ("b", np.uint64)])
    )
    cur = curate_files(inputs, hq, ovlp)
    flat = accumulate_depth_numpy(layout, cur.target_id, cur.start, cur.end, flank_len)
    return depth_dict_from_flat(layout, flat)


def _compare(got, want):
    assert set(got) == set(want)
    for t in want:
        np.testing.assert_array_equal(got[t], want[t], err_msg=t)


def test_single_bam_matches_oracle(tmp_path, rng):
    p = str(tmp_path / "a.bam")
    make_bam(p, REFS, LENS, random_reads(rng, REFS, LENS, 400))
    bam = read_bam(p)
    got = _vector_filter([], [bam], TARGETS)
    want = oracle_filter([], [bam], TARGETS)
    _compare(got, want)


def test_two_bams_matches_oracle(tmp_path, rng):
    p1, p2 = str(tmp_path / "a.bam"), str(tmp_path / "b.bam")
    make_bam(p1, REFS, LENS, random_reads(rng, REFS, LENS, 300))
    make_bam(p2, REFS, LENS, random_reads(rng, REFS, LENS, 300))
    bams = [read_bam(p1), read_bam(p2)]
    got = _vector_filter([], bams, TARGETS)
    want = oracle_filter([], bams, TARGETS)
    _compare(got, want)


def _random_paf_rows(rng, n, name_space=120):
    rows = []
    for _ in range(n):
        t = REFS[int(rng.integers(0, len(REFS)))]
        tlen = TARGETS[t]
        qlen = int(rng.integers(500, 20000))
        qs = int(rng.integers(0, qlen // 2))
        qe = int(rng.integers(qs + 1, qlen + 1))
        ts = int(rng.integers(0, max(tlen - 100, 1)))
        te = min(ts + (qe - qs), tlen)
        alnlen = max(qe - qs, 1)
        nmatch = int(alnlen * rng.uniform(0.7, 1.0))
        mapq = int(rng.choice([0, 20, 30, 50, 60]))
        rows.append(
            (f"q{int(rng.integers(0, name_space))}", qlen, qs, qe, "+", t,
             tlen, ts, te, nmatch, alnlen, mapq)
        )
    return rows


def test_paf_plus_bam_matches_oracle(tmp_path, rng):
    pp1 = str(tmp_path / "x.paf")
    pp2 = str(tmp_path / "y.paf")
    bp = str(tmp_path / "a.bam")
    make_paf(pp1, _random_paf_rows(rng, 300))
    make_paf(pp2, _random_paf_rows(rng, 250))
    make_bam(bp, REFS, LENS, random_reads(rng, REFS, LENS, 300, name_prefix="q"))
    pafs = [read_paf(pp1), read_paf(pp2)]
    bam = read_bam(bp)
    got = _vector_filter(pafs, [bam], TARGETS)
    want = oracle_filter(pafs, [bam], TARGETS)
    _compare(got, want)


def test_flank_wrap_quirk(tmp_path):
    # alignment shorter than the flank: end-flank+1 goes negative and the
    # reference's slice wraps around to L+e (GCI.py:302-306)
    reads = [dict(name="tiny", ref="chrC", pos=2, mapq=60, cigar="10M", nm=0)]
    p = str(tmp_path / "t.bam")
    make_bam(p, REFS, LENS, reads)
    bam = read_bam(p)
    got = _vector_filter([], [bam], TARGETS)
    want = oracle_filter([], [bam], TARGETS)
    _compare(got, want)
    # the quirk produces a huge smeared increment, not a no-op
    assert got["chrC"].sum() > 0


def test_chrs_restriction_matches_oracle(tmp_path, rng):
    p = str(tmp_path / "a.bam")
    make_bam(p, REFS, LENS, random_reads(rng, REFS, LENS, 200))
    bam = read_bam(p)
    restricted = {"chrB": TARGETS["chrB"]}
    got = _vector_filter([], [bam], restricted)
    want = oracle_filter([], [bam], restricted)
    _compare(got, want)


def test_paf_plus_two_bams_matches_oracle(tmp_path, rng):
    """Three-file curation fold incl. drop-then-readopt via high-qual."""
    pp = str(tmp_path / "x.paf")
    b1 = str(tmp_path / "a.bam")
    b2 = str(tmp_path / "b.bam")
    make_paf(pp, _random_paf_rows(rng, 250, name_space=80))
    make_bam(b1, REFS, LENS, random_reads(rng, REFS, LENS, 250, name_prefix="q"))
    make_bam(b2, REFS, LENS, random_reads(rng, REFS, LENS, 250, name_prefix="q"))
    pafs = [read_paf(pp)]
    bams = [read_bam(b1), read_bam(b2)]
    got = _vector_filter(pafs, bams, TARGETS)
    want = oracle_filter(pafs, bams, TARGETS)
    _compare(got, want)


def test_ovlp_percent_sweep_matches_oracle(tmp_path, rng):
    b1 = str(tmp_path / "a.bam")
    b2 = str(tmp_path / "b.bam")
    make_bam(b1, REFS, LENS, random_reads(rng, REFS, LENS, 200, name_prefix="s"))
    make_bam(b2, REFS, LENS, random_reads(rng, REFS, LENS, 200, name_prefix="s"))
    bams = [read_bam(b1), read_bam(b2)]
    for op in (0.0, 0.5, 0.99):
        got = _vector_filter([], bams, TARGETS, ovlp_percent=op)
        want = oracle_filter([], bams, TARGETS, ovlp_percent=op)
        _compare(got, want)
