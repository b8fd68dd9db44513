"""Benchmark: reads/s through the filtered+depth-binned device pipeline, one chip.

Synthetic CHM13-scale workload (the reference ships no speed harness;
BASELINE.json metric: "CHM13 HiFi+ONT reads/s filtered+depth-binned per
chip").  The measured step is the device compute path: vectorized filter
cascade -> read-delta scatter -> genome prefix sum -> gap mask -> issue
interval edge extraction, jitted as one program on one TPU chip.

The baseline comparator is a faithful reference-style implementation
(per-read numpy slice increments + per-base Python interval scan,
GCI.py:302-306/356-390) timed on a subsampled workload and scaled linearly —
the reference's cost is linear in reads and bases.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

# persistent compile cache: the remote Mosaic/XLA compile of the fused scan
# kernel is slow (minutes) and highly variable on this host; cache it on disk
# so repeated bench runs pay it once (shared dir/implementation with the CLI
# and graft entry — gci_tpu.utils.jaxcache).
import jax  # noqa: E402

from gci_tpu.utils.jaxcache import enable_compile_cache  # noqa: E402

enable_compile_cache(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
)

GENOME_BP = 1_000_000_000  # 1 Gbp synthetic assembly (8 targets)
N_READS = 4_000_000        # ~typical HiFi read count at this scale
N_TARGETS = 8
FLANK = 15
READ_LEN_MEAN = 18_000

BASELINE_SAMPLE_READS = 40_000
BASELINE_SAMPLE_BP = 40_000_000


def synth_columns(rng, n_reads, target_len, n_targets):
    """Synthetic packed BAM columns with realistic filter pass rates."""
    tid = rng.integers(0, n_targets, size=n_reads, dtype=np.int32)
    start = rng.integers(0, target_len - READ_LEN_MEAN - 1, size=n_reads, dtype=np.int32)
    span = rng.integers(READ_LEN_MEAN // 2, READ_LEN_MEAN * 2, size=n_reads).astype(np.int32)
    end = np.minimum(start + span, target_len)
    m = span
    i = rng.integers(0, 50, size=n_reads, dtype=np.int32)
    d = rng.integers(0, 50, size=n_reads, dtype=np.int32)
    s = (span * rng.beta(1, 30, size=n_reads)).astype(np.int32)
    nm = i + d + (span * rng.beta(1, 60, size=n_reads)).astype(np.int32)
    mapq = rng.choice(np.array([0, 10, 30, 50, 60], dtype=np.int32), size=n_reads)
    flag = rng.choice(np.array([0, 0, 0, 0, 16, 256, 2048], dtype=np.int32), size=n_reads)
    qlen = span + s
    return dict(
        tid=tid, start=start, end=end, m=m, i=i, d=d, s=s,
        eq=np.zeros(n_reads, np.int32), x=np.zeros(n_reads, np.int32),
        nm=nm, mapq=mapq, flag=flag, qlen=qlen,
    )


def device_pipeline(total_padded, offsets_dev, lengths_dev):
    import jax
    import jax.numpy as jnp

    from gci_tpu.depth.pallas_scan import fused_depth_scan
    from gci_tpu.filters.device import bam_filter_mask_device

    def step(c, valid, leftmost, rightmost):
        keep = bam_filter_mask_device(
            c["flag"], c["mapq"], c["m"], c["i"], c["d"], c["s"],
            c["eq"], c["x"], c["nm"],
        )
        L = lengths_dev[c["tid"]]
        s = c["start"].astype(jnp.int32) + FLANK
        e = c["end"].astype(jnp.int32) - FLANK + 1
        e = jnp.where(e < 0, e + L, e)
        e = jnp.clip(e, 0, L)
        s = jnp.minimum(s, L)
        live = (keep & (e > s)).astype(jnp.int32)
        base = offsets_dev[c["tid"]]
        gs = base + s
        ge = base + e
        delta = jnp.zeros(total_padded, jnp.int32)
        delta = delta.at[gs].add(live, mode="drop")
        delta = delta.at[ge].add(-live, mode="drop")
        depth, rise, fall = fused_depth_scan(delta, valid, leftmost, rightmost)
        # tiny reductions force full materialization without a 4GB readback
        return depth[-1], rise.sum(), fall.sum(), keep.sum()

    return jax.jit(step)


def run_device(cols, targets_length):
    import jax
    import jax.numpy as jnp

    from gci_tpu.depth.accum import GenomeLayout
    from gci_tpu.depth.device import build_scan_valid, pallas_chunk_multiple

    layout = GenomeLayout.from_targets(targets_length)
    chunk = pallas_chunk_multiple()
    total_padded = layout.total_slots + ((-layout.total_slots) % chunk)
    valid = np.zeros(total_padded, dtype=np.int8)
    valid[: layout.total_slots] = build_scan_valid(layout, FLANK)
    step = device_pipeline(
        total_padded,
        jnp.asarray(layout.offsets[:-1].astype(np.int32)),
        jnp.asarray(layout.lengths.astype(np.int32)),
    )
    c_dev = {k: jnp.asarray(v) for k, v in cols.items()}
    valid_dev = jnp.asarray(valid)
    # warmup/compile
    out = step(c_dev, valid_dev, -1, 0)
    res = [int(np.asarray(x)) for x in out]
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = step(c_dev, valid_dev, -1, 0)
        res = [int(np.asarray(x)) for x in out]
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), res


def run_reference_style(cols, targets_length, n_sample, bp_sample):
    """Reference-equivalent host implementation on a subsample, scaled."""
    names = list(targets_length)
    scale_targets = {t: bp_sample // len(names) for t in names}
    sub = {k: v[:n_sample] for k, v in cols.items()}
    L = bp_sample // len(names)
    depths = {t: np.zeros(L, dtype=np.int64) for t in names}
    t0 = time.perf_counter()
    # per-read python loop with the reference's filter conditionals
    for k in range(n_sample):
        flag = int(sub["flag"][k])
        if flag & (4 | 256 | 2048) or int(sub["mapq"][k]) < 30:
            continue
        M, I, D, S = (int(sub[x][k]) for x in ("m", "i", "d", "s"))
        eq, X, NM = (int(sub[x][k]) for x in ("eq", "x", "nm"))
        mm = NM - (I + D)
        denom1 = M + eq + X + I + S
        denom2 = M + eq + X + I + D
        if denom1 == 0 or denom2 == 0:
            continue
        if S / denom1 > 0.1 or (M + eq + X - mm) / denom2 < 0.9:
            continue
        t = names[int(sub["tid"][k]) % len(names)]
        s0 = min(int(sub["start"][k]), L)
        e0 = min(int(sub["end"][k]), L)
        depths[t][s0 + FLANK : e0 - FLANK + 1] += 1
    read_time = time.perf_counter() - t0
    # per-base python interval scan (the reference's collapse loop)
    t0 = time.perf_counter()
    for t in names:
        dl = depths[t]
        start_flag, end_flag = 0, 1
        chr_len = len(dl)
        for i2, depth in enumerate(dl[FLANK : chr_len - FLANK]):
            if -1 < depth <= 0:
                if start_flag == 0:
                    start_flag, end_flag = 1, 0
                if i2 == (chr_len - FLANK * 2 - 1):
                    pass
            else:
                if end_flag == 0:
                    end_flag, start_flag = 1, 0
    scan_time = time.perf_counter() - t0
    per_read = read_time / n_sample
    per_base = scan_time / bp_sample
    return per_read, per_base


def main():
    rng = np.random.default_rng(0xBEEF)
    target_len = GENOME_BP // N_TARGETS
    targets_length = {f"chr{i}": target_len for i in range(N_TARGETS)}
    cols = synth_columns(rng, N_READS, target_len, N_TARGETS)

    dev_time, checks = run_device(cols, targets_length)
    reads_per_s = N_READS / dev_time

    per_read, per_base = run_reference_style(
        cols, targets_length, BASELINE_SAMPLE_READS, BASELINE_SAMPLE_BP
    )
    ref_time_full = per_read * N_READS + per_base * GENOME_BP
    ref_reads_per_s = N_READS / ref_time_full

    print(
        json.dumps(
            {
                "metric": "synthetic 1Gbp/4M-read filtered+depth-binned+interval-scanned reads/s per chip",
                "value": round(reads_per_s, 1),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_s / ref_reads_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
