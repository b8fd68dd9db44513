"""Round-5 fused-kernel candidates (VERDICT r4 'Weak #1' / 'Next #3').

The r4 packed kernel (fused_depth_scan_flags: i32+i8 in, i32+i8 out,
10 B/slot) measured 19.4-20.3 ms per 0.5G-slot pass vs its own copy4
stream-mix ceiling of 15.6 ms — a ~4 ms VPU tail and one int8 input
stream of headroom.  The named lever is fewer/wider streams.  Candidates:

* packed9 — fold the THREE input streams into ONE int32 word per slot:
  ``word = read_delta<<2 | gap_event<<1 | valid_event``.  Because N-gap
  intervals and scan-window intervals are each DISJOINT, their event
  prefix sums are always in {0,1}, so one int32 cumsum scans all three
  fields at once with no cross-field carries (the depth field needs
  depth < 2^29, asserted at pack time).  The chunk carry then transports
  the gap/valid seed state for free (it IS the packed prefix).  Outputs
  stay clean: depth i32 + flag byte (rise|fall<<1|change<<2|gap<<3).
  9 B/slot, and e2e it deletes the separate flag-build pass entirely
  (two O(genome) prefix-sum programs in fused._flags_fn).
  The VPU tail is also trimmed: ONE predecessor pass instead of two
  (the interval mask rides the sign bit of the depth word), and the
  position-0 forced change boundary moves into the predecessor seed
  (no iota/force ops).
* fold8 — same input word; all four out-flags folded into the depth
  word's high bits (depth | gap<<28 | rise<<29 | fall<<30 | change<<31):
  8 B/slot, the 2-stream copy floor, at the cost of a packed output
  contract (every consumer masks, and bit-stream readbacks must read
  4 B/slot instead of 1).
* copy3 — i32 in -> i32 + i8 out pure copy: packed9's structural DMA
  ceiling (the honest denominator for its sol fraction).

Usage:  python experiments/kernel_r5.py [--rows N] [--variants a,b,c]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gci_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
)

from gci_tpu.depth import pallas_scan as ps  # noqa: E402

LANES = 128
TOTAL = 1 << 29  # 0.5G slots, the r3/r4 measurement size
ITERS = 16


def timeit_chained(make_step, *args):
    """Per-pass seconds: (t_16 - t_1) / 15 cancels tunnel dispatch."""

    def timed(n):
        fn = make_step(n)
        _ = int(np.asarray(fn(*args)))  # compile + warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = int(np.asarray(fn(*args)))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    t1 = timed(1)
    tn = timed(ITERS)
    return (tn - t1) / (ITERS - 1)


# ---------------------------------------------------------------------------
# candidate kernel bodies
# ---------------------------------------------------------------------------

def _packed9_body(is_first, carry_val, lo, hi, word_ref, depth_ref, flags_ref):
    """Folded-input kernel: scan ONE packed word, emit clean depth + flags."""
    w = word_ref[:]
    row_cs = ps._lane_inclusive_scan(w)
    sw = row_cs + ps._row_carry_bcast(row_cs) + carry_val  # packed prefix
    depth = jax.lax.shift_right_logical(sw, 2)  # sw >= 0 always
    depth_ref[:] = depth

    gap2 = jnp.bitwise_and(sw, 2)  # 0 or 2
    masked = jnp.where(gap2 != 0, 0, depth)
    m = (masked > lo) & (masked <= hi) & (jnp.bitwise_and(sw, 1) != 0)

    carry_depth = jax.lax.shift_right_logical(carry_val, 2)
    prev_masked0 = jnp.where(jnp.bitwise_and(carry_val, 2) != 0, 0, carry_depth)
    prev0_m = (
        (prev_masked0 > lo)
        & (prev_masked0 <= hi)
        & (jnp.bitwise_and(carry_val, 1) != 0)
    )
    # ONE predecessor pass: the interval mask rides the sign bit
    int_min = jnp.int32(-(2**31))
    pw = jnp.where(m, jnp.bitwise_or(depth, int_min), depth)
    # position-0 forced change boundary: seed an impossible prev depth
    seed_pw = jnp.bitwise_or(
        jnp.where(prev0_m, int_min, 0),
        jnp.where(is_first, jnp.int32(0x7FFFFFFF), carry_depth),
    )
    prev_pw = ps._linear_prev(pw, seed_pw)
    prev_m = prev_pw < 0
    prev_depth = jnp.bitwise_and(prev_pw, jnp.int32(0x7FFFFFFF))
    rise = m & ~prev_m
    fall = prev_m & ~m
    change = depth != prev_depth
    flags_ref[:] = (
        rise.astype(jnp.int32)
        + fall.astype(jnp.int32) * 2
        + change.astype(jnp.int32) * 4
        + gap2 * 4  # 0/2 -> bit3
    ).astype(jnp.int8)


def _fold8_body(is_first, carry_val, lo, hi, word_ref, out_ref):
    """Fully folded: flags ride the depth word's high bits (8 B/slot)."""
    w = word_ref[:]
    row_cs = ps._lane_inclusive_scan(w)
    sw = row_cs + ps._row_carry_bcast(row_cs) + carry_val
    depth = jax.lax.shift_right_logical(sw, 2)

    gap2 = jnp.bitwise_and(sw, 2)
    masked = jnp.where(gap2 != 0, 0, depth)
    m = (masked > lo) & (masked <= hi) & (jnp.bitwise_and(sw, 1) != 0)

    carry_depth = jax.lax.shift_right_logical(carry_val, 2)
    prev_masked0 = jnp.where(jnp.bitwise_and(carry_val, 2) != 0, 0, carry_depth)
    prev0_m = (
        (prev_masked0 > lo)
        & (prev_masked0 <= hi)
        & (jnp.bitwise_and(carry_val, 1) != 0)
    )
    int_min = jnp.int32(-(2**31))
    pw = jnp.where(m, jnp.bitwise_or(depth, int_min), depth)
    seed_pw = jnp.bitwise_or(
        jnp.where(prev0_m, int_min, 0),
        jnp.where(is_first, jnp.int32(0x7FFFFFFF), carry_depth),
    )
    prev_pw = ps._linear_prev(pw, seed_pw)
    prev_m = prev_pw < 0
    prev_depth = jnp.bitwise_and(prev_pw, jnp.int32(0x7FFFFFFF))
    rise = m & ~prev_m
    fall = prev_m & ~m
    change = depth != prev_depth
    out_ref[:] = (
        depth
        + jax.lax.shift_left(gap2, 27)  # 0/2 -> bit 28
        + jax.lax.shift_left(rise.astype(jnp.int32), 29)
        + jax.lax.shift_left(fall.astype(jnp.int32), 30)
        + jax.lax.shift_left(change.astype(jnp.int32), 31)
    )


def _packed9_seq_call(rows):
    """Single-pass variant: SEQUENTIAL grid, carry lives in SMEM scratch —
    no separate whole-array reduce pass (the next chunk's carry is just
    sw[-1, -1] of the tile already computed)."""
    n_chunks = TOTAL // (rows * LANES)
    spec = pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0))

    def kernel(lo_s, hi_s, word_b, depth_b, flags_b, carry_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_ref[0] = 0

        carry_val = carry_ref[0]
        w = word_b[0]
        row_cs = ps._lane_inclusive_scan(w)
        sw = row_cs + ps._row_carry_bcast(row_cs) + carry_val
        carry_ref[0] = sw[rows - 1, LANES - 1]
        depth = jax.lax.shift_right_logical(sw, 2)
        depth_b[0] = depth
        lo, hi = lo_s[i], hi_s[i]
        gap2 = jnp.bitwise_and(sw, 2)
        masked = jnp.where(gap2 != 0, 0, depth)
        m = (masked > lo) & (masked <= hi) & (jnp.bitwise_and(sw, 1) != 0)
        carry_depth = jax.lax.shift_right_logical(carry_val, 2)
        prev_masked0 = jnp.where(
            jnp.bitwise_and(carry_val, 2) != 0, 0, carry_depth
        )
        prev0_m = (
            (prev_masked0 > lo)
            & (prev_masked0 <= hi)
            & (jnp.bitwise_and(carry_val, 1) != 0)
        )
        int_min = jnp.int32(-(2**31))
        pw = jnp.where(m, jnp.bitwise_or(depth, int_min), depth)
        seed_pw = jnp.bitwise_or(
            jnp.where(prev0_m, int_min, 0),
            jnp.where(i == 0, jnp.int32(0x7FFFFFFF), carry_depth),
        )
        prev_pw = ps._linear_prev(pw, seed_pw)
        prev_m = prev_pw < 0
        prev_depth = jnp.bitwise_and(prev_pw, jnp.int32(0x7FFFFFFF))
        rise = m & ~prev_m
        fall = prev_m & ~m
        change = depth != prev_depth
        flags_b[0] = (
            rise.astype(jnp.int32)
            + fall.astype(jnp.int32) * 2
            + change.astype(jnp.int32) * 4
            + gap2 * 4
        ).astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_chunks,),
            in_specs=[spec],
            out_specs=[spec, spec],
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_chunks, rows, LANES), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )


def _make_call(body, rows, out_dtypes):
    n_chunks = TOTAL // (rows * LANES)
    spec = pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0))

    def kernel(carry_s, lo_s, hi_s, word_b, *outs):
        i = pl.program_id(0)
        body(i == 0, carry_s[i], lo_s[i], hi_s[i], word_b.at[0],
             *[o.at[0] for o in outs])

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_chunks,),
            in_specs=[spec],
            out_specs=[spec] * len(out_dtypes),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, rows, LANES), dt)
            for dt in out_dtypes
        ],
        compiler_params=ps._grid_params(rows),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--variants", default="all")
    args = ap.parse_args()
    rows = args.rows
    n_chunks = TOTAL // (rows * LANES)
    chunk = rows * LANES

    rng = np.random.default_rng(0)
    delta_h = np.zeros(TOTAL, np.int32)
    idx = rng.integers(0, TOTAL - 1, 4_000_000)
    np.add.at(delta_h, idx, 1)
    np.add.at(delta_h, idx + 1, -1)
    # packed word: delta<<2, valid everywhere (one +1 event at slot 0),
    # a few gap intervals
    word_h = delta_h << 2
    word_h[0] += 1
    gs = rng.integers(0, TOTAL - 2000, 64)
    gs.sort()
    word_h[gs] += 2
    word_h[gs + 1000] -= 2
    word = jnp.asarray(word_h)

    results = {}

    def report(name, secs, nbytes):
        results[name] = round(secs * 1e3, 2)
        print(
            f"{name:28s} {secs*1e3:8.2f} ms/pass   {nbytes/secs/1e9:7.1f} GB/s",
            flush=True,
        )

    def prep(x):
        d2 = x.reshape(n_chunks, rows, LANES)
        sums = jnp.sum(d2, axis=(1, 2), dtype=jnp.int32)
        carry = jnp.cumsum(sums) - sums
        lo = jnp.full((n_chunks,), -1, jnp.int32)
        hi = jnp.full((n_chunks,), 0, jnp.int32)
        return d2, carry, lo, hi

    variants = args.variants.split(",") if args.variants != "all" else [
        "flags10", "packed9", "copy3", "fold8",
    ]

    # --- current production packed kernel (10 B/slot), for the day's floor
    if "flags10" in variants:
        flags_dev = jnp.full(TOTAL, 2, jnp.int8)

        def make_flags10(n):
            @jax.jit
            def f(delta, flags):
                def body(_, d):
                    depth, _ = ps.fused_depth_scan_flags(
                        d, flags, -1, 0, rows=rows
                    )
                    return depth

                return jax.lax.fori_loop(0, n, body, delta)[-1]

            return f

        report(
            "flags10(2in/2out)",
            timeit_chained(make_flags10, jnp.asarray(delta_h), flags_dev),
            10 * TOTAL,
        )

    # --- packed9: folded input word, clean depth + flag byte out ---
    if "packed9" in variants:
        call9 = _make_call(_packed9_body, rows, (jnp.int32, jnp.int8))

        def make_packed9(n):
            @jax.jit
            def f(w):
                d2, carry, lo, hi = prep(w)

                def body(_, x):
                    o, _f = call9(carry, lo, hi, x)
                    return o

                return jax.lax.fori_loop(0, n, body, d2).reshape(-1)[-1]

            return f

        report("packed9(1in/2out)", timeit_chained(make_packed9, word), 9 * TOTAL)

        # exactness vs the production flags kernel on equivalent inputs
        d2, carry, lo, hi = prep(word)
        dep9, fl9 = call9(carry, lo, hi, d2)
        # rebuild the unpacked streams from the event lists (bit-extracting
        # them from word_h would mangle the negative event contributions)
        gd = np.zeros(TOTAL, np.int32)
        np.add.at(gd, gs, 1)
        np.add.at(gd, gs + 1000, -1)
        gap_h = (np.cumsum(gd) > 0).astype(np.int8)
        flags_h = gap_h + 2  # valid everywhere (one +1 event at slot 0)
        depA, flA = ps.fused_depth_scan_flags(
            jnp.asarray(delta_h), jnp.asarray(flags_h), -1, 0, rows=rows
        )
        dep_ok = bool(jnp.all(dep9.reshape(-1) == depA))
        # packed9 flags add bit3 = gap; bits 0-2 must match
        fl_ok = bool(
            jnp.all((fl9.reshape(-1) & 7) == flA)
            & jnp.all(((fl9.reshape(-1) >> 3) & 1) == jnp.asarray(gap_h))
        )
        print(f"  packed9 parity vs flags10: depth={dep_ok} flags={fl_ok}",
              flush=True)

    # --- copy3: packed9's structural DMA ceiling ---
    if "copy3" in variants:
        n_ch = n_chunks
        spec = pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0))

        def copy3_kernel(carry_s, w, o_depth, o_flags):
            o_depth[...] = w[...]
            o_flags[...] = (w[...] & 1).astype(jnp.int8)

        call3 = pl.pallas_call(
            copy3_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_ch,),
                in_specs=[spec], out_specs=[spec] * 2,
            ),
            out_shape=[
                jax.ShapeDtypeStruct((n_ch, rows, LANES), jnp.int32),
                jax.ShapeDtypeStruct((n_ch, rows, LANES), jnp.int8),
            ],
            compiler_params=ps._grid_params(rows),
        )

        def make_copy3(n):
            carry = jnp.zeros(n_ch, jnp.int32)

            @jax.jit
            def f(w):
                def body(_, x):
                    o, _f = call3(carry, x)
                    return o

                return jax.lax.fori_loop(
                    0, n, body, w.reshape(n_ch, rows, LANES)
                ).reshape(-1)[-1]

            return f

        report("copy3(1in/2out mix)", timeit_chained(make_copy3, word), 9 * TOTAL)

    # --- fold8: everything in two int32 streams ---
    if "fold8" in variants:
        call8 = _make_call(_fold8_body, rows, (jnp.int32,))

        def make_fold8(n):
            @jax.jit
            def f(w):
                d2, carry, lo, hi = prep(w)

                def body(_, x):
                    (o,) = call8(carry, lo, hi, x)
                    return o

                return jax.lax.fori_loop(0, n, body, d2).reshape(-1)[-1]

            return f

        report("fold8(1in/1out)", timeit_chained(make_fold8, word), 8 * TOTAL)

    print(results, flush=True)




def extra_variants(rows=2048):
    """Decompose packed9 = carry prep (full-array reduce + tiny cumsum) +
    pallas scan pass: are they additive, or does XLA hide the prep?"""
    import jax
    import jax.numpy as jnp

    n_chunks = TOTAL // (rows * LANES)
    rng = np.random.default_rng(0)
    word_h = rng.integers(-4, 8, size=TOTAL).astype(np.int32)
    word = jnp.asarray(word_h)

    results = {}

    def report(name, secs, nbytes):
        results[name] = round(secs * 1e3, 2)
        print(f"{name:28s} {secs*1e3:8.2f} ms/pass   "
              f"{nbytes/secs/1e9:7.1f} GB/s", flush=True)

    # prep only: chained sums+cumsum (the fused call's non-pallas part)
    def make_prep(n):
        @jax.jit
        def f(w):
            def body(_, x):
                d2 = x.reshape(n_chunks, rows, LANES)
                sums = jnp.sum(d2, axis=(1, 2), dtype=jnp.int32)
                carry = jnp.cumsum(sums) - sums
                # keep the same chained int32 array shape
                return x + carry[0]
            return jax.lax.fori_loop(0, n, body, w)[-1]
        return f

    report("prep-only(reduce+cumsum)", timeit_chained(make_prep, word), 2 * TOTAL)

    # pallas scan WITHOUT the prep: fixed precomputed carry
    call9 = _make_call(_packed9_body, rows, (jnp.int32, jnp.int8))
    carry0 = jnp.zeros(n_chunks, jnp.int32)
    lo = jnp.full((n_chunks,), -1, jnp.int32)
    hi = jnp.full((n_chunks,), 0, jnp.int32)

    def make_noprep(n):
        @jax.jit
        def f(w):
            def body(_, x):
                o, _f = call9(carry0, lo, hi, x)
                return o
            return jax.lax.fori_loop(
                0, n, body, w.reshape(n_chunks, rows, LANES)
            ).reshape(-1)[-1]
        return f

    report("packed9-noprep", timeit_chained(make_noprep, word), 9 * TOTAL)

    # single-pass sequential-grid variant: no reduce pre-pass at all
    call_seq = _packed9_seq_call(rows)

    def make_seq(n):
        @jax.jit
        def f(w):
            def body(_, x):
                o, _f = call_seq(lo, hi, x)
                return o
            return jax.lax.fori_loop(
                0, n, body, w.reshape(n_chunks, rows, LANES)
            ).reshape(-1)[-1]
        return f

    report("packed9-seq(1 pass e2e)", timeit_chained(make_seq, word), 9 * TOTAL)

    # exactness vs the production two-phase call on a real event word
    rng = np.random.default_rng(1)
    wh = np.zeros(TOTAL, np.int32)
    idx = rng.integers(0, TOTAL - 1, 1_000_000)
    np.add.at(wh, idx, 4)
    np.add.at(wh, idx + 1, -4)
    wh[0] += 1
    gs = np.sort(rng.choice(TOTAL - 2000, 64, replace=False))
    np.add.at(wh, gs, 2)
    np.add.at(wh, gs + 1000, -2)
    wv = jnp.asarray(wh)
    d_ref, f_ref = ps.fused_depth_scan_packed(wv, -1, 0, rows=rows)
    d_seq, f_seq = call_seq(lo, hi, wv.reshape(n_chunks, rows, LANES))
    ok_d = bool(jnp.all(d_seq.reshape(-1) == d_ref))
    ok_f = bool(jnp.all(f_seq.reshape(-1) == f_ref))
    print(f"  packed9-seq parity vs two-phase: depth={ok_d} flags={ok_f}",
          flush=True)
    print(results, flush=True)





if __name__ == "__main__":
    if "--extra" in sys.argv:
        extra_variants()
    else:
        main()
