"""Attribute the fused-scan compute floor (VERDICT r3 'Weak #1' / 'Next #2').

Measured r3: the production masked kernel runs ~24 ms per 0.5G-slot pass at
rows=2048 (287.9 GB/s of the 13-byte/slot traffic), and a pure copy kernel
with the same grid reaches 495 GB/s at rows=4096 — but the scan kernel does
not improve with rows because a ~20 ms COMPUTE floor is invariant to rows,
to the lane-scan impl (MXU vs VPU), and to the sublane-carry impl.

This script times ablation variants of the kernel on the real chip to
attribute the floor, optionally capturing an xprof trace.  Results feed the
committed note in the pallas_scan docstring + the r4 kernel changes.

Usage:  python experiments/kernel_floor.py [--trace DIR] [--rows N]
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
TOTAL = 1 << 29  # 0.5G slots, the r3 measurement size


ITERS = 16


def timeit_chained(make_step, *args):
    """Per-pass seconds via the bench's two-point method: `make_step(n)`
    returns a jitted fn running n serially-dependent passes; per-pass =
    (t_16 - t_1) / 15, which cancels the ~19 ms tunnel dispatch latency."""

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


def grid_call(kernel_body, n_out_i32, n_out_i8, rows, n_in=1):
    """pallas_call factory with the production grid structure."""
    n_chunks = TOTAL // (rows * LANES)
    in_specs = [
        pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0))
        for _ in range(n_in)
    ]
    out_specs = [
        pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0))
        for _ in range(n_out_i32 + n_out_i8)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_chunks, rows, LANES), jnp.int32)
        for _ in range(n_out_i32)
    ] + [
        jax.ShapeDtypeStruct((n_chunks, rows, LANES), jnp.int8)
        for _ in range(n_out_i8)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kernel_body,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=ps._grid_params(rows),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--variants", default="all")
    args = ap.parse_args()
    rows = args.rows
    n_chunks = TOTAL // (rows * LANES)

    rng = np.random.default_rng(0)
    delta_h = np.zeros(TOTAL, np.int32)
    idx = rng.integers(0, TOTAL, 4_000_000)
    np.add.at(delta_h, idx, 1)
    delta = jnp.asarray(delta_h)
    gap = jnp.zeros(TOTAL, jnp.int8)
    valid = jnp.ones(TOTAL, jnp.int8)
    carry = jnp.zeros(n_chunks, jnp.int32)

    d2 = delta.reshape(n_chunks, rows, LANES)

    results = {}

    def report(name, secs, nbytes):
        results[name] = (secs, nbytes / secs / 1e9)
        print(
            f"{name:28s} {secs*1e3:8.2f} ms/pass   {nbytes/secs/1e9:7.1f} GB/s",
            flush=True,
        )

    # --- production masked kernel (13 bytes/slot: 4+1+1 in, 4+3 out) ---
    def make_prod(n):
        @jax.jit
        def f(delta, gap, valid):
            def body(_, d):
                depth, *_ = ps.fused_depth_scan_masked(
                    d, gap, valid, -1, 0, rows=rows
                )
                return depth

            return jax.lax.fori_loop(0, n, body, delta)[-1]

        return f

    if args.variants in ("all", "prod"):
        report(
            "production-masked",
            timeit_chained(make_prod, delta, gap, valid),
            13 * TOTAL,
        )

    def make_simple(body_kernel, n_in=1):
        call = grid_call(body_kernel, 1, 0, rows, n_in=n_in)

        def make(n):
            @jax.jit
            def f(c, x):
                def body(_, d):
                    (o,) = call(c, d) if n_in == 1 else call(c, d, d)
                    return o

                return jax.lax.fori_loop(0, n, body, x).reshape(-1)[-1]

            return f

        return make

    # --- copy kernel (4 in + 4 out bytes/slot) ---
    def copy_body(carry_s, x, o):
        o[...] = x[...]

    if args.variants in ("all", "copy"):
        report("copy", timeit_chained(make_simple(copy_body), carry, d2), 8 * TOTAL)

    # --- scan-only (lane scan + row carry + add), 4+4 bytes ---
    def scan_body(carry_s, x, o):
        i = pl.program_id(0)
        ps._scan_only_kernel(carry_s[i], x.at[0], o.at[0])

    if args.variants in ("all", "scan"):
        report("scan-only", timeit_chained(make_simple(scan_body), carry, d2), 8 * TOTAL)

    # --- lane scan only (no row carry) ---
    def lane_body(carry_s, x, o):
        o[...] = ps._lane_inclusive_scan(x[0])[None]

    if args.variants in ("all", "lane"):
        report(
            "lane-scan-only(MXU12)",
            timeit_chained(make_simple(lane_body), carry, d2),
            8 * TOTAL,
        )

    # --- lane scan VPU rolls only ---
    def lanev_body(carry_s, x, o):
        o[...] = ps._lane_inclusive_scan_rolls(x[0])[None]

    if args.variants in ("all", "lanev"):
        report(
            "lane-scan-only(VPU7)",
            timeit_chained(make_simple(lanev_body), carry, d2),
            8 * TOTAL,
        )

    # --- row carry only (no lane scan) ---
    def carry_body(carry_s, x, o):
        o[...] = ps._row_carry_bcast(x[0])[None]

    if args.variants in ("all", "rowcarry"):
        report(
            "row-carry-only",
            timeit_chained(make_simple(carry_body), carry, d2),
            8 * TOTAL,
        )

    # --- copy with the production stream mix (3 in / 4 out, same dtypes):
    # the TRUE structural DMA ceiling of the masked kernel's shape ---
    def make_copy7(n):
        n_chunks_l = TOTAL // (rows * LANES)
        spec = pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0))
        def copy7_kernel(carry_s, d, g, v, o_depth, o_r, o_f, o_c):
            o_depth[...] = d[...]
            o_r[...] = g[...]
            o_f[...] = v[...]
            o_c[...] = g[...]

        call = pl.pallas_call(
            copy7_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_chunks_l,),
                in_specs=[spec] * 3, out_specs=[spec] * 4,
            ),
            out_shape=[
                jax.ShapeDtypeStruct((n_chunks_l, rows, LANES), jnp.int32),
                jax.ShapeDtypeStruct((n_chunks_l, rows, LANES), jnp.int8),
                jax.ShapeDtypeStruct((n_chunks_l, rows, LANES), jnp.int8),
                jax.ShapeDtypeStruct((n_chunks_l, rows, LANES), jnp.int8),
            ],
            compiler_params=ps._grid_params(rows),
        )

        @jax.jit
        def f(delta, gap, valid):
            g2 = gap.reshape(n_chunks_l, rows, LANES)
            v2 = valid.reshape(n_chunks_l, rows, LANES)

            def body(_, d):
                o, *_rest = call(carry, d, g2, v2)
                return o

            return jax.lax.fori_loop(
                0, n, body, delta.reshape(n_chunks_l, rows, LANES)
            ).reshape(-1)[-1]

        return f

    if args.variants in ("all", "copy7"):
        report(
            "copy7(3in/4out mix)",
            timeit_chained(make_copy7, delta, gap, valid),
            13 * TOTAL,
        )

    # --- packed-stream production kernel (2 in / 2 out, 10 bytes/slot) ---
    def make_packed(n):
        @jax.jit
        def f(delta, flags):
            def body(_, d):
                depth, _ = ps.fused_depth_scan_flags(d, flags, -1, 0, rows=rows)
                return depth

            return jax.lax.fori_loop(0, n, body, delta)[-1]

        return f

    if args.variants in ("all", "packed"):
        flags_h = (gap + valid * 2).astype(np.int8)
        flags_dev = jnp.asarray(flags_h)
        secs = timeit_chained(make_packed, delta, flags_dev)
        report("packed-flags(2in/2out)", secs, 10 * TOTAL)
        print(
            f"  equivalent throughput at the old 13-byte accounting: "
            f"{13 * TOTAL / secs / 1e9:.1f} GB/s",
            flush=True,
        )

    # --- copy with the PACKED stream mix (i32+i8 in, i32+i8 out):
    # structural ceiling of the packed kernel ---
    def make_copy4(n):
        n_chunks_l = TOTAL // (rows * LANES)
        spec = pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0))

        def copy4_kernel(carry_s, d, g, o_depth, o_flags):
            o_depth[...] = d[...]
            o_flags[...] = g[...]

        call = pl.pallas_call(
            copy4_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_chunks_l,),
                in_specs=[spec] * 2, out_specs=[spec] * 2,
            ),
            out_shape=[
                jax.ShapeDtypeStruct((n_chunks_l, rows, LANES), jnp.int32),
                jax.ShapeDtypeStruct((n_chunks_l, rows, LANES), jnp.int8),
            ],
            compiler_params=ps._grid_params(rows),
        )

        @jax.jit
        def f(delta, gapf):
            g2 = gapf.reshape(n_chunks_l, rows, LANES)

            def body(_, d):
                o, _f = call(carry, d, g2)
                return o

            return jax.lax.fori_loop(
                0, n, body, delta.reshape(n_chunks_l, rows, LANES)
            ).reshape(-1)[-1]

        return f

    if args.variants in ("all", "copy4"):
        report(
            "copy4(2in/2out mix)",
            timeit_chained(make_copy4, delta, gap),
            10 * TOTAL,
        )

    # --- 8-bit-split DEFAULT-precision lane scan (4 cheap MXU passes) ---
    def lane8_body(carry_s, x, o):
        o[...] = lane_scan_8bit(x[0])[None]

    if args.variants in ("all", "lane8"):
        report(
            "lane-scan-8bit(MXU4)",
            timeit_chained(make_simple(lane8_body), carry, d2),
            8 * TOTAL,
        )
        got = grid_call(lane8_body, 1, 0, rows)(carry, d2)[0]
        want = np.cumsum(np.asarray(d2).reshape(n_chunks * rows, LANES), axis=1)
        ok = np.array_equal(
            np.asarray(got).reshape(n_chunks * rows, LANES), want
        )
        print(f"  8-bit-split exactness: {ok}")

    if args.trace:
        prod1 = make_prod(4)
        with jax.profiler.trace(args.trace):
            _ = int(np.asarray(prod1(delta, gap, valid)))
        print(f"trace written to {args.trace}")

    print({k: round(v[0] * 1e3, 2) for k, v in results.items()})


def lane_scan_8bit(x):
    """Inclusive lane cumsum via four 8-bit-piece DEFAULT-precision matmuls.

    Each piece is in [0, 255] -> exactly representable in bf16 (8 mantissa
    bits), the 0/1 triangular matrix is exact, and per-row accumulations are
    < 128*255 < 2^15 -> exact in f32.  Four 1-pass matmuls instead of the
    12 MXU passes the HIGHEST-precision 16-bit-halves form costs.
    """
    i0 = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    tri = (i0 <= i1).astype(jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    out = jnp.zeros(x.shape, jnp.int32)
    for shift in (0, 8, 16, 24):
        piece = jnp.bitwise_and(
            jax.lax.shift_right_logical(x, shift), 0xFF
        ).astype(jnp.float32)
        cs = jax.lax.dot_general(
            piece, tri, dn, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
        out = out + jax.lax.shift_left(cs.astype(jnp.int32), shift)
    return out


if __name__ == "__main__":
    main()
