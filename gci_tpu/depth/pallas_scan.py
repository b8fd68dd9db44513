"""Pallas TPU kernel: fused chunked prefix-sum + interval-mask + edge flags.

XLA lowers a 1-D ``jnp.cumsum`` over the genome axis to ~log2(N) full HBM
passes (measured ~275 ms for 1 Gbp on v5e — ~30x off memory speed-of-light).
This kernel makes the whole per-base stage graph a single pass:

  * one fused Pallas pass per chunk: in-VMEM hierarchical scan (MXU
    triangular-matmul lane scan + full-tile-broadcast sublane carry), add
    the running carry, then compute the issue-interval mask and its
    rise/fall edge flags in the same pass — depth, mask edges and the
    gap-masked depth all come out of a single HBM read of the input;
  * the chunk carry lives in SMEM scratch across a SEQUENTIAL grid (r5b):
    the next chunk's carry is just the scanned tile's last element, so the
    classic two-level decomposition's whole-array reduce pre-pass (an
    extra full HBM read, ~2.9 ms per 0.5G slots) is gone — the production
    kernels are genuinely one-pass end to end.

Measured shape facts (r3, v5e, 0.5G slots, rows=2048):
  * a pure copy kernel with this grid/block structure reaches ~298 GB/s —
    the realistic DMA ceiling (36% of the 819 GB/s nominal HBM SoL);
  * (R, 1)-COLUMN rolls lower pathologically: the original column-based
    sublane carry cost ~17 ms/pass by itself (scan-only pass 37.6 ms vs
    20.4 ms with the broadcast form in ``_row_carry_bcast``) — keep every
    hot op a full-width (R, 128) tile;
  * the MXU lane-scan matmul vs a VPU roll chain is wall-clock neutral;
  * block height is neutral for THIS kernel: rows=4096 (vmem limit raised
    via ``_grid_params``) measures 24.9 vs 25.6 ms — even though a
    2-stream copy kernel doubles to ~495 GB/s at rows=4096, the 7-stream
    masked kernel does not follow; rows=2048 stays the default.

The chunk-boundary mask dependency (``prev`` of the first element) is exact:
depth just before a chunk IS the carry, and the previous slot's scan-window
validity is prefetched per chunk.  Layout: each chunk is an (R, 128) tile,
row-major = genome order; R a multiple of 8 (int32 tiling).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEF_ROWS = 2048  # chunk = ROWS*LANES elements (2048*128 = 256Ki = 1 MiB int32)

# every grid step is independent (chunk carries are precomputed), so tell
# Mosaic the grid dimension is parallel — enables DMA pipelining/reordering
# instead of strictly sequential iteration
_PARALLEL_GRID = pltpu.CompilerParams(dimension_semantics=("parallel",))


def _grid_params(rows: int):
    """Compiler params for a given block height: blocks past 2048 rows
    exceed the 16 MiB scoped-vmem default once double-buffered."""
    if rows <= 2048:
        return _PARALLEL_GRID
    return pltpu.CompilerParams(
        dimension_semantics=("parallel",), vmem_limit_bytes=100 * 1024 * 1024
    )


def _lane_inclusive_scan_rolls(x):
    """Inclusive cumsum along axis=1 (lanes) via doubling shifts (VPU)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < LANES:
        shifted = pltpu.roll(x, k, 1)
        x = x + jnp.where(lane >= k, shifted, 0)
        k *= 2
    return x


def _lane_inclusive_scan(x):
    """Inclusive cumsum along axis=1 (lanes) as MXU matmuls.

    ``cumsum(x, axis=1) == x @ A`` with ``A[k, j] = 1 if k <= j``.  The
    int32 operand is split into four 8-bit pieces, each scanned with a
    DEFAULT-precision f32 matmul: pieces in [0, 255] are exactly
    representable in bf16 (8 mantissa bits), the 0/1 triangular matrix is
    exact, and per-row accumulations are < 128*255 < 2^15 — so each matmul
    is a single exact MXU pass.  Recombining ``sum(piece_cs << shift)`` in
    int32 wraps mod 2^32 exactly like a native int32 cumsum.

    Four 1-pass matmuls replace the previous 16-bit-halves form's 12 MXU
    passes (2 halves x 6-pass HIGHEST): measured on-chip (r4, 0.5G slots,
    rows=2048) the lane scan drops from +2.0 ms over the copy floor to
    +0.06 ms — compute becomes free, leaving the kernel DMA-bound.
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


def _row_carry_bcast(row_cs):
    """Exclusive prefix (over rows) of the row totals, broadcast to the full
    (R, LANES) tile.

    Semantically the broadcast of an exclusive column scan of the row
    totals, but every op is a full-width tile: (R, 1)-column rolls dominate the whole
    kernel when R is large (attribution measured r3: scan pass 37.6 ms with
    the column chain vs 20.4 ms with this form, on 0.5G slots), while
    full-tile sublane rolls are nearly free because the VPU processes 128
    lanes either way.
    """
    tot = jnp.broadcast_to(row_cs[:, LANES - 1 :], row_cs.shape)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, row_cs.shape, 0)
    rows = row_cs.shape[0]
    inc = tot
    k = 1
    while k < rows:
        inc = inc + jnp.where(row_idx >= k, pltpu.roll(inc, k, 0), 0)
        k *= 2
    return inc - tot


def _linear_prev(m, prev0):
    """Row-major linear-order predecessor of each element of an (R, 128)
    int32 tile; ``prev0`` (scalar) seeds the predecessor of element (0, 0).

    Full-tile rolls only: the lane-0 boundary (``m[r-1, 127]``) comes from
    rolling both axes of the whole tile instead of a (R, 1) column roll
    (same pathological-lowering avoidance as ``_row_carry_bcast``)."""
    both = pltpu.roll(pltpu.roll(m, 1, 0), 1, 1)  # [r, c] = m[r-1, c-1]
    prev_lane = pltpu.roll(m, 1, 1)               # [r, c] = m[r, c-1]
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)
    out = jnp.where(lane_idx == 0, both, prev_lane)
    return jnp.where((lane_idx == 0) & (row_idx == 0), prev0, out)


def _scan_kernel(carry_val, seed_valid_val, lo, hi,
                 delta_ref, valid_ref, depth_ref, rise_ref, fall_ref):
    x = delta_ref[:]
    row_cs = _lane_inclusive_scan(x)
    depth = row_cs + _row_carry_bcast(row_cs) + carry_val
    depth_ref[:] = depth

    valid = valid_ref[:] != 0
    # int32 mask: Mosaic's rotate only supports 32-bit lanes
    m = ((depth > lo) & (depth <= hi) & valid).astype(jnp.int32)

    prev0 = (
        (carry_val > lo) & (carry_val <= hi) & (seed_valid_val != 0)
    ).astype(jnp.int32)
    prev = _linear_prev(m, prev0)

    rise_ref[:] = ((m == 1) & (prev == 0)).astype(jnp.int8)
    fall_ref[:] = ((m == 0) & (prev == 1)).astype(jnp.int8)


def _scan_masked_kernel(is_first, carry_val, seed_valid_val, seed_gap_val, lo, hi,
                        delta_ref, gap_ref, valid_ref,
                        depth_ref, rise_ref, fall_ref, change_ref):
    """The production single-pass kernel (see ``fused_depth_scan_masked``)."""
    x = delta_ref[:]
    row_cs = _lane_inclusive_scan(x)
    raw = row_cs + _row_carry_bcast(row_cs) + carry_val
    depth_ref[:] = raw

    gap = gap_ref[:] != 0
    masked = jnp.where(gap, 0, raw)
    valid = valid_ref[:] != 0
    m = ((masked > lo) & (masked <= hi) & valid).astype(jnp.int32)

    # masked depth just before this chunk: the raw carry, zeroed if that
    # slot sits inside a gap
    prev_masked0 = jnp.where(seed_gap_val != 0, 0, carry_val)
    prev0 = (
        (prev_masked0 > lo) & (prev_masked0 <= hi) & (seed_valid_val != 0)
    ).astype(jnp.int32)
    prev = _linear_prev(m, prev0)
    rise_ref[:] = ((m == 1) & (prev == 0)).astype(jnp.int8)
    fall_ref[:] = ((m == 0) & (prev == 1)).astype(jnp.int8)

    # raw run boundaries (RLE checkpoint): raw[i] != raw[i-1], with a forced
    # boundary at global position 0
    prev_raw = _linear_prev(raw, carry_val)
    change = raw != prev_raw
    row_idx = jax.lax.broadcasted_iota(jnp.int32, raw.shape, 0)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, raw.shape, 1)
    force0 = is_first & (row_idx == 0) & (lane_idx == 0)
    change_ref[:] = (change | force0).astype(jnp.int8)


def _scan_only_kernel(carry_val, delta_ref, depth_ref):
    x = delta_ref[:]
    row_cs = _lane_inclusive_scan(x)
    depth_ref[:] = row_cs + _row_carry_bcast(row_cs) + carry_val


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def depth_scan(delta: jax.Array, rows: int = DEF_ROWS, interpret: bool = False):
    """Depth-only prefix sum, ONE HBM pass (sequential grid, running carry
    in SMEM scratch — no separate whole-array reduce for the chunk carries;
    same r5b structure as ``fused_depth_scan_packed``)."""
    total = delta.shape[0]
    chunk = rows * LANES
    assert total % chunk == 0, "pad the axis to a chunk multiple"
    n_chunks = total // chunk
    d2 = delta.reshape(n_chunks, rows, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0))],
        out_specs=[pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0))],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )

    def kernel(delta_b, depth_b, carry_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_ref[0] = 0

        x = delta_b[0]
        row_cs = _lane_inclusive_scan(x)
        depth = row_cs + _row_carry_bcast(row_cs) + carry_ref[0]
        depth_b[0] = depth
        carry_ref[0] = depth[rows - 1, LANES - 1]

    (depth,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_chunks, rows, LANES), jnp.int32)],
        compiler_params=None if interpret else _seq_grid_params(rows),
        interpret=interpret,
    )(d2)
    return depth.reshape(total)


@functools.partial(
    jax.jit, static_argnames=("rows", "interpret")
)
def fused_depth_scan(
    delta: jax.Array,       # (n_chunks*rows*128,) int32 scatter deltas
    valid: jax.Array,       # same shape, int8 scan-window validity
    leftmost,
    rightmost,
    rows: int = DEF_ROWS,
    interpret: bool = False,
):
    """(depth, rise, fall) over the padded genome axis.

    ``delta``/``valid`` length must be a multiple of rows*128 (pad with
    zeros; padded slots must be invalid).  Single-pass (r5b): sequential
    grid, running carry in SMEM scratch — no separate carry pre-pass.
    """
    total = delta.shape[0]
    chunk = rows * LANES
    assert total % chunk == 0, "pad the axis to a chunk multiple"
    n_chunks = total // chunk

    d2 = delta.reshape(n_chunks, rows, LANES)
    v2 = valid.reshape(n_chunks, rows, LANES)
    # scan-window validity of the slot just before each chunk (False for 0)
    seed_valid = jnp.concatenate(
        [jnp.zeros(1, valid.dtype), valid[chunk - 1 :: chunk][:-1]]
    ).astype(jnp.int32)

    lo = jnp.full((n_chunks,), leftmost, jnp.int32)
    hi = jnp.full((n_chunks,), rightmost, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # seed_valid, lo, hi
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )

    def kernel(seed_s, lo_s, hi_s, delta_b, valid_b, depth_b, rise_b, fall_b,
               carry_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_ref[0] = 0

        _scan_kernel(
            carry_ref[0],
            seed_s[i],
            lo_s[i],
            hi_s[i],
            delta_b.at[0],
            valid_b.at[0],
            depth_b.at[0],
            rise_b.at[0],
            fall_b.at[0],
        )
        carry_ref[0] = depth_b[0, rows - 1, LANES - 1]

    depth, rise, fall = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_chunks, rows, LANES), jnp.int8),
            jax.ShapeDtypeStruct((n_chunks, rows, LANES), jnp.int8),
        ],
        compiler_params=None if interpret else _seq_grid_params(rows),
        interpret=interpret,
    )(seed_valid, lo, hi, d2, v2)
    return (
        depth.reshape(total),
        rise.reshape(total),
        fall.reshape(total),
    )


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def fused_depth_scan_masked(
    delta: jax.Array,       # (n_chunks*rows*128,) int32 scatter deltas
    gap: jax.Array,         # same shape, int8 N-gap indicator (1 inside gaps)
    valid: jax.Array,       # same shape, int8 scan-window validity
    leftmost,
    rightmost,
    rows: int = DEF_ROWS,
    interpret: bool = False,
):
    """One-pass production scan: (raw_depth, rise, fall, change).

    The pipeline's whole per-base stage graph fused into a single HBM pass
    (reference GCI.py:302-306 depth + 315-329 gap mask + 356-390 interval
    scan + the RLE boundaries of GCI.py:99-143's checkpoint):

    * ``raw_depth`` — the prefix-summed depth *before* gap masking (what the
      ``.depth.gz`` checkpoint stores);
    * ``rise``/``fall`` — issue-interval edges of the *gap-masked* depth
      against ``(leftmost, rightmost]`` within ``valid`` positions;
    * ``change`` — run boundaries of the raw depth (``raw[i] != raw[i-1]``,
      forced True at position 0) for O(runs) checkpoint readback.

    The masked depth itself is never written to HBM — it exists only in VMEM
    for the edge computation, and is reconstructed on demand as
    ``where(gap, 0, raw)`` (one cheap fused elementwise op).
    """
    total = delta.shape[0]
    chunk = rows * LANES
    assert total % chunk == 0, "pad the axis to a chunk multiple"
    n_chunks = total // chunk

    d2 = delta.reshape(n_chunks, rows, LANES)
    sums = jnp.sum(d2, axis=(1, 2), dtype=jnp.int32)
    carry = jnp.cumsum(sums) - sums  # exclusive, (n_chunks,)

    g2 = gap.reshape(n_chunks, rows, LANES)
    v2 = valid.reshape(n_chunks, rows, LANES)
    # validity / gap state of the slot just before each chunk (False for 0)
    seed_valid = jnp.concatenate(
        [jnp.zeros(1, valid.dtype), valid[chunk - 1 :: chunk][:-1]]
    ).astype(jnp.int32)
    seed_gap = jnp.concatenate(
        [jnp.zeros(1, gap.dtype), gap[chunk - 1 :: chunk][:-1]]
    ).astype(jnp.int32)

    lo = jnp.full((n_chunks,), leftmost, jnp.int32)
    hi = jnp.full((n_chunks,), rightmost, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # carry, seed_valid, seed_gap, lo, hi
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
        ],
    )

    def kernel(carry_s, seedv_s, seedg_s, lo_s, hi_s, delta_b, gap_b, valid_b,
               depth_b, rise_b, fall_b, change_b):
        i = pl.program_id(0)
        _scan_masked_kernel(
            i == 0, carry_s[i], seedv_s[i], seedg_s[i], lo_s[i], hi_s[i],
            delta_b.at[0], gap_b.at[0], valid_b.at[0],
            depth_b.at[0], rise_b.at[0], fall_b.at[0], change_b.at[0],
        )

    depth, rise, fall, change = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_chunks, rows, LANES), jnp.int8),
            jax.ShapeDtypeStruct((n_chunks, rows, LANES), jnp.int8),
            jax.ShapeDtypeStruct((n_chunks, rows, LANES), jnp.int8),
        ],
        compiler_params=None if interpret else _grid_params(rows),
        interpret=interpret,
    )(carry, seed_valid, seed_gap, lo, hi, d2, g2, v2)
    return (
        depth.reshape(total),
        rise.reshape(total),
        fall.reshape(total),
        change.reshape(total),
    )


def _scan_flags_kernel(is_first, carry_val, seed_flags_val, lo, hi,
                       delta_ref, flags_ref, depth_ref, out_ref):
    """Packed-stream production kernel: flags-in bit0=gap bit1=valid;
    flags-out bit0=rise bit1=fall bit2=change."""
    x = delta_ref[:]
    row_cs = _lane_inclusive_scan(x)
    raw = row_cs + _row_carry_bcast(row_cs) + carry_val
    depth_ref[:] = raw

    flags = flags_ref[:].astype(jnp.int32)
    gap = (flags & 1) != 0
    valid = (flags & 2) != 0
    masked = jnp.where(gap, 0, raw)
    m = ((masked > lo) & (masked <= hi) & valid).astype(jnp.int32)

    seed_gap = seed_flags_val & 1
    seed_valid = (seed_flags_val >> 1) & 1
    prev_masked0 = jnp.where(seed_gap != 0, 0, carry_val)
    prev0 = (
        (prev_masked0 > lo) & (prev_masked0 <= hi) & (seed_valid != 0)
    ).astype(jnp.int32)
    prev = _linear_prev(m, prev0)
    rise = (m == 1) & (prev == 0)
    fall = (m == 0) & (prev == 1)

    prev_raw = _linear_prev(raw, carry_val)
    change = raw != prev_raw
    row_idx = jax.lax.broadcasted_iota(jnp.int32, raw.shape, 0)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, raw.shape, 1)
    force0 = is_first & (row_idx == 0) & (lane_idx == 0)
    out_ref[:] = (
        rise.astype(jnp.int32)
        + fall.astype(jnp.int32) * 2
        + (change | force0).astype(jnp.int32) * 4
    ).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def fused_depth_scan_flags(
    delta: jax.Array,   # (n_chunks*rows*128,) int32 scatter deltas
    flags: jax.Array,   # same shape, int8: bit0 = in-gap, bit1 = scan-valid
    leftmost,
    rightmost,
    rows: int = DEF_ROWS,
    interpret: bool = False,
):
    """Packed-stream production scan: (raw_depth, out_flags).

    Same math as ``fused_depth_scan_masked`` but with the five int8 streams
    packed into two (gap+valid in, rise+fall+change out): 13 -> 10 bytes
    of HBM traffic per slot.  The r4 on-chip ablation showed the masked
    kernel sits at 87% of its own 7-stream copy ceiling (18.2 ms/0.5G) —
    the stream MIX, not compute, caps throughput, so fewer/wider streams
    are the remaining lever.  ``out_flags``: bit0=rise, bit1=fall,
    bit2=change (same definitions as the unpacked kernel).
    """
    total = delta.shape[0]
    chunk = rows * LANES
    assert total % chunk == 0, "pad the axis to a chunk multiple"
    n_chunks = total // chunk

    d2 = delta.reshape(n_chunks, rows, LANES)
    sums = jnp.sum(d2, axis=(1, 2), dtype=jnp.int32)
    carry = jnp.cumsum(sums) - sums  # exclusive, (n_chunks,)

    f2 = flags.reshape(n_chunks, rows, LANES)
    seed_flags = jnp.concatenate(
        [jnp.zeros(1, flags.dtype), flags[chunk - 1 :: chunk][:-1]]
    ).astype(jnp.int32)

    lo = jnp.full((n_chunks,), leftmost, jnp.int32)
    hi = jnp.full((n_chunks,), rightmost, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # carry, seed_flags, lo, hi
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
        ],
    )

    def kernel(carry_s, seedf_s, lo_s, hi_s, delta_b, flags_b, depth_b, out_b):
        i = pl.program_id(0)
        _scan_flags_kernel(
            i == 0, carry_s[i], seedf_s[i], lo_s[i], hi_s[i],
            delta_b.at[0], flags_b.at[0], depth_b.at[0], out_b.at[0],
        )

    depth, out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_chunks, rows, LANES), jnp.int8),
        ],
        compiler_params=None if interpret else _grid_params(rows),
        interpret=interpret,
    )(carry, seed_flags, lo, hi, d2, f2)
    return depth.reshape(total), out.reshape(total)


def _scan_packed_kernel(is_first, carry_val, lo, hi, word_ref,
                        depth_ref, flags_ref):
    """Folded-input production kernel body (r5): ONE int32 input word per
    slot, ``word = read_delta<<2 | gap_event<<1 | valid_event``.

    N-gap intervals and scan-window intervals are each DISJOINT, so their
    interval-event prefix sums are always in {0, 1}: one int32 cumsum scans
    all three fields at once with no cross-field carries (requires
    depth < 2^29, asserted by the callers).  The chunk carry IS the packed
    prefix, so it transports the gap/valid seed state for free.  Outputs:
    clean depth + flag byte (bit0 rise, bit1 fall, bit2 change, bit3 gap).
    Returns the scanned tile's last element — the NEXT chunk's carry.

    VPU-tail diet vs ``_scan_flags_kernel`` (measured r5, 0.5G slots:
    19.8 -> 15.7 ms/pass vs a 14.9 ms copy ceiling of the same 9 B/slot
    stream mix): ONE ``_linear_prev`` pass instead of two — the interval
    mask rides the sign bit of the depth word — and the position-0 forced
    change boundary folds into the predecessor seed (no iota/force ops).
    """
    w = word_ref[:]
    row_cs = _lane_inclusive_scan(w)
    sw = row_cs + _row_carry_bcast(row_cs) + carry_val  # packed prefix
    depth = jax.lax.shift_right_logical(sw, 2)          # sw >= 0 always
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
    int_min = jnp.int32(-(2**31))
    pw = jnp.where(m, jnp.bitwise_or(depth, int_min), depth)
    # chunk 0 seeds an impossible prev depth -> forced change at position 0
    seed_pw = jnp.bitwise_or(
        jnp.where(prev0_m, int_min, 0),
        jnp.where(is_first, jnp.int32(0x7FFFFFFF), carry_depth),
    )
    prev_pw = _linear_prev(pw, seed_pw)
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
    return sw[sw.shape[0] - 1, LANES - 1]


def _seq_grid_params(rows: int):
    """Sequential-grid compiler params (the scratch carry imposes order);
    blocks past 2048 rows still need the raised scoped-vmem limit."""
    if rows <= 2048:
        return pltpu.CompilerParams(dimension_semantics=("arbitrary",))
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=100 * 1024 * 1024,
    )


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def fused_depth_scan_packed(
    word: jax.Array,    # (n_chunks*rows*128,) int32 packed event words
    leftmost,
    rightmost,
    rows: int = DEF_ROWS,
    interpret: bool = False,
):
    """Folded-input production scan, ONE HBM pass: (raw_depth, out_flags).

    ``word[i] = read_delta[i]<<2 | gap_event[i]<<1 | valid_event[i]`` where
    gap/valid events are the +-1 interval boundary deltas of the (disjoint)
    N-gap and scan-window interval sets.  9 B/slot of HBM traffic (the r4
    packed kernel moved 10 and read the flag byte from a separate stream
    built by two extra O(genome) prefix-sum programs — both deleted here).
    ``out_flags``: bit0=rise, bit1=fall, bit2=change (same definitions as
    ``fused_depth_scan_flags``) plus bit3 = in-gap.

    Single-pass (r5b): the grid runs SEQUENTIALLY with the running carry in
    SMEM scratch — the next chunk's carry is just ``sw[-1, -1]`` of the
    tile already computed — which deletes the separate whole-array
    reduce+cumsum carry pre-pass of the classic two-level decomposition
    (measured 18.6 -> 15.8 ms per 0.5G-slot construction; the sequential
    grid itself is wall-neutral vs the parallel one, 15.76 vs 15.84 ms).

    Callers must guarantee depth < 2^29 (equivalently: fewer than 2^29
    overlapping reads at any position — any realistic input).
    """
    total = word.shape[0]
    chunk = rows * LANES
    assert total % chunk == 0, "pad the axis to a chunk multiple"
    n_chunks = total // chunk

    w2 = word.reshape(n_chunks, rows, LANES)
    lo = jnp.full((n_chunks,), leftmost, jnp.int32)
    hi = jnp.full((n_chunks,), rightmost, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # lo, hi
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )

    def kernel(lo_s, hi_s, word_b, depth_b, flags_b, carry_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_ref[0] = 0

        carry_ref[0] = _scan_packed_kernel(
            i == 0, carry_ref[0], lo_s[i], hi_s[i],
            word_b.at[0], depth_b.at[0], flags_b.at[0],
        )

    depth, flags = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_chunks, rows, LANES), jnp.int8),
        ],
        compiler_params=None if interpret else _seq_grid_params(rows),
        interpret=interpret,
    )(lo, hi, w2)
    return depth.reshape(total), flags.reshape(total)


def fused_depth_scan_packed_xla(word, leftmost, rightmost):
    """XLA implementation of ``fused_depth_scan_packed`` (non-TPU backends,
    unaligned shapes, and the parity oracle for the packed-word kernel)."""
    sw = jnp.cumsum(word).astype(jnp.int32)
    raw = jax.lax.shift_right_logical(sw, 2)
    gap = (sw & 2) != 0
    valid = (sw & 1) != 0
    masked = jnp.where(gap, 0, raw)
    m = (masked > leftmost) & (masked <= rightmost) & valid
    prev = jnp.concatenate([jnp.zeros(1, bool), m[:-1]])
    rise = m & ~prev
    fall = ~m & prev
    prev_raw = jnp.concatenate([raw[:1] - 1, raw[:-1]])  # forces change at 0
    change = raw != prev_raw
    out = (
        rise.astype(jnp.int8)
        + fall.astype(jnp.int8) * 2
        + change.astype(jnp.int8) * 4
        + gap.astype(jnp.int8) * 8
    )
    return raw, out


def fused_depth_scan_flags_xla(delta, flags, leftmost, rightmost):
    """XLA implementation of ``fused_depth_scan_flags`` (non-TPU backends,
    unaligned shapes, and the parity oracle for the packed kernel)."""
    raw = jnp.cumsum(delta).astype(jnp.int32)
    gap = (flags & 1) != 0
    valid = (flags & 2) != 0
    masked = jnp.where(gap, 0, raw)
    m = (masked > leftmost) & (masked <= rightmost) & valid
    prev = jnp.concatenate([jnp.zeros(1, bool), m[:-1]])
    rise = m & ~prev
    fall = ~m & prev
    prev_raw = jnp.concatenate([raw[:1] - 1, raw[:-1]])  # forces change at 0
    change = raw != prev_raw
    out = (
        rise.astype(jnp.int8)
        + fall.astype(jnp.int8) * 2
        + change.astype(jnp.int8) * 4
    )
    return raw, out


def fused_depth_scan_masked_xla(delta, gap, valid, leftmost, rightmost):
    """XLA implementation of ``fused_depth_scan_masked`` (non-TPU backends,
    unaligned shapes, and the parity oracle for the kernel)."""
    raw = jnp.cumsum(delta).astype(jnp.int32)
    masked = jnp.where(gap != 0, 0, raw)
    v = valid != 0
    m = (masked > leftmost) & (masked <= rightmost) & v
    prev = jnp.concatenate([jnp.zeros(1, bool), m[:-1]])
    rise = (m & ~prev).astype(jnp.int8)
    fall = (~m & prev).astype(jnp.int8)
    prev_raw = jnp.concatenate([raw[:1] - 1, raw[:-1]])  # forces change at 0
    change = (raw != prev_raw).astype(jnp.int8)
    return raw, rise, fall, change
