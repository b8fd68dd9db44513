"""Streamed depth accumulation for genomes larger than device memory.

A 3.1 Gbp assembly needs ~12.5 GB for the int32 delta axis plus the same for
the depth output — beyond a single v5e's HBM once workspaces are counted.
This path processes the concatenated genome axis in fixed-size chunks:

* read events (start:+1, stop:-1 slots) are host-sorted once; each chunk's
  event slice is found with two searchsorted calls;
* the chunk carry (depth just before the chunk) is exact:
  ``#starts < a  −  #stops < a`` — no sequential dependency between chunks
  beyond two binary searches, so chunks could even run on different devices;
* per chunk the device scatters its events and runs the pallas prefix-sum
  kernel (XLA cumsum fallback off-TPU), the host pulls the finished chunk.

HBM usage is O(chunk), independent of genome size.
"""
from __future__ import annotations

import numpy as np

from gci_tpu.depth.accum import GenomeLayout, clamp_read_intervals


def accumulate_depth_streamed(
    layout: GenomeLayout,
    target_id: np.ndarray,
    start: np.ndarray,
    end: np.ndarray,
    flank_len: int = 15,
    chunk_slots: int = 256 * 1024 * 1024,
    kernel: str = "auto",
) -> np.ndarray:
    """Flat per-slot int32 depth, computed chunk-by-chunk on device."""
    import jax
    import jax.numpy as jnp

    s, e = clamp_read_intervals(layout, target_id, start, end, flank_len)
    live = e > s
    base = layout.offsets[target_id]
    gs = np.sort((base + s)[live].astype(np.int64))
    ge = np.sort((base + e)[live].astype(np.int64))

    total = layout.total_slots
    use_pallas = kernel == "pallas" or (
        kernel == "auto" and jax.default_backend() not in ("cpu",)
    )
    if use_pallas:
        # align chunk to the pallas tile
        from gci_tpu.depth.pallas_scan import DEF_ROWS, LANES

        tile = DEF_ROWS * LANES
        chunk_slots = max(tile, (chunk_slots // tile) * tile)
    chunk_slots = max(1, chunk_slots)

    if use_pallas:
        from gci_tpu.depth.pallas_scan import depth_scan

        def scan(delta):
            return depth_scan(delta)
    else:
        def scan(delta):
            return jnp.cumsum(delta)

    @jax.jit
    def chunk_step(gs_sel, ge_sel, carry):
        delta = jnp.zeros(chunk_slots, jnp.int32)
        delta = delta.at[gs_sel].add(jnp.where(gs_sel < chunk_slots, 1, 0), mode="drop")
        delta = delta.at[ge_sel].add(jnp.where(ge_sel < chunk_slots, -1, 0), mode="drop")
        return scan(delta) + carry

    out = np.empty(total, dtype=np.int32)
    n_chunks = -(-total // chunk_slots)
    # max events any chunk sees (static pad so one compiled program serves all)
    bounds = np.arange(n_chunks + 1, dtype=np.int64) * chunk_slots
    gs_lo = np.searchsorted(gs, bounds[:-1])
    gs_hi = np.searchsorted(gs, np.minimum(bounds[1:], total))
    ge_lo = np.searchsorted(ge, bounds[:-1])
    ge_hi = np.searchsorted(ge, np.minimum(bounds[1:], total))
    max_ev = max(1, int(max((gs_hi - gs_lo).max(), (ge_hi - ge_lo).max(), 0)))

    for c in range(n_chunks):
        a = int(bounds[c])
        b = min(a + chunk_slots, total)
        gsel = gs[gs_lo[c] : gs_hi[c]] - a
        gesel = ge[ge_lo[c] : ge_hi[c]] - a
        # pad with out-of-range sentinels (dropped by the scatter)
        gsel = np.pad(gsel, (0, max_ev - gsel.shape[0]), constant_values=chunk_slots)
        gesel = np.pad(gesel, (0, max_ev - gesel.shape[0]), constant_values=chunk_slots)
        carry = np.int32(gs_lo[c] - ge_lo[c])
        depth_chunk = chunk_step(
            jnp.asarray(gsel.astype(np.int32)),
            jnp.asarray(gesel.astype(np.int32)),
            carry,
        )
        out[a:b] = np.asarray(depth_chunk[: b - a])
    return out
