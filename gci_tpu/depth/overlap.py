"""Pack <-> device-scatter overlap for the single-BAM, no-PAF pipeline shape.

The reference streams (target, window) fetch tasks while accumulating depth
(GCI.py:146-169); our streaming packer instead finished the whole file before
the depth backend started, serialized by the last-wins name dedup.  For the
common single-BAM no-PAF case (e.g. the CHM13 rehearsal shape) the dedup CAN
fold incrementally: a record whose name already appeared retracts the stored
record's interval (scatter -1) and adds its own (+1) — the running sum equals
the scatter of the final last-wins survivor set exactly, because integer
scatter-adds commute.  Each packed chunk's deltas therefore dispatch to the
device (asynchronously) while the native producer inflates the next chunk.

Two consumers:

* ``DeviceDepth.from_delta``  — single-chip fused path (<= 2^31 slots);
* ``events_from_delta2d_streamed`` — the >HBM streamed path; the resident
  delta lives as a (n_chunks, chunk_slots) int32 array so scatter indices
  stay int32 (global slots can exceed 2^31).
"""
from __future__ import annotations

import functools

import numpy as np

from gci_tpu.depth.accum import GenomeLayout, clamp_read_intervals


class LastWinsFold:
    """Incremental last-wins name dedup across packed chunks.

    Chunks arrive in file order, already deduped *within* the chunk.  For
    each chunk, returns the rows that a record in this chunk replaces (the
    currently-live record of the same name from an earlier chunk); those
    rows' intervals are retracted from the device delta.  Membership tests
    run against per-chunk sorted "pockets" (no global re-sort per chunk).
    """

    def __init__(self) -> None:
        # per pocket: (sorted void16 keys, rows (n, 3) int64, alive mask)
        self._pockets: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []

    def fold(
        self, kv: np.ndarray, tid: np.ndarray, start: np.ndarray,
        end: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Fold one chunk; returns (tid, start, end) rows to retract.

        ``kv`` is the chunk's void16 key view (unique within the chunk).
        """
        retract: list[np.ndarray] = []
        for keys, rows, alive in self._pockets:
            pos = np.searchsorted(keys, kv)
            posc = np.minimum(pos, keys.shape[0] - 1)
            hit = (keys[posc] == kv) & alive[posc]
            if hit.any():
                h = posc[hit]
                retract.append(rows[h])
                alive[h] = False
        order = np.argsort(kv)
        rows = np.stack(
            [tid.astype(np.int64), start.astype(np.int64),
             end.astype(np.int64)], axis=1,
        )[order]
        self._pockets.append(
            (kv[order], rows, np.ones(kv.shape[0], dtype=bool))
        )
        if retract:
            r = np.concatenate(retract)
            return r[:, 0], r[:, 1], r[:, 2]
        e = np.empty(0, np.int64)
        return e, e, e


@functools.lru_cache(maxsize=8)
def _scatter2d_fn(n_rows: int, n_cols: int):
    """Signed scatter of interval events into the resident 2-D delta.

    Out-of-range rows (sentinel ``n_rows``) drop; the delta buffer is
    donated so repeated chunk scatters never copy the multi-GB array.
    """
    import jax
    import jax.numpy as jnp

    def f(delta2d, rs, cs, re_, ce, val):
        delta2d = delta2d.at[(rs, cs)].add(val, mode="drop")
        delta2d = delta2d.at[(re_, ce)].add(-val, mode="drop")
        return delta2d

    return jax.jit(f, donate_argnums=(0,))


class DeltaAccumulator:
    """Device-resident (n_chunks, chunk_slots) int32 delta, fed chunk by
    chunk during pack.  Dispatches are asynchronous: the host returns to
    inflating/filtering the next BAM chunk while the device scatters.
    """

    def __init__(self, layout: GenomeLayout, flank_len: int, chunk_slots: int):
        import jax.numpy as jnp

        self.layout = layout
        self.flank_len = flank_len
        self.chunk_slots = int(chunk_slots)
        self.n_chunks = -(-layout.total_slots // self.chunk_slots)
        self.delta2d = jnp.zeros(
            (self.n_chunks, self.chunk_slots), jnp.int32
        )
        self._fold = LastWinsFold()

    def _coords(self, g: np.ndarray, live: np.ndarray):
        rows = np.where(live, g // self.chunk_slots, self.n_chunks)
        cols = g % self.chunk_slots
        return rows.astype(np.int32), cols.astype(np.int32)

    def _scatter(self, tid, start, end, sign: int) -> None:
        import jax.numpy as jnp

        if tid.shape[0] == 0:
            return
        s, e = clamp_read_intervals(self.layout, tid, start, end, self.flank_len)
        base = self.layout.offsets[tid]
        live = e > s
        # pad to a power of two so one compiled program serves all chunks
        n = tid.shape[0]
        padded = 1 << (n - 1).bit_length()
        gs = np.pad(base + s, (0, padded - n))
        ge = np.pad(base + e, (0, padded - n))
        live = np.pad(live, (0, padded - n))
        rs, cs = self._coords(gs, live)
        re_, ce = self._coords(ge, live)
        val = np.where(live, np.int32(sign), 0).astype(np.int32)
        self.delta2d = _scatter2d_fn(self.n_chunks, self.chunk_slots)(
            self.delta2d, jnp.asarray(rs), jnp.asarray(cs),
            jnp.asarray(re_), jnp.asarray(ce), jnp.asarray(val),
        )

    def add_chunk(self, kv, tid, start, end) -> None:
        """Fold one packed chunk (unique names within the chunk) into the
        resident delta: retract replaced records, add the new ones."""
        rt, rstart, rend = self._fold.fold(kv, tid, start, end)
        self._scatter(rt, rstart, rend, -1)
        self._scatter(tid, start, end, +1)

    def delta_flat(self):
        """The accumulated delta as a flat (n_chunks*chunk_slots,) view."""
        return self.delta2d.reshape(-1)

    def release(self) -> None:
        """Free the resident delta immediately (fallback path: the classic
        depth computation needs the HBM this buffer holds)."""
        try:
            self.delta2d.delete()
        except Exception:
            pass
        self.delta2d = None
