"""Sharded whole-pipeline depth: one read-type's genome axis resident on a
(dp, gp) device mesh end-to-end.

This is the user-reachable multi-chip path (``depth_backend="sharded"`` /
``gci --mesh dp,gp``): reads are packed once on host, scattered data-parallel
over ``dp``, the per-base genome axis lives gp-sharded on device through
depth accumulation (GCI.py:302-306), gap masking (GCI.py:315-329), two-type
max (GCI.py:332-353) and issue-interval extraction (GCI.py:356-390).  Only
interval lists (tiny) and run-length boundaries (O(runs)) ever come back to
host; the per-base axis is never materialized host-side.

Collectives: psum over dp merges read-parallel delta partials; the genome
prefix sum is a per-shard scan + all_gather of shard totals; interval edges
and run boundaries stitch across shards with ppermute (gci_tpu.depth.device).
All device paths are asserted byte-identical to the host oracle by
tests/test_sharded_pipeline.py.
"""
from __future__ import annotations

import functools

import numpy as np

from gci_tpu.depth.accum import GenomeLayout
from gci_tpu.depth.base import ResidentDepth, events_from_change_indices

_INT32_MAX = np.iinfo(np.int32).max


@functools.lru_cache(maxsize=32)
def _depth_fn(mesh, pad_total):
    from gci_tpu.depth.device import make_sharded_depth_fn

    return make_sharded_depth_fn(mesh, pad_total)


@functools.lru_cache(maxsize=32)
def _interval_fn(mesh, pad_total):
    from gci_tpu.depth.device import make_sharded_interval_fn

    return make_sharded_interval_fn(mesh, pad_total)


@functools.lru_cache(maxsize=32)
def _change_fn(mesh, pad_total):
    from gci_tpu.depth.device import make_sharded_change_fn

    return make_sharded_change_fn(mesh, pad_total)


@functools.lru_cache(maxsize=32)
def _replicated_take_fn(mesh):
    """Cached replicated-output gather for multi-process value readback."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.jit(jnp.take, out_shardings=NamedSharding(mesh, P()))


@functools.lru_cache(maxsize=8)
def _mask_max_fns():
    import jax
    import jax.numpy as jnp

    mask = jax.jit(lambda depth, marks: jnp.where(marks > 0, 0, depth))
    vmax = jax.jit(jnp.maximum)
    return mask, vmax


def _to_global(mesh, packed: tuple[np.ndarray, ...]):
    """dp-sharded global device arrays from host arrays (multi-process aware).

    Single-process: plain transfers.  Multi-process: every host holds the
    full packed arrays; each contributes only the dp chunks its addressable
    devices own (``jax.make_array_from_process_local_data``), so the device
    feed is per-host input sharding and the dp-psum that merges the partial
    depth deltas is the DCN-crossing collective.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        return tuple(jnp.asarray(a) for a in packed)
    sharding = NamedSharding(mesh, P("dp"))
    dp = mesh.shape["dp"]
    me = jax.process_index()
    owned = sorted({
        int(pos[0])
        for pos, dev in np.ndenumerate(mesh.devices)
        if dev.process_index == me
    })
    out = []
    for a in packed:
        chunk = a.shape[0] // dp
        local = (
            np.concatenate([a[d * chunk : (d + 1) * chunk] for d in owned])
            if owned
            else a[:0]
        )
        out.append(
            jax.make_array_from_process_local_data(sharding, local, a.shape)
        )
    return tuple(out)


def _gp_global(mesh, a: np.ndarray):
    """gp-sharded global device array from identical full host arrays."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        return jnp.asarray(a)
    sharding = NamedSharding(mesh, P("gp"))
    gp = mesh.shape["gp"]
    me = jax.process_index()
    owned = sorted({
        int(pos[1])
        for pos, dev in np.ndenumerate(mesh.devices)
        if dev.process_index == me
    })
    chunk = a.shape[0] // gp
    local = (
        np.concatenate([a[g * chunk : (g + 1) * chunk] for g in owned])
        if owned
        else a[:0]
    )
    return jax.make_array_from_process_local_data(sharding, local, a.shape)


def _replicated_global(mesh, a: np.ndarray):
    """Fully-replicated global device array from identical host data."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        return jnp.asarray(a)
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), a, a.shape
    )


def _host_all(x) -> np.ndarray:
    """Full host copy of a (possibly gp-sharded) global array, every process."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def parse_mesh_spec(spec: str | None = None, n_devices: int | None = None):
    """'dp,gp' | 'auto' | None -> a (dp, gp) jax Mesh over local devices."""
    from gci_tpu.parallel.mesh import make_mesh

    if spec in (None, "", "auto"):
        return make_mesh(n_devices)
    try:
        parts = [int(p) for p in str(spec).split(",")]
        if len(parts) == 1:
            return make_mesh(parts[0])
        dp, gp = parts
    except ValueError:
        import sys

        sys.exit(
            f'ERROR!!! Invalid mesh spec "{spec}"\n'
            "Expected 'dp,gp' (e.g. --mesh 2,4) or 'auto'"
        )
    return make_mesh(dp * gp, dp=dp)


class ShardedDepth(ResidentDepth):
    """One read-type's whole-genome depth, gp-sharded on a device mesh.

    Drop-in value for the pipeline's depth dictionaries: gap masking,
    two-type max, interval collapse and checkpoint serialization all
    dispatch on this type and stay on device.
    """

    def __init__(self, mesh, layout: GenomeLayout, array, pad_total: int):
        self.mesh = mesh
        self.layout = layout
        self.array = array  # jax int32, (pad_total,), sharded over gp
        self.pad_total = pad_total
        self._events = None  # lazy host event-space view

    # ------------------------------------------------------------ construct
    @staticmethod
    def _pad_total(mesh, total: int) -> int:
        import jax

        gp = mesh.shape["gp"]
        if jax.default_backend() == "tpu":
            # per-shard size: Pallas-tile aligned + size-bucketed (shared
            # compile keys across nearby genome sizes — see
            # DeviceDepth.pad_total_for), so the per-shard prefix sum takes
            # the fused kernel path without a fresh Mosaic compile per size
            from gci_tpu.depth.fused import DeviceDepth

            return DeviceDepth.pad_total_for(-(-total // gp)) * gp
        return total + ((-total) % gp)

    @classmethod
    def from_reads(
        cls,
        mesh,
        layout: GenomeLayout,
        target_id: np.ndarray,
        start: np.ndarray,
        end: np.ndarray,
        flank_len: int,
    ) -> "ShardedDepth":
        import jax
        import jax.numpy as jnp

        from gci_tpu.depth.device import pack_read_deltas_sharded

        dp = mesh.shape["dp"]
        pad_total = cls._pad_total(mesh, layout.total_slots)
        shard = pad_total // mesh.shape["gp"]
        n = target_id.shape[0]
        n_padded = n + ((-n) % dp)
        if jax.process_count() > 1:
            # per-host input shard: pack only the rows whose dp chunks live
            # on this process's devices (gci_tpu.parallel.distributed)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from gci_tpu.parallel.distributed import owned_dp_rows

            lo, hi = owned_dp_rows(mesh, n_padded)
            sl = slice(lo, min(hi, n))
            packed = pack_read_deltas_sharded(
                layout, target_id[sl], start[sl], end[sl], flank_len, shard,
                pad_to=hi - lo,
            )
            sharding = NamedSharding(mesh, P("dp"))
            arrs = tuple(
                jax.make_array_from_process_local_data(sharding, a, (n_padded,))
                for a in packed
            )
        else:
            packed = pack_read_deltas_sharded(
                layout, target_id, start, end, flank_len, shard,
                pad_to=n_padded,
            )
            arrs = tuple(jnp.asarray(a) for a in packed)
        fn = _depth_fn(mesh, pad_total)
        with mesh:
            arr = fn(*arrs)
        return cls(mesh, layout, arr, pad_total)

    # ------------------------------------------------------------------ ops
    def mask_gaps(self, gaps: dict[str, list[tuple[int, int]]]) -> "ShardedDepth":
        """Zero depth over N-gap intervals, on device (GCI.py:315-329)."""
        import jax.numpy as jnp

        from gci_tpu.parallel.mesh import pad_to_multiple

        from gci_tpu.depth.base import gap_interval_events

        gs, ge = gap_interval_events(self.layout, gaps)
        if gs.shape[0] == 0:
            return self
        shard = self.pad_total // self.mesh.shape["gp"]
        packed = (
            (gs // shard).astype(np.int32),
            (gs % shard).astype(np.int32),
            (ge // shard).astype(np.int32),
            (ge % shard).astype(np.int32),
            np.ones(gs.shape[0], np.int32),
        )
        dp = self.mesh.shape["dp"]
        packed = tuple(pad_to_multiple(a, dp, fill=f)
                       for a, f in zip(packed, (-1, 0, -1, 0, 0)))
        fn = _depth_fn(self.mesh, self.pad_total)
        mask_fn, _ = _mask_max_fns()
        with self.mesh:
            marks = fn(*_to_global(self.mesh, packed))
            arr = mask_fn(self.array, marks)
        return ShardedDepth(self.mesh, self.layout, arr, self.pad_total)

    def maximum(self, other: "ShardedDepth") -> "ShardedDepth":
        """Per-base two-type max, on device (GCI.py:332-353)."""
        assert self.pad_total == other.pad_total
        _, max_fn = _mask_max_fns()
        with self.mesh:
            arr = max_fn(self.array, other.array)
        return ShardedDepth(self.mesh, self.layout, arr, self.pad_total)

    def collapse_dict(
        self,
        leftmost: float = -1,
        rightmost: float = 0,
        flank_len: int = 15,
        start_pos: int = 0,
    ) -> dict[str, list[tuple[int, int]]]:
        """Issue intervals via the sharded edge extraction (GCI.py:356-390)."""
        import jax.numpy as jnp

        from gci_tpu.depth.device import build_scan_valid, edges_to_intervals

        valid = build_scan_valid(self.layout, flank_len, self.pad_total)
        fn = _interval_fn(self.mesh, self.pad_total)
        with self.mesh:
            m, rise, fall = fn(
                self.array,
                _gp_global(self.mesh, valid),
                _replicated_global(self.mesh, np.asarray([leftmost], np.int32)),
                _replicated_global(self.mesh, np.asarray([rightmost], np.int32)),
            )
        # NOTE: device-side index compaction directly on the MESH-SHARDED
        # bitmaps is deliberately avoided — XLA's SPMD partitioner handles
        # flatnonzero on sharded inputs pathologically (minutes for ~10M
        # slots).  Single-process meshes instead reshard the edge bitmaps
        # to one device (ICI gather) and compact there with the fused
        # batched machinery: the host transfer is O(edges), not the
        # O(genome) bitmap (measured r4: the bitmap pull cost 85 s through
        # the narrow tunnel link for a 0.5G-slot genome).  Multi-process
        # meshes keep the allgathered-bitmap path (shards span hosts).
        import jax

        if jax.process_count() == 1:
            from gci_tpu.depth.device import edge_indices_to_intervals
            from gci_tpu.depth.fused import _batched_edge_readback

            dev = self.mesh.devices.flat[0]
            rise0 = jax.device_put(rise, dev)
            fall0 = jax.device_put(fall, dev)
            # values are irrelevant for interval extraction: reuse a bitmap
            # as the gather source rather than moving the depth array
            (rise_idx, fall_idx), _, _ = _batched_edge_readback(
                rise0, self.layout, (rise0, fall0), 0
            )
            return edge_indices_to_intervals(
                self.layout, rise_idx, fall_idx, flank_len, start_pos
            )
        return edges_to_intervals(
            self.layout, _host_all(rise), _host_all(fall), _host_all(m),
            flank_len, start_pos,
        )

    # ------------------------------------------------------------ host view
    def to_events(self):
        """O(runs) host view: {target: DepthEvents}.

        Run boundaries come from the sharded change-detect collective (int8
        bitmap transfer); boundary values from one device gather.  Used for
        the checkpoint writer, regions re-collapse and plotting — the only
        host-side representations the pipeline needs.
        """
        if self._events is not None:
            return self._events
        import jax.numpy as jnp

        import jax

        fn = _change_fn(self.mesh, self.pad_total)
        with self.mesh:
            change = fn(self.array)
        if jax.process_count() == 1 and self.pad_total <= _INT32_MAX:
            # single-process: reshard to one device and compact + gather
            # there — O(runs) host transfer instead of the O(genome) int8
            # bitmap (see collapse_dict NOTE)
            from gci_tpu.depth.fused import _batched_edge_readback

            dev = self.mesh.devices.flat[0]
            arr0 = jax.device_put(self.array, dev)
            change0 = jax.device_put(change, dev)
            (idx,), vals, offset_vals = _batched_edge_readback(
                arr0, self.layout, (change0,), 0
            )
            pos = np.concatenate(
                [idx, np.asarray(self.layout.offsets, np.int64)]
            )
            allv = np.concatenate([vals, offset_vals])
            order = np.argsort(pos, kind="stable")
            pos, allv = pos[order], allv[order]

            def gather0(all_idx: np.ndarray) -> np.ndarray:
                return allv[np.searchsorted(pos, all_idx)]

            self._events = events_from_change_indices(
                self.layout, idx, gather0
            )
            return self._events
        # host flatnonzero of the int8 bitmap (see collapse_dict NOTE)
        idx = np.flatnonzero(_host_all(change)).astype(np.int64)

        def gather(all_idx: np.ndarray) -> np.ndarray:
            if self.pad_total > _INT32_MAX:
                # >2^31 slots: int32 device indexing would wrap — gather on
                # host from the assembled array (O(genome) transfer, the
                # honest cost at this scale)
                host = _host_all(self.array)
                return host[all_idx].astype(np.int64)
            if jax.process_count() > 1:
                with self.mesh:
                    vals = _replicated_take_fn(self.mesh)(
                        self.array,
                        _replicated_global(self.mesh, all_idx.astype(np.int32)),
                    )
                return np.asarray(vals).astype(np.int64)
            with self.mesh:
                return np.asarray(
                    jnp.take(self.array, jnp.asarray(all_idx.astype(np.int32)))
                ).astype(np.int64)

        self._events = events_from_change_indices(self.layout, idx, gather)
        return self._events

    def materialize_dict(self) -> dict[str, np.ndarray]:
        """Per-target per-base arrays (tests/oracles only — O(genome) host)."""
        flat = np.asarray(self.array)[: self.layout.total_slots]
        from gci_tpu.depth.accum import depth_dict_from_flat

        return depth_dict_from_flat(self.layout, flat)
