"""Multi-host runtime helpers.

On a TPU pod slice each host packs a disjoint shard of the alignment data
(reads are embarrassingly parallel), devices accumulate partial depth deltas,
and the dp-axis psum merges them — DCN only carries the all-reduce when dp
spans hosts.  The reference has no distributed anything (SURVEY.md §2.3);
this module is the native cluster entry.

Testable pieces (shard assignment, record-range splitting) are pure; the
``initialize`` wrapper is a thin veneer over ``jax.distributed``.
"""
from __future__ import annotations

import os
from dataclasses import dataclass


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (no-op on single-process runs).

    With no arguments, relies on the cluster environment (TPU metadata /
    JAX_COORDINATOR_ADDRESS) exactly like ``jax.distributed.initialize``.
    """
    import jax

    if num_processes in (None, 1) and coordinator_address is None and (
        "JAX_COORDINATOR_ADDRESS" not in os.environ
    ):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


@dataclass(frozen=True)
class HostShard:
    """This process's slice of the input work."""

    process_index: int
    process_count: int

    def files(self, paths: list[str]) -> list[str]:
        """Round-robin file assignment (whole files stay on one host)."""
        return [p for i, p in enumerate(paths) if i % self.process_count == self.process_index]

    def record_range(self, n_records: int) -> tuple[int, int]:
        """Contiguous [start, stop) record range for one shared file."""
        per = -(-n_records // self.process_count)
        start = min(self.process_index * per, n_records)
        return start, min(start + per, n_records)


def current_host_shard() -> HostShard:
    import jax

    return HostShard(jax.process_index(), jax.process_count())


def owned_dp_rows(mesh, n_rows: int) -> tuple[int, int]:
    """Contiguous [lo, hi) range of a dp-sharded axis owned by this process.

    This is the per-host input shard: on a pod slice each host packs only the
    read records whose dp chunks live on its own devices; the dp-psum that
    merges the partial depth deltas is then the only cross-host traffic.
    ``n_rows`` must be a multiple of the mesh's dp size.
    """
    import jax
    import numpy as np

    dp = mesh.shape["dp"]
    chunk = n_rows // dp
    me = jax.process_index()
    owned = sorted({
        int(pos[0])
        for pos, dev in np.ndenumerate(mesh.devices)
        if dev.process_index == me
    })
    if not owned:
        return (0, 0)
    assert owned == list(range(owned[0], owned[-1] + 1)), (
        "dp rows owned by one process must be contiguous"
    )
    return owned[0] * chunk, (owned[-1] + 1) * chunk


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary_host() -> bool:
    """True on the process that owns file writes (process 0).

    On a multi-host run every process executes the full pipeline (the
    collectives are SPMD — all processes must participate), but exactly one
    writes the output files; the reference's single-writer file semantics
    (GCI.py:99-143 etc.) are preserved verbatim.  Always True single-process.
    """
    import jax

    return jax.process_index() == 0
