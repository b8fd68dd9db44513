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
