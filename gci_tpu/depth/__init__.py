from .accum import (
    GenomeLayout,
    accumulate_depth,
    accumulate_depth_numpy,
    depth_dict_from_flat,
)

_AUTO_RESOLVED: str | None = None


def _probe_dispatch_latency(n: int = 3) -> float:
    """Median seconds for one tiny device round-trip (put + readback)."""
    import time

    import jax
    import numpy as np

    x = np.zeros(8, np.float32)
    np.asarray(jax.device_put(x))  # warm the path
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(jax.device_put(x))
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[len(samples) // 2]


def resolve_auto_backend(
    default_backend: str | None = None,
    dispatch_latency: float | None = None,
) -> str:
    """Resolve the ``auto`` depth backend honestly.

    ``device`` when a *colocated* TPU is attached (default backend is tpu
    and a tiny put+readback round-trip is fast); ``events`` on host-only
    runs or when the TPU sits behind a high-latency dispatch path (e.g. a
    network tunnel), where per-call overhead dominates the kernel wins
    (measured r2: backend stages 2.4s events vs 17.1s tunneled device).
    Cached per process; ``GCI_AUTO_BACKEND`` overrides.
    """
    global _AUTO_RESOLVED
    import os

    override = os.environ.get("GCI_AUTO_BACKEND")
    if override:
        valid = {"events", "device", "streamed", "sharded", "numpy"}
        if override not in valid:
            raise ValueError(
                f"GCI_AUTO_BACKEND={override!r} is not a known depth backend"
                f" (expected one of {sorted(valid)})"
            )
        return override
    explicit = default_backend is not None or dispatch_latency is not None
    if not explicit and _AUTO_RESOLVED is not None:
        return _AUTO_RESOLVED
    if default_backend is None:
        # tunneled-TPU plugins (axon) are never "colocated": decide from the
        # platform list WITHOUT initializing the backend — merely warming the
        # runtime through a tunnel can cost minutes (measured 233s), which
        # would be absurd overhead just to pick the host backend
        import jax

        platforms = os.environ.get("JAX_PLATFORMS", "") or str(
            getattr(jax.config, "jax_platforms", None) or ""
        )
        if "axon" in (p.strip() for p in platforms.split(",")):
            _AUTO_RESOLVED = "events"
            return "events"
        default_backend = jax.default_backend()
    if default_backend != "tpu":
        choice = "events"
    else:
        if dispatch_latency is None:
            dispatch_latency = _probe_dispatch_latency()
        # colocated PCIe dispatch+readback is ~0.1-0.5ms; a tunnel is >=10ms
        choice = "device" if dispatch_latency < 0.003 else "events"
    if not explicit:  # cache only real-environment probes
        _AUTO_RESOLVED = choice
    return choice


__all__ = [
    "GenomeLayout",
    "accumulate_depth",
    "accumulate_depth_numpy",
    "depth_dict_from_flat",
    "resolve_auto_backend",
]
