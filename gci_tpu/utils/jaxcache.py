"""Persistent XLA compile cache wiring.

The fused depth-scan kernel's Mosaic/XLA compile is expensive (minutes on a
cold remote-compile path), so every entry point (CLI, side-car tools, bench,
graft entry) enables jax's on-disk compilation cache before the first trace.
Cache location: ``$GCI_JAX_CACHE_DIR`` if set, else ``~/.cache/gci_tpu/jax``.

Safe to call multiple times and safe when jax's backend is already
initialized (the config knobs below are not backend-init-locked).
"""
from __future__ import annotations

import os

_done = False


def enable_compile_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import jax
    except Exception:
        return
    cache_dir = os.environ.get("GCI_JAX_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "gci_tpu", "jax"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail the pipeline over it
