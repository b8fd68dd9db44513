"""Persistent XLA compile cache wiring — the ONE implementation every entry
point (CLI, side-car tools, bench, graft entry) shares.

The fused depth-scan kernel's Mosaic/XLA compile is expensive (minutes on a
cold remote-compile path), so each entry point enables jax's on-disk
compilation cache before the first trace.  Cache dir resolution order:

1. explicit ``cache_dir`` argument,
2. ``$GCI_JAX_CACHE_DIR``,
3. a source checkout's repo-local ``.jax_cache`` (detected as a ``.jax_cache``
   or ``pyproject.toml`` sibling of the package dir) — so CLI runs, bench.py
   and the graft entry all hit the same cache during development,
4. ``~/.cache/gci_tpu/jax``.

Safe to call multiple times and safe when jax's backend is already
initialized (the config knobs below are not backend-init-locked).
"""
from __future__ import annotations

import os

_done = False


def default_cache_dir() -> str:
    env = os.environ.get("GCI_JAX_CACHE_DIR")
    if env:
        return env
    pkg_parent = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    repo_cache = os.path.join(pkg_parent, ".jax_cache")
    if os.path.isdir(repo_cache) or os.path.exists(
        os.path.join(pkg_parent, "pyproject.toml")
    ):
        return repo_cache
    return os.path.join(os.path.expanduser("~"), ".cache", "gci_tpu", "jax")


def enable_compile_cache(cache_dir: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import jax
    except Exception:
        return
    cache_dir = cache_dir or default_cache_dir()
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail the pipeline over it
