"""Persistent XLA compilation cache — first TPU compile of the big scans is
tens of seconds (remote-compiled in this environment); caching makes every
subsequent process start warm."""

from __future__ import annotations

import os

import jax


def enable_persistent_cache(path=None):
    path = path or os.environ.get("VMLMF_JAX_CACHE", os.path.expanduser("~/.cache/vmlmf_jax"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail a run over it
    return path
