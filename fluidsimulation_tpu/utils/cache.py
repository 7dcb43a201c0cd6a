"""Persistent XLA compilation cache — the reference's .cso blob cache.

The reference checks for a compiled shader blob on disk before invoking the
HLSL compiler (Common/d3dUtil.cpp:238-257, used by Simulation.cpp:461) so a
warm start skips all shader compilation.  The JAX equivalent is the XLA
persistent compilation cache: compiled executables are keyed by HLO +
compile options and written to a directory, so a second process reloads
them instead of recompiling (the 128^3 step is ~2 min, the renderer ~4 min
cold in this environment — CLAUDE.md).

Call enable_compilation_cache() before the first jit compilation.  Safe to
call multiple times; a failure (read-only FS, unsupported backend) degrades
to a warning-free no-op because compilation still works without the cache.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)

_enabled_path: str | None = None


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache.  Returns the directory on
    success, None if the cache could not be enabled.  Idempotent: repeat
    calls (every entry point calls this defensively) return the already-
    configured path without touching jax.config again."""
    global _enabled_path
    import jax

    path = cache_dir or os.environ.get("FST_JAX_CACHE_DIR") or _DEFAULT_DIR
    if _enabled_path is not None and cache_dir is None:
        return _enabled_path
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything: default min compile time (1 s) would skip the
        # many sub-second helper jits that still add up across a process.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled_path = path
        return path
    except Exception:
        return None
