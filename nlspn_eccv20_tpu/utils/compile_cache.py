"""Persistent XLA compilation cache.

The fork-default model unrolls 12 propagation iterations (the fast layout,
see docs/PERFORMANCE.md), which makes first-compile of the full-resolution
train step expensive (minutes). JAX's persistent compilation cache stores
the compiled executable keyed by (HLO, compiler flags, platform), so every
later process start — resumed training, eval, serving, benchmarking — skips
straight to execution.

The reference has no equivalent cost (PyTorch eager); this removes ours.

Enabled by default from the CLI/serve/bench entry points; opt out with
``--no_compile_cache`` or ``NLSPN_COMPILE_CACHE=0``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/nlspn_eccv20_tpu/xla")
_enabled_dir: str | None = None


def enable_compilation_cache(cache_dir: str = "") -> str | None:
    """Idempotently turn on the persistent cache; returns the dir or None.

    cache_dir: explicit directory; empty selects $NLSPN_COMPILE_CACHE or
    the default ``~/.cache/nlspn_eccv20_tpu/xla``. ``NLSPN_COMPILE_CACHE=0``
    disables entirely.
    """
    global _enabled_dir
    env = os.environ.get("NLSPN_COMPILE_CACHE", "")
    if env == "0":
        return None
    path = cache_dir or env or _DEFAULT_DIR
    if _enabled_dir == path:
        return path
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything that took noticeable compile time; tiny programs
    # recompile faster than they deserialize.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled_dir = path
    return path
