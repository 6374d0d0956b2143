"""Persistent XLA compilation cache.

Compiling the fused inference programs through a remote-attached TPU takes
minutes; the persistent cache makes every later process start at full speed.
Enabled automatically by the engines; override the location with
TS2D_COMPILE_CACHE (set to '0' to disable).
"""

from __future__ import annotations

import os

_done = False


def enable_compilation_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    path = os.environ.get('TS2D_COMPILE_CACHE')
    if path == '0':
        return
    if not path:
        path = os.path.join(os.path.expanduser('~'), '.ts2d', 'jax_cache')
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception:
        pass
