"""Persistent XLA compilation cache shared by every CLI in this package.

TPU compiles of the big jit programs (the 50/100-step sampler scan, the
fused multi-step train dispatch) take minutes through a remote-tunnel
runtime; caching them makes chunked/resumed training restarts and repeat
benchmarks start in seconds.  The cache must live on a durable filesystem —
an earlier round kept it in /tmp and lost it (plus a chunk of recompiles)
to every VM restart — so it defaults to `.jax_cache/` next to the package
(gitignored), overridable with LADIFFCODEC_CACHE_DIR.
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def setup_compile_cache(path: str | None = None) -> str:
    """Enable the persistent compilation cache; returns the directory used.

    Safe to call more than once; call before the first jit compilation for
    full effect."""
    path = path or os.environ.get("LADIFFCODEC_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
