"""Persistent XLA compilation cache for the TPU entry points.

The axon TPU backend on this machine compiles remotely with high variance
(the same program has compiled in 23 s and 344 s in one session — see
CLAUDE.md); the jax persistent cache stores the compiled executable
locally keyed by program hash, so reruns of bench/eval/sweep programs skip
the remote compile entirely (measured: a 54 s axon compile reloads in
~1 s). Cache entries are keyed by platform + program, so CPU test
artifacts (tests/conftest.py points at the same directory) and TPU
artifacts coexist; code changes change the hash, so staleness is not a
correctness risk. The directory is gitignored.
"""

from __future__ import annotations

import os


def enable_compile_cache(min_compile_secs: float = 2.0) -> str:
    """Point jax's persistent compilation cache at the repo-local
    ``.jax_cache`` directory (same one the test suite uses). Call before
    the first compilation; idempotent. Returns the cache directory."""
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
    return cache_dir
