"""RNG helpers for sharding-invariant sampling."""

from __future__ import annotations

import jax


def fold_in_batch(key: jax.Array, ids) -> jax.Array:
    """Derive one key per integer id. Used to give every sample a key that
    depends only on its GLOBAL index, so a sharded solve draws the same
    noise regardless of mesh shape."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(ids)
