"""shard_map varying-manual-axes helpers (jax 0.9 vma bookkeeping).

Under `shard_map`, constant-initialized `lax.scan` carries (zeros, eye)
are "unvarying" while the data they accumulate is "varying" over the
manual mesh axes — the scan then rejects the carry type mismatch. These
helpers promote values explicitly; both are no-ops outside shard_map
(callers only pass axes when sharded / refs carry no vma there).
"""

from __future__ import annotations

import jax


def pvary(x, axes):
    """Promote x to varying over any of `axes` it is not already varying
    over."""
    have = getattr(jax.typeof(x), "vma", frozenset())
    need = tuple(a for a in axes if a not in have)
    return jax.lax.pcast(x, need, to="varying") if need else x


def match_vma(x, ref):
    """Promote x's varying-manual-axes to include ref's."""
    want = getattr(jax.typeof(ref), "vma", frozenset())
    return pvary(x, tuple(want))
