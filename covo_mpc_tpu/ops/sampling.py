"""Correlated-noise action samplers.

The reference draws N samples by vmapping `jax.random.multivariate_normal`
over N keys with the SAME covariance (reference: quadjax/controllers/
mppi.py:56-65, covo.py:215-221) — semantically N redundant Cholesky
factorizations. Here the factorization happens once and the correlation is
applied as a single batched matmul, which on TPU is one MXU pass:

    A = mean + Z @ L^T,   Z ~ N(0, I)^(N x D),   L = chol(cov)

Three RNG modes:
  * ``parity``   — reproduce the reference's exact key tree and draws
                   (per-sample subkeys feeding `normal`), so sampled actions
                   are bit-compatible with the reference given the same key.
  * ``fast``     — one `normal(key, (N, ...))` draw; fastest single-chip.
  * ``invariant``— per-sample `fold_in(key, sample_id)` draws; results are
                   independent of how the sample axis is sharded across a
                   mesh, so multi-chip solves are reproducible at any mesh
                   shape (used by covo_mpc_tpu.parallel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PARITY = "parity"
FAST = "fast"
INVARIANT = "invariant"
# KERNEL: the draw happens INSIDE the fused rollout kernel (TPU hardware
# PRNG + Box-Muller, ops/rollout_pallas.make_pallas_rollout_sampling) —
# same MVN law, different stream from the jnp samplers. Requires the
# pallas engine; the sampled actions come back as a kernel output.
KERNEL = "kernel"


def _std_normal(key, N, shape, mode, sample_ids=None):
    """N i.i.d. standard-normal blocks of `shape` under the given RNG mode."""
    if mode == FAST:
        return jax.random.normal(key, (N,) + shape)
    if mode == INVARIANT:
        from covo_mpc_tpu.utils.keys import fold_in_batch

        ids = sample_ids if sample_ids is not None else jnp.arange(N)
        keys = fold_in_batch(key, ids)
        return jax.vmap(lambda k: jax.random.normal(k, shape))(keys)
    raise ValueError(f"unknown rng mode {mode!r}")


def sample_per_step(
    key: jax.Array,
    a_mean: jnp.ndarray,  # (H, dA)
    a_cov: jnp.ndarray,  # (H, dA, dA)
    N: int,
    mode: str = FAST,
    sample_ids: jnp.ndarray | None = None,
    chol: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """MPPI-style sampling: independent per-step MVN blocks -> (N, H, dA).

    Parity mode replicates the reference key tree (mppi.py:53-65): per
    sample n, per step h, ``normal(key_{n,h}, (dA,))`` correlated through
    ``chol(a_cov[h])`` — identical normal draws, one shared factorization.
    ``chol``: pass the carried factor (solvers/mppi.py) to skip the
    per-solve batched Cholesky; None derives it from ``a_cov``.
    """
    if chol is None:
        chol = jnp.linalg.cholesky(a_cov)  # (H, dA, dA), once for all N
    H, dA = a_mean.shape
    if mode == PARITY:
        sample_keys = jax.random.split(key, N)  # (N,) keys
        step_keys = jax.vmap(lambda k: jax.random.split(k, H))(sample_keys)
        z = jax.vmap(jax.vmap(lambda k: jax.random.normal(k, (dA,))))(step_keys)
    else:
        z = _std_normal(key, N, (H, dA), mode, sample_ids)
    # a[n, h] = mean[h] + chol[h] @ z[n, h]
    return a_mean[None] + jnp.einsum("hij,nhj->nhi", chol, z)


def sample_joint(
    key: jax.Array,
    mean_flat: jnp.ndarray,  # (D,)
    factor: jnp.ndarray,  # (D, D) such that cov = factor @ factor.T
    N: int,
    mode: str = FAST,
    sample_ids: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """CoVO-style sampling from one joint D-dim MVN -> (N, D).

    ``factor`` is any square root of the covariance. The parity path must be
    fed ``chol(cov)`` (what `multivariate_normal` uses internally); the fast
    path can use the cheaper eigen-factor from the Σ-designer directly
    (covo_mpc_tpu.ops.covariance.optimize_sigma).
    """
    D = mean_flat.shape[0]
    if mode == PARITY:
        sample_keys = jax.random.split(key, N)
        z = jax.vmap(lambda k: jax.random.normal(k, (D,)))(sample_keys)
    else:
        z = _std_normal(key, N, (D,), mode, sample_ids)
    return mean_flat[None] + z @ factor.T


def sample_joint_t(
    key: jax.Array,
    mean_flat: jnp.ndarray,  # (D,)
    factor: jnp.ndarray,  # (D, D)
    N: int,
    mode: str = FAST,
    sample_ids: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """:func:`sample_joint` emitted directly in the fused kernel's (D, N)
    layout — the SAME draws (z stays (N, D); the MXU contracts
    ``factor @ z.T`` without materializing a transpose), so downstream
    never pays the 4 MB action-tensor transpose the (N, D) layout needs
    before the kernel (measured ~11 µs/solve at N=8192, D=128)."""
    if mode == PARITY:  # pragma: no cover - parity pairs with the jnp engine
        raise ValueError("transposed sampling is a fast-path layout")
    z = _std_normal(key, N, (mean_flat.shape[0],), mode, sample_ids)
    return mean_flat[:, None] + jnp.einsum("ed,nd->en", factor, z)


def sample_per_step_t(
    key: jax.Array,
    a_mean: jnp.ndarray,  # (H, dA)
    a_cov: jnp.ndarray,  # (H, dA, dA)
    N: int,
    mode: str = FAST,
    sample_ids: jnp.ndarray | None = None,
    chol: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """:func:`sample_per_step` emitted in the fused kernel's (H, dA, N)
    layout (same draws, no materialized transpose)."""
    if mode == PARITY:  # pragma: no cover
        raise ValueError("transposed sampling is a fast-path layout")
    if chol is None:
        chol = jnp.linalg.cholesky(a_cov)
    H, dA = a_mean.shape
    z = _std_normal(key, N, (H, dA), mode, sample_ids)
    return a_mean[..., None] + jnp.einsum("hij,nhj->hin", chol, z)
