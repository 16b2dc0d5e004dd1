"""CoVO's optimal sampling-covariance design as an on-device linalg block.

Implements Σ ∝ R^{-1/2} under a fixed-determinant constraint
(reference: quadjax/controllers/covo.py:116-132) plus the cost-Hessian
estimators that feed it (reference: covo.py:134-185).

TPU notes:
  * The (H·dA)² Hessian is built from batched JVP rollouts — XLA turns the
    tangent batch into wide vectorized programs.
  * ``optimize_sigma`` returns BOTH the covariance and an eigen-square-root
    factor: samplers in fast mode use the factor directly and skip the
    Cholesky of Σ entirely (Σ = U diag(e^s) U^T ⇒ U diag(e^{s/2}) is a
    valid sampling factor).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

FWD_FWD = "fwd_fwd"  # jacfwd ∘ jacfwd: the reference's estimator (covo.py:183-185)
FWD_REV = "fwd_rev"  # jacfwd ∘ grad: one backward pass per tangent, ~D× cheaper


def optimize_sigma(
    R: jnp.ndarray, sample_sigma, horizon_dim: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Determinant-preserving inverse-square-root spectrum rescale.

    Exactly the reference recipe (covo.py:116-132): symmetrize R, eigh,
    shift the spectrum positive by ``-λ_min + 1e-2``, then set
    ``log s_i = ½ log c - ½ log λ_i`` with the constant chosen so that
    ``det Σ = det(σ² I)`` — i.e. Σ ∝ R^{-1/2} at fixed sampling volume.

    Args:
      R: (D, D) cost Hessian, D = H · action_dim.
      sample_sigma: the isotropic σ whose determinant is preserved.
      horizon_dim: D (static).

    Returns:
      (a_cov, factor): the (D, D) covariance and a (D, D) factor with
      ``factor @ factor.T == a_cov`` (eigen square root, for fast sampling).
    """
    R = (R + R.T) / 2.0
    eigs, u = jnp.linalg.eigh(R)
    offset = -jnp.min(eigs) + 1e-2
    log_o = jnp.log(eigs + offset)

    log_det_a_cov = horizon_dim * (jnp.log(sample_sigma) * 2.0)
    log_const = (log_det_a_cov * 2.0 + jnp.sum(log_o)) / horizon_dim
    log_s = 0.5 * log_const - 0.5 * log_o

    factor = u * jnp.exp(0.5 * log_s)[None, :]
    a_cov = (u * jnp.exp(log_s)[None, :]) @ u.T
    a_cov = (a_cov + a_cov.T) / 2.0
    return a_cov, factor


def make_hessian(cost_fn, mode: str = FWD_FWD):
    """Hessian of a scalar rollout cost w.r.t. the flattened action sequence.

    ``cost_fn(a_flat, *args) -> scalar``; returns ``hessian(a_flat, *args)
    -> (D, D)``.

    * ``fwd_fwd`` is the reference's estimator (covo.py:183-185): forward
      over forward, ~D² tangent rollouts, fully batched.
    * ``fwd_rev`` runs one reverse pass per forward tangent (~D rollouts) —
      mathematically the same matrix, cheaper at D=128; made default-able
      once parity tests pass (both are pinned against the reference in
      tests/test_covo.py).
    """
    if mode == FWD_FWD:
        return jax.jacfwd(jax.jacfwd(cost_fn, argnums=0), argnums=0)
    if mode == FWD_REV:
        return jax.jacfwd(jax.grad(cost_fn, argnums=0), argnums=0)
    raise ValueError(f"unknown hessian mode {mode!r}")
