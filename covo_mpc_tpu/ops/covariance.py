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

from covo_mpc_tpu.utils.vma import match_vma

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


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """fp32 matmul. TPU's default matmul precision truncates fp32 inputs to
    bf16, which wrecks the λ_min refinement (needs ~1e-6 relative) — the
    designer NaNs over a real episode without this. HIGHEST keeps the MXU
    path (multi-pass bf16) at full fp32 accuracy."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _extreme_eig(B: jnp.ndarray, squarings: int, norm_every: int = 3) -> jnp.ndarray:
    """λ_max of symmetric PSD ``B`` by power iteration with repeated squaring.

    After ``m`` squarings the spectral weight of eigenvalue λ in
    ``M ∝ B^(2^m)`` is ``(λ/λ_max)^(2^m)``; the Rayleigh quotient
    ``<M, B M> / <M, M>`` then averages only eigenvalues within
    ``~2^{-m} log``-distance of the top, so the estimate is exact up to the
    width of the top cluster — the right semantics for a spectrum shift.
    Matmul-only (one 128³ matmul per squaring): MXU-bound, no eigh.

    The overflow/underflow normalization runs every ``norm_every`` squarings
    instead of every squaring: the designer's cost is SEQUENTIAL op-issue
    latency (each full-matrix norm is a reduction the next matmul waits on),
    and a block of 3 unnormalized squarings is fp32-safe — after a
    normalize ``σ_max(M) ≥ D^{-1/2}`` (flattest case M ∝ I/√D), so three
    squarings keep ``‖M⁸‖_F ≥ σ_max(M)⁸ = D^{-4} ≈ 4e-9`` at D=128, far
    above the fp32 floor, while squaring a normalized matrix can never
    overflow (‖M²‖ ≤ ‖M‖² = 1). Rounds ``squarings`` UP to whole blocks
    (suppression only grows); the Rayleigh quotient is scale-invariant, so
    the estimate is unchanged up to fp rounding (pinned vs eigh in
    tests/test_covo.py::TestOptimizeSigmaNS).

    Normalization divides by the norm only when it is strictly positive —
    NOT by ``‖·‖ + 1e-30``: the additive guard leaves M far below unit
    norm when ``‖B‖`` is subnormal-small (degenerate R: the norm's
    sum-of-squares itself underflows to 0), and three unnormalized
    squarings of a sub-unit M then underflow the NEXT norm to exact zero,
    exploding that normalize. With the where-guard a zero/underflowed-norm
    matrix is left as-is and decays to exact 0, whose Rayleigh quotient is
    a harmless 0; from a genuinely unit-scale block entry,
    ``‖M⁸‖_F ≥ σ_max⁸ ≥ D⁻⁴`` keeps every norm representable.
    """
    blocks = -(-squarings // norm_every)

    def _unit(M):
        n = jnp.linalg.norm(M)
        return M / jnp.where(n > 0, n, 1.0)

    def block(M, _):
        for _ in range(norm_every):
            M = _mm(M, M)
        return _unit(M), None

    M, _ = jax.lax.scan(block, _unit(B), None, length=blocks)
    return jnp.vdot(M, _mm(B, M)) / (jnp.vdot(M, M) + 1e-30)


# Quintic lift coefficients (Muon's polar Newton–Schulz a,b,c): the coupled
# eigenvalue map below is x → x·q(x)² with q(x) = a + b·x + c·x², which is
# exactly Muon's odd-polynomial singular-value map expressed in x = σ².
_LIFT_A, _LIFT_B, _LIFT_C = 3.4445, -4.7750, 2.0315


def _ns_sqrt(
    Ahat: jnp.ndarray, lift: int, polish: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coupled inverse-square-root iteration ``(Y, Z) → (A^{1/2}, A^{-1/2})``
    with a quintic lift phase. Requires ``spec(Ahat) ⊂ (0, 1]``.

    The coupled step ``Y ← Y·q(X), Z ← q(X)·Z`` with ``X = Z·Y`` is valid
    for ANY polynomial q: Y₀ = A and Z₀ = I are polynomials in A, so all
    iterates commute and per-eigenvalue ``y = a·z`` is invariant; the
    eigenvalues of X follow ``x → x·q(x)²``, and x → 1 forces
    ``z → a^{-1/2}``. The classic cubic ``q = (3−x)/2`` grows small
    eigenvalues 2.25× per iteration at 2 matmuls of critical path; the
    tuned quintic lift grows them ``a² ≈ 11.9×`` at 3 matmuls — 2.28× vs
    1.5× per matmul of MXU-latency-bound chain — after which cubic polish
    steps square the residual to below the fp32 rounding floor.

    Schedule (picked by dense scalar simulation of the composed maps, with
    ≥10× condition margin): lift=8/polish=5 covers κ ≤ 1e8 with exact-
    arithmetic residual ``|ZY−I| ≤ 8e-12``; lift=3/polish=4 covers κ ≤ 500
    at ≤ 3.3e-6. Pure 128³ matmuls — the MXU replacement for eigh.
    """
    D = Ahat.shape[0]
    eye = match_vma(jnp.eye(D, dtype=Ahat.dtype), Ahat)

    def lift_body(carry, _):
        Y, Z = carry
        X = _mm(Z, Y)
        Q = _LIFT_A * eye + _LIFT_B * X + _LIFT_C * _mm(X, X)
        return (_mm(Y, Q), _mm(Q, Z)), None

    def polish_body(carry, _):
        Y, Z = carry
        T = 0.5 * (3.0 * eye - _mm(Z, Y))
        return (_mm(Y, T), _mm(T, Z)), None

    carry = (Ahat, eye)
    carry, _ = jax.lax.scan(lift_body, carry, None, length=lift)
    (Y, Z), _ = jax.lax.scan(polish_body, carry, None, length=polish)
    return Y, Z


def optimize_sigma_ns(
    R: jnp.ndarray,
    sample_sigma,
    horizon_dim: int,
    *,
    squarings: int = 14,
    ns_rough: Tuple[int, int] = (3, 4),
    ns_main: Tuple[int, int] = (8, 5),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigh-free :func:`optimize_sigma`: the same det-preserving ``R^{-1/2}``
    design computed entirely with matmuls + one Cholesky.

    eigh(128) costs ~0.66 ms on a TPU chip (sequential QR machinery); this
    path replaces it with MXU-native pieces:

      1. a certified λ_max bound from ‖R‖_F (free — the NS lift schedule's
         κ headroom absorbs the ≤√D looseness; a dedicated power-squaring
         pass measured +0.013 ms/solve, scripts/designer_ab.py) and a rough
         λ_min by one power-squaring pass (:func:`_extreme_eig`),
      2. λ_min refined THROUGH THE INVERSE: a rough, generously-shifted
         ``A₁^{-1/2}`` by Newton–Schulz, then power-squaring on
         ``Z₁² = (A₁/s₁)^{-1}`` — inversion magnifies the bottom of the
         spectrum, so the estimate error scales with the (small) shifted
         floor instead of with the spectral spread. That is what makes the
         reference's absolute ``-λ_min + 1e-2`` shift (covo.py:120-122)
         reachable without eigh: one direct pass needs λ_min to ±1e-2 out
         of a spread that reaches ~400 in flight (2.5e-6 relative — below
         what fp32 power/Krylov iterations deliver), while the refined
         error is ~1e-4 · floor.
      3. ``A^{-1/2}`` by coupled Newton–Schulz (:func:`_ns_sqrt`) — an
         8-step quintic lift + 5 cubic polish steps covers shifted
         condition up to ~1e8 (see the schedule notes on ``_ns_sqrt``),
      4. ONE Cholesky of Z ≈ (A/s)^{-1/2}: its diagonal gives
         ``log det A = D log s - 4 Σ log diag(L_z)`` for the
         fixed-determinant constant (covo.py:124-128), and ``L_z`` itself
         IS a sampling factor — ``Σ = (c/√s) Z = (c/√s) L_z L_zᵀ`` — so
         no second Newton–Schulz for ``A^{-1/4}`` is needed.

    Differences vs. the eigh path are O(top-cluster width) in the shift and
    O(NS residual) in the roots — pinned against eigh in tests on real
    rollout Hessians across the in-flight conditioning range. Use for the
    fast mode; parity mode keeps eigh.
    """
    D = horizon_dim
    R = (R + R.T) / 2.0
    eye = jnp.eye(D, dtype=R.dtype)
    fnorm = jnp.linalg.norm(R) + 1e-30

    # 1) certified spectral bound: ‖R‖_F ≥ ρ(R) ≥ λ_max, already computed.
    # A dedicated λ_max power-squaring pass bought tightness the NS lift
    # schedule does not need — its κ ≤ 1e8 coverage leaves ~2500× headroom
    # over the in-flight range, while the Frobenius bound is loose by at
    # most √D ≈ 11.3× — so the pass is pure critical-path cost (~18
    # sequential ops; dropping it measured +0.013 ms solve-level,
    # scripts/designer_ab.py). The λ_min rough pass keeps its accuracy
    # budget via the enlarged delta1 below.
    bound = fnorm  # ≥ λ_max(R), certified
    lam_min_rough = bound - _extreme_eig(bound * eye - R, squarings)
    spread = bound - lam_min_rough  # ≥ true spread (bound looseness)

    # 2) refine λ_min through the inverse of a generously-shifted A₁.
    # delta1 is sized for the DILUTED rough pass: with bound = ‖R‖_F the
    # suppression gap (λ−λ_min)/(bound−λ_min) shrinks by the bound's
    # looseness (≤ ~2√D), but the Rayleigh top-cluster error is still
    # ≤ ~1e-4·(bound−λ_min) ≤ 1e-4·spread_hat at 14 squarings, so the
    # 5e-3·spread_hat margin keeps ≥50× PD slack; the rough estimate only
    # ever OVER-estimates λ_min (Rayleigh ≤ λ_max on B), which this shift
    # absorbs. κ(A₁) ≤ ~(spread+delta1)/(delta1−err) ≲ 210 — inside the
    # rough schedule's κ ≤ 500 coverage.
    delta1 = 1e-2 + 5e-3 * spread
    off1 = -lam_min_rough + delta1
    s1 = (bound + off1) * 1.05
    _, Z1 = _ns_sqrt((R + off1 * eye) / s1, *ns_rough)  # κ(A₁) ≲ 500
    lam_min = s1 / _extreme_eig(_mm(Z1, Z1), squarings) - off1

    # 3) the reference shift, now with floor error ~1e-4 · 1e-2
    offset = -lam_min + 1e-2
    A = R + offset * eye
    s = (bound + offset) * 1.05 + 1e-30  # ≥ λ_max(A), certified
    _, Z = _ns_sqrt(A / s, *ns_main)  # Z ≈ (A/s)^{-1/2}

    # 4) one Cholesky of Z: logdet + sampling factor in a single shot
    Z = (Z + Z.T) / 2.0
    Lz = jnp.linalg.cholesky(Z)
    # det Z = det(A/s)^{-1/2}  =>  log det A = D log s - 4 Σ log diag(Lz)
    log_det_A = D * jnp.log(s) - 4.0 * jnp.sum(jnp.log(jnp.diagonal(Lz)))
    log_det_a_cov = D * (jnp.log(sample_sigma) * 2.0)
    log_const = (log_det_a_cov * 2.0 + log_det_A) / D
    c = jnp.exp(0.5 * log_const)

    scale = c / jnp.sqrt(s)
    a_cov = scale * Z
    factor = jnp.sqrt(scale) * Lz  # factor @ factor.T == a_cov
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
