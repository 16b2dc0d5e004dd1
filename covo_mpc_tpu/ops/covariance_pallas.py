"""Fused Pallas-TPU kernel for the Newton-Schulz Σ-designer.

`ops.covariance.optimize_sigma_ns` is ~200 small 128x128 matmuls plus a
Cholesky; at the XLA level each is a separate op with per-op overhead
comparable to its MXU time. This kernel runs the ENTIRE designer — spectral
extremes by power-squaring, the inverse-refined λ_min, both coupled
Newton-Schulz root iterations, and an in-VMEM elimination for log det —
as one program with every matrix resident in VMEM (a 128x128 fp32 matrix
is 64 KB; the working set is <1 MB).

Numerics match ops.covariance.optimize_sigma_ns: identical iteration
counts, and every dot runs at Precision.HIGHEST (TPU's default bf16
truncation NaNs the λ_min refinement — see covariance._mm).

Perf status (r5, device-trace solve-level A/B — scripts/sigma_pallas_ab.py):
DECLINED as the default. The full covo gn+krng solve measures 181.7 µs
with this kernel vs 130.2 µs with the XLA-side designer (−51 µs). The
fusion does eliminate the designer's per-op issue latency, but the
trace shows the kernel itself runs 109.7 µs/solve vs ~48 µs for the
XLA designer stages: Mosaic's HIGHEST-precision dependent 128×128 dot
chains are ~2× XLA's MXU chain even before the in-kernel elimination
(`_chol_logdet`: 128 sequential iterations × 3 dependent MXU dots,
vs XLA's 14 µs cholesky custom-call) — so a hybrid split (kernel
chains + XLA cholesky) cannot win either. Kept behind
sigma_mode="ns_pallas" as the fusion-experiment record + coverage for
environments where a single-launch designer matters more than latency.

Reference semantics: covo.py:116-132 (det-preserving R^{-1/2} spectrum
rescale); equivalence pinned by tests/test_covo.py::TestOptimizeSigmaNSPallas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())), precision=HIGHEST
    )


def _fnorm(M):
    return jnp.sqrt(jnp.sum(M * M))


def _extreme(B, squarings: int, norm_every: int = 3):
    """λ_max of symmetric PSD B (covariance._extreme_eig, in-kernel —
    identical block-normalized squaring cadence and max-guard)."""
    blocks = -(-squarings // norm_every)

    def _unit(M):
        n = _fnorm(M)
        return M / jnp.where(n > 0, n, 1.0)

    def block(_, M):
        for _ in range(norm_every):
            M = _dot(M, M)
        return _unit(M)

    M = jax.lax.fori_loop(0, blocks, block, _unit(B))
    BM = _dot(B, M)
    return jnp.sum(M * BM) / (jnp.sum(M * M) + 1e-30)


def _ns_sqrt(Ahat, eye, lift: int, polish: int):
    """Coupled quintic-lift + cubic-polish inverse sqrt
    (covariance._ns_sqrt, in-kernel — identical schedule/coefficients)."""
    from covo_mpc_tpu.ops.covariance import _LIFT_A, _LIFT_B, _LIFT_C

    def lift_body(_, carry):
        Y, Z = carry
        X = _dot(Z, Y)
        Q = _LIFT_A * eye + _LIFT_B * X + _LIFT_C * _dot(X, X)
        return _dot(Y, Q), _dot(Q, Z)

    def polish_body(_, carry):
        Y, Z = carry
        T = 0.5 * (3.0 * eye - _dot(Z, Y))
        return _dot(Y, T), _dot(T, Z)

    carry = jax.lax.fori_loop(0, lift, lift_body, (Ahat, eye))
    return jax.lax.fori_loop(0, polish, polish_body, carry)


def _chol_logdet(A, D: int):
    """(U, log det) of a PD matrix by symmetric elimination, in-VMEM:
    A = UᵀU with U upper triangular (row j = pivot-row j / √pivot).

    At pivot j only row j of the running Schur complement is read; the
    full-matrix rank-1 update writes junk into already-eliminated rows,
    which are never read again. Row extraction is a one-hot matvec (MXU)
    so no dynamic lane indexing is needed.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)

    def body(j, carry):
        M, U, logdet = carry
        e = (lane == j).astype(jnp.float32)  # (1, D) one-hot
        row = _dot(e, M)  # (1, D)
        row = jnp.where(lane >= j, row, 0.0)  # clear elimination residue
        piv = jnp.sum(row * e)
        M = M - _dot(row.T, row) / piv
        U = U + _dot(e.T, row) / jnp.sqrt(piv)  # write U row j
        return M, U, logdet + jnp.log(piv)

    _, U, logdet = jax.lax.fori_loop(
        0, D, body, (A, jnp.zeros((D, D), jnp.float32), jnp.float32(0.0))
    )
    return U, logdet


def _sigma_ns_kernel(
    R_ref,
    sig_ref,
    acov_ref,
    factor_ref,
    *,
    D: int,
    squarings: int,
    ns_rough: tuple,
    ns_main: tuple,
):
    R = R_ref[...]
    R = 0.5 * (R + R.T)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    eye = (row_i == col_i).astype(jnp.float32)
    fnorm = _fnorm(R) + 1e-30

    # 1) certified spectral bound (covariance.optimize_sigma_ns step 1:
    # ‖R‖_F replaces the dedicated λ_max pass — identical math)
    bound = fnorm
    lam_min_rough = bound - _extreme(bound * eye - R, squarings)
    spread = bound - lam_min_rough

    # 2) λ_min refined through the inverse (delta1 sized for the diluted
    # rough pass — see covariance.optimize_sigma_ns step 2)
    delta1 = 1e-2 + 5e-3 * spread
    off1 = -lam_min_rough + delta1
    s1 = (bound + off1) * 1.05
    _, Z1 = _ns_sqrt((R + off1 * eye) / s1, eye, *ns_rough)
    lam_min = s1 / _extreme(_dot(Z1, Z1), squarings) - off1

    # 3) the reference shift + A^{-1/2}
    offset = -lam_min + 1e-2
    A = R + offset * eye
    s = (bound + offset) * 1.05 + 1e-30
    _, Z = _ns_sqrt(A / s, eye, *ns_main)

    # 4) one elimination of Z: logdet + triangular sampling factor
    # (Z = UᵀU; det Z = det(A/s)^{-1/2} => log det A = D log s - 2 log det Z)
    Z = 0.5 * (Z + Z.T)
    U, logdet_Z = _chol_logdet(Z, D)
    log_det_A = D * jnp.log(s) - 2.0 * logdet_Z
    sigma = sig_ref[0, 0]
    log_det_a_cov = D * (jnp.log(sigma) * 2.0)
    log_const = (log_det_a_cov * 2.0 + log_det_A) / D
    c = jnp.exp(0.5 * log_const)

    scale = c / jnp.sqrt(s)
    acov_ref[...] = scale * Z
    factor_ref[...] = jnp.sqrt(scale) * U.T  # lower-tri: F @ F.T == a_cov


def optimize_sigma_ns_pallas(
    R: jnp.ndarray,
    sample_sigma,
    horizon_dim: int,
    *,
    squarings: int = 14,
    ns_rough: tuple = (3, 4),
    ns_main: tuple = (8, 5),
    interpret: bool = False,
):
    """Drop-in for covariance.optimize_sigma_ns, fused into one TPU kernel."""
    D = horizon_dim
    sig = jnp.full((1, 1), sample_sigma, jnp.float32)
    kernel = functools.partial(
        _sigma_ns_kernel,
        D=D,
        squarings=squarings,
        ns_rough=ns_rough,
        ns_main=ns_main,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(R.astype(jnp.float32), sig)
