#!/usr/bin/env python
"""Micro-profile the CoVO Σ-design candidates on the real TPU.

Times (amortized over a K-iteration lax.scan inside one jit, per
CLAUDE.md's dispatch-latency rule):
  * eigh(128)                     — the current optimize_sigma core
  * cholesky(128)                 — logdet candidate
  * coupled Newton-Schulz sqrt    — matmul-only A^{1/2}/A^{-1/2}
  * lanczos-k for lambda_min      — shift candidate
  * full optimize_sigma (eigh) vs optimize_sigma_ns prototype
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax

D = 128
K = 64


def timeit(name, fn, *args, reps=5):
    @jax.jit
    def run(x):
        def one(c, _):
            out = fn(c, *args)
            return out, ()
        c, _ = lax.scan(one, x, None, length=K)
        return c

    x0 = args_init()
    jax.block_until_ready(run(x0))
    ts = []
    for _ in range(reps):
        t = time.perf_counter()
        jax.block_until_ready(run(x0))
        ts.append((time.perf_counter() - t) / K)
    best = min(ts) * 1e3
    print(f"{name:36s} {best:8.4f} ms")
    return best


def args_init():
    key = jax.random.PRNGKey(0)
    M = jax.random.normal(key, (D, D))
    A = M @ M.T / D + 1e-2 * jnp.eye(D)  # PD, spread spectrum
    return A


def f_eigh(A):
    eigs, u = jnp.linalg.eigh(A)
    return (u * eigs[None, :]) @ u.T


def f_chol(A):
    Lf = jnp.linalg.cholesky(A)
    return Lf @ Lf.T


def f_ns(A, iters=18):
    # coupled Newton-Schulz: Y->sqrt(As), Z->invsqrt(As), As = A/s
    s = jnp.linalg.norm(A)  # frobenius upper-bounds lambda_max
    Y = A / s
    Z = jnp.eye(D, dtype=A.dtype)
    I3 = 3.0 * jnp.eye(D, dtype=A.dtype)

    def body(c, _):
        Y, Z = c
        T = 0.5 * (I3 - Z @ Y)
        return (Y @ T, T @ Z), ()

    (Y, Z), _ = lax.scan(body, (Y, Z), None, length=iters)
    return Y * jnp.sqrt(s) + Z / jnp.sqrt(s)


def f_lanczos(A, k=30):
    v = jnp.ones((D,)) / jnp.sqrt(D)

    def body(c, _):
        v_prev, v_cur, beta = c
        w = A @ v_cur
        alpha = v_cur @ w
        w = w - alpha * v_cur - beta * v_prev
        beta_n = jnp.linalg.norm(w)
        return (v_cur, w / (beta_n + 1e-30), beta_n), (alpha, beta_n)

    _, (alphas, betas) = lax.scan(body, (v, v, 0.0), None, length=k)
    T = jnp.diag(alphas) + jnp.diag(betas[:-1], 1) + jnp.diag(betas[:-1], -1)
    ritz = jnp.linalg.eigvalsh(T)
    return A + ritz[0] * 0  # keep shape for scan carry


def f_matmul(A):
    return A @ A * 0.5 + A * 0.5


def main():
    print(f"device: {jax.devices()[0]}")
    timeit("matmul 128 (floor)", f_matmul)
    timeit("eigh(128)", f_eigh)
    timeit("eigvalsh(128)", lambda A: A + jnp.sum(jnp.linalg.eigvalsh(A)) * 0)
    timeit("cholesky(128)", f_chol)
    timeit("newton-schulz x18 (sqrt+invsqrt)", f_ns)
    timeit("newton-schulz x30", lambda A: f_ns(A, 30))
    timeit("lanczos k=30 + eigvalsh(30)", f_lanczos)

    # accuracy check for NS
    A = args_init()
    s = jnp.linalg.norm(A)
    Y = A / s
    Z = jnp.eye(D)
    for _ in range(30):
        T = 0.5 * (3.0 * jnp.eye(D) - Z @ Y)
        Y, Z = Y @ T, T @ Z
    sqrtA = Y * jnp.sqrt(s)
    err = jnp.linalg.norm(sqrtA @ sqrtA - A) / jnp.linalg.norm(A)
    eigs = jnp.linalg.eigvalsh(A)
    print(f"NS30 relerr {err:.2e}  cond(A) {eigs[-1]/eigs[0]:.1e}")


if __name__ == "__main__":
    main()
