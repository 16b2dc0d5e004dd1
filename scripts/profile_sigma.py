#!/usr/bin/env python
"""Micro-profile the Σ-design building blocks on the real TPU.

Each candidate is amortized over a K-iteration `lax.scan` inside one jit
and synchronized by TRANSFERRING the result (`jax.block_until_ready`
does not actually block on the tunneled axon backend — see CLAUDE.md).
NOTE: this harness has a ~0.1-0.2 ms/iteration floor even for trivial
ops; treat the numbers as RELATIVE. For absolute costs use solve-level
A/B ablation (stub one stage of the full solve and diff — see CLAUDE.md
perf notes).

Findings this script produced (TPU v5e): eigh(128) 0.66 ms,
cholesky(128) 0.12 ms, Newton-Schulz matmul chains ~5x cheaper than
eigh, full NS designer 0.22-0.24 ms, Pallas fusion of the matmul chain
ties XLA (kept as sigma_mode="ns_pallas").
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

D = 128
K = 256


def timeit(name, fn, A, reps=4):
    @jax.jit
    def run(x):
        def one(c, _):
            out = fn(x + c * 1e-20)
            leaves = out if isinstance(out, tuple) else (out,)
            return sum(jnp.sum(o) for o in leaves) * 1e-20, ()

        c, _ = lax.scan(one, jnp.float32(0.0), None, length=K)
        return c

    float(run(A))  # warm + sync via transfer
    ts = []
    for _ in range(reps):
        t = time.perf_counter()
        float(run(A))
        ts.append(time.perf_counter() - t)
    print(f"{name:36s} {min(ts)/K*1e3:8.4f} ms")


def main():
    from covo_mpc_tpu.ops import covariance
    from covo_mpc_tpu.ops.covariance_pallas import optimize_sigma_ns_pallas

    print(f"device: {jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    M = jax.random.normal(key, (D, D))
    R = (M @ M.T / D) * 40.0 - 12.0 * jnp.eye(D)

    timeit("eigh designer (parity path)",
           lambda r: covariance.optimize_sigma(r, 0.5, D), R)
    timeit("NS designer (jnp)",
           lambda r: covariance.optimize_sigma_ns(r, 0.5, D), R)
    timeit("NS designer (pallas kernel)",
           lambda r: optimize_sigma_ns_pallas(r, 0.5, D), R)
    timeit("eigh(128) alone",
           lambda r: jnp.linalg.eigh(r)[1], R)
    timeit("cholesky(128) alone",
           lambda r: jnp.linalg.cholesky(r @ r.T / D + jnp.eye(D)), R)


if __name__ == "__main__":
    main()
