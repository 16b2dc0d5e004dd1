"""Fused Pallas kernel for the adjoint Hessian's forward-sensitivity chain.

The adjoint Hessian (ops/hessian.make_hessian_adjoint, reference semantics:
/root/reference/quadjax/controllers/covo.py:134-185) needs the chained
first-order pullback maps

    T_h = [S1_h; E_h],   S1_{h+1} = J_h T_h

— H SEQUENTIAL (13, 17) @ (17, D) matmuls. Unrolled in XLA each step is
its own tiny MXU op with issue latency (solve-level A/B: the whole tail
costs ~36 us of a 242 us CoVO solve at H=32). This kernel runs the chain
in ONE launch; the quadratic pullback sum_h T_h^T M_h T_h that CONSUMES T
is batched over h with no sequential dependency, so it stays in XLA where
it runs at the MXU floor (a first attempt that also accumulated the
(D, D) pullback in-kernel ran 1000x slower — the transposed-LHS dots and
the unrolled L x L accumulator carry are mosaic-hostile).

Bank layout: the 17 z-dims (13 state + 4 action) are spread over 24
8-aligned rows — state dims in rows 0..12, action dims in rows 16..19,
padding rows zero — so every in-kernel slice is sublane-aligned and the
zero padding rows contribute nothing to the products. D = H * dA lanes
(padded to a 128 multiple).

Precision: the XLA pullback einsums run at Precision.HIGHEST (cheap
there, and the default bf16 truncation alone costs ~7e-3 absolute on a
unit-scale Hessian). The in-kernel chain dot stays at DEFAULT precision —
mosaic compiles a HIGHEST dot ~300x slower (>200 s for this kernel, a
measured dead end) — leaving the chain's bf16 accumulation error at the
same scale as the incumbent all-XLA default-precision tail.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SD = 13  # state dims
_ZB = 24  # z bank rows (state 0..12, action 16..19)
_AB = 16  # action bank offset


def _chain_kernel(J_ref, T_ref, *, H: int, dA: int):
    """T_ref[_ZB*h : _ZB*h+_ZB] = T_h in bank rows, S1 chained through J.

    J_ref: (H*16, _ZB) f32 — J_h at rows 16h..16h+12 (bank cols)
    T_ref: (H*_ZB, L) f32 out — T_h rows: 0..12 S1-state, 16..16+dA E_h
    """
    L = T_ref.shape[-1]
    f32 = jnp.float32

    S1 = jnp.zeros((_AB, L), f32)
    zero4 = jnp.zeros((_ZB - _AB - dA, L), f32)
    row4 = jax.lax.broadcasted_iota(jnp.int32, (dA, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (dA, L), 1)
    for h in range(H):
        # T_h in bank rows: [S1 (16); E_h (dA); zero pad]
        E = (col == dA * h + row4).astype(f32)
        T = jnp.concatenate([S1, E, zero4], axis=0)  # (_ZB, L)
        T_ref[_ZB * h:_ZB * (h + 1), :] = T
        J_h = J_ref[_AB * h:_AB * (h + 1), :]  # (16, _ZB)
        S1 = jax.lax.dot_general(
            J_h, T, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (16, L); rows 13..15 stay zero (J bank rows are zero there)


def _to_bank_cols(x, sd: int):
    """(..., sd+dA) z-axis -> (..., _ZB) bank axis (state 0..sd-1, action
    _AB..)."""
    pad = [(0, 0)] * (x.ndim - 1)
    state = jnp.pad(x[..., :sd], pad + [(0, _AB - sd)])
    act = jnp.pad(x[..., sd:], pad + [(0, _ZB - _AB - (x.shape[-1] - sd))])
    return jnp.concatenate([state, act], axis=-1)


def make_tail_pullback(H: int, dA: int, sd: int = _SD, interpret: bool = False):
    """Build ``tail(J, M) -> (D, D)`` = sum_h T_h^T M_h T_h (chained T).

    Drop-in for steps 3/5/6 of make_hessian_adjoint: J (H, sd, sd+dA) local
    jacobians, M (H, sd+dA, sd+dA) the per-step curvature (reward Hessian +
    costate-weighted dynamics Hessian). ``sd`` is 13 for the core
    sensitivity state, 16 for the velocity-coupled one (drag/mixed; the
    bank layout already reserves 16 state rows, so both fit). Matches the
    XLA scan tail to fp rounding (pinned in tests/test_covo.py).
    """
    D = H * dA
    L = -(-D // 128) * 128
    hi = jax.lax.Precision.HIGHEST

    def tail(J, M, vma=()):
        # ``vma``: mesh axes the output varies over — required when the
        # kernel runs inside shard_map under check_vma (see rollout_pallas)
        Z = J.shape[-1]  # sd + dA
        assert Z == sd + dA and dA <= _ZB - _AB and sd <= _AB
        # J rows (sd outputs) -> 16-row bank; cols -> 24-col bank
        J_bank = jnp.pad(_to_bank_cols(J, sd), [(0, 0), (0, _AB - sd), (0, 0)])
        T_bank = pl.pallas_call(
            functools.partial(_chain_kernel, H=H, dA=dA),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (H * _ZB, L), jnp.float32,
                **({"vma": frozenset(vma)} if vma else {}),
            ),
            interpret=interpret,
        )(J_bank.reshape(H * _AB, _ZB).astype(jnp.float32))
        T_bank = T_bank.reshape(H, _ZB, L)
        # un-bank to (H, Z, D) and pull back — batched over h, MXU-floor
        T = jnp.concatenate(
            [T_bank[:, :sd, :D], T_bank[:, _AB:_AB + dA, :D]], axis=1
        )
        MT = jnp.einsum("huv,hvx->hux", M, T, precision=hi)  # (H, Z, D)
        return jnp.einsum("hux,huy->xy", T, MT, precision=hi)  # (D, D)

    return tail
