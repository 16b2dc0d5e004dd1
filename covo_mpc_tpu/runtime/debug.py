"""Debug modes: NaN trapping and in-program assertions.

The reference's only debug affordance is the --debug flag enabling
jax_debug_nans plus a tiny N/H override (reference: quadjax/envs/
quadrotor.py:705-707, 770-771). Here:

  * `debug_mode()` — context manager enabling jax_debug_nans (and
    optionally disabling jit) for a scope instead of globally.
  * `checked_solver()` — wraps a solver so each solve runs under
    `jax.experimental.checkify` with float checks; errors surface with
    messages instead of silent NaN propagation.
"""

from __future__ import annotations

import contextlib

import jax
from jax.experimental import checkify


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    old_nans = jax.config.jax_debug_nans
    try:
        jax.config.update("jax_debug_nans", nans)
        if disable_jit:
            with jax.disable_jit():
                yield
        else:
            yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)


def checked_solver(solver):
    """Return solve_fn(obs, state, params, key, cp, info) that raises with
    a located error on NaN/Inf or failed in-program checks."""

    def raw(obs, state, params, key, cp, info):
        return solver(obs, state, params, key, cp, info)

    checked = checkify.checkify(
        raw, errors=checkify.float_checks | checkify.user_checks
    )

    def solve(obs, state, params, key, cp, info):
        err, out = checked(obs, state, params, key, cp, info)
        checkify.check_error(err)
        return out

    return solve
