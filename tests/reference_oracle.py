"""Load the upstream reference implementation as a test oracle.

The reference (read-only at /root/reference) depends on gymnax/tyro which
are not installed; both are stubbed with the minimal surface the MPC code
path touches. jax>=0.6 removed `jax.tree_map`, which the reference calls —
shimmed to `jax.tree.map`.

The oracle is used ONLY to generate golden values inside tests; no
reference code is imported into the framework itself.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_PATH = os.environ.get("COVO_REFERENCE_PATH", "/root/reference")

_cached = None


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "quadjax"))


def load_reference():
    """Import and return the reference `quadjax` package (cached)."""
    global _cached
    if _cached is not None:
        return _cached
    if not reference_available():
        return None

    import jax
    import jax.numpy as jnp

    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree.map

    if "gymnax" not in sys.modules:
        gymnax = types.ModuleType("gymnax")
        genv = types.ModuleType("gymnax.environments")
        genv_env = types.ModuleType("gymnax.environments.environment")
        gwrap = types.ModuleType("gymnax.wrappers")
        gwrap_purerl = types.ModuleType("gymnax.wrappers.purerl")

        class Environment:
            def __call__(self, *a, **k):
                raise NotImplementedError

            def discount(self, state, params):
                return jnp.where(self.is_terminal(state, params), 0.0, 1.0)

        class GymnaxWrapper:
            def __init__(self, env):
                self._env = env

        genv_env.Environment = Environment
        genv_env.EnvParams = object
        genv_env.EnvState = object
        gwrap_purerl.GymnaxWrapper = GymnaxWrapper
        sys.modules.update(
            {
                "gymnax": gymnax,
                "gymnax.environments": genv,
                "gymnax.environments.environment": genv_env,
                "gymnax.wrappers": gwrap,
                "gymnax.wrappers.purerl": gwrap_purerl,
            }
        )
    if "tyro" not in sys.modules:
        tyro = types.ModuleType("tyro")
        tyro.cli = lambda cls: cls()
        sys.modules["tyro"] = tyro

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    import quadjax  # noqa: F401
    import quadjax.controllers
    import quadjax.dynamics
    import quadjax.envs.quadrotor

    _cached = quadjax
    return _cached
