"""Small reference utilities kept for API completeness
(reference: quadjax/dynamics/utils.py:11-46, 476-487)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def angle_normalize(x):
    """Wrap an angle to [-pi, pi) (reference: utils.py:11-14)."""
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


# NOTE: the reference's get_hit_penalty (utils.py:17-31) is dead code even
# there (jumping-task leftover, SURVEY §2 #5) — intentionally NOT reproduced.
# See MIGRATION.md "Intentional omissions".


def constant_disturbance(x, u, params):
    """(reference: utils.py:39-41)"""
    return params.d_offset


def sample_sphere(key: jax.Array, R, center):
    """Uniform-ish point inside a sphere via spherical draws
    (reference: utils.py:476-487)."""
    theta_key, phi_key, r_key = jax.random.split(key, 3)
    theta = jax.random.uniform(theta_key, (1,), minval=0.0, maxval=2 * jnp.pi)
    phi = jax.random.uniform(phi_key, (1,), minval=0.0, maxval=jnp.pi)
    r = jax.random.uniform(r_key, (1,), minval=0.0, maxval=R)
    x = r * jnp.sin(phi) * jnp.cos(theta) + center[0]
    y = r * jnp.sin(phi) * jnp.sin(theta) + center[1]
    z = r * jnp.cos(phi) + center[2]
    return jnp.concatenate([x, y, z], axis=0)
