"""Checkpoint / resume for solver state and results.

The reference persists only result pickles and recomputes the CoVO-offline
Σ schedule at every episode reset (reference: quadjax/controllers/
covo.py:101-112 and quadjax/envs/quadrotor.py:587-591). Here solver state —
nominal sequence, covariance, and the offline schedule (max_steps x D x D,
~20 MB at the paper config) — round-trips through structured ``.npz``
artifacts, so a schedule computed once can be reused across runs and
machines. Flax-struct params are flattened by field name.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_solver_state(control_params, path: str) -> str:
    """Persist any flax-struct solver params (MPPIParams/CoVOParams/...)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves = {
        k: np.asarray(v)
        for k, v in vars(control_params).items()
        if v is not None
    }
    np.savez_compressed(path, **leaves)
    return path


def load_solver_state(template, path: str):
    """Load into the same struct type as ``template`` (field-name keyed)."""
    with np.load(path) as data:
        updates = {k: jax.numpy.asarray(data[k]) for k in data.files}
    return template.replace(**updates)


def save_eval_result(result, path: str) -> str:
    """Persist an EvalResult (reference pickles a bare array,
    quadrotor.py:588-591; we keep the summary stats alongside)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path,
        err_pos_ep=np.asarray(result.err_pos_ep),
        mean=result.mean,
        std=result.std,
    )
    return path
