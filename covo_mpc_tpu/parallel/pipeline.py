"""Two-stage speculative CoVO pipeline over a mesh ``pipe`` axis.

``CoVOSolver(mode="speculative")`` (solvers/covo.py) splits the solve into
``act`` (shift + sample + rollout + update — the obs→action critical path)
and ``prepare`` (adjoint Hessian + Σ-designer at the model-predicted next
state). On one chip the two still run back-to-back; ``prepare`` hides only
in control-loop idle. This module maps the same cut onto TWO devices of a
mesh: every control step the ``act`` stage (pipe index 0) solves with the
factor the design stage produced last step, while the design stage (pipe
index 1) — concurrently, on its own chip — designs the factor for the
NEXT step. Each stage's product is replicated to the other chip with a
masked ``psum`` over the pipe axis (an (H·dA)² factor + an (H, dA) mean +
a scalar, ~66 KB/step — ICI latency, not bandwidth). A single control
loop's solve rate becomes ``1/max(act, design)`` instead of
``1/(act + design)``.

Staleness contract (vs. the single-chip speculative mode, which itself
trades one model step of staleness for the latency cut — covo.py:
prepare()): the design stage runs concurrently with the mean update it
cannot see, so it predicts the next state along the PRE-update shifted
mean rather than the post-update mean — one mean-update of extra
staleness, and the Σ it designs is centred on the pre-update nominal.
Quality is gated on the eval protocol like every non-parity mode
(RESULTS.md); the exact decomposition semantics are pinned against a
stage-sequential oracle in tests/test_pipeline.py.

There is no counterpart anywhere in the reference (quadjax has no
distributed machinery at all — SURVEY.md §2); this is a TPU-native
extension of the reference's CoVO-online controller (quadjax/controllers/
covo.py:187-283).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from covo_mpc_tpu.models import dynamics
from covo_mpc_tpu.models.structs import FDIST, VEL
from covo_mpc_tpu.ops import covariance
from covo_mpc_tpu.ops.hessian import make_hessian_adjoint
from covo_mpc_tpu.parallel.mesh import SAMPLE_AXIS
from covo_mpc_tpu.parallel.sharded import make_covo_local_core
from covo_mpc_tpu.utils.vma import pvary

PIPE_AXIS = "pipe"

ACT_STAGE = 0  # pipe index running sample/rollout/update
DESIGN_STAGE = 1  # pipe index running Hessian + Σ-designer


def make_pipeline_mesh(devices=None, samples: int = 1) -> Mesh:
    """(pipe=2[, samples=k]) mesh for the speculative pipeline. Pick
    ICI-adjacent chips: the per-step exchange is a latency-bound 66 KB
    all-reduce. ``samples > 1`` adds a sample-sharding axis under the act
    stage (the natural 3-4 chip configuration: the act row's N rollout
    samples split over k chips while the design row runs concurrently);
    devices are laid out row-major so each pipe row is contiguous."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < 2 * samples:
        raise ValueError(
            f"the pipeline mesh needs {2 * samples} devices "
            f"(pipe=2 x samples={samples}); got {len(devices)}"
        )
    if samples == 1:
        return Mesh(np.array(devices[:2]), (PIPE_AXIS,))
    grid = np.array(devices[: 2 * samples]).reshape(2, samples)
    return Mesh(grid, (PIPE_AXIS, SAMPLE_AXIS))


def make_pipeline_step(
    env,
    mesh,
    N: int,
    H: int,
    lam: float,
    sample_sigma: float = 0.5,
    axis: str = PIPE_AXIS,
    engine: str = "jnp",
    interpret: bool = False,
    rng: str = "invariant",
    hessian_primal: str | None = None,
    hessian_mode: str = "adjoint",
):
    """Build the pipelined speculative-CoVO control step.

    Returns ``step(x0, t0, pos_traj, vel_traj, a_mean (H, dA),
    factor (D, D), params, key, gamma_mean=1.0, discount=1.0) ->
    (a_mean_new (H, dA), factor_next (D, D), min_cost)`` with every input
    and output replicated across the mesh; the stage split is internal.
    ``factor`` is the Σ square root designed LAST step (cold start:
    :func:`make_init_factor`); ``factor_next`` feeds the next call.

    ``engine``/``rng`` select the act stage's rollout/sampler exactly as in
    :func:`covo_mpc_tpu.parallel.sharded.make_sharded_covo_sample_rollout`
    ("kernel" draws inside the fused kernel — fastest, TPU only).

    When the mesh also carries a ``samples`` axis of size k (built via
    ``make_pipeline_mesh(samples=k)``), the act stage's N rollout samples
    shard over the k chips of the pipe-0 row (global-id invariant draws +
    pmin/psum within the row — the same sufficient-statistics layout as
    parallel/sharded.py) while the pipe-1 row designs the next factor
    concurrently (redundantly across its k chips; the design is O(D²) and
    cheaper to replicate than to communicate). With the invariant sampler
    the result is EXACTLY the 2-chip pipeline's at any k (pinned in
    tests/test_pipeline.py).
    """
    if mesh.shape[axis] != 2:
        raise ValueError(
            f"the speculative pipeline has exactly two stages; mesh axis "
            f"{axis!r} has size {mesh.shape[axis]}"
        )
    sample_axis = SAMPLE_AXIS if SAMPLE_AXIS in mesh.shape else None
    k_shards = mesh.shape[sample_axis] if sample_axis else 1
    if N % k_shards:
        raise ValueError(f"N={N} not divisible by {k_shards} sample shards")
    n_local = N // k_shards
    dA = env.action_dim
    D = H * dA
    dt = env._dt
    disturb_fn = env.disturb_fn

    act_core = make_covo_local_core(env, H, lam, engine=engine,
                                    interpret=interpret, rng=rng)
    primal = hessian_primal or (
        "pallas_interpret" if engine == "pallas" and interpret
        else "pallas" if engine == "pallas"
        else "scan"
    )
    if hessian_mode not in ("adjoint", "gn"):
        raise ValueError(
            f"pipeline design stage supports 'adjoint'/'gn', "
            f"got {hessian_mode!r}"
        )
    # "gn" (Gauss-Newton, first-order-only curvature) shrinks the design
    # stage — the pipeline's rate wall at 1/max(act, design)
    hess = make_hessian_adjoint(
        env, H, primal=primal, second_order=hessian_mode == "adjoint"
    )

    def local_step(x0, t0, pos_traj, vel_traj, a_mean, factor, params, key,
                   gamma_mean, discount):
        stage = lax.axis_index(axis)
        sshard = lax.axis_index(sample_axis) if sample_axis else None
        # the mesh axes per-device values vary over: {pipe[, samples]}
        # under check_vma, empty in interpret mode (check_vma=False)
        probe = stage if sshard is None else stage + sshard
        vary = tuple(getattr(jax.typeof(probe), "vma", frozenset()))
        # receding-horizon shift, shared by both stages (reference:
        # covo.py:201-203). Key derivation is this mode's own 3-way split
        # (NOT CoVOSolver.act/prepare's chain — the pipeline is a distinct
        # non-parity mode whose quality is eval-gated, so the streams only
        # need to be disjoint)
        mean = jnp.concatenate([a_mean[1:], a_mean[-1:]])
        mean_flat = mean.reshape(-1)
        k_act, k_step, k_prep = jax.random.split(key, 3)

        def act_branch(_):
            # CoVOSolver.act semantics on the full N (sample/rollout/update
            # with LAST step's factor) — the shared core. Unsharded
            # (axis=None) the act stage holds all N; on a (2, k) mesh the
            # act row's samples shard with global-id invariant draws and
            # pmin/psum within the row (the row IS the sample_axis group).
            if sample_axis:
                ids = sshard * n_local + jnp.arange(n_local)
                shard_key = jax.random.fold_in(k_act, sshard)
            else:
                ids = jnp.arange(N)
                shard_key = k_act
            a_new, min_cost = act_core(
                x0, t0, pos_traj, vel_traj, mean_flat, factor,
                gamma_mean, discount, params, k_act, k_step,
                n_local=n_local, ids=ids,
                shard_key=pvary(shard_key, vary), vary=vary,
                axis=sample_axis,
            )
            return a_new, pvary(jnp.zeros((D, D), factor.dtype), vary), min_cost

        def design_branch(_):
            # predict the next state one deterministic model step along the
            # shifted (pre-update) mean — the concurrent analogue of
            # CoVOSolver.prepare, which uses the post-update mean. Inputs
            # are promoted to the stage's vma up front so the Hessian's
            # pallas primal declares the vma check_vma demands.
            x0_v, t0_v, pt_v, vt_v, mean_v, params_v, k_v = jax.tree.map(
                lambda x: pvary(x, vary),
                (x0, t0, pos_traj, vel_traj, mean, params, k_prep),
            )
            det = params_v.replace(dyn_noise_scale=0.0)
            a0 = jnp.clip(mean_v[0], -1.0, 1.0)
            u, _ = dynamics.control_to_thrust_omega(a0, det)
            x1 = dynamics.bodyrate_step(x0_v, u, det, dt)
            f1 = disturb_fn(
                dynamics.derive_dynamics_keys(k_v), det, t0_v,
                x0_v[..., VEL], x0_v[..., FDIST],
            )
            x1 = x1.at[..., FDIST].set(f1)
            nominal = jnp.concatenate([mean_v[1:], mean_v[-1:]])
            R = hess(
                nominal.reshape(-1), x1, t0_v + 1, pt_v, vt_v,
                params_v, k_v,
            )
            _, f_next = covariance.optimize_sigma_ns(R, sample_sigma, D)
            return (
                pvary(jnp.zeros((H, dA), a_mean.dtype), vary),
                f_next,
                pvary(jnp.zeros((), jnp.float32), vary),
            )

        # both branches' outputs must agree in varying-manual-axes; each
        # stage's real product is computed from replicated inputs (hence
        # unvarying) while its placeholder was pvary'd — promote uniformly
        def _vary_out(branch):
            return lambda op: jax.tree.map(
                lambda x: pvary(x, vary), branch(op)
            )

        a_new, f_next, min_cost = lax.cond(
            stage == ACT_STAGE, _vary_out(act_branch),
            _vary_out(design_branch), None,
        )
        # replicate each stage's product to the other chip(s): a masked
        # psum is one tiny all-reduce AND lets shard_map prove the outputs
        # replicated (out_specs=P()). On a (2, k) mesh exactly one device
        # contributes each product (sample-shard 0 of its row — the act
        # row's update is already row-replicated by the core's psum, the
        # design row's factor is computed redundantly), reduced over BOTH
        # axes.
        if sample_axis:
            axes = (axis, sample_axis)
            pick_act = (stage == ACT_STAGE) & (sshard == 0)
            pick_des = (stage == DESIGN_STAGE) & (sshard == 0)
        else:
            axes = axis
            pick_act = stage == ACT_STAGE
            pick_des = stage == DESIGN_STAGE
        a_out = lax.psum(a_new * pick_act.astype(a_new.dtype), axes)
        mc_out = lax.psum(min_cost * pick_act, axes)
        f_out = lax.psum(f_next * pick_des.astype(f_next.dtype), axes)
        return a_out, f_out, mc_out

    def step(x0, t0, pos_traj, vel_traj, a_mean, factor, params, key,
             gamma_mean=1.0, discount=1.0):
        args = (x0, t0, pos_traj, vel_traj, a_mean, factor, params, key,
                gamma_mean, discount)
        return jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=jax.tree.map(lambda _: P(), args),
            out_specs=(P(), P(), P()),
            # see sharded.py: the interpret-mode pallas evaluator trips
            # strict vma checking; the compiled TPU path keeps the check
            check_vma=not (engine == "pallas" and interpret),
        )(*args)

    return step


def make_init_factor(env, H: int, sample_sigma: float = 0.5,
                     hessian_primal: str = "scan",
                     hessian_mode: str = "adjoint"):
    """Cold-start Σ factor for :func:`make_pipeline_step` — designed at the
    reset state around the shifted nominal, exactly like the single-chip
    speculative mode's reset (solvers/covo.py CoVOSolver.reset).

    Pass the SAME ``hessian_mode`` as the pipeline step: a gn pipeline
    cold-starting from a second-order adjoint factor would design step 0
    from a different curvature than every later step (r5 review
    finding)."""
    dA = env.action_dim
    D = H * dA
    hess = make_hessian_adjoint(env, H, primal=hessian_primal,
                                second_order=hessian_mode == "adjoint")

    @jax.jit
    def init_factor(x0, t0, pos_traj, vel_traj, a_mean, params, key):
        nominal = jnp.concatenate([a_mean[1:], a_mean[-1:]])
        R = hess(nominal.reshape(-1), x0, t0, pos_traj, vel_traj, params, key)
        _, factor = covariance.optimize_sigma_ns(R, sample_sigma, D)
        return factor

    return init_factor
