"""Pallas fused rollout kernel vs the jnp reference engine.

Runs in interpreter mode on CPU (tests); the compiled path is exercised by
bench.py on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covo_mpc_tpu.models import EnvConfig, QuadEnv, pack_state
from covo_mpc_tpu.ops.rollout import make_rollout
from covo_mpc_tpu.ops.rollout_pallas import build_disturb_table, make_pallas_rollout

N, H = 1024, 8


def make_env(**kw):
    cfg = dict(
        task="tracking",
        enable_randomizer=False,
        disturb_type="gaussian",
        disable_rollover_terminate=True,
        generate_noisy_state=True,
    )
    cfg.update(kw)
    return QuadEnv(EnvConfig(**cfg))


def _setup(env, seed=0):
    params = env.default_params
    _, info, state = env.reset_env(jax.random.PRNGKey(seed), params)
    noisy = info["noisy_state"]
    x0 = pack_state(noisy)
    actions = (
        jax.random.normal(jax.random.PRNGKey(seed + 1), (N, H, 4)) * 0.4
    )
    return params, noisy, x0, actions


@pytest.mark.parametrize(
    "env_kw,deterministic",
    [
        (dict(disturb_type="gaussian"), False),
        (dict(disturb_type="gaussian"), True),
        (dict(disturb_type="none"), False),
        (dict(disturb_type="periodic"), False),
        (dict(disturb_type="sin"), False),
        (dict(task="tracking_slow", disturb_type="gaussian"), False),
        (dict(disturb_type="gaussian", disable_rollover_terminate=False), False),
    ],
)
def test_matches_jnp_engine(env_kw, deterministic):
    env = make_env(**env_kw)
    params, state, x0, actions = _setup(env)
    jnp_engine = make_rollout(env)
    pallas_engine = make_pallas_rollout(env, interpret=True)

    key = jax.random.PRNGKey(3)
    ref, _ = jnp_engine(
        x0, state.time, state.pos_traj, state.vel_traj, actions, params, key,
        deterministic=deterministic, discount=0.99,
    )
    got, _ = pallas_engine(
        x0, state.time, state.pos_traj, state.vel_traj, actions, params, key,
        deterministic=deterministic, discount=0.99,
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-5)


def test_termination_freeze_matches():
    """Samples that fly out of |pos|>3 must freeze rewards identically."""
    env = make_env()
    params, state, x0, _ = _setup(env)
    # huge actions push some samples out of bounds within the horizon
    actions = jnp.concatenate(
        [
            jnp.ones((N // 2, H, 4)),
            jax.random.normal(jax.random.PRNGKey(5), (N // 2, H, 4)) * 0.3,
        ]
    )
    x0 = x0.at[7:10].set(jnp.array([7.0, 0.0, 0.0]))  # already fast
    jnp_engine = make_rollout(env)
    pallas_engine = make_pallas_rollout(env, interpret=True)
    key = jax.random.PRNGKey(3)
    ref, _ = jnp_engine(
        x0, state.time, state.pos_traj, state.vel_traj, actions, params, key
    )
    got, _ = pallas_engine(
        x0, state.time, state.pos_traj, state.vel_traj, actions, params, key
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-5)


def test_time_limit_freeze():
    """Rollouts that cross the episode end freeze on the time criterion."""
    env = make_env()
    params, state, x0, actions = _setup(env)
    t0 = params.max_steps_in_episode - 3  # horizon crosses the limit
    jnp_engine = make_rollout(env)
    pallas_engine = make_pallas_rollout(env, interpret=True)
    key = jax.random.PRNGKey(3)
    ref, _ = jnp_engine(
        x0, t0, state.pos_traj, state.vel_traj, actions, params, key
    )
    got, _ = pallas_engine(
        x0, t0, state.pos_traj, state.vel_traj, actions, params, key
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-5)

    # NON-DEFAULT episode length from the RUNTIME params: the jnp
    # engine used to bake default max_steps_in_episode in at build time
    # (r5 review finding) — both engines must freeze at the runtime
    # limit, and shortening it must actually change the costs
    params10 = params.replace(max_steps_in_episode=jnp.int32(10))
    ref10, _ = jnp_engine(
        x0, 8, state.pos_traj, state.vel_traj, actions, params10, key
    )
    got10, _ = pallas_engine(
        x0, 8, state.pos_traj, state.vel_traj, actions, params10, key
    )
    np.testing.assert_allclose(got10, ref10, atol=2e-4, rtol=1e-5)
    ref_full, _ = jnp_engine(
        x0, 8, state.pos_traj, state.vel_traj, actions, params, key
    )
    assert not np.allclose(np.asarray(ref10), np.asarray(ref_full)), (
        "shortening max_steps_in_episode must change rollout costs"
    )


def test_disturb_table_matches_rollout_semantics():
    """Table[h] must equal the f_disturb the jnp engine integrates with."""
    env = make_env(disturb_type="periodic")
    params, state, x0, _ = _setup(env)
    key = jax.random.PRNGKey(3)
    table = build_disturb_table(env, x0, state.time, params, key, False, H)
    assert table.shape == (H, 3)
    np.testing.assert_allclose(table[0], x0[13:16], atol=1e-7)


def test_kernel_draw_packing():
    """kernel_draw=True ("krng" disturb mode, TPU hardware path): no
    XLA-side draw — the _DRAW0 scal lane carries only the effective
    noise scale (dyn_noise_scale for gaussian, 0 for none / deterministic)
    and the table is zeros. The draw itself comes from the kernel's
    second PRNG stream; its semantics (shared across samples AND steps,
    d ~ eff*N(0,1)) are quality-gated on hardware (RESULTS.md speed-mode
    gates: mppi kernel-rng 6.63 cm under the in-kernel draw)."""
    from covo_mpc_tpu.ops.rollout_pallas import build_kernel_disturb

    for dtype, want_eff in (("gaussian", None), ("none", 0.0)):
        env = make_env(disturb_type=dtype)
        params, state, x0, _ = _setup(env)
        key = jax.random.PRNGKey(3)
        table, draw = build_kernel_disturb(
            env, x0, state.time, params, key, False, H, kernel_draw=True
        )
        np.testing.assert_array_equal(np.asarray(table), 0.0)
        eff = float(params.dyn_noise_scale) if want_eff is None else want_eff
        np.testing.assert_allclose(np.asarray(draw), [eff, 0.0, 0.0])
        # deterministic=True static: scale must be exactly zero
        _, draw_det = build_kernel_disturb(
            env, x0, state.time, params, key, True, H, kernel_draw=True
        )
        np.testing.assert_array_equal(np.asarray(draw_det), 0.0)


@pytest.mark.parametrize("disturb", ["drag", "mixed"])
def test_velocity_dependent_disturbances_in_kernel(disturb):
    """"drag"/"mixed" depend on per-sample velocity and run IN-KERNEL on
    the velocity slabs (build_kernel_disturb) — must match the jnp engine
    including the periodic redraw inside "mixed"."""
    env = make_env(disturb_type=disturb)
    params, state, x0, actions = _setup(env)
    # start mid-episode so the horizon crosses a disturb_period boundary
    # (period=50): exercises the in-kernel periodic redraw of "mixed"
    t0 = 47
    # give the start state a nonzero disturbance carry
    x0 = x0.at[13:16].set(jnp.array([0.02, -0.01, 0.015]))
    jnp_engine = make_rollout(env)
    pallas_engine = make_pallas_rollout(env, interpret=True)
    key = jax.random.PRNGKey(3)
    ref, _ = jnp_engine(
        x0, t0, state.pos_traj, state.vel_traj, actions, params, key,
        deterministic=False, discount=0.99,
    )
    got, _ = pallas_engine(
        x0, t0, state.pos_traj, state.vel_traj, actions, params, key,
        deterministic=False, discount=0.99,
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-5)


@pytest.mark.parametrize("n", [
    1000,  # below-tile AND non-divisible — the interesting padding case
    pytest.param(16, marks=pytest.mark.slow),
    pytest.param(384, marks=pytest.mark.slow),
])
def test_ragged_sample_counts_tile_padded(n):
    """N below / not divisible by the 1024-sample tile is zero-padded and
    sliced — the fused engine now serves the N-ablation's small N too."""
    env = make_env()
    params, state, x0, _ = _setup(env)
    a = jax.random.normal(jax.random.PRNGKey(4), (n, H, 4)) * 0.4
    key = jax.random.PRNGKey(3)
    ref, _ = make_rollout(env)(
        x0, state.time, state.pos_traj, state.vel_traj, a, params, key,
        deterministic=True, discount=1.0,
    )
    got, _ = make_pallas_rollout(env, interpret=True)(
        x0, state.time, state.pos_traj, state.vel_traj, a, params, key,
        deterministic=True, discount=1.0,
    )
    assert got.shape == (n,)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-5)


def test_atan2_polynomial_accuracy():
    """In-kernel atan2 must track libm to ~1e-5 over the yaw domain."""
    from covo_mpc_tpu.ops.rollout_pallas import _atan2

    key = jax.random.PRNGKey(0)
    y = jax.random.uniform(key, (4096,), minval=-1.0, maxval=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4096,), minval=-1.0, maxval=1.0)
    got = _atan2(y, x)
    ref = jnp.arctan2(y, x)
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-5


@pytest.mark.slow
def test_solver_engine_consistency():
    """MPPISolver(pallas) == MPPISolver(jnp) end-to-end (same samples)."""
    from covo_mpc_tpu.ops import sampling
    from covo_mpc_tpu.solvers import get_solver

    env = make_env()
    kw = dict(rng_mode=sampling.FAST, collect_debug=False)
    s_jnp, cp = get_solver(env, "mppi", "N1024_H8_lam0.01", engine="jnp", **kw)
    s_pal, _ = get_solver(env, "mppi", "N1024_H8_lam0.01",
                          engine="pallas_interpret", **kw)
    key = jax.random.PRNGKey(0)
    params = env.default_params
    obs, info, state = env.reset_env(key, params)
    rng = jax.random.PRNGKey(5)
    a1, cp1, _ = s_jnp(obs, state, params, rng, cp, info)
    a2, cp2, _ = s_pal(obs, state, params, rng, cp, info)
    np.testing.assert_allclose(a1, a2, atol=1e-4)
    np.testing.assert_allclose(cp1.a_mean, cp2.a_mean, atol=1e-4)


def test_batched_kernel_matches_jnp():
    """Scenario-batched kernel == per-scenario jnp engine."""
    from covo_mpc_tpu.ops.rollout_pallas import make_pallas_rollout_batched

    env = make_env()
    B = 3
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    params_b = jax.vmap(env.sample_params)(keys)
    # enable_randomizer=False -> params differ only in disturb_params; also
    # randomize masses explicitly to exercise the scenario-strided scalars
    params_b = params_b.replace(
        m=jnp.array([0.027, 0.031, 0.024]),
        alpha_bodyrate=jnp.array([0.5, 0.4, 0.6]),
    )
    resets = jax.vmap(lambda k, p: env.reset_env(k, p)[2])(keys, params_b)
    x0s = jax.vmap(pack_state)(resets)
    t0s = resets.time
    actions = jax.random.normal(jax.random.PRNGKey(1), (B, N, H, 4)) * 0.4
    step_keys = keys

    batched = make_pallas_rollout_batched(env, interpret=True)
    got = batched(x0s, t0s, resets.pos_traj, resets.vel_traj, actions,
                  params_b, step_keys, deterministic=False, discount=0.98)

    jnp_engine = make_rollout(env)
    for b in range(B):
        p_b = jax.tree.map(lambda x: x[b], params_b)
        ref, _ = jnp_engine(
            x0s[b], t0s[b], resets.pos_traj[b], resets.vel_traj[b],
            actions[b], p_b, step_keys[b],
            deterministic=False, discount=0.98,
        )
        np.testing.assert_allclose(got[b], ref, atol=2e-4, rtol=1e-5,
                                   err_msg=f"scenario {b}")


@pytest.fixture(autouse=True, scope="module")
def _fresh_caches():
    """Work around a deterministic XLA:CPU segfault in the full tier.

    With the live jit-cache state accumulated by test_covo + test_env
    (not either alone), compiling/running this module's interpret-mode
    kernels segfaults inside XLA at test_non_power_of_two_lane_blocks —
    reproduced 3x at the same site, gone with a cache clear, all subsets
    pass (bisect log: round-4 notes). Runtime-level bug, not numerics:
    the same programs pass bit-identically from a fresh cache. Clearing
    here costs one re-trace of this module's ~28 tests (the persistent
    .jax_cache keeps XLA compiles warm)."""
    jax.clear_caches()
    yield


@pytest.mark.parametrize("n", [5120, 6144])
def test_non_power_of_two_lane_blocks(n):
    """N divisible by 1024 but with lanes % 512 != 0 must still cover every
    tile (regression: grid = lanes // LB skipped the tail blocks and left
    the last samples' costs uninitialized)."""
    env = make_env(task="tracking_zigzag")
    _, info, state = env.reset_env(jax.random.PRNGKey(0), env.default_params)
    x0 = pack_state(state)
    a = jax.random.normal(jax.random.PRNGKey(1), (n, 4, 4)) * 0.3
    cj, _ = make_rollout(env)(
        x0, state.time, state.pos_traj, state.vel_traj, a, env.default_params,
        jax.random.PRNGKey(2), deterministic=True, discount=1.0,
    )
    cp, _ = make_pallas_rollout(env, interpret=True)(
        x0, state.time, state.pos_traj, state.vel_traj, a, env.default_params,
        jax.random.PRNGKey(2), deterministic=True, discount=1.0,
        collect_poses=False,
    )
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cj), atol=2e-4)


def test_sampling_kernel_matches_plain_kernel():
    """Fused sample+rollout (input_z mode, what interpret/CPU runs) ==
    clip(mean + L z) computed outside + the plain kernel on those actions.

    Pins the in-kernel correlate/clip/output logic exactly; the TPU "prng"
    mode differs only in where z comes from (hardware PRNG vs this XLA
    draw) — its statistics are checked on hardware by bench.py."""
    from covo_mpc_tpu.ops.rollout_pallas import SUB, make_pallas_rollout_sampling

    env = make_env()
    params, state, x0, _ = _setup(env)
    a_mean = jax.random.normal(jax.random.PRNGKey(7), (H, 4)) * 0.2
    # random SPD per-step covariance -> lower-tri Cholesky factors
    A = jax.random.normal(jax.random.PRNGKey(8), (H, 4, 4)) * 0.3
    cov = jnp.einsum("hij,hkj->hik", A, A) + 0.05 * jnp.eye(4)
    chol = jnp.linalg.cholesky(cov)
    step_key, act_key = jax.random.PRNGKey(3), jax.random.PRNGKey(4)

    sampler = make_pallas_rollout_sampling(env, interpret=True)
    costs, a_flat = sampler(
        x0, state.time, state.pos_traj, state.vel_traj, a_mean, chol,
        params, step_key, act_key, N, deterministic=False, discount=0.98,
    )

    # reference: same z (the input_z draw), correlated + clipped outside
    lanes = max(N // SUB, 1)
    z = jax.random.normal(act_key, (H, 4, SUB, lanes)).reshape(H, 4, N)
    a_ref = jnp.clip(
        a_mean[:, :, None] + jnp.einsum("hij,hjn->hin", chol, z), -1.0, 1.0
    )
    np.testing.assert_allclose(
        np.asarray(a_flat.reshape(H, 4, N)), np.asarray(a_ref), atol=1e-6
    )
    costs_ref, _ = make_pallas_rollout(env, interpret=True)(
        x0, state.time, state.pos_traj, state.vel_traj, a_ref, params,
        step_key, deterministic=False, discount=0.98, layout="hdn",
    )
    np.testing.assert_allclose(np.asarray(costs), np.asarray(costs_ref),
                               atol=2e-4, rtol=1e-5)


def test_solver_kernel_rng_mode():
    """MPPISolver(engine=pallas_interpret, rng_mode='kernel') solves: the
    fused path returns clipped actions, updates the mean, and improves the
    tracking objective over a few control steps."""
    from covo_mpc_tpu.ops import sampling
    from covo_mpc_tpu.solvers import get_solver

    env = make_env()
    solver, cp = get_solver(
        env, "mppi", "N1024_H8_lam0.01", engine="pallas_interpret",
        rng_mode=sampling.KERNEL, collect_debug=False,
    )
    params = env.default_params
    obs, info, state = env.reset_env(jax.random.PRNGKey(0), params)
    rng = jax.random.PRNGKey(5)
    for i in range(3):
        rng, k = jax.random.split(rng)
        act, cp, _ = solver(obs, state, params, k, cp, info)
        assert float(jnp.max(jnp.abs(act))) <= 1.0
        assert bool(jnp.all(jnp.isfinite(cp.a_mean)))
        obs, state, _, _, info = env.step_env(k, state, act, params)[:5]
    # the mean must have moved off the PID-free init toward the target
    assert float(jnp.max(jnp.abs(cp.a_mean))) > 1e-3


def test_joint_sampling_kernel_matches_plain_kernel():
    """Fused joint sample+rollout (CoVO path, input_z mode) ==
    clip(mean + F z) computed outside + the plain kernel on those actions.
    F is a full (D, D) factor (not triangular), matching the Σ-designer's
    output."""
    from covo_mpc_tpu.ops.rollout_pallas import (
        SUB,
        make_pallas_rollout_joint_sampling,
    )

    env = make_env()
    params, state, x0, _ = _setup(env)
    D = H * 4
    a_mean = jax.random.normal(jax.random.PRNGKey(7), (H, 4)) * 0.2
    factor = jax.random.normal(jax.random.PRNGKey(8), (D, D)) * 0.1
    step_key, act_key = jax.random.PRNGKey(3), jax.random.PRNGKey(4)

    sampler = make_pallas_rollout_joint_sampling(env, interpret=True)
    costs, a_t = sampler(
        x0, state.time, state.pos_traj, state.vel_traj, a_mean, factor,
        params, step_key, act_key, N, deterministic=True, discount=0.98,
    )

    lanes = max(N // SUB, 1)
    z = jax.random.normal(act_key, (D, SUB, lanes)).reshape(D, N)
    a_ref = jnp.clip(a_mean.reshape(D)[:, None] + factor @ z, -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(a_t), np.asarray(a_ref), atol=1e-5)
    costs_ref, _ = make_pallas_rollout(env, interpret=True)(
        x0, state.time, state.pos_traj, state.vel_traj, a_ref, params,
        step_key, deterministic=True, discount=0.98, layout="hdn",
    )
    np.testing.assert_allclose(np.asarray(costs), np.asarray(costs_ref),
                               atol=2e-4, rtol=1e-5)


@pytest.mark.slow
def test_covo_solver_kernel_rng_mode():
    """CoVOSolver(engine=pallas_interpret, rng_mode='kernel') solves with
    the fused joint-sampling path and produces finite, in-range output.

    slow tier (102 s): the in-kernel-rng solver path stays covered in the
    quick tier by test_solver_kernel_rng_mode (MPPI) and the joint kernel
    by test_joint_sampling_kernel_matches_plain_kernel."""
    from covo_mpc_tpu.ops import sampling
    from covo_mpc_tpu.solvers import get_solver

    env = make_env()
    solver, cp = get_solver(
        env, "covo_online", "N1024_H8_lam0.01", engine="pallas_interpret",
        rng_mode=sampling.KERNEL, collect_debug=False,
        hessian_mode="adjoint", sigma_mode="ns",
    )
    params = env.default_params
    obs, info, state = env.reset_env(jax.random.PRNGKey(0), params)
    rng = jax.random.PRNGKey(5)
    for i in range(2):
        rng, k = jax.random.split(rng)
        act, cp, _ = solver(obs, state, params, k, cp, info)
        assert float(jnp.max(jnp.abs(act))) <= 1.0
        assert bool(jnp.all(jnp.isfinite(cp.a_mean)))
        obs, state, _, _, info = env.step_env(k, state, act, params)[:5]
    assert float(jnp.max(jnp.abs(cp.a_mean))) > 1e-3


@pytest.mark.slow
@pytest.mark.parametrize("joint", [False, True])
def test_batched_sampling_kernel_matches_plain(joint):
    # slow tier (101 s for the pair): the batched sampling kernels are
    # also pinned quick by test_batched_solve_kernel_rng
    """Scenario-batched fused sample+rollout (input_z) == correlate+clip
    outside + the plain batched kernel, for both the per-step (MPPI) and
    joint (CoVO) correlation forms."""
    from covo_mpc_tpu.ops.rollout_pallas import (
        SUB,
        make_pallas_rollout_batched,
        make_pallas_rollout_batched_sampling,
    )

    env = make_env()
    B, D = 3, H * 4
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    params_b = jax.vmap(env.sample_params)(keys)
    params_b = params_b.replace(m=jnp.array([0.027, 0.031, 0.024]))
    resets = jax.vmap(lambda k, p: env.reset_env(k, p)[2])(keys, params_b)
    x0s = jax.vmap(pack_state)(resets)
    a_means = jax.random.normal(jax.random.PRNGKey(7), (B, H, 4)) * 0.2
    if joint:
        facs = jax.random.normal(jax.random.PRNGKey(8), (B, D, D)) * 0.1
    else:
        A = jax.random.normal(jax.random.PRNGKey(8), (B, H, 4, 4)) * 0.3
        cov = jnp.einsum("bhij,bhkj->bhik", A, A) + 0.05 * jnp.eye(4)
        facs = jnp.linalg.cholesky(cov)
    act_key = jax.random.PRNGKey(4)

    sampler = make_pallas_rollout_batched_sampling(
        env, interpret=True, joint=joint
    )
    costs, a_t = sampler(
        x0s, resets.time, resets.pos_traj, resets.vel_traj, a_means, facs,
        params_b, keys, act_key, N, deterministic=True, discount=0.98,
    )

    lanes = max(N // SUB, 1)
    if joint:
        z = jax.random.normal(act_key, (B, D, SUB, lanes)).reshape(B, D, N)
        a_ref = jnp.clip(
            a_means.reshape(B, D)[:, :, None]
            + jnp.einsum("bed,bdn->ben", facs, z),
            -1.0, 1.0,
        )
    else:
        z = jax.random.normal(act_key, (B, H, 4, SUB, lanes)).reshape(
            B, H, 4, N
        )
        a_ref = jnp.clip(
            a_means[..., None] + jnp.einsum("bhij,bhjn->bhin", facs, z),
            -1.0, 1.0,
        ).reshape(B, D, N)
    np.testing.assert_allclose(np.asarray(a_t), np.asarray(a_ref), atol=1e-5)

    costs_ref = make_pallas_rollout_batched(env, interpret=True)(
        x0s, resets.time, resets.pos_traj, resets.vel_traj, a_ref, params_b,
        keys, deterministic=True, discount=0.98, layout="bhdn",
    )
    np.testing.assert_allclose(np.asarray(costs), np.asarray(costs_ref),
                               atol=2e-4, rtol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("maker_rng", ["covo", "mppi"])
def test_batched_solve_kernel_rng(maker_rng):
    """make_batched_{covo,mppi}_solve(rng='kernel') runs end-to-end in
    interpret mode and returns finite, in-range results."""
    from covo_mpc_tpu.parallel.scenarios import (
        make_batched_covo_solve,
        make_batched_mppi_solve,
    )

    env = make_env(task="tracking_zigzag")
    B = 2
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    params_b = jax.vmap(env.sample_params)(keys)
    resets = jax.vmap(lambda k, p: env.reset_env(k, p)[2])(keys, params_b)
    x0s = jax.vmap(pack_state)(resets)
    a_means = jnp.zeros((B, H, 4))
    if maker_rng == "covo":
        solve = make_batched_covo_solve(env, N, H, 0.01, interpret=True,
                                        rng="kernel")
        a_new, min_costs = solve(
            x0s, resets.time, resets.pos_traj, resets.vel_traj, a_means,
            params_b, jax.random.PRNGKey(5),
        )
    else:
        solve = make_batched_mppi_solve(env, N, H, 0.01, interpret=True,
                                        rng="kernel")
        a_covs = jnp.tile(jnp.eye(4) * 0.25, (B, H, 1, 1))
        a_new, _, min_costs = solve(
            x0s, resets.time, resets.pos_traj, resets.vel_traj, a_means,
            a_covs, params_b, jax.random.PRNGKey(5),
        )
    assert a_new.shape == (B, H, 4)
    assert bool(jnp.all(jnp.isfinite(a_new)))
    assert bool(jnp.all(jnp.isfinite(min_costs)))
