"""Two-stage speculative pipeline (parallel/pipeline.py) on a CPU mesh.

Pins (a) the pipelined step against a stage-sequential oracle built from
the same ops building blocks (exact decomposition semantics), (b) a
closed-loop drive stays finite and tracks, (c) the fused-kernel act stage
(interpret mode) agrees with the jnp act stage.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covo_mpc_tpu.models import EnvConfig, QuadEnv, dynamics, pack_state
from covo_mpc_tpu.models.structs import FDIST, VEL
from covo_mpc_tpu.ops import covariance, reductions, sampling
from covo_mpc_tpu.ops.hessian import make_hessian_adjoint
from covo_mpc_tpu.ops.rollout import make_rollout
from covo_mpc_tpu.parallel import (
    make_init_factor,
    make_pipeline_mesh,
    make_pipeline_step,
)
from covo_mpc_tpu.solvers import hover_sequence

N, H = 64, 4
LAM = 0.01
SIGMA = 0.5


@pytest.fixture(scope="module")
def setup():
    env = QuadEnv(
        EnvConfig(
            task="tracking",
            enable_randomizer=False,
            disturb_type="gaussian",
            disable_rollover_terminate=True,
            generate_noisy_state=True,
        )
    )
    params = env.default_params
    _, _, state = env.reset_env(jax.random.PRNGKey(0), params)
    return env, params, state


def _oracle_step(env, params, x0, t0, pos_traj, vel_traj, a_mean, factor, key):
    """Stage-sequential reference of the pipeline step's semantics."""
    mean = jnp.concatenate([a_mean[1:], a_mean[-1:]])
    k_act, k_step, k_prep = jax.random.split(key, 3)

    # act stage: sample with LAST step's factor, rollout, update
    a = jnp.clip(
        sampling.sample_joint(
            k_act, mean.reshape(-1), factor, N,
            mode=sampling.INVARIANT, sample_ids=jnp.arange(N),
        ),
        -1.0, 1.0,
    ).reshape(N, H, env.action_dim)
    costs, _ = make_rollout(env)(
        x0, t0, pos_traj, vel_traj, a, params, k_step,
        deterministic=True, discount=1.0,
    )
    w = reductions.mppi_weights(costs, LAM)
    a_new = reductions.mean_update(w, a, mean, 1.0)

    # design stage: predict one deterministic step along the PRE-update
    # shifted mean, then Hessian + NS designer at the predicted state
    det = params.replace(dyn_noise_scale=0.0)
    a0 = jnp.clip(mean[0], -1.0, 1.0)
    u, _ = dynamics.control_to_thrust_omega(a0, det)
    x1 = dynamics.bodyrate_step(x0, u, det, env._dt)
    f1 = env.disturb_fn(
        dynamics.derive_dynamics_keys(k_prep), det, t0,
        x0[..., VEL], x0[..., FDIST],
    )
    x1 = x1.at[..., FDIST].set(f1)
    nominal = jnp.concatenate([mean[1:], mean[-1:]])
    R = make_hessian_adjoint(env, H)(
        nominal.reshape(-1), x1, t0 + 1, pos_traj, vel_traj, params, k_prep
    )
    _, f_next = covariance.optimize_sigma_ns(R, SIGMA, H * env.action_dim)
    return a_new, f_next, jnp.min(costs)


def test_pipeline_matches_sequential_oracle(setup):
    env, params, state = setup
    mesh = make_pipeline_mesh(jax.devices()[:2])
    step = make_pipeline_step(env, mesh, N=N, H=H, lam=LAM, sample_sigma=SIGMA)

    a_mean = hover_sequence(env, H)
    x0 = pack_state(state)
    key0, key1 = jax.random.split(jax.random.PRNGKey(3))
    factor = make_init_factor(env, H, SIGMA)(
        x0, state.time, state.pos_traj, state.vel_traj, a_mean, params, key0
    )

    a_new, f_next, mc = step(
        x0, state.time, state.pos_traj, state.vel_traj, a_mean, factor,
        params, key1,
    )
    ref_a, ref_f, ref_mc = _oracle_step(
        env, params, x0, state.time, state.pos_traj, state.vel_traj,
        a_mean, factor, key1,
    )
    np.testing.assert_allclose(a_new, ref_a, atol=1e-5)
    np.testing.assert_allclose(mc, ref_mc, atol=1e-5)
    np.testing.assert_allclose(f_next, ref_f, atol=1e-4)


@pytest.mark.parametrize("engine", [
    # slow tier: the 2-chip pipeline's semantics are pinned quick by the
    # sequential oracle, and the driver dryrun executes the (2, k) mesh
    pytest.param("jnp", marks=pytest.mark.slow),
    pytest.param("pallas_interpret", marks=pytest.mark.slow),
])
def test_pipeline_sample_sharded_matches_two_chip(setup, engine):
    """(pipe=2, samples=2) mesh — the act row's samples sharded over 2
    chips while the design row runs concurrently — equals the 2-chip
    pipeline exactly (invariant rng; round-2 verdict item 6)."""
    env, params, state = setup
    a_mean = hover_sequence(env, H)
    x0 = pack_state(state)
    key0, key1 = jax.random.split(jax.random.PRNGKey(3))
    factor = make_init_factor(env, H, SIGMA)(
        x0, state.time, state.pos_traj, state.vel_traj, a_mean, params, key0
    )
    kw = dict(N=N, H=H, lam=LAM, sample_sigma=SIGMA)
    if engine == "pallas_interpret":
        kw.update(engine="pallas", interpret=True)
    args = (x0, state.time, state.pos_traj, state.vel_traj, a_mean, factor,
            params, key1)

    step2 = make_pipeline_step(env, make_pipeline_mesh(jax.devices()[:2]),
                               **kw)
    step4 = make_pipeline_step(
        env, make_pipeline_mesh(jax.devices()[:4], samples=2), **kw
    )
    a2, f2, mc2 = step2(*args)
    a4, f4, mc4 = step4(*args)
    np.testing.assert_allclose(a4, a2, atol=1e-6)
    np.testing.assert_allclose(f4, f2, atol=1e-6)
    np.testing.assert_allclose(mc4, mc2, atol=1e-6)


def test_pipeline_sharded_rejects_indivisible_n(setup):
    env, _, _ = setup
    with pytest.raises(ValueError, match="not divisible"):
        make_pipeline_step(
            env, make_pipeline_mesh(jax.devices()[:6], samples=3),
            N=N, H=H, lam=LAM,
        )


@pytest.mark.slow
def test_pipeline_closed_loop_tracks(setup):
    # slow tier (214 s): the pipeline's semantics are pinned quick by the
    # sequential-oracle test; this drives a whole episode
    env, params, state = setup
    mesh = make_pipeline_mesh(jax.devices()[:2])
    step = make_pipeline_step(env, mesh, N=N, H=H, lam=LAM, sample_sigma=SIGMA)

    a_mean = hover_sequence(env, H)
    key = jax.random.PRNGKey(11)
    key, k0 = jax.random.split(key)
    factor = make_init_factor(env, H, SIGMA)(
        pack_state(state), state.time, state.pos_traj, state.vel_traj,
        a_mean, params, k0,
    )
    for _ in range(6):
        key, k_solve, k_env = jax.random.split(key, 3)
        a_mean, factor, mc = step(
            pack_state(state), state.time, state.pos_traj, state.vel_traj,
            a_mean, factor, params, k_solve,
        )
        _, state, _, done, _ = env.step_env(k_env, state, a_mean[0], params)
        assert bool(jnp.isfinite(mc))
        assert not bool(done)
    assert bool(jnp.all(jnp.isfinite(a_mean)))
    assert bool(jnp.all(jnp.isfinite(factor)))
    err = jnp.linalg.norm(state.pos - state.pos_tar)
    assert float(err) < 0.5, f"pipeline diverged: err_pos={float(err)}"


@pytest.mark.slow
def test_pipeline_pallas_interpret_matches_jnp(setup):
    """slow tier: compiles both engines' pipeline steps; the jnp pipeline
    is pinned against the oracle in the quick tier and the fused kernel
    against the jnp engine in test_pallas_rollout."""
    env, params, state = setup
    mesh = make_pipeline_mesh(jax.devices()[:2])
    a_mean = hover_sequence(env, H)
    x0 = pack_state(state)
    key0, key1 = jax.random.split(jax.random.PRNGKey(7))
    factor = make_init_factor(env, H, SIGMA)(
        x0, state.time, state.pos_traj, state.vel_traj, a_mean, params, key0
    )
    args = (x0, state.time, state.pos_traj, state.vel_traj, a_mean, factor,
            params, key1)
    a_j, f_j, mc_j = make_pipeline_step(
        env, mesh, N=N, H=H, lam=LAM, sample_sigma=SIGMA, engine="jnp"
    )(*args)
    a_p, f_p, mc_p = make_pipeline_step(
        env, mesh, N=N, H=H, lam=LAM, sample_sigma=SIGMA,
        engine="pallas", interpret=True,
    )(*args)
    # same invariant draws, same reductions; engines differ only in
    # evaluation order
    np.testing.assert_allclose(a_p, a_j, atol=1e-5)
    np.testing.assert_allclose(mc_p, mc_j, atol=1e-5)
    np.testing.assert_allclose(f_p, f_j, atol=1e-4)


def test_pipeline_pallas_compiled_traces_under_check_vma(setup):
    """Regression: the compiled-TPU configuration (engine='pallas',
    interpret=False, check_vma=True) must TRACE — the pallas primal and
    the per-shard rollout kernel have to declare the vma shard_map's
    check demands (jax.eval_shape exercises exactly that without needing
    mosaic or a TPU)."""
    env, params, state = setup
    mesh = make_pipeline_mesh(jax.devices()[:2])
    a_mean = hover_sequence(env, H)
    x0 = pack_state(state)
    factor = jnp.eye(H * env.action_dim) * 0.5
    for rng in ("invariant", "kernel"):
        step = make_pipeline_step(
            env, mesh, N=64, H=H, lam=LAM, sample_sigma=SIGMA,
            engine="pallas", interpret=False, rng=rng,
        )
        out = jax.eval_shape(
            step, x0, state.time, state.pos_traj, state.vel_traj,
            a_mean, factor, params, jax.random.PRNGKey(1),
        )
        assert out[0].shape == (H, env.action_dim), rng
        assert out[1].shape == factor.shape, rng


@pytest.mark.slow
def test_pipeline_kernel_rng_interpret_runs(setup):
    """The fused in-kernel-draw act stage (rng='kernel') executes in
    interpret mode and stays finite/in-range."""
    env, params, state = setup
    mesh = make_pipeline_mesh(jax.devices()[:2])
    step = make_pipeline_step(
        env, mesh, N=N, H=H, lam=LAM, sample_sigma=SIGMA,
        engine="pallas", interpret=True, rng="kernel",
    )
    a_mean = hover_sequence(env, H)
    x0 = pack_state(state)
    key0, key1 = jax.random.split(jax.random.PRNGKey(9))
    factor = make_init_factor(env, H, SIGMA)(
        x0, state.time, state.pos_traj, state.vel_traj, a_mean, params, key0
    )
    a_new, f_next, mc = step(
        x0, state.time, state.pos_traj, state.vel_traj, a_mean, factor,
        params, key1,
    )
    assert bool(jnp.all(jnp.isfinite(a_new)))
    assert bool(jnp.all(jnp.abs(a_new) <= 1.0 + 1e-6))
    assert bool(jnp.all(jnp.isfinite(f_next)))
    assert bool(jnp.isfinite(mc))


def test_pipeline_rejects_bad_mesh(setup):
    env, _, _ = setup
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    with pytest.raises(ValueError, match="two stages"):
        make_pipeline_step(env, mesh, N=N, H=H, lam=LAM)
