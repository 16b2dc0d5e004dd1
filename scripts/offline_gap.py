#!/usr/bin/env python
"""Explain covo_offline's below-band improvement (round-3 verdict, Weak #4).

RESULTS.md records covo_offline at +38.9% over MPPI vs the paper's 43-54%
claim. Question: is the shortfall ours, or inherent to the offline
approximation? Answer it by measurement: run the REFERENCE's own mppi and
covo-offline through the oracle (tests/reference_oracle.py) under the same
protocol at small N, next to OUR mppi/covo_offline at the same config, and
compare the relative improvements.

The reference loop is the exact host-Python eval chain of
quadrotor.py:506-591 (the chain test_harness.py pins our `evaluate`
against); ours runs through `runtime.evaluate`.

Usage: python -u scripts/offline_gap.py [--n 1024] [--h 32] [--reps 3]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def reference_eval(ref, controller_name, pstr, num_trajs, reps, seed=1):
    """The reference's own eval protocol (quadrotor.py:506-591), run
    through the oracle import."""
    import jax
    import numpy as np

    env_r = ref.envs.quadrotor.Quad3D(
        task="tracking_zigzag", obs_type="quad", enable_randomizer=False,
        disturb_type="gaussian", disable_rollover_terminate=True,
        generate_noisy_state=True,
    )
    ctrl, _ = ref.envs.quadrotor.get_controller(env_r, controller_name, pstr)
    params_r = env_r.default_params
    step_jit = jax.jit(env_r.step)

    rng = jax.random.PRNGKey(seed)
    rng, meta = jax.random.split(rng)
    reset_keys = jax.random.split(meta, num_trajs)
    # episode i uses reset key i // reps (reference loop nesting)
    reset_seq = np.repeat(np.asarray(reset_keys), reps, axis=0)

    errs = []
    for reset_key in reset_seq:
        obs, info, state = env_r.reset(jax.numpy.asarray(reset_key), params_r)
        rng_control, rng = jax.random.split(rng)
        cp = ctrl.reset(state, params_r, ctrl.init_control_params, rng_control)
        ep_err = []
        for _ in range(300):
            rng, rng_act, rng_step, _ = jax.random.split(rng, 4)
            action, cp, _ = ctrl(obs, state, params_r, rng_act, cp, info)
            obs, state, reward, done, info = step_jit(
                rng_step, state, action, params_r
            )
            ep_err.append(float(info["err_pos"]))
            rng, _ = jax.random.split(rng)
        errs.append(float(np.mean(ep_err)))
        print(f"  [ref {controller_name}] episode {len(errs)}: "
              f"{errs[-1]*100:.2f} cm", file=sys.stderr, flush=True)
    return float(np.mean(errs)), float(np.std(errs))


def our_eval(controller_name, n, h, num_eps, engine, seed=1):
    from covo_mpc_tpu.models import EnvConfig, QuadEnv
    from covo_mpc_tpu.runtime import evaluate
    from covo_mpc_tpu.solvers import get_solver

    env = QuadEnv(
        EnvConfig(
            task="tracking_zigzag", enable_randomizer=False,
            disturb_type="gaussian", disable_rollover_terminate=True,
            generate_noisy_state=True,
        )
    )
    solver, _ = get_solver(
        env, controller_name, f"N{n}_H{h}_lam0.01",
        rng_mode="fast", hessian_mode="adjoint", collect_debug=False,
        engine=engine, sigma_mode="ns",
    )
    res = evaluate(env, solver, total_steps=300 * num_eps, seed=seed)
    return res.mean, res.std


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3,
                    help="repetitions of the 4 fixed trajectories")
    ap.add_argument("--engine", default="pallas",
                    choices=["pallas", "pallas_interpret", "jnp"])
    ap.add_argument("--skip-ours", action="store_true")
    args = ap.parse_args()

    from covo_mpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from reference_oracle import load_reference

    ref = load_reference()
    if ref is None:
        print("reference unavailable", file=sys.stderr)
        return 1

    pstr = f"N{args.n}_H{args.h}_lam0.01"
    num_trajs, reps = 4, args.reps
    num_eps = num_trajs * reps

    rows = {}
    for name in ("mppi", "covo-offline"):
        t0 = time.time()
        mean, std = reference_eval(ref, name, pstr, num_trajs, reps)
        rows[f"ref {name}"] = (mean, std)
        print(f"ref {name:14s}: {mean*100:6.2f} +/- {std*100:5.2f} cm "
              f"({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)

    if not args.skip_ours:
        for name in ("mppi", "covo_offline"):
            t0 = time.time()
            mean, std = our_eval(name, args.n, args.h, num_eps, args.engine)
            rows[f"ours {name}"] = (mean, std)
            print(f"ours {name:13s}: {mean*100:6.2f} +/- {std*100:5.2f} cm "
                  f"({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)

    print(f"\nconfig: N={args.n} H={args.h} lam=0.01 tracking_zigzag noDR, "
          f"{num_eps} episodes")
    ref_gap = 1 - rows["ref covo-offline"][0] / rows["ref mppi"][0]
    print(f"reference offline improvement over reference mppi: "
          f"{ref_gap*100:+.1f}%")
    if not args.skip_ours:
        our_gap = 1 - rows["ours covo_offline"][0] / rows["ours mppi"][0]
        print(f"our offline improvement over our mppi:          "
              f"{our_gap*100:+.1f}%")
    for k, (m, s) in rows.items():
        print(f"  {k:20s} {m*100:6.2f} +/- {s*100:5.2f} cm")
    return 0


if __name__ == "__main__":
    sys.exit(main())
