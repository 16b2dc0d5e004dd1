#!/usr/bin/env python
"""Pod-scale (BASELINE config #5) feasibility evidence.

Config #5: 1024 domain-randomized scenarios x CoVO-online N=8192 H=32,
sharded across a multi-host slice. One real chip is available, so the
evidence comes in two measured halves (round-3 verdict, Next #3):

  --sweep (real TPU): per-chip scenario-batch capacity — sweep B at
    N=8192 H=32 through the batched CoVO solve until HBM runs out (or a
    cap), recording the aggregate solve rate at each B. This measures the
    per-chip block of the pod program directly.

  --aot (CPU, 8 virtual devices): AOT lower+compile of the FULL-SIZE
    1024-scenario x N=8192 x H=32 multichip CoVO step over a
    (samples=1, scenarios=8) mesh — 128 scenarios per device, the same
    global shapes a v5e pod slice would shard — plus the compiler's own
    per-device memory analysis. Compile-only: proves shape/layout/
    collective feasibility without 8 real chips. (The jnp cost engine is
    lowered — the per-shard pallas kernel is shape-identical and pinned
    equal at small shapes in tests/test_sharding.py.)

Run: python -u scripts/pod_scale.py --sweep          # on the TPU
     JAX_PLATFORMS=cpu is NOT needed for --aot: it pins cpu in-process.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def hbm_arithmetic(B, N, H, out=sys.stderr):
    """Static per-chip HBM accounting for the batched CoVO solve."""
    f = 4  # fp32 bytes
    rows = [
        ("action samples (B,N,H,4)", B * N * H * 4 * f),
        ("sample z-draws (B,N,D)", B * N * H * 4 * f),
        ("costs + weights (2*B,N)", 2 * B * N * f),
        ("Hessian/Σ/factor (3*B,D,D)", 3 * B * (H * 4) ** 2 * f),
        ("packed states+trajs (B,~16+2*T*3)", B * (16 + 6 * 300) * f),
    ]
    total = sum(b for _, b in rows)
    print(f"  static HBM arithmetic at B={B}, N={N}, H={H}:", file=out)
    for name, b in rows:
        print(f"    {name:36s} {b/2**20:10.1f} MiB", file=out)
    print(f"    {'total (excl. XLA temps)':36s} {total/2**20:10.1f} MiB "
          f"of 16 GiB/chip (v5e)", file=out)
    return total


def sweep(args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from covo_mpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from covo_mpc_tpu.models import EnvConfig, QuadEnv
    from covo_mpc_tpu.models.structs import pack_state
    from covo_mpc_tpu.parallel.scenarios import make_batched_covo_solve
    from covo_mpc_tpu.solvers import hover_sequence

    env = QuadEnv(
        EnvConfig(
            task="tracking_zigzag", enable_randomizer=True,
            disturb_type="gaussian", disable_rollover_terminate=True,
            generate_noisy_state=True,
        )
    )
    N, H = args.n, args.h
    solve = make_batched_covo_solve(env, N, H, 0.01, rng=args.rng)
    print(f"[pod-scale] device={jax.devices()[0]}", file=sys.stderr)

    results = []
    B = args.b_start
    while B <= args.b_max:
        keys = jax.random.split(jax.random.PRNGKey(11), B)
        params_b = jax.vmap(env.sample_params)(keys)
        states = jax.vmap(lambda k, p: env.reset_env(k, p)[2])(keys, params_b)
        x0s = jax.vmap(pack_state)(states)
        a_means0 = jnp.tile(hover_sequence(env, H)[None], (B, 1, 1))

        def make_run(length):
            def one(carry, _):
                a_means, key = carry
                key, k_s = jax.random.split(key)
                a_means, min_costs = solve(
                    x0s, states.time, states.pos_traj, states.vel_traj,
                    a_means, params_b, k_s,
                )
                return (a_means, key), min_costs[0]

            @jax.jit
            def run(a, key):
                (a, _), outs = lax.scan(one, (a, key), None, length=length)
                return jnp.sum(a) + jnp.sum(outs)

            return run

        try:
            # device-trace wall (bench.trace_wall): the old two-point
            # slope read B=8 25% fast here (0.63 vs 0.876 ms trace).
            # IMPORTANT: compile+warm OUTSIDE the trace helper first so a
            # genuine OOM is distinguishable from a mere profiler/trace
            # failure — only the latter falls back to the slope.
            import bench as _bench

            run_warm = make_run(4 * args.k)
            float(run_warm(a_means0, jax.random.PRNGKey(1)))  # OOM fires here
            try:
                per_batch = _bench.trace_wall(
                    make_run, a_means0, 4 * args.k, iters=3
                )
            except Exception as e:  # noqa: BLE001 — profiler optional
                print(f"[pod-scale] B={B}: trace wall unavailable "
                      f"({e}); falling back to the two-point slope",
                      file=sys.stderr)
                from covo_mpc_tpu.runtime.profiling import time_slope

                def adapt(length):
                    run = make_run(length)
                    return lambda i: run(
                        a_means0,
                        jax.random.fold_in(jax.random.PRNGKey(2), i),
                    )

                per_batch, _ = time_slope(adapt, k=args.k, reps=3)
        except Exception as e:  # noqa: BLE001 — record OOM and stop
            print(f"[pod-scale] B={B}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:200]})", file=sys.stderr)
            results.append((B, None))
            break
        agg = B / per_batch
        results.append((B, agg))
        print(f"[pod-scale] B={B:5d}: {per_batch*1e3:8.3f} ms/batch-step -> "
              f"{agg:10.1f} aggregate solves/s/chip ({agg/B:7.1f}/s/scenario)",
              file=sys.stderr, flush=True)
        hbm_arithmetic(B, N, H)
        B *= 2

    print("\nB, aggregate_solves_per_s")
    for B, agg in results:
        print(f"{B}, {'OOM/fail' if agg is None else round(agg, 1)}")
    ok = [r for r in results if r[1] is not None]
    if ok:
        best = max(ok, key=lambda r: r[1])
        chips = 1024 // best[0] if best[0] <= 1024 else 1
        print(f"best per-chip block: B={best[0]} at {best[1]:.0f} "
              f"aggregate solves/s -> config #5 (1024 scenarios) needs "
              f"{chips} chips at this block size")


def aot(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import os

    # must be set before backend init; re-exec guard for safety
    if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )

    import jax.numpy as jnp

    from covo_mpc_tpu.models import EnvConfig, QuadEnv
    from covo_mpc_tpu.parallel import make_mesh
    from covo_mpc_tpu.parallel.scenarios import make_multichip_covo_step
    from covo_mpc_tpu.solvers import hover_sequence

    assert len(jax.devices()) >= 8, (
        "need 8 virtual cpu devices; set XLA_FLAGS="
        "--xla_force_host_platform_device_count=8 in the environment"
    )

    B, N, H = 1024, args.n, args.h
    mesh = make_mesh(samples=1, scenarios=8)
    env = QuadEnv(
        EnvConfig(
            task="tracking_zigzag", enable_randomizer=True,
            disturb_type="gaussian", disable_rollover_terminate=True,
            generate_noisy_state=True,
        )
    )
    step = make_multichip_covo_step(env, mesh, N=N, H=H, lam=0.01,
                                    engine="jnp")

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    params = jax.jit(jax.vmap(env.sample_params))(keys)
    states = jax.jit(jax.vmap(lambda k, p: env.reset_env(k, p)[2]))(
        keys, params
    )
    a_means = jnp.tile(hover_sequence(env, H)[None], (B, 1, 1))

    print(f"[pod-scale] AOT lower+compile: B={B} x N={N} x H={H} over "
          f"mesh(samples=1, scenarios=8) = 128 scenarios/device",
          file=sys.stderr, flush=True)
    t0 = time.time()
    lowered = jax.jit(step).lower(states, params, a_means, keys)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(f"[pod-scale] lowered in {t_lower:.1f}s, compiled in "
          f"{t_compile:.1f}s", file=sys.stderr)
    try:
        ma = compiled.memory_analysis()
        print(f"[pod-scale] compiler memory analysis (per device): "
              f"args {ma.argument_size_in_bytes/2**20:.1f} MiB, "
              f"output {ma.output_size_in_bytes/2**20:.1f} MiB, "
              f"temp {ma.temp_size_in_bytes/2**20:.1f} MiB, "
              f"gen {ma.generated_code_size_in_bytes/2**20:.1f} MiB")
    except Exception as e:  # noqa: BLE001 — backend may not support it
        print(f"[pod-scale] memory_analysis unavailable: {e}")
    hbm_arithmetic(128, N, H, out=sys.stdout)
    print("AOT OK: full-size config-#5 program compiles; per-device "
          "shapes above.")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--aot", action="store_true")
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--rng", default="kernel", choices=["fast", "kernel"])
    ap.add_argument("--b-start", type=int, default=8)
    ap.add_argument("--b-max", type=int, default=256)
    args = ap.parse_args()
    if args.aot:
        aot(args)
    if args.sweep:
        sweep(args)
    if not (args.aot or args.sweep):
        print("pass --sweep (TPU) and/or --aot (CPU)", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
