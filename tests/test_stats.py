"""Cross-RNG statistical pin (utils/stats.py).

The kernel-rng vs invariant-rng agreement check in the multichip dryrun
(__graft_entry__.py) and sharding tests uses a z-bound derived from the
empirical sampling spread instead of a flat atol — these tests pin its
sensitivity: unbiased same-estimator draws pass, a bias well below the
old flat atol=0.25 (round-4 verdict item 6) is rejected.
"""

import numpy as np
import pytest

from covo_mpc_tpu.utils.stats import assert_sampled_mean_agreement


def _draws(rng, bias=0.0, S=4, sd=0.006, shape=(4, 4)):
    """Synthetic solve outputs at the CALIBRATED noise scale of the
    dryrun's distributed kernel-rng solve (per-coordinate sd measured
    0.001-0.013 at N=8192, H=4 — utils/stats.py docstring)."""
    truth = rng.standard_normal(shape) * 0.1
    ref = truth + rng.standard_normal(shape) * sd
    samples = [truth + bias + rng.standard_normal(shape) * sd
               for _ in range(S)]
    return samples, ref


def test_unbiased_passes():
    rng = np.random.default_rng(0)
    for trial in range(20):  # no flakes across reseeds at z=5
        samples, ref = _draws(rng)
        assert_sampled_mean_agreement(samples, ref)


def test_bias_below_old_atol_rejected():
    """A 0.05 injected stream bias passed the old flat atol=0.25 pin;
    the z-bound rejects it."""
    rng = np.random.default_rng(1)
    samples, ref = _draws(rng, bias=0.05)
    # old pin: np.allclose(..., atol=0.25) — silently green
    assert np.all(np.abs(np.mean(samples, axis=0) - ref) < 0.25)
    with pytest.raises(AssertionError, match="biased"):
        assert_sampled_mean_agreement(samples, ref)


def test_floor_guards_degenerate_spread():
    """Concentrated weights can collapse the empirical sd to ~0; the
    floor still admits ulp-scale engine differences there."""
    samples = [np.zeros((3,)) for _ in range(4)]
    ref = np.full((3,), 1e-4)  # sub-floor systematic difference
    assert_sampled_mean_agreement(samples, ref)
    with pytest.raises(AssertionError):
        assert_sampled_mean_agreement(samples, np.full((3,), 6e-3))


def test_needs_two_samples():
    with pytest.raises(ValueError):
        assert_sampled_mean_agreement([np.zeros(3)], np.zeros(3))


# --- step_durations dispatch-boundary split (runtime/profiling.py) ------


def _rows(deltas_us, marker="solve_kernel"):
    ts, t = [], 0.0
    for d in [0.0] + list(deltas_us):
        t += d
        ts.append(t)
    return [{"name": marker, "ts_us": ts_i, "dur_us": 1.0, "category": "x"}
            for ts_i in ts]


def test_step_durations_keeps_slow_solves_splits_dispatches():
    """r5 review findings, both directions: a genuinely slow solve
    (>10x median but well under the RTT scale) must STAY in the
    distribution; the inter-dispatch gap (median + >=20 ms host RTT)
    must be split out — including for slow solvers whose 100x-median
    would exceed the RTT (the min(..., med+10ms) clamp)."""
    from covo_mpc_tpu.runtime.profiling import step_durations

    # fast solver: median 130 us, one real 2 ms hiccup, one 25 ms gap
    deltas = [130.0] * 20 + [2000.0] + [130.0] * 10 + [25_130.0]
    got = step_durations(_rows(deltas), "solve_kernel") * 1e6
    assert got.max() == pytest.approx(2000.0)   # hiccup kept
    assert (got > 10_000).sum() == 0            # dispatch gap split

    # slow solver (median 500 us): 100x median = 50 ms > RTT — the
    # med+10ms clamp must still split the ~25.5 ms dispatch gap
    deltas = [500.0] * 20 + [25_500.0] + [500.0] * 10
    got = step_durations(_rows(deltas), "solve_kernel") * 1e6
    assert got.max() == pytest.approx(500.0)
    assert len(got) == 30


def test_time_trace_raises_cleanly_off_tpu():
    """time_trace needs per-HLO device events (a TPU-trace feature); on
    CPU it must raise (not return garbage) so callers fall back to
    time_slope — the contract bench.py / bench_mesh / pod_scale rely on."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from covo_mpc_tpu.runtime.profiling import time_trace

    def make_run(length):
        @jax.jit
        def run(i):
            def one(c, _):
                return c * 0.999 + jnp.float32(i) * 1e-9, None
            out, _ = lax.scan(one, jnp.ones((8, 8)), None, length=length)
            return jnp.sum(out)
        return run

    with pytest.raises(Exception):
        time_trace(make_run, chain=16, iters=1)
