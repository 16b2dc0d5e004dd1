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
