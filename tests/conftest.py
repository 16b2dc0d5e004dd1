"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding layer is
exercised without TPU hardware (SURVEY.md §4e). Must run before jax import.
"""

import os

# Hard override: the machine environment pins JAX_PLATFORMS to the TPU
# backend and a sitecustomize hook initializes it in every process; tests
# must run on host CPU with virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in _flags:
    # Full-suite runs intermittently segfault inside XLA:CPU's
    # backend_compile (LLVM codegen race under parallel module splitting;
    # observed twice at the same suite position, not reproducible from
    # the failing test alone). Serializing codegen costs nothing
    # measurable at this program scale (test_pipeline: 170 s -> 173 s).
    _flags = (_flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = _flags

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-dominated on this
# one-core box and most test programs are identical across runs, so warm
# reruns skip the XLA backend compile (tracing still runs). Must be set via
# jax.config (this jax version does not read the env-var spelling). The
# cache dir is gitignored; delete it to force cold compiles.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run slow-marked tests (full tier; the default quick tier "
        "skips them so iteration stays tight)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test — skipped unless --runslow or RUN_SLOW=1",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
