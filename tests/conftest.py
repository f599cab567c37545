"""Test configuration.

Tests run on the local CPU backend with 8 virtual XLA devices so multi-chip
sharding paths (`jax.sharding.Mesh` + shard_map/pjit) are exercised without
TPU hardware — the idiomatic JAX answer to multi-device testing (SURVEY.md §4
[TPU] note).

Note: the environment preloads a TPU PJRT plugin via sitecustomize before
pytest starts, so `jax` is already imported here; `jax.config.update` (not
env vars) is the reliable way to force the CPU backend, and XLA_FLAGS must be
set before the CPU backend first initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# float64 on the CPU test backend enables tight scipy numerics parity
# checks; the TPU runtime path stays float32/bfloat16.
jax.config.update("jax_enable_x64", True)


# --------------------------------------------------------------------- #
# Fast lane: `-m "not slow"` (<5 min on the 1-vCPU CI box).
#
# The suite's cost is concentrated in statistical-bound tests (many-draw
# MCMC/SGVB runs), end-to-end example trainings, and 8-device-mesh
# compiles. Those modules are marked slow wholesale below (per-module
# auto-marking keeps the policy in ONE place; a new test in a slow module
# is slow until proven otherwise). Everything else — the full
# distribution zoo, framework/BN semantics, shapes/dtypes/error paths,
# objective gradients — stays in the fast lane.
# --------------------------------------------------------------------- #

import pytest  # noqa: E402

SLOW_MODULES = {
    "test_examples",        # end-to-end example trainings
    "test_mcmc",            # double-well KDE bounds, long chains
    "test_smc",             # annealing bridges
    "test_parallel",        # 8-device mesh compiles + statistical runs
    "test_rwm_mala",        # acceptance-rate statistics
    "test_elliptical",      # GP posterior recovery
    "test_evaluation",      # AIS bridges
    "test_implicit_reparam",  # 2e5-sample MC gradient checks
    "test_chees",           # adaptive trajectory statistics
    "test_transform",       # flow trainings
    "test_sampler_stats",   # KS tests on large draws
    "test_svgd",            # particle descent to convergence
    "test_remc",            # replica-exchange statistics
    "test_sgmcmc_extra",    # long SGMCMC chains
    "test_diagnostics",     # large-trajectory ESS/R-hat
    "test_checkpoint",      # HMC resume runs
    "test_contract",        # full-zoo contract sweep (182s)
    "test_flow",            # flow-distribution change-of-variables (103s)
    "test_lkj",             # quadrature/importance normalizer checks (70s)
    "test_objectives",      # 1e6-sample estimator gradient checks (51s)
    "test_ssm",             # PMMH chains + particle-vs-Kalman bounds (89s)
    "test_sbc",             # 256-sim calibration studies
    "test_gp",              # SVGP optimization loops
    "test_slice",           # slice-sampler moment checks (27s)
    "test_gibbs",           # compound-kernel moment + Geweke checks (35s)
    "test_pathfinder",      # L-BFGS path VI moment recovery (40s)
    "test_discrete_gibbs",  # exact-enumeration GMM + Geweke (18s)
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: statistical/example/mesh-compile tests "
        "excluded from the fast lane (-m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rpartition(".")[2] in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
