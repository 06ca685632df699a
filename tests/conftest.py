"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real TPU chip is reserved for benchmarking; unit tests must be hermetic
and exercise the multi-device sharding paths.  NOTE: the axon PJRT plugin
overrides the JAX_PLATFORMS env var at import (it sets "axon,cpu"), so
forcing CPU must go through jax.config.update, not the environment.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


# ---------------------------------------------------------------------------
# Test tiers: `-m fast` must stay under ~5 minutes for a CI/driver slot.
# Heavy modules (full PCS proofs, sharded mesh proves, production-protocol
# runs) are auto-marked `slow`; everything else is `fast`.
# ---------------------------------------------------------------------------

import pytest

_SLOW_FILES = {
    "test_prover_e2e.py",
    "test_sharded_prover.py",
    "test_sha256_example.py",
    "test_production_protocol.py",
    # multi-process: each worker pays full interpreter + jit startup
    "test_distributed_segments.py",
}


def pytest_configure(config):
    config.addinivalue_line("markers", "fast: completes in seconds on CPU")
    config.addinivalue_line("markers", "slow: full proofs / mesh runs (minutes)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.fspath.basename
        if name in _SLOW_FILES or "slow" in item.keywords:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)
