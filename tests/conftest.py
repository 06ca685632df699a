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
