"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real TPU chip is reserved for benchmarking; unit tests must be
hermetic and exercise the multi-device sharding paths, so we force the
CPU platform with 8 virtual devices before JAX initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
