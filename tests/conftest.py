"""Test configuration: run everything on CPU with a fake 8-device mesh.

The reference test strategy (SURVEY.md section 4) calls for multi-chip tests
without a cluster: we force the host platform and fake 8 XLA devices so
sharding/halo tests can assert sharded == unsharded. x64 is enabled so the
float64 reference implementations (the parity spec) are available; all
production code in planet_tpu is dtype-explicit and works with or without x64.
"""

import os

import pytest

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: everything not marked `slow` is auto-marked `fast`,
    so `pytest -m fast` runs the smoke tier (parity + unit + one sharded
    equivalence; minutes on a cold compile cache) and `pytest -m slow` the
    integration tier (big fused-program compiles; see docs/CI.md)."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)

# The axon TPU plugin prepends itself to jax_platforms regardless of the
# JAX_PLATFORMS env var, so force CPU via config (must happen before any
# backend is initialized).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is dominated by XLA:CPU compiles
# of the big fused programs (single-core box); cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
