"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip `shard_map` ring path is exercised without a TPU pod (SURVEY.md
section 4 'Implication for the rebuild').  Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize may have force-registered a remote TPU
# backend and overwritten jax_platforms; force back to CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def make_small_system(n=256, seed=0, dtype=np.float32,
                      max_pos=100_000.0, min_mass=1e5, max_mass=1e9):
    """Small random system in the reference's init ranges (utils.cpp:30-37)."""
    r = np.random.default_rng(seed)
    pos = r.uniform(-max_pos, max_pos, size=(n, 3)).astype(dtype)
    mass = r.uniform(min_mass, max_mass, size=(n,)).astype(dtype)
    vel = np.zeros((n, 3), dtype=dtype)
    return pos, vel, mass
