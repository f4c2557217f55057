"""Test configuration: force an 8-device virtual CPU mesh and float64.

Tests validate numerics (dynamics, QP KKT residuals) at double precision on CPU
and exercise multi-chip sharding on a virtual 8-device mesh, per the build
instructions. TPU execution paths are identical code; the driver benches them
on real hardware.
"""

import os

# Force CPU: the ambient environment may preset JAX_PLATFORMS to a TPU backend;
# tests want double precision + an 8-device virtual mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The ambient axon site hook forces the TPU platform regardless of env vars;
# config.update wins over it.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA cache: the fused-engine compiles dominate suite wall time;
# repeat runs with unchanged code load executables from disk instead.
from g1_locomotion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def g1():
    from g1_locomotion_tpu.models.robot import load_robot
    import jax.numpy as jnp

    return load_robot("g1_23dof", dtype=jnp.float64)


@pytest.fixture(scope="session")
def g1_f32():
    from g1_locomotion_tpu.models.robot import load_robot
    import jax.numpy as jnp

    return load_robot("g1_23dof", dtype=jnp.float32)


@pytest.fixture(scope="session")
def q_stand(g1):
    """Reference initial configuration (config.py:2-39), internal wxyz layout."""
    from g1_locomotion_tpu.engine.state import q_init_standing

    return q_init_standing(g1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
