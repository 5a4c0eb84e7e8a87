"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags BEFORE jax initializes a backend, so this sits at the top
of conftest and is imported before any test module imports jax.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

import jax  # noqa: E402

# This host's sitecustomize force-registers an experimental TPU plugin and
# sets jax_platforms='axon,cpu' PROGRAMMATICALLY (overriding the env var),
# so force the config back before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end tests")


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_devices():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got "
        f"{jax.devices()[0].platform}")
    assert len(jax.devices()) >= 8


@pytest.fixture(scope="session")
def cpu_mesh():
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devices = np.array(jax.devices()[:8])
    with Mesh(devices, axis_names=("data",)) as mesh:
        yield mesh
