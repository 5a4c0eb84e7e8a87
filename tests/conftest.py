"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags BEFORE jax initializes a backend, so this sits at the top
of conftest and is imported before any test module imports jax.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def cpu_mesh():
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devices = np.array(jax.devices()[:8])
    with Mesh(devices, axis_names=("data",)) as mesh:
        yield mesh
