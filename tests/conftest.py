"""Test configuration: force an 8-device virtual CPU mesh.

Must run before the first jax import anywhere (pytest imports conftest
first, so setting the env here is sufficient).
"""

import os

# Force CPU: the shell environment pins JAX_PLATFORMS to the axon TPU
# tunnel, which is both slow for unit tests and single-device; the test
# suite must run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
# f64 available for oracle-parity tests (framework code paths pass explicit
# f32 dtypes, so the TPU-precision paths are still exercised).
os.environ["JAX_ENABLE_X64"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin self-registers via sitecustomize and pins
# JAX_PLATFORMS=axon; the config update (not the env var) is what actually
# forces CPU here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# This box has a single CPU core: XLA compiles dominate test time.  The
# persistent compilation cache makes re-runs cheap.
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(173)


@pytest.fixture
def key():
    return jax.random.PRNGKey(173)
