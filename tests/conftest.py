"""Test harness: force CPU with 8 virtual devices so sharding tests run
anywhere, and enable x64 before JAX initialises."""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (a live TPU
# tunnel whose sitecustomize registers the backend before conftest runs), so
# the env var alone is not enough — override via jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
try:
    # warm re-runs of the suite skip recompiling the big jacfwd/scan graphs
    jax.config.update("jax_compilation_cache_dir", "/tmp/scenelib2_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")


@pytest.fixture
def data_dir():
    return os.path.abspath(DATA_DIR)


def pytest_collection_modifyitems(config, items):
    # pallas implies slow: interpret-mode kernels take minutes on CPU, so the
    # fast edit-loop selection is just `pytest -m "not slow"`
    for item in items:
        if "pallas" in item.keywords:
            item.add_marker(pytest.mark.slow)
