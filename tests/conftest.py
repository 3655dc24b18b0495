"""Test configuration: run everything on a virtual 8-device CPU mesh.

The XLA host-device-count flag must be set before the backend initializes;
this jax build pins `jax_platforms` to "axon,cpu" regardless of the
JAX_PLATFORMS env var, so we force CPU via config.update instead
(SURVEY.md §4: multi-node testing plan).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _tmp_data_dir(tmp_path, monkeypatch):
    """Keep generated datasets/results inside the test tmpdir."""
    monkeypatch.setenv("KMB_DATA_DIR", str(tmp_path / "data"))
    monkeypatch.chdir(tmp_path)
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
