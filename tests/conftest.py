"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA/JAX environment variables before jax is imported anywhere, so
that multi-chip sharding logic is exercised without TPU hardware
(SURVEY.md §4: multi-node testing plan).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

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
