"""Tests for dataset generation and the HDF5 spec."""

import numpy as np

from kmb_tpu.algorithms.bruteforce_numpy import kernel_matrix
from kmb_tpu.datasets import (
    DATASETS, fibonacci_sphere, get_dataset, uniform_cube, write_output,
)


def test_registry_has_reference_datasets():
    # The 16 reference synthetic datasets must all exist by name
    # (reference datasets.py:383-427).
    for task in ["product", "solver"]:
        for n in [1000, 2000, 5000, 10000]:
            assert (f"{task}-sphere-D3-E1-M{n}-N{n}-inverse-distance"
                    in DATASETS)
            assert f"{task}-cube-D3-E1-M{n}-N{n}-gaussian" in DATASETS


def test_fibonacci_sphere_on_unit_sphere():
    pts = fibonacci_sphere(500)
    norms = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-12)


def test_cube_dataset_really_in_cube(tmp_path):
    # The reference has a bug where cube datasets sample the sphere
    # (datasets.py:400-413); ours must sample [0, 1]^3.
    fn = str(tmp_path / "cube.hdf5")
    uniform_cube(n_points=100, task="product", kernel="gaussian")(fn)
    import h5py
    with h5py.File(fn, "r") as f:
        pts = f["source_points"][:]
    assert pts.min() >= 0.0 and pts.max() <= 1.0
    # Not all on a sphere:
    assert np.std(np.linalg.norm(pts, axis=1)) > 0.01


def test_generated_ground_truth_is_consistent(tmp_path):
    fn = str(tmp_path / "d.hdf5")
    rng = np.random.default_rng(3)
    y = rng.standard_normal((60, 3))
    b = rng.standard_normal((60, 2))
    write_output(
        filename=fn, task="product", kernel="gaussian",
        short_description="t", description="t",
        source_points=y, source_signal=b)
    import h5py
    with h5py.File(fn, "r") as f:
        assert f.attrs["task"] == "product"
        assert f.attrs["same_points"]
        assert not f.attrs["density_estimation"]
        k = kernel_matrix(kernel="gaussian", source_points=y)
        np.testing.assert_allclose(
            f["target_signal"][:], k @ b, rtol=1e-12)


def test_attention_dataset_truth_normalized(tmp_path):
    fn = str(tmp_path / "att.hdf5")
    rng = np.random.default_rng(4)
    y = 0.3 * rng.standard_normal((40, 5))
    b = rng.standard_normal((40, 2))
    write_output(
        filename=fn, task="attention", kernel="exponential",
        short_description="t", description="t",
        source_points=y, source_signal=b, normalize_rows=True)
    import h5py
    with h5py.File(fn, "r") as f:
        assert f.attrs["normalize_rows"]
        k = kernel_matrix(kernel="exponential", source_points=y)
        expected = (k @ b) / k.sum(axis=1, keepdims=True)
        np.testing.assert_allclose(f["target_signal"][:], expected, rtol=1e-12)


def test_get_dataset_generates_and_loads():
    name = "product-sphere-D3-E1-M1000-N1000-inverse-distance"
    f, dim = get_dataset(name)
    try:
        assert dim == 3
        assert f["source_points"].shape == (1000, 3)
        assert f["target_signal"].shape == (1000, 1)
        assert f.attrs["kernel"] == "inverse-distance"
        # Singular kernel has finite ground truth (diagonal masked):
        assert np.all(np.isfinite(f["target_signal"][:]))
    finally:
        f.close()


# -- real-data loaders (local raw files) --------------------------------------

def _write_idx_gz(path, arr):
    import gzip
    import struct

    arr = np.asarray(arr, dtype=np.uint8)
    with gzip.open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, arr.ndim))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.tobytes())


def test_load_idx_roundtrip(tmp_path):
    from kmb_tpu.datasets import load_idx

    imgs = np.arange(2 * 4 * 4, dtype=np.uint8).reshape(2, 4, 4)
    fn = str(tmp_path / "imgs.gz")
    _write_idx_gz(fn, imgs)
    out = load_idx(fn)
    assert out.shape == (2, 16)
    np.testing.assert_array_equal(out, imgs.reshape(2, 16))


def test_mnist_loader_builds_dataset(tmp_path, monkeypatch):
    from kmb_tpu.datasets import mnist

    raw = tmp_path / "raw"
    raw.mkdir()
    monkeypatch.setenv("KMB_RAW_DIR", str(raw))
    rng = np.random.default_rng(0)
    _write_idx_gz(str(raw / "train-images-idx3-ubyte.gz"),
                  rng.integers(0, 256, (30, 7, 7)))
    _write_idx_gz(str(raw / "t10k-images-idx3-ubyte.gz"),
                  rng.integers(0, 256, (12, 7, 7)))

    fn = str(tmp_path / "mnist.hdf5")
    mnist("mnist", kernel="gaussian", task="product",
          n_points=20, n_targets=12)(fn)
    import h5py
    with h5py.File(fn, "r") as f:
        assert f["source_points"].shape == (20, 49)
        assert f["target_points"].shape == (12, 49)
        # Pixels scaled into the exp-family-safe range.
        assert float(f["source_points"][:].max()) <= 1.0 / np.sqrt(49)
        want = kernel_matrix(
            kernel="gaussian", source_points=f["source_points"][:],
            target_points=f["target_points"][:]) @ f["source_signal"][:]
        np.testing.assert_allclose(f["target_signal"][:], want, rtol=1e-10)


def test_mnist_loader_missing_raw_is_loud(tmp_path, monkeypatch):
    import pytest
    from kmb_tpu.datasets import mnist

    monkeypatch.setenv("KMB_RAW_DIR", str(tmp_path / "nowhere"))
    with pytest.raises(FileNotFoundError, match="KMB_RAW_DIR"):
        mnist("mnist")(str(tmp_path / "out.hdf5"))


def test_glove_loader_builds_attention_dataset(tmp_path, monkeypatch):
    from kmb_tpu.datasets import glove

    raw = tmp_path / "raw"
    raw.mkdir()
    monkeypatch.setenv("KMB_RAW_DIR", str(raw))
    rng = np.random.default_rng(1)
    with open(raw / "glove.twitter.27B.25d.txt", "wb") as f:
        for i in range(40):
            vec = rng.standard_normal(25)
            f.write((f"word{i} " + " ".join(f"{v:.5f}" for v in vec)
                     + "\n").encode())

    fn = str(tmp_path / "glove.hdf5")
    glove(dimension=25, n_points=30, n_targets=10)(fn)
    import h5py
    with h5py.File(fn, "r") as f:
        assert f.attrs["task"] == "attention"
        assert bool(f.attrs["normalize_rows"])
        assert f["source_points"].shape == (30, 25)
        assert f["target_points"].shape == (10, 25)
        norms = np.linalg.norm(f["source_points"][:], axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        k = kernel_matrix(
            kernel="exponential", source_points=f["source_points"][:],
            target_points=f["target_points"][:])
        want = (k @ f["source_signal"][:]) / k.sum(axis=1, keepdims=True)
        np.testing.assert_allclose(f["target_signal"][:], want, rtol=1e-10)


def test_real_data_registered():
    assert "product-mnist-D784-E1-M60000-N10000-gaussian" in DATASETS
    assert ("attention-glove25-D25-E1-M1183514-N10000-exponential"
            in DATASETS)


def test_download_path_with_file_url(tmp_path, monkeypatch):
    """KMB_DATASET_URL re-enables the reference's download-or-generate
    flow (reference datasets.py:86-125); a file:// URL exercises it
    end-to-end without egress."""
    from kmb_tpu.datasets import get_dataset, get_dataset_fn

    name = "product-sphere-D3-E1-M1000-N1000-inverse-distance"
    # Build the "website" copy by generating once into a mirror dir.
    mirror = tmp_path / "mirror"
    monkeypatch.setenv("KMB_DATA_DIR", str(mirror))
    f, _dim = get_dataset(name)
    # Tag the mirror copy so we can prove the download path used it.
    f.close()
    import h5py
    with h5py.File(get_dataset_fn(name), "r+") as fw:
        fw.attrs["mirror_tag"] = "downloaded-not-generated"

    # Fresh data dir + URL pointing at the mirror: get_dataset must
    # fetch, not regenerate.
    monkeypatch.setenv("KMB_DATA_DIR", str(tmp_path / "fresh"))
    monkeypatch.setenv("KMB_DATASET_URL", f"file://{mirror}")
    f2, dim = get_dataset(name)
    assert dim == 3
    assert f2.attrs["mirror_tag"] == "downloaded-not-generated"
    f2.close()


def test_download_failure_falls_back_to_generation(tmp_path, monkeypatch):
    from kmb_tpu.datasets import get_dataset

    name = "product-sphere-D3-E1-M1000-N1000-inverse-distance"
    monkeypatch.setenv("KMB_DATA_DIR", str(tmp_path / "fresh2"))
    monkeypatch.setenv("KMB_DATASET_URL",
                       f"file://{tmp_path}/no-such-mirror")
    f, dim = get_dataset(name)  # warning + local generation
    assert dim == 3
    assert f.attrs["task"] == "product"
    f.close()
