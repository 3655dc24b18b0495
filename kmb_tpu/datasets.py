"""Dataset layer: HDF5 spec, synthetic generators, float64 ground truth.

File format (identical to the reference spec, datasets.py:1-70):

- f["source_points"]   (M, D) float64 — positions y_j
- f["target_points"]   (N, D) float64 — positions x_i
- f["source_signal"]   (M, E) float64 — signal b_j
- f["target_signal"]   (N, E) float64 — ground-truth output a_i, computed
  at float64 by the blocked NumPy oracle in the *product* direction:
      a_i = sum_j k(x_i, y_j) b_j            (normalize_rows=False)
      a_i = sum_j k b_j / sum_j k            (normalize_rows=True)
  Solver datasets reuse the same file: their ground truth is the original
  source_signal, exact by construction (reference runner.py:90).

Attributes: task ("product" | "solver" | "attention"), kernel, point_type,
normalize_rows, same_points, density_estimation, short_description,
description.

Naming convention (reference algos.yaml:37-40):
    {task}-{label}-D{D}-E{E}-M{M}-N{N}-{kernel}

Differences from the reference:
- Datasets are always generated locally (this environment has no network
  egress; set KMB_DATASET_URL to re-enable downloading).
- The `*-cube-*` datasets really sample the unit cube (the reference
  mistakenly routes them to the sphere generator, datasets.py:400-413).
- All generators are seeded for reproducibility (the reference's sphere
  signal is unseeded, datasets.py:228).
- New dataset families: attention (exponential kernel, normalize_rows),
  high-dimensional normal clouds (MNIST-scale D=784), multi-channel E>1
  signals, kernel-density-estimation, and large-M TPU-scale configs.
"""

from __future__ import annotations

import logging
import math
import os

import h5py
import numpy as np

from kmb_tpu.algorithms.bruteforce_numpy import blocked_kernel_product

logger = logging.getLogger("kmb")


def get_dataset_fn(dataset):
    """Path of the local HDF5 file for a dataset name."""
    data_dir = os.environ.get("KMB_DATA_DIR", "data")
    os.makedirs(data_dir, exist_ok=True)
    return os.path.join(data_dir, f"{dataset}.hdf5")


def get_dataset(which):
    """Return (open h5py.File, point dimension D); generates if missing."""
    fn = get_dataset_fn(which)
    if not os.path.exists(fn):
        url_base = os.environ.get("KMB_DATASET_URL")
        if url_base:
            from urllib.request import urlretrieve
            url = f"{url_base}/{which}.hdf5"
            try:
                urlretrieve(url, fn)
            except Exception as exc:
                logger.warning(
                    "Download of %s failed (%s); falling back to local "
                    "generation.", url, exc)
        if not os.path.exists(fn):
            if which not in DATASETS:
                raise KeyError(f"Unknown dataset {which!r}.")
            DATASETS[which](fn)

    f = h5py.File(fn, "r")
    dimension = int(f["source_points"].shape[-1])
    return f, dimension


def write_output(*, filename, task, kernel, short_description, description,
                 source_points, target_points=None, source_signal=None,
                 point_type="float", normalize_rows=False):
    """Write a dataset file, computing the float64 ground truth."""
    with h5py.File(filename, "w") as f:
        f.attrs["task"] = task
        f.attrs["kernel"] = kernel
        f.attrs["point_type"] = point_type
        f.attrs["normalize_rows"] = normalize_rows
        f.attrs["short_description"] = short_description
        f.attrs["description"] = description

        source_points = np.asarray(source_points, dtype=np.float64)
        f["source_points"] = source_points
        same_points = target_points is None
        f.attrs["same_points"] = same_points
        f["target_points"] = (
            source_points if same_points
            else np.asarray(target_points, dtype=np.float64))

        density_estimation = source_signal is None
        f.attrs["density_estimation"] = density_estimation
        if density_estimation:
            source_signal_arr = np.ones((len(source_points), 1))
        else:
            source_signal_arr = np.asarray(source_signal, dtype=np.float64)
        f["source_signal"] = source_signal_arr

        # Ground truth, always in the product direction, at float64,
        # streamed in blocks so large datasets never materialize (N, M).
        target_points_arr = (
            None if same_points else f["target_points"][:])
        n_rows = len(source_points if same_points else target_points_arr)
        use_native = False
        if n_rows * len(source_points) > 10**7:
            # Large datasets: the threaded C++ streaming oracle
            # (cross-checked against the NumPy oracle to ~1e-15 in
            # tests/test_native.py) avoids hours of NumPy time and the
            # O(block * M * D) difference buffers.
            from kmb_tpu import native
            use_native = native.is_available()
        if use_native:
            f["target_signal"] = native.native_kernel_product(
                kernel=kernel,
                source_points=source_points,
                target_points=target_points_arr,
                source_signal=(
                    None if density_estimation else source_signal_arr),
                normalize_rows=normalize_rows,
            )
        else:
            f["target_signal"] = blocked_kernel_product(
                kernel=kernel,
                source_points=source_points,
                target_points=target_points_arr,
                source_signal=(
                    None if density_estimation else source_signal_arr),
                normalize_rows=normalize_rows,
            )


# -- synthetic generators ----------------------------------------------------

def fibonacci_sphere(n_points, radius=1.0):
    """Evenly spread points on the 2-sphere via the golden-angle spiral.

    Same construction as reference datasets.py:209-225, vectorized.
    """
    i = np.arange(n_points, dtype=np.float64)
    y = 1.0 - 2.0 * i / (n_points - 1)         # from 1 to -1
    r_y = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    golden_angle = math.pi * (3.0 - math.sqrt(5.0))
    theta = golden_angle * i
    points = np.stack(
        [np.cos(theta) * r_y, y, np.sin(theta) * r_y], axis=1)
    return radius * points


def uniform_sphere(n_points=1000, dimension=3, radius=1.0,
                   kernel="inverse-distance", task="product",
                   normalize_rows=False, n_channels=1):
    """Dataset writer: golden-angle sphere cloud (dimension must be 3)."""
    if dimension != 3:
        raise ValueError("The Fibonacci sphere generator is 3-dimensional.")

    def write_to(filename):
        rng = np.random.default_rng(n_points + dimension)
        source_points = fibonacci_sphere(n_points, radius=radius)
        source_signal = rng.standard_normal((n_points, n_channels))
        write_output(
            filename=filename,
            task=task,
            kernel=kernel,
            short_description=f"sphere (N={n_points}, D={dimension})",
            description=(f"{task.capitalize()} on the sphere, {kernel} "
                         f"(N={n_points}, D={dimension})"),
            source_points=source_points,
            target_points=None,
            source_signal=source_signal,
            normalize_rows=normalize_rows,
        )

    return write_to


def uniform_cube(n_points=1000, dimension=3, radius=1.0, kernel="gaussian",
                 task="product", normalize_rows=False, n_channels=1,
                 density_estimation=False):
    """Dataset writer: seeded uniform sample in [0, radius]^D."""

    def write_to(filename):
        rng = np.random.default_rng(n_points + dimension)
        source_points = radius * rng.random((n_points, dimension))
        source_signal = (
            None if density_estimation
            else rng.standard_normal((n_points, n_channels)))
        write_output(
            filename=filename,
            task=task,
            kernel=kernel,
            short_description=f"cube (N={n_points}, D={dimension})",
            description=(f"{task.capitalize()} on the cube, {kernel} "
                         f"(N={n_points}, D={dimension})"),
            source_points=source_points,
            target_points=None,
            source_signal=source_signal,
            normalize_rows=normalize_rows,
        )

    return write_to


def normal_cloud(n_points=10000, dimension=784, radius=1.0, kernel="gaussian",
                 task="product", normalize_rows=False, n_channels=1,
                 separate_targets=False, n_targets=None):
    """Dataset writer: isotropic Gaussian cloud, scaled by radius/sqrt(D).

    The 1/sqrt(D) scaling keeps pairwise squared distances and dot products
    O(1) in any dimension, so exponential-family kernels stay in a sane
    numerical range — the role MNIST-like data plays in the reference's
    aspirational registry (reference README.md:103-110).
    """

    def write_to(filename):
        rng = np.random.default_rng(n_points + dimension)
        scale = radius / math.sqrt(dimension)
        source_points = scale * rng.standard_normal((n_points, dimension))
        target_points = None
        if separate_targets:
            m = n_targets or n_points
            target_points = scale * rng.standard_normal((m, dimension))
        source_signal = rng.standard_normal((n_points, n_channels))
        write_output(
            filename=filename,
            task=task,
            kernel=kernel,
            short_description=f"normal (N={n_points}, D={dimension})",
            description=(f"{task.capitalize()} on a normal cloud, {kernel} "
                         f"(N={n_points}, D={dimension})"),
            source_points=source_points,
            target_points=target_points,
            source_signal=source_signal,
            normalize_rows=normalize_rows,
        )

    return write_to


# -- real-data loaders (local raw files; this environment has no egress) -----

def _raw_path(filename):
    """Path of a raw input file under KMB_RAW_DIR (default: <data>/raw).

    The reference ships MNIST/Fashion-MNIST/GloVe loaders that are stale
    ann-benchmarks vestiges (wrong write_output signature, disabled in the
    registry — reference datasets.py:289-377, 421-426).  These loaders are
    functional but read from local files: place the raw downloads in
    KMB_RAW_DIR and the dataset builds like any synthetic one.
    """
    raw_dir = os.environ.get(
        "KMB_RAW_DIR",
        os.path.join(os.environ.get("KMB_DATA_DIR", "data"), "raw"))
    path = os.path.join(raw_dir, filename)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Raw data file {filename!r} not found in {raw_dir!r}. "
            "This environment has no network egress: download it "
            "elsewhere and drop it there (or set KMB_RAW_DIR).")
    return path


def load_idx(path):
    """Vectorized IDX (MNIST-format) reader -> (N, prod(dims)) float64.

    Replaces the reference's per-entry struct loop
    (datasets.py:311-333) with one np.frombuffer pass; supports the
    same type codes, gzip or plain files.
    """
    import gzip
    import struct

    opener = gzip.open if path.endswith(".gz") else open
    dtypes = {0x08: np.uint8, 0x09: np.int8, 0x0B: ">i2", 0x0C: ">i4",
              0x0D: ">f4", 0x0E: ">f8"}
    with opener(path, "rb") as f:
        zero, type_code, ndim = struct.unpack(">HBB", f.read(4))
        if zero != 0 or type_code not in dtypes:
            raise ValueError(f"{path!r} is not an IDX file.")
        dims = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        data = np.frombuffer(f.read(), dtype=dtypes[type_code])
    return data.astype(np.float64).reshape(dims[0], -1)


def mnist(variant="mnist", kernel="gaussian", task="product",
          normalize_rows=False, n_points=None, n_targets=None):
    """Dataset writer: MNIST / Fashion-MNIST pixels (D=784).

    Train images are the sources, test images the targets (the
    reference's aspirational MNIST entry, README.md:103-110).  Pixels are
    scaled to [0, 1] and then by 1/sqrt(D) so exponential-family kernels
    stay in a sane numerical range at D=784 (same policy as
    `normal_cloud`).
    """
    files = {
        "mnist": ("train-images-idx3-ubyte.gz", "t10k-images-idx3-ubyte.gz"),
        "fashion-mnist": ("fashion-train-images-idx3-ubyte.gz",
                          "fashion-t10k-images-idx3-ubyte.gz"),
    }[variant]

    def write_to(filename):
        src = load_idx(_raw_path(files[0]))[:n_points]
        tgt = load_idx(_raw_path(files[1]))[:n_targets]
        d = src.shape[1]
        scale = 1.0 / (255.0 * math.sqrt(d))
        rng = np.random.default_rng(d)
        write_output(
            filename=filename,
            task=task,
            kernel=kernel,
            short_description=f"{variant} (M={len(src)}, N={len(tgt)})",
            description=(f"{task.capitalize()} on {variant} pixels, "
                         f"{kernel} (M={len(src)}, N={len(tgt)}, D={d})"),
            source_points=src * scale,
            target_points=tgt * scale,
            source_signal=rng.standard_normal((len(src), 1)),
            normalize_rows=normalize_rows,
        )

    return write_to


def glove(dimension=25, kernel="exponential", task="attention",
          normalize_rows=True, n_points=None, n_targets=10000):
    """Dataset writer: GloVe twitter word embeddings (D in 25/50/100/200).

    Reads `glove.twitter.27B.{d}d.txt` from KMB_RAW_DIR, L2-normalizes
    each embedding (the reference's "angular" framing, README.md:108-110:
    exp(<x,y>) on unit vectors), and splits the last `n_targets` rows off
    as targets under a seeded shuffle.
    """

    def write_to(filename):
        path = _raw_path(f"glove.twitter.27B.{dimension}d.txt")
        rows = []
        with open(path, "rb") as f:
            for line in f:
                parts = line.rstrip().split()
                rows.append(np.asarray(parts[1:], dtype=np.float64))
                if n_points is not None and len(rows) >= n_points + n_targets:
                    break
        pts = np.stack(rows)
        pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-12)
        rng = np.random.default_rng(dimension)
        pts = pts[rng.permutation(len(pts))]
        src, tgt = pts[:-n_targets], pts[-n_targets:]
        rng2 = np.random.default_rng(dimension + 1)
        write_output(
            filename=filename,
            task=task,
            kernel=kernel,
            short_description=f"glove-{dimension} (M={len(src)})",
            description=(f"{task.capitalize()} on unit GloVe-{dimension} "
                         f"embeddings, {kernel} (M={len(src)}, "
                         f"N={len(tgt)})"),
            source_points=src,
            target_points=tgt,
            source_signal=rng2.standard_normal((len(src), 1)),
            normalize_rows=normalize_rows,
        )

    return write_to


# -- registry ----------------------------------------------------------------

def _name(task, label, d, e, m, n, kernel):
    return f"{task}-{label}-D{d}-E{e}-M{m}-N{n}-{kernel}"


_SIZES = [1000, 2000, 5000, 10000]

# The 16 reference-equivalent synthetic datasets (datasets.py:383-427),
# with the cube family genuinely sampling the cube:
PRODUCT_SPHERE = {
    _name("product", "sphere", 3, 1, n, n, "inverse-distance"):
        uniform_sphere(n_points=n, task="product", kernel="inverse-distance")
    for n in _SIZES
}
SOLVER_SPHERE = {
    _name("solver", "sphere", 3, 1, n, n, "inverse-distance"):
        uniform_sphere(n_points=n, task="solver", kernel="inverse-distance")
    for n in _SIZES
}
PRODUCT_CUBE = {
    _name("product", "cube", 3, 1, n, n, "gaussian"):
        uniform_cube(n_points=n, task="product", kernel="gaussian")
    for n in _SIZES
}
SOLVER_CUBE = {
    _name("solver", "cube", 3, 1, n, n, "gaussian"):
        uniform_cube(n_points=n, task="solver", kernel="gaussian")
    for n in _SIZES
}

# Attention benchmarks: exp(<x,y>) kernel with row normalization
# (reference README.md:38-59; flagged via normalize_rows, not a separate
# kernel in the product code path).
ATTENTION = {
    _name("attention", "sphere", 3, 1, n, n, "exponential"):
        uniform_sphere(n_points=n, task="attention", kernel="exponential",
                       normalize_rows=True)
    for n in _SIZES
}
ATTENTION_HIGHD = {
    _name("attention", "normal", 64, 8, 10000, 10000, "exponential"):
        normal_cloud(n_points=10000, dimension=64, n_channels=8,
                     task="attention", kernel="exponential",
                     normalize_rows=True),
}

# High-dimensional clouds (MNIST-scale geometry, synthetic since this
# environment has no network access):
HIGH_D = {
    _name("product", "normal", 784, 1, 10000, 10000, "gaussian"):
        normal_cloud(n_points=10000, dimension=784, task="product",
                     kernel="gaussian"),
    _name("solver", "normal", 784, 1, 5000, 5000, "gaussian"):
        normal_cloud(n_points=5000, dimension=784, task="solver",
                     kernel="gaussian"),
    _name("product", "normal", 256, 16, 20000, 20000,
          "absolute-exponential"):
        normal_cloud(n_points=20000, dimension=256, n_channels=16,
                     task="product", kernel="absolute-exponential"),
}

# Kernel density estimation (source_signal == 1):
KDE = {
    _name("product", "cube-kde", 3, 1, 10000, 10000, "gaussian"):
        uniform_cube(n_points=10000, task="product", kernel="gaussian",
                     density_estimation=True),
}

# TPU-scale configs (ground truth via the native float64 oracle; the
# N=M=2^20 entry is the BASELINE.json north star — 1.1e12 exact kernel
# pairs, a dense K would be 4 TB at f32):
SCALE = {
    _name("product", "cube", 3, 1, n, n, "gaussian"):
        uniform_cube(n_points=n, task="product", kernel="gaussian")
    for n in [50000, 131072, 1048576]
}
SCALE.update({
    _name("solver", "cube", 3, 1, 50000, 50000, "gaussian"):
        uniform_cube(n_points=50000, task="solver", kernel="gaussian"),
    _name("solver", "cube", 3, 1, 131072, 131072, "gaussian"):
        uniform_cube(n_points=131072, task="solver", kernel="gaussian"),
    # The gaussian cube system above is numerically singular at this
    # density (recovering b is ill-posed for ANY solver; the harness
    # records the resulting unit-scale error honestly).  The sphere
    # inverse-distance system is the well-posed scale solver benchmark,
    # matching the reference's solver-task kernel choice
    # (datasets.py:383-398).
    _name("solver", "sphere", 3, 1, 131072, 131072, "inverse-distance"):
        uniform_sphere(n_points=131072, task="solver",
                       kernel="inverse-distance"),
    # Slow-spectral-decay SPD system at scale: the absolute-exponential
    # kernel is where plain float32 CG visibly floors (residual stalls
    # ~2e-4) and preconditioning + mixed-precision refinement earn
    # their keep — the solver family's hard benchmark.
    _name("solver", "cube", 3, 1, 131072, 131072,
          "absolute-exponential"):
        uniform_cube(n_points=131072, task="solver",
                     kernel="absolute-exponential"),
    # BLR / H-matrix home turf (reference htool.py:9-12: BEM-style
    # compression of the singular inverse-distance kernel) at scale:
    # the product-task twin of the solver dataset above.
    _name("product", "sphere", 3, 1, 131072, 131072, "inverse-distance"):
        uniform_sphere(n_points=131072, task="product",
                       kernel="inverse-distance"),
    _name("attention", "cube", 3, 1, 262144, 262144, "exponential"):
        uniform_cube(n_points=262144, task="attention",
                     kernel="exponential", normalize_rows=True),
    # GloVe-regime synthetic scale config: D=25 unit-scale attention at
    # M=N=2^20 — the mid-dimension regime of the registered GloVe
    # datasets (reference README.md:107-110) without needing raw files.
    _name("attention", "normal", 25, 1, 1048576, 1048576, "exponential"):
        normal_cloud(n_points=1048576, dimension=25, task="attention",
                     kernel="exponential", normalize_rows=True),
    # Same regime in the real GloVe *geometry* (reference README.md:107-110:
    # 1.18M sources, 10k held-out targets): M = 2^20 sources against 10k
    # targets keeps the float64 ground truth affordable (1e10 pairs)
    # while exercising the full-scale source cloud on the chip.
    _name("attention", "normal", 25, 1, 1048576, 10000, "exponential"):
        normal_cloud(n_points=1048576, separate_targets=True,
                     n_targets=10000, dimension=25, task="attention",
                     kernel="exponential", normalize_rows=True),
})

# Real-data entries build lazily: machines without the raw downloads get
# a clear FileNotFoundError from get_dataset at generation time instead
# of an import-time failure (this environment has no network egress).
REAL_DATA = {
    _name("product", "mnist", 784, 1, 60000, 10000, "gaussian"):
        mnist("mnist", kernel="gaussian", task="product"),
    _name("product", "fashion-mnist", 784, 1, 60000, 10000, "gaussian"):
        mnist("fashion-mnist", kernel="gaussian", task="product"),
    # The raw glove.twitter.27B file has 1,193,514 rows; splitting the
    # last 10k off as targets leaves M = 1,183,514 sources (reference
    # README.md:107-110 quotes the source count).
    _name("attention", "glove25", 25, 1, 1183514, 10000, "exponential"):
        glove(dimension=25),
    _name("attention", "glove100", 100, 1, 1183514, 10000, "exponential"):
        glove(dimension=100),
}

DATASETS = {
    **PRODUCT_SPHERE,
    **SOLVER_SPHERE,
    **PRODUCT_CUBE,
    **SOLVER_CUBE,
    **ATTENTION,
    **ATTENTION_HIGHD,
    **HIGH_D,
    **KDE,
    **SCALE,
    **REAL_DATA,
}
