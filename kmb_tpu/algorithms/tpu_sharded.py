"""Multi-chip sharded TPU algorithms (the distributed engine as a
harness citizen).

Wraps kmb_tpu.parallel.sharded schedules in the benchmark lifecycle, so
distributed runs produce the same result HDF5s / Pareto points as every
other method.  Mesh construction happens in the untimed `prepare_data`;
`query` runs the sharded computation and fences.  `n_chips` is reported
via get_additional so the tflops-per-chip metric normalizes correctly
(plotting/metrics.py), and scaling efficiency can be computed across runs
with different `n_devices`.

On a single-chip host these wrappers degrade to a 1-device mesh (still
correct, with shard_map overhead) — CI exercises them on a virtual
8-device CPU mesh (tests/test_parallel.py).
"""

from __future__ import annotations

import numpy as np

import jax

from kmb_tpu.utils import hard_fence
from kmb_tpu.algorithms.base import BaseProduct, BaseSolver
from kmb_tpu.algorithms.tpu_engine import _TpuAlgorithm
from kmb_tpu.ops.kernels import KERNELS
from kmb_tpu.parallel.sharded import (
    make_mesh, prepare_sharded_cg, sharded_cg_solve, sharded_kernel_matvec)


def _resolve_devices(n_devices):
    devices = jax.devices()
    if n_devices and n_devices > 0:
        if n_devices > len(devices):
            raise RuntimeError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return devices


class ShardedProduct(_TpuAlgorithm, BaseProduct):
    """Kernel product sharded over the device mesh.

    schedule="ring" rotates source shards around the ICI ring (context
    parallelism); schedule="allpairs" uses a 2-D (tgt, src) mesh with one
    psum.  mesh_shape overrides the default layout, e.g. [2, 4].
    """

    def __init__(self, *, kernel, dimension, normalize_rows=False,
                 precision="float32", schedule="ring", mesh_shape=None,
                 n_devices=None, block_n=None, block_m=None):
        super().__init__(kernel=kernel, dimension=dimension,
                         normalize_rows=normalize_rows, precision=precision)
        self._check_kernel(kernel)
        self.schedule = schedule
        self.mesh_shape = tuple(mesh_shape) if mesh_shape else None
        self.n_devices = n_devices
        self.block_n = block_n
        self.block_m = block_m
        # n_devices distinguishes device-sweep rows (the scaling-
        # efficiency metric groups by name, so 1/2/4/8-device runs must
        # not collapse into one legend entry).
        tag = f", devices={n_devices}" if n_devices else ""
        self.name = f"ShardedProduct({precision}, {schedule}{tag})"

    def prepare_data(self, *, source_points, target_points, same_points=False,
                     density_estimation=False):
        devices = _resolve_devices(self.n_devices)
        if self.mesh_shape:
            axes = ("tgt", "src") if len(self.mesh_shape) == 2 else ("shard",)
            self.mesh = make_mesh(self.mesh_shape, axes, devices=devices)
        elif self.schedule == "allpairs" and len(devices) % 2 == 0:
            self.mesh = make_mesh((2, len(devices) // 2), ("tgt", "src"),
                                  devices=devices)
        else:
            self.mesh = make_mesh((len(devices),), ("shard",),
                                  devices=devices)
        self.y = np.asarray(source_points, dtype=np.float32)
        self.x = (self.y if same_points
                  else np.asarray(target_points, dtype=np.float32))
        self.density_estimation = density_estimation

    def fit(self):
        pass  # streaming: no precomputation

    def prepare_query(self, *, source_signal):
        self.b = (None if self.density_estimation
                  else np.asarray(source_signal, dtype=np.float32))

    def query(self):
        # An "allpairs" request degrades to ring when the device count
        # only admits a 1-D mesh (e.g. a single chip).
        schedule = ("ring" if len(self.mesh.shape) == 1 else self.schedule)
        out = sharded_kernel_matvec(
            self.x, self.y, self.b, mesh=self.mesh,
            schedule=schedule, kernel_name=self.kernel,
            normalize_rows=self.normalize_rows,
            density_estimation=self.density_estimation,
            precision=self.precision, block_n=self.block_n,
            block_m=self.block_m)
        self.res = hard_fence(out)

    def get_additional(self):
        return {"n_chips": int(np.prod(list(self.mesh.shape.values()))),
                "schedule": self.schedule}

    def get_result(self):
        return np.ascontiguousarray(np.asarray(self.res), dtype=np.float64)


class ShardedSolverCG(_TpuAlgorithm, BaseSolver):
    """Distributed matrix-free CG: ring matvec + psum'd dot products."""

    def __init__(self, *, kernel, dimension, normalize_rows=False,
                 precision="float32", tol=1e-6, max_iters=1000,
                 precond_rank=0, n_devices=None):
        super().__init__(kernel=kernel, dimension=dimension,
                         normalize_rows=normalize_rows, precision=precision)
        self._check_kernel(kernel)
        self.tol = tol
        self.max_iters = max_iters
        self.precond_rank = int(precond_rank)
        self.n_devices = n_devices
        self.iterations = 0
        self.residual = float("nan")
        # The constructor-parameter tag must survive set_query_arguments'
        # name rebuild (the runner always calls it before storing with
        # name=str(algo)): without it the precond_rank=256 variant is
        # recorded under the exact same name as the plain variant.
        self._param_tag = f", rank={precond_rank}" if precond_rank else ""
        self.name = f"ShardedSolverCG({precision}, tol={tol}{self._param_tag})"

    def prepare_data(self, *, source_points):
        devices = _resolve_devices(self.n_devices)
        self.mesh = make_mesh((len(devices),), ("shard",), devices=devices)
        self.y = np.asarray(source_points, dtype=np.float32)
        # Untimed staging: shard the points and build the stable matvec
        # object so repeated solves reuse the jitted CG loop.  The
        # Nyström preconditioner build is TIMED (fit), like the
        # single-chip solver.
        self._prepared = prepare_sharded_cg(
            self.y, mesh=self.mesh, kernel_name=self.kernel,
            precision=self.precision)

    def fit(self):
        # TIMED: the sharded Nyström preconditioner build (rank ring
        # matvecs fused into one sketch pass) — rank=0 keeps it a no-op.
        if self.precond_rank > 0:
            from kmb_tpu.parallel.sharded import build_sharded_precond
            self._prepared = build_sharded_precond(
                self._prepared, kernel_name=self.kernel,
                precond_rank=self.precond_rank)
            hard_fence(self._prepared[3].args[0])

    def set_query_arguments(self, tol=None, max_iters=None):
        if tol is not None:
            self.tol = tol
        if max_iters is not None:
            self.max_iters = max_iters
        self.name = (f"ShardedSolverCG({self.precision}, "
                     f"tol={self.tol}{self._param_tag})")

    def prepare_query(self, *, target_signal):
        self.rhs = np.asarray(target_signal, dtype=np.float32)

    def query(self):
        b, iters, residual = sharded_cg_solve(
            self.y, self.rhs, mesh=self.mesh, kernel_name=self.kernel,
            precision=self.precision, tol=float(self.tol),
            max_iters=int(self.max_iters), prepared=self._prepared)
        self.res = hard_fence(b)
        self.iterations = int(iters)
        self.residual = float(residual)

    def get_additional(self):
        return {"n_chips": int(np.prod(list(self.mesh.shape.values()))),
                "cg_iterations": self.iterations,
                "cg_relative_residual": self.residual}

    def get_result(self):
        return np.ascontiguousarray(np.asarray(self.res), dtype=np.float64)
