"""Tiled kernel-matrix product engines: a = K(x, y) @ b without storing K.

The TPU-native replacement for the reference's dense BLAS path
(bruteforce.py:25-58,113-153): instead of materializing the (N, M) kernel
matrix in memory and calling GEMM, we stream (block_n, block_m) kernel tiles
through VMEM with a Pallas kernel:

    for each (i, j) tile:
        G   = x_aug[i] @ y_aug[j]^T          # one MXU matmul = the whole
                                             # bilinear form (see below)
        K   = kernel_fn(G) * masks           # pointwise on the VPU
        acc += K @ b[j]                      # MXU again

The "augmentation trick" turns the squared distance into a single matmul:
    x_aug = [-2x, |x|^2, 1],  y_aug = [y, 1, |y|^2]
    => <x_aug_i, y_aug_j> = |x_i|^2 + |y_j|^2 - 2 <x_i, y_j> = |x_i - y_j|^2
so the MXU computes the full (bN, bM) squared-distance tile directly, with
no VPU broadcast arithmetic.  Dot-product kernels (exponential) skip the
augmentation.  FLOPs: ~2*N*M*(D + E) plus one transcendental per (i, j).

Two accumulation schemes:
- direct: acc += K @ b (optionally with a ones column appended to b so the
  row sums come out of the same matmul — the reference's fused attention
  trick, bruteforce.py:140-145).
- flash (online softmax): for exponential-family kernels with
  normalize_rows, track a running row max and normalizer so arbitrarily
  large logits (attention with exp(<x,y>)) stay stable — the classic
  flash-attention recurrence, generalized to any log-kernel.

A pure-XLA blocked fallback (`kernel_matvec_xla`) provides the same
semantics for CPU execution (tests, virtual-device meshes) and doubles as
an independent implementation to validate the Pallas kernels against.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmb_tpu.ops.kernels import KernelSpec, get_kernel

LANE = 128


def _ceil_to(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _pad_axis(arr, target: int, axis: int):
    pad = target - arr.shape[axis]
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths)


def _augment(points, on: str, dtype):
    """Build the augmented matrix whose Gram matrix is the bilinear form.

    For on == "sqdist", returns the (n, D+2) augmentation for the *target*
    side; `flip=True` (source side) swaps the norm/ones columns so that
    <x_aug, y_aug> = |x - y|^2.
    """
    if on == "dot":
        return points.astype(dtype)
    sq = jnp.sum(points * points, axis=1, keepdims=True)
    ones = jnp.ones_like(sq)
    return jnp.concatenate(
        [(-2.0 * points), sq, ones], axis=1).astype(dtype)


def _augment_source(points, on: str, dtype):
    if on == "dot":
        return points.astype(dtype)
    sq = jnp.sum(points * points, axis=1, keepdims=True)
    ones = jnp.ones_like(sq)
    return jnp.concatenate([points, ones, sq], axis=1).astype(dtype)


def _tile_masks(i, j, block_n, block_m, n, m, mask_diagonal):
    """(bN, bM) validity mask for a tile at grid position (i, j).

    Masks padded columns (>= m) and, for singular kernels, the global
    diagonal (reference bruteforce.py:12-15 zeroes k[i, i]).
    Rows >= n are left unmasked: their outputs are sliced away.
    """
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_n, block_m), 1)
    col_ids = j * block_m + cols
    mask = col_ids < m
    if mask_diagonal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_n, block_m), 0)
        row_ids = i * block_n + rows
        mask = jnp.logical_and(mask, row_ids != col_ids)
    return mask


def _direct_kernel_body(x_ref, y_ref, b_ref, out_ref, acc_ref, *,
                        spec: KernelSpec, block_n, block_m, n, m,
                        mask_diagonal, compute_dtype, mxu_precision):
    """Direct accumulation: acc += kernel(G) @ b."""
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gram = jax.lax.dot_general(
        x_ref[:], y_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu_precision,
    )
    k_tile = spec.fn(gram)
    mask = _tile_masks(i, j, block_n, block_m, n, m, mask_diagonal)
    k_tile = jnp.where(mask, k_tile, 0.0)

    acc_ref[:] += jax.lax.dot_general(
        k_tile.astype(compute_dtype), b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu_precision,
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _flash_kernel_body(x_ref, y_ref, b_ref, out_ref, acc_ref, m_ref, l_ref,
                       *, spec: KernelSpec, block_n, block_m, n, m,
                       mask_diagonal, compute_dtype, mxu_precision):
    """Online-softmax accumulation for normalized exponential-family kernels.

    Maintains per-row running max `m`, normalizer `l` and the rescaled
    accumulator, so the normalized product
        out_i = sum_j exp(L_ij) b_j / sum_j exp(L_ij)
    is computed stably in one pass over j, never materializing K.
    """
    i, j = pl.program_id(0), pl.program_id(1)
    neg_inf = jnp.float32(-1e30)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, neg_inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    gram = jax.lax.dot_general(
        x_ref[:], y_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu_precision,
    )
    logits = spec.log_fn(gram)
    mask = _tile_masks(i, j, block_n, block_m, n, m, mask_diagonal)
    logits = jnp.where(mask, logits, neg_inf)

    m_prev = m_ref[:]                                   # (bN, 1)
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)                     # (bN, 1)
    p = jnp.exp(logits - m_new)                         # (bN, bM)
    p = jnp.where(mask, p, 0.0)

    m_ref[:] = m_new
    l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = alpha * acc_ref[:] + jax.lax.dot_general(
        p.astype(compute_dtype), b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu_precision,
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:] / l_ref[:]


def default_blocks(d: int, m: int, n: int):
    """Pick tile sizes that keep the working set well under VMEM (~16MB)."""
    if d <= 32:
        block_n, block_m = 256, 1024
    elif d <= 256:
        block_n, block_m = 256, 512
    else:
        block_n, block_m = 128, 512
    return min(block_n, _ceil_to(n, 8)), min(block_m, _ceil_to(m, LANE))


@functools.partial(
    jax.jit,
    static_argnames=("kernel_name", "normalize_rows", "mask_diagonal",
                     "density_estimation", "precision", "block_n", "block_m",
                     "interpret", "out_channels"))
def kernel_matvec_pallas(x, y, b, *, kernel_name: str,
                         normalize_rows: bool = False,
                         mask_diagonal: Optional[bool] = None,
                         density_estimation: bool = False,
                         precision: str = "float32",
                         block_n: Optional[int] = None,
                         block_m: Optional[int] = None,
                         interpret: bool = False,
                         out_channels: Optional[int] = None):
    """Pallas streaming kernel product on TPU.

    Args:
        x: (N, D) target points.  y: (M, D) source points.
        b: (M, E) source signal, or None with density_estimation.
        precision: "float32" or "bfloat16" — dtype of the MXU inputs;
            accumulation is always float32.

    Returns:
        (N, E) float32 result (E = 1 for density estimation).
    """
    spec = get_kernel(kernel_name)
    if mask_diagonal is None:
        mask_diagonal = spec.zero_diagonal
    n, d = x.shape
    m = y.shape[0]
    compute_dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32

    if density_estimation and normalize_rows:
        return jnp.ones((n, 1), dtype=jnp.float32)
    if b is None:
        b = jnp.ones((m, 1), dtype=jnp.float32)
    e = b.shape[1] if out_channels is None else out_channels

    use_flash = normalize_rows and spec.log_fn is not None
    if normalize_rows and not use_flash:
        # Non-exp-family normalized product: fused ones column, divide after.
        b = jnp.concatenate([b, jnp.ones((m, 1), b.dtype)], axis=1)

    bn, bm = default_blocks(d, m, n)
    if block_n is not None:
        bn = block_n
    if block_m is not None:
        bm = block_m

    # Augment & pad.  Padded rows/cols of the Gram matrix are masked in-tile.
    x_aug = _augment(x.astype(jnp.float32), spec.on, compute_dtype)
    y_aug = _augment_source(y.astype(jnp.float32), spec.on, compute_dtype)
    d_aug = x_aug.shape[1]
    d_pad = _ceil_to(d_aug, LANE)
    n_pad = _ceil_to(n, bn)
    m_pad = _ceil_to(m, bm)
    e_in = b.shape[1]
    e_pad = _ceil_to(e_in, LANE)

    x_aug = _pad_axis(_pad_axis(x_aug, d_pad, 1), n_pad, 0)
    y_aug = _pad_axis(_pad_axis(y_aug, d_pad, 1), m_pad, 0)
    b_pad = _pad_axis(_pad_axis(b.astype(compute_dtype), e_pad, 1), m_pad, 0)

    grid = (n_pad // bn, m_pad // bm)

    # On the TPU MXU, "float32" matmuls default to fast bf16 passes; the
    # f32 Pareto entry needs HIGHEST (multi-pass) to deliver f32 accuracy.
    mxu_precision = (jax.lax.Precision.DEFAULT
                     if compute_dtype == jnp.bfloat16
                     else jax.lax.Precision.HIGHEST)
    common = dict(block_n=bn, block_m=bm, n=n, m=m,
                  mask_diagonal=mask_diagonal, compute_dtype=compute_dtype,
                  mxu_precision=mxu_precision)
    scratch = [pltpu.VMEM((bn, e_pad), jnp.float32)]
    if use_flash:
        body = functools.partial(_flash_kernel_body, spec=spec, **common)
        scratch += [pltpu.VMEM((bn, 1), jnp.float32),
                    pltpu.VMEM((bn, 1), jnp.float32)]
    else:
        body = functools.partial(_direct_kernel_body, spec=spec, **common)

    flops = 2 * n_pad * m_pad * (d_pad + e_pad)
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, d_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, d_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, e_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, e_pad), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, e_pad), jnp.float32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x_aug.size + y_aug.size + b_pad.size) * 4,
            transcendentals=n_pad * m_pad,
        ),
        interpret=interpret,
    )(x_aug, y_aug, b_pad)

    out = out[:n]
    if normalize_rows and not use_flash:
        return out[:, :e_in - 1][:, :e] / out[:, e_in - 1:e_in]
    return out[:, :e]


@functools.partial(
    jax.jit,
    static_argnames=("kernel_name", "normalize_rows", "mask_diagonal",
                     "density_estimation", "precision", "block_n",
                     "row_offset"))
def kernel_matvec_xla(x, y, b, *, kernel_name: str,
                      normalize_rows: bool = False,
                      mask_diagonal: Optional[bool] = None,
                      density_estimation: bool = False,
                      precision: str = "float32",
                      block_n: int = 1024,
                      row_offset: int = 0):
    """Blocked pure-XLA product with identical semantics (CPU fallback).

    Streams block_n target rows at a time with lax.map, so peak memory is
    O(block_n * M) — usable both as the CPU path and as an independent
    check of the Pallas kernels.  `row_offset` shifts the global row index
    for diagonal masking (used by sharded target splits).
    """
    spec = get_kernel(kernel_name)
    if mask_diagonal is None:
        mask_diagonal = spec.zero_diagonal
    n, d = x.shape
    m = y.shape[0]
    dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32

    if density_estimation and normalize_rows:
        return jnp.ones((n, 1), dtype=jnp.float32)
    if b is None:
        b = jnp.ones((m, 1), dtype=jnp.float32)

    x = x.astype(dtype)
    y = y.astype(dtype)
    b = b.astype(dtype)
    mxu_precision = (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
                     else jax.lax.Precision.HIGHEST)
    matmul = functools.partial(jnp.matmul, precision=mxu_precision)

    bn = min(block_n, n)
    n_pad = _ceil_to(n, bn)
    x_padded = _pad_axis(x, n_pad, 0)
    starts = jnp.arange(n_pad // bn) * bn

    use_flash = normalize_rows and spec.log_fn is not None

    def block(start):
        xb = jax.lax.dynamic_slice_in_dim(x_padded, start, bn, axis=0)
        if spec.on == "dot":
            form = matmul(xb, y.T).astype(jnp.float32)
        else:
            xsq = jnp.sum(
                xb.astype(jnp.float32) ** 2, axis=1, keepdims=True)
            ysq = jnp.sum(
                y.astype(jnp.float32) ** 2, axis=1, keepdims=True).T
            form = xsq + ysq - 2.0 * matmul(xb, y.T).astype(jnp.float32)

        if mask_diagonal:
            rows = row_offset + start + jax.lax.broadcasted_iota(
                jnp.int32, (bn, m), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (bn, m), 1)
            diag = rows == cols
        if use_flash:
            logits = spec.log_fn(form)
            if mask_diagonal:
                logits = jnp.where(diag, -jnp.inf, logits)
            mx = jnp.max(logits, axis=1, keepdims=True)
            p = jnp.exp(logits - mx)
            return matmul(p.astype(dtype), b).astype(jnp.float32) / jnp.sum(
                p, axis=1, keepdims=True)
        k = spec.fn(form)
        if mask_diagonal:
            k = jnp.where(diag, 0.0, k)
        num = matmul(k.astype(dtype), b).astype(jnp.float32)
        if normalize_rows:
            return num / jnp.sum(k, axis=1, keepdims=True)
        return num

    out = jax.lax.map(block, starts)
    out = out.reshape(n_pad, -1)[:n]
    return out


def kernel_matvec(x, y, b, **kwargs):
    """Backend dispatch: Pallas on TPU, blocked XLA elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return kernel_matvec_pallas(x, y, b, **kwargs)
    kwargs.pop("interpret", None)
    kwargs.pop("block_m", None)
    kwargs.pop("out_channels", None)
    bn = kwargs.pop("block_n", None)
    if bn is not None:
        kwargs["block_n"] = bn
    return kernel_matvec_xla(x, y, b, **kwargs)
