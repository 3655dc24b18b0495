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
- direct: acc += K @ [b, 1] — a ones column rides in the existing lane
  padding of b, so the kernel row sums (for normalization / density
  estimation) come out of the same matmul for free (the reference's fused
  attention trick, bruteforce.py:140-145).
- flash (online softmax): for exponential-family kernels with
  normalize_rows, track a running row max and normalizer so arbitrarily
  large logits (attention with exp(<x,y>)) stay stable — the classic
  flash-attention recurrence, generalized to any log-kernel.

Sharding hooks (used by kmb_tpu.parallel):
- `row_offset` / `col_offset` are *dynamic* global index offsets (SMEM
  scalars inside the Pallas kernel), so a shard holding rows [r0, r0+n)
  and columns [c0, c0+m) of the global problem masks the true global
  diagonal of singular kernels.
- `deferred=True` returns the raw combination state instead of the
  finalized output: (num, den) for the direct scheme, (acc, m, l) for
  flash.  States from different source shards combine exactly via psum /
  running-max merges (see kmb_tpu.parallel.sharded).

A pure-XLA blocked fallback (`kernel_matvec_xla`) provides the same
semantics for CPU execution (tests, virtual-device meshes) and doubles as
an independent implementation to validate the Pallas kernels against.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmb_tpu.ops.kernels import KernelSpec, get_kernel

LANE = 128
FLASH_NEG_INF = -1e30  # python float: jnp constants would be captured consts in pallas


def _ceil_to(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _pad_axis(arr, target: int, axis: int):
    pad = target - arr.shape[axis]
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths)


def _augment_target(points, on: str, dtype, sign: float = 1.0):
    """Left factor of the bilinear form: [-2x, |x|^2, 1] for sqdist.

    With sign=-1 the factors are negated ([2x, -|x|^2, -1]) so the MXU
    emits -|x-y|^2 directly — the negation that exp-family kernels need
    is free here instead of one extra VPU pass over every tile.
    """
    if on == "dot":
        return points.astype(dtype)
    sq = jnp.sum(points * points, axis=1, keepdims=True)
    ones = jnp.ones_like(sq)
    return (sign * jnp.concatenate([(-2.0 * points), sq, ones], axis=1)
            ).astype(dtype)


def _augment_source(points, on: str, dtype):
    """Right factor: [y, 1, |y|^2] so <x_aug, y_aug> = |x - y|^2."""
    if on == "dot":
        return points.astype(dtype)
    sq = jnp.sum(points * points, axis=1, keepdims=True)
    ones = jnp.ones_like(sq)
    return jnp.concatenate([points, ones, sq], axis=1).astype(dtype)


def _dot3(a, b, dimension_numbers):
    """bf16x3 matmul: a 2-term hi/lo bfloat16 split with the negligible
    lo*lo product dropped — three DEFAULT MXU passes for ~2^-16 relative
    accuracy, against six passes for Precision.HIGHEST (~2^-24) and one
    for DEFAULT (~2^-8).  Mosaic only lowers DEFAULT and HIGHEST dot
    precisions, so the intermediate tier is built by hand.
    """
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    return dot(ah, bh) + (dot(ah, bl) + dot(al, bh))


def _tile_form(x_ref, y_ref, *, form_mode, on, d, mxu_precision,
               sign: float = 1.0):
    """(bN, bM) bilinear form tile: squared distances or dot products.

    form_mode "mxu": x_ref/y_ref hold augmented factors (bn, d_pad) /
    (bm, d_pad); one MXU matmul yields the whole form (see module
    docstring; `sign` is folded into the augmentation upstream).
    form_mode "vpu": for small D the 128-lane padding makes
    the MXU matmul ~d_pad/d times wasteful, so instead x_ref holds raw
    points (bn, d8) and y_ref the TRANSPOSED points (d8, bm), and the form
    is an unrolled VPU broadcast loop over the true D — exact f32, zero
    MXU cost, freeing the MXU for the K @ b accumulation.  With sign=-1
    the accumulation is a chain of fused negate-multiply-adds, so the
    negation exp-family kernels need is free.
    """
    if form_mode == "mxu":
        dims = (((1,), (1,)), ((), ()))
        if mxu_precision == "bf16x3":
            return _dot3(x_ref[:], y_ref[:], dims)
        return jax.lax.dot_general(
            x_ref[:], y_ref[:],
            dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=mxu_precision,
        )
    form = None
    for k in range(d):
        xk = x_ref[:, k:k + 1]         # (bn, 1)
        yk = y_ref[k:k + 1, :]         # (1, bm)
        if on == "dot":
            term = xk * yk
        else:
            diff = xk - yk
            term = diff * diff
        if sign < 0:
            form = -term if form is None else form - term
        else:
            form = term if form is None else form + term
    return form


def _tile_masks(i, j, row_off, col_off, col_limit, row_limit,
                block_n, block_m, m, mask_flags):
    """(bN, bM) validity mask for the tile at grid position (i, j).

    `mask_flags` is the static (mask_rows, mask_cols_local,
    mask_cols_global, mask_diag) tuple; only the requested terms are
    built, so each unnecessary condition costs zero VPU work (matters in
    the small-D VPU-form regime, where the full 4-term mask is several
    passes per tile — comparable to the form itself).  The terms:

    - cols_local: padded local columns (local col >= m);
    - cols_global: global col >= col_limit, for shards of a globally
      padded problem;
    - rows: global row >= row_limit — needed so iterative solvers can run
      in padded space with exactly-zero fake rows;
    - diag: the *global* diagonal (row_off + row == col_off + col) of
      singular kernels, matching the reference's post-hoc zeroing
      (bruteforce.py:12-15).

    Returns None when no term is requested.
    """
    mask_rows, mask_cols_local, mask_cols_global, mask_diag = mask_flags
    mask = None

    def _and(a, b):
        return b if a is None else jnp.logical_and(a, b)

    if mask_cols_local or mask_cols_global or mask_diag:
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_n, block_m), 1)
        local_cols = j * block_m + cols
    if mask_rows or mask_diag:
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_n, block_m), 0)
        global_rows = row_off + i * block_n + rows
    if mask_cols_local:
        mask = _and(mask, local_cols < m)
    if mask_cols_global or mask_diag:
        global_cols = col_off + local_cols
    if mask_cols_global:
        mask = _and(mask, global_cols < col_limit)
    if mask_rows:
        mask = _and(mask, global_rows < row_limit)
    if mask_diag:
        mask = _and(mask, global_rows != global_cols)
    return mask


def _accumulate(k_tile, b_ref, *, acc_mode, n_cols, compute_dtype,
                acc_precision):
    """weights @ b for one tile, as a full (bn, e_pad) update.

    acc_mode "mxu": b_ref is (bm, e_pad); one matmul.  For f32 this costs
    6 bf16 passes over 128 output lanes even when E=1 — the dominant MXU
    cost at small D/E.  acc_mode "vpu": b_ref holds b TRANSPOSED
    (e8, bm); each of the n_cols true columns is a broadcast multiply +
    lane reduction on the VPU — exact f32, zero MXU, ~n_cols VPU passes.
    """
    if acc_mode == "mxu":
        dims = (((1,), (0,)), ((), ()))
        if acc_precision == "bf16x3":
            return _dot3(k_tile, b_ref[:], dims)
        return jax.lax.dot_general(
            k_tile.astype(compute_dtype), b_ref[:],
            dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=acc_precision,
        )
    cols = [jnp.sum(k_tile * b_ref[c:c + 1, :], axis=1, keepdims=True)
            for c in range(n_cols)]
    pad = jnp.zeros((k_tile.shape[0], LANE - n_cols), jnp.float32)
    return jnp.concatenate(cols + [pad], axis=1)


def _direct_kernel_body(offs_ref, x_ref, y_ref, b_ref, out_ref, acc_ref, *,
                        spec: KernelSpec, block_n, block_m, m,
                        compute_dtype, mxu_precision,
                        acc_precision, form_mode, d, mask_flags,
                        acc_mode, n_cols):
    """Direct accumulation: acc += kernel(G) @ [b, 1]."""
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gram = _tile_form(x_ref, y_ref, form_mode=form_mode, on=spec.on, d=d,
                      mxu_precision=mxu_precision, sign=spec.form_sign)
    k_tile = spec.scaled_fn(gram)
    mask = _tile_masks(
        i, j, offs_ref[0, 0], offs_ref[0, 1], offs_ref[0, 2],
        offs_ref[0, 3], block_n, block_m, m, mask_flags)
    if mask is not None:
        k_tile = jnp.where(mask, k_tile, 0.0)

    acc_ref[:] += _accumulate(
        k_tile, b_ref, acc_mode=acc_mode, n_cols=n_cols,
        compute_dtype=compute_dtype, acc_precision=acc_precision)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _flash_kernel_body(offs_ref, x_ref, y_ref, b_ref,
                       acc_out, m_out, l_out,
                       acc_ref, m_ref, l_ref, *,
                       spec: KernelSpec, block_n, block_m, m,
                       compute_dtype, mxu_precision,
                       acc_precision, form_mode, d, mask_flags,
                       acc_mode, n_cols):
    """Online-softmax accumulation for normalized exponential-family kernels.

    Maintains per-row running max `m`, normalizer `l` and the rescaled
    accumulator, so the normalized product
        out_i = sum_j exp(L_ij) b_j / sum_j exp(L_ij)
    is computed stably in one pass over j, never materializing K.  The
    whole recurrence runs in BASE 2 (logits from `scaled_log2_fn`,
    rescales via `exp2` — the TPU-native transcendental; the division
    acc / l is base-invariant).  Emits the raw (acc, m, l) state, with m
    a base-2 logit; finalization (acc / l) happens outside so states from
    different source shards can still be merged exactly (the exp2-based
    merge algebra lives in kmb_tpu.parallel.sharded).
    """
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, FLASH_NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    gram = _tile_form(x_ref, y_ref, form_mode=form_mode, on=spec.on, d=d,
                      mxu_precision=mxu_precision, sign=spec.form_sign)
    logits = spec.scaled_log2_fn(gram)
    mask = _tile_masks(
        i, j, offs_ref[0, 0], offs_ref[0, 1], offs_ref[0, 2],
        offs_ref[0, 3], block_n, block_m, m, mask_flags)
    if mask is not None:
        logits = jnp.where(mask, logits, FLASH_NEG_INF)

    m_prev = m_ref[:]                                   # (bN, 1)
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    alpha = jnp.exp2(m_prev - m_new)                    # (bN, 1)
    p = jnp.exp2(logits - m_new)                        # (bN, bM)
    if mask is not None:
        p = jnp.where(mask, p, 0.0)

    m_ref[:] = m_new
    l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = alpha * acc_ref[:] + _accumulate(
        p, b_ref, acc_mode=acc_mode, n_cols=n_cols,
        compute_dtype=compute_dtype, acc_precision=acc_precision)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        acc_out[:] = acc_ref[:]
        m_out[:] = m_ref[:]
        l_out[:] = l_ref[:]


def default_blocks(d: int, m: int, n: int, e: int = 1,
                   precision: str = "float32"):
    """Pick tile sizes that keep the working set under scoped VMEM (16MB).

    Swept on a v5e chip (N=M=262144, f32): the VPU-form regime (small D)
    peaks at (1024, 2048) — 2.7e11 pairs/s vs 2.2e11 at (256, 1024) —
    for the direct, masked, and flash paths alike; the MXU-form regime
    peaks at (1024, 512) for D≈64 and must shrink to (512, 512) by D≈784
    (larger tiles fail VMEM allocation) — EXCEPT at bfloat16, whose
    2-byte point/signal tiles leave room for (1024, 512) at D=784 too
    (round-5 sweep, artifacts/r05_mxu_sweep_bf16.jsonl: 108.0 TFLOP/s vs
    104.2 at (512, 512); f32/f32x3 tiles at those shapes fail Mosaic
    VMEM allocation, same sweep).

    Wide signals (e.g. the rank-wide sketch matvec of the Nystrom
    preconditioner, solve.py:209) scale the b/out/acc tiles by E, so the
    swept defaults are halved until the estimated working set — form
    tile + double-buffered points and signal + accumulators — fits the
    scoped-VMEM budget.
    """
    bf16 = precision == "bfloat16"
    if d <= 8:
        block_n, block_m = 1024, 2048
    elif d <= 256 or bf16:
        block_n, block_m = 1024, 512
    else:
        block_n, block_m = 512, 512

    e_pad = _ceil_to(e + 1, LANE)      # worst case: den column rides in b
    d_pad = _ceil_to(d + 2, 8 if d <= 8 else LANE)
    # bf16 point/signal tiles are 2 bytes; the form tile and accumulator
    # stay f32.  The 4-byte model below is kept for the f32 tiers (their
    # larger shapes measurably fail Mosaic VMEM allocation at D=784);
    # for bf16 the halved point-tile cost is what admits block_n=1024.
    pt_bytes = 2 if bf16 else 4

    # Wide signals (e_pad > one 128-lane group) defeat the compiler's
    # in-place fusion of the kernel map into the form tile and keep more
    # accumulator temporaries live (measured: E=256 at (1024, 1024) uses
    # 22.4MB scoped vs ~12MB predicted by the narrow-signal model), so
    # the form counts twice and the accumulator terms 6x in that regime.
    form_k = 1 if e_pad <= LANE else 2
    acc_k = 3 if e_pad <= LANE else 6

    def working_set(bn, bm):
        return (4 * form_k * bn * bm       # form (+ kernel) tile (f32)
                + pt_bytes * 2 * bm * e_pad    # double-buffered signal
                + 4 * acc_k * bn * e_pad   # accumulator + buffered out
                + pt_bytes * 2 * (bn + bm) * d_pad)  # dbl-buffered points

    budget = 12_500_000  # leave headroom inside the 16MB scoped limit
    while working_set(block_n, block_m) > budget and block_m > 512:
        block_m //= 2
    while working_set(block_n, block_m) > budget and block_n > 256:
        block_n //= 2
    return min(block_n, _ceil_to(n, 8)), min(block_m, _ceil_to(m, LANE))


def _mxu_precision(precision, compute_dtype):
    # On the TPU MXU, "float32" matmuls default to fast bf16 passes; the
    # f32 Pareto entry needs HIGHEST (six bf16 passes) for the bilinear
    # form, where squared-distance cancellation is accuracy-critical.
    # "float32x3" opts into the hand-built 3-pass tier (_dot3): half the
    # MXU cost at ~2^-16 relative form error.
    if precision == "float32x3":
        return "bf16x3"
    return (jax.lax.Precision.DEFAULT if compute_dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _acc_precision(precision, compute_dtype):
    # Mosaic lowers only DEFAULT and HIGHEST dot precisions, and with the
    # VPU form path the kernel is VPU-bound anyway, so the K @ b matmul
    # keeps full f32 (HIGHEST) accuracy at no wall-clock cost.
    return _mxu_precision(precision, compute_dtype)


def kernel_matvec_pallas(x, y, b, *, kernel_name: str,
                         mask_diagonal: Optional[bool] = None,
                         block_n: Optional[int] = None,
                         block_m: Optional[int] = None,
                         row_offset=0, col_offset=0, col_limit=2**31 - 1,
                         row_limit=2**31 - 1,
                         rows_aligned: bool = False,
                         cols_aligned: bool = False, **kwargs):
    """Pallas streaming kernel product on TPU (see `_kernel_matvec_pallas`).

    This wrapper statically decides which in-tile mask terms are needed;
    every unnecessary term's iota/compare/select work is compiled out
    (`_tile_masks`).  With static integer offsets/limits the decision is
    exact.  With traced offsets (SPMD shards inside shard_map, where the
    offset depends on axis_index) the limits are conservatively assumed
    to clip unless the caller passes `rows_aligned` / `cols_aligned` —
    promises that row_limit / col_limit can never clip a real local
    row/column on ANY shard (i.e. the global problem has no row / column
    padding).  The sharded schedules (kmb_tpu.parallel.sharded) set them
    whenever the global shapes divide evenly.
    """
    spec = get_kernel(kernel_name)
    md = spec.zero_diagonal if mask_diagonal is None else mask_diagonal
    n, d = x.shape
    m = y.shape[0]
    bn, bm = default_blocks(d, m, n, 1 if b is None else b.shape[1],
                            precision=kwargs.get("precision", "float32"))
    bn = block_n if block_n is not None else bn
    bm = block_m if block_m is not None else bm

    n_pad, m_pad = _ceil_to(n, bn), _ceil_to(m, bm)
    bounds = (row_offset, col_offset, col_limit, row_limit)
    # Local column padding (cols in [m, m_pad)) would inject fake sources
    # into real rows — always masked when present.  Local ROW padding only
    # produces garbage output rows that are sliced off, so rows need
    # masking only when row_limit actually clips real rows (padded-space
    # iteration).
    mask_cols_local = m_pad != m
    if all(isinstance(v, int) for v in bounds):
        mask_cols_global = col_offset + m > col_limit
        mask_rows = row_offset + n > row_limit
    else:
        mask_cols_global = not cols_aligned
        mask_rows = not rows_aligned
    mask_flags = (bool(mask_rows), bool(mask_cols_local),
                  bool(mask_cols_global), bool(md))

    return _kernel_matvec_pallas(
        x, y, b, kernel_name=kernel_name,
        block_n=block_n, block_m=block_m, mask_flags=mask_flags,
        row_offset=row_offset, col_offset=col_offset,
        col_limit=col_limit, row_limit=row_limit, **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=("kernel_name", "normalize_rows",
                     "density_estimation", "precision", "block_n", "block_m",
                     "interpret", "deferred", "mask_flags", "form"))
def _kernel_matvec_pallas(x, y, b, *, kernel_name: str,
                          normalize_rows: bool = False,
                          density_estimation: bool = False,
                          precision: str = "float32",
                          block_n: Optional[int] = None,
                          block_m: Optional[int] = None,
                          interpret: bool = False,
                          deferred: bool = False,
                          mask_flags=(True, True, True, False),
                          form: Optional[str] = None,
                          row_offset=0, col_offset=0, col_limit=2**31 - 1,
                          row_limit=2**31 - 1):
    """Pallas streaming kernel product on TPU.

    Args:
        x: (N, D) target points.  y: (M, D) source points.
        b: (M, E) source signal, or None with density_estimation.
        precision: "float32" or "bfloat16" — dtype of the MXU inputs;
            accumulation is always float32.
        deferred: return raw combination state for cross-shard merging —
            (num, den) for the direct scheme (den is None when nothing
            consumes row sums — a plain product's shards merge by summing
            num alone), (acc, m, l) for flash.
        mask_flags: static (mask_rows, mask_cols_local, mask_cols_global,
            mask_diag) — which in-tile mask terms to build (see
            `_tile_masks`); resolved by the `kernel_matvec_pallas` wrapper.
        row_offset / col_offset: dynamic global offsets of this shard's
            rows/columns (for global diagonal masking).

    Returns:
        (N, E) float32 result, or the deferred state tuple.
    """
    spec = get_kernel(kernel_name)
    n, d = x.shape
    m = y.shape[0]
    compute_dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32

    if density_estimation and normalize_rows and not deferred:
        return jnp.ones((n, 1), dtype=jnp.float32)
    b_was_none = b is None
    if b_was_none:
        b = jnp.ones((m, 1), dtype=jnp.float32)
    e = b.shape[1]

    use_flash = normalize_rows and spec.scaled_log2_fn is not None

    # Row sums (the "den" output) only cost anything when someone reads
    # them: sum normalization, or density estimation with a
    # caller-supplied signal (when b is implicit ones, num == den
    # exactly).  A deferred plain product returns (num, None): its
    # cross-shard merge sums num alone, so the extra accumulation column
    # would be pure waste (one whole VPU lane-reduction pass per tile at
    # E=1).
    needs_den = (not use_flash) and (
        normalize_rows or (density_estimation and not b_was_none))

    bn, bm = default_blocks(d, m, n, e, precision=precision)
    if block_n is not None:
        bn = block_n
    if block_m is not None:
        bm = block_m

    n_pad = _ceil_to(n, bn)
    m_pad = _ceil_to(m, bm)
    # When row sums are needed, a ones column rides in b's lane padding at
    # index e, yielding them from the same matmul:
    n_cols = e + (1 if needs_den else 0)
    e_pad = _ceil_to(n_cols, LANE)

    xs = x.astype(jnp.float32)
    ys = y.astype(jnp.float32)
    if spec.point_scale != 1.0:
        # Fold the base-2 conversion of exp-family kernels into the
        # points: scaling both sets by sqrt(log2 e) scales the bilinear
        # form by log2 e, collapsing per-pair exp to native exp2.
        xs = xs * spec.point_scale
        ys = ys * spec.point_scale

    # Form layout: for small D the MXU matmul would be ~LANE/d wasteful
    # (the contraction dim pads to 128 lanes), so feed raw + transposed
    # points and compute the form on the VPU instead (_tile_form).
    # `form` overrides the heuristic (perf experiments / tuning).
    form_mode = form if form is not None else ("vpu" if d <= 8 else "mxu")
    if form_mode == "vpu":
        d_pad = _ceil_to(d, 8)
        x_in = _pad_axis(_pad_axis(xs, d_pad, 1), n_pad, 0)
        y_in = _pad_axis(_pad_axis(ys, d_pad, 1),
                         m_pad, 0).T          # (d_pad, m_pad), lanes = m
        x_spec = pl.BlockSpec((bn, d_pad), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
        y_spec = pl.BlockSpec((d_pad, bm), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)
    else:
        # Augment & pad; padded Gram rows/cols are masked in-tile.
        x_in = _augment_target(xs, spec.on, compute_dtype,
                               sign=spec.form_sign)
        y_in = _augment_source(ys, spec.on, compute_dtype)
        d_pad = _ceil_to(x_in.shape[1], LANE)
        x_in = _pad_axis(_pad_axis(x_in, d_pad, 1), n_pad, 0)
        y_in = _pad_axis(_pad_axis(y_in, d_pad, 1), m_pad, 0)
        x_spec = pl.BlockSpec((bn, d_pad), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
        y_spec = pl.BlockSpec((bm, d_pad), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)
    # Accumulation layout: for tiny E in f32, the (bm, 128)-lane MXU
    # matmul at HIGHEST is the dominant cost — per-column VPU lane
    # reductions with b transposed are cheaper and exactly f32.
    acc_mode = ("vpu" if n_cols <= 4 and compute_dtype == jnp.float32
                else "mxu")
    if acc_mode == "vpu":
        e8 = _ceil_to(n_cols, 8)
        cols = [b.astype(jnp.float32)]
        if needs_den:
            cols.append(jnp.ones((m, 1), jnp.float32))
        b_pad = _pad_axis(_pad_axis(
            jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0],
            e8, 1), m_pad, 0).T                      # (e8, m_pad)
        b_spec = pl.BlockSpec((e8, bm), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)
    else:
        b_pad = _pad_axis(_pad_axis(b.astype(compute_dtype), e_pad, 1),
                          m_pad, 0)
        if needs_den:
            b_pad = b_pad.at[:m, e].set(jnp.asarray(1.0, compute_dtype))
        b_spec = pl.BlockSpec((bm, e_pad), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)

    offs = jnp.stack(
        [jnp.asarray(row_offset, jnp.int32),
         jnp.asarray(col_offset, jnp.int32),
         jnp.asarray(col_limit, jnp.int32),
         jnp.asarray(row_limit, jnp.int32)]).reshape(1, 4)

    grid = (n_pad // bn, m_pad // bm)

    common = dict(block_n=bn, block_m=bm, m=m,
                  compute_dtype=compute_dtype,
                  mxu_precision=_mxu_precision(precision, compute_dtype),
                  acc_precision=_acc_precision(precision, compute_dtype),
                  form_mode=form_mode, d=d, mask_flags=tuple(mask_flags),
                  acc_mode=acc_mode, n_cols=n_cols)
    in_specs = [
        pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                     memory_space=pltpu.SMEM),
        x_spec,
        y_spec,
        b_spec,
    ]
    cost = pl.CostEstimate(
        flops=2 * n_pad * m_pad * (d_pad + e_pad),
        bytes_accessed=(x_in.size + y_in.size + b_pad.size) * 4,
        transcendentals=n_pad * m_pad,
    )

    if use_flash:
        acc, mx, l = pl.pallas_call(
            functools.partial(_flash_kernel_body, spec=spec, **common),
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((bn, e_pad), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_pad, e_pad), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            ),
            scratch_shapes=[pltpu.VMEM((bn, e_pad), jnp.float32),
                            pltpu.VMEM((bn, 1), jnp.float32),
                            pltpu.VMEM((bn, 1), jnp.float32)],
            cost_estimate=cost,
            interpret=interpret,
        )(offs, x_in, y_in, b_pad)
        acc = acc[:n, :e]
        mx = mx[:n]
        l = l[:n]
        if deferred:
            return acc, mx, l
        return acc / l

    out = pl.pallas_call(
        functools.partial(_direct_kernel_body, spec=spec, **common),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bn, e_pad), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, e_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bn, e_pad), jnp.float32)],
        cost_estimate=cost,
        interpret=interpret,
    )(offs, x_in, y_in, b_pad)

    num = out[:n, :e]
    den = out[:n, e:e + 1] if needs_den else None
    if deferred:
        return num, den
    if density_estimation and not normalize_rows:
        # With an implicit ones signal num IS the row sum (needs_den was
        # elided); with an explicit signal the ones column carried it.
        return den if needs_den else num
    if normalize_rows:
        return num / den
    return num


@functools.partial(
    jax.jit,
    static_argnames=("kernel_name", "normalize_rows", "mask_diagonal",
                     "density_estimation", "precision", "block_n",
                     "deferred"))
def kernel_matvec_xla(x, y, b, *, kernel_name: str,
                      normalize_rows: bool = False,
                      mask_diagonal: Optional[bool] = None,
                      density_estimation: bool = False,
                      precision: str = "float32",
                      block_n: int = 1024,
                      deferred: bool = False,
                      row_offset=0, col_offset=0, col_limit=2**31 - 1,
                      row_limit=2**31 - 1):
    """Blocked pure-XLA product with identical semantics (CPU fallback).

    Streams block_n target rows at a time with lax.map, so peak memory is
    O(block_n * M) — usable both as the CPU path and as an independent
    check of the Pallas kernels.  Supports the same deferred-state and
    global-offset contract as the Pallas engine.
    """
    spec = get_kernel(kernel_name)
    if mask_diagonal is None:
        mask_diagonal = spec.zero_diagonal
    n, d = x.shape
    m = y.shape[0]
    dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32

    if density_estimation and normalize_rows and not deferred:
        return jnp.ones((n, 1), dtype=jnp.float32)
    b_was_none = b is None
    if b_was_none:
        b = jnp.ones((m, 1), dtype=jnp.float32)

    scale = jnp.float32(spec.point_scale)
    x = (x.astype(jnp.float32) * scale).astype(dtype)
    y = (y.astype(jnp.float32) * scale).astype(dtype)
    b = b.astype(dtype)
    sign = spec.form_sign
    # The XLA fallback has no hand-built 3-pass tier; float32x3 maps to
    # full f32 there (semantics: "at least f32x3 accurate").
    matmul = functools.partial(
        jnp.matmul,
        precision=(jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
                   else jax.lax.Precision.HIGHEST))
    row_offset = jnp.asarray(row_offset, jnp.int32)
    col_offset = jnp.asarray(col_offset, jnp.int32)
    col_limit = jnp.asarray(col_limit, jnp.int32)
    row_limit = jnp.asarray(row_limit, jnp.int32)

    bn = min(block_n, n)
    n_pad = _ceil_to(n, bn)
    x_padded = _pad_axis(x, n_pad, 0)
    starts = jnp.arange(n_pad // bn) * bn

    use_flash = normalize_rows and spec.scaled_log2_fn is not None

    def block(start):
        xb = jax.lax.dynamic_slice_in_dim(x_padded, start, bn, axis=0)
        if spec.on == "dot":
            form = matmul(xb, y.T).astype(jnp.float32)
            if sign < 0:
                form = -form
        elif d <= 8:
            # Cancellation-safe difference form, matching the Pallas
            # engine's VPU-form regime: the BLAS form below rounds the
            # squared distance of near-coincident pairs to <= 0 at f32,
            # which the singular inverse-distance kernel amplifies into
            # O(1)-relative errors (or inf on exact cancellation).
            xf = xb.astype(jnp.float32)
            yf = y.astype(jnp.float32)
            form = None
            for k in range(d):
                diff = xf[:, k:k + 1] - yf[:, k:k + 1].T
                term = diff * diff
                if sign < 0:
                    form = -term if form is None else form - term
                else:
                    form = term if form is None else form + term
        else:
            xsq = jnp.sum(
                xb.astype(jnp.float32) ** 2, axis=1, keepdims=True)
            ysq = jnp.sum(
                y.astype(jnp.float32) ** 2, axis=1, keepdims=True).T
            dots = matmul(xb, y.T).astype(jnp.float32)
            if sign < 0:
                form = 2.0 * dots - xsq - ysq
            else:
                form = xsq + ysq - 2.0 * dots

        cols = (col_offset
                + jax.lax.broadcasted_iota(jnp.int32, (bn, m), 1))
        local_rows = start + jax.lax.broadcasted_iota(
            jnp.int32, (bn, m), 0)
        invalid = jnp.logical_or(
            cols >= col_limit, (row_offset + local_rows) >= row_limit)
        if mask_diagonal:
            invalid = jnp.logical_or(
                invalid, (row_offset + local_rows) == cols)
        if use_flash:
            # Base-2 logits, matching the Pallas engine: deferred flash
            # states from either backend merge interchangeably.
            logits = spec.scaled_log2_fn(form)
            logits = jnp.where(invalid, FLASH_NEG_INF, logits)
            mx = jnp.max(logits, axis=1, keepdims=True)
            p = jnp.exp2(logits - mx)
            p = jnp.where(invalid, 0.0, p)
            acc = matmul(p.astype(dtype), b).astype(jnp.float32)
            l = jnp.sum(p, axis=1, keepdims=True)
            return acc, mx, l
        k = spec.scaled_fn(form)
        k = jnp.where(invalid, 0.0, k)
        num = matmul(k.astype(dtype), b).astype(jnp.float32)
        den = jnp.sum(k, axis=1, keepdims=True).astype(jnp.float32)
        return num, den

    parts = jax.lax.map(block, starts)
    if use_flash:
        acc, mx, l = (p.reshape(n_pad, -1)[:n] for p in parts)
        if deferred:
            return acc, mx, l
        return acc / l
    num, den = (p.reshape(n_pad, -1)[:n] for p in parts)
    # Same deferred-state contract as the Pallas engine: den is None when
    # nothing consumes row sums (jit DCEs the unused sum), so states from
    # either backend merge interchangeably.
    needs_den = normalize_rows or (density_estimation and not b_was_none)
    if deferred:
        return num, (den if needs_den else None)
    if density_estimation and not normalize_rows:
        return den if needs_den else num
    if normalize_rows:
        return num / den
    return num


def kernel_matvec(x, y, b, **kwargs):
    """Backend dispatch: Pallas on TPU, blocked XLA elsewhere."""
    if jax.default_backend() == "tpu":
        return kernel_matvec_pallas(x, y, b, **kwargs)
    kwargs.pop("interpret", None)
    kwargs.pop("block_m", None)
    kwargs.pop("rows_aligned", None)  # Pallas mask-elision hints; the XLA
    kwargs.pop("cols_aligned", None)  # path always masks (cost is noise)
    bn = kwargs.pop("block_n", None)
    if bn is not None:
        kwargs["block_n"] = bn
    return kernel_matvec_xla(x, y, b, **kwargs)
