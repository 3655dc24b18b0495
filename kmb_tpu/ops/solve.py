"""Kernel linear-system solvers: b = K^-1 a on TPU.

Two regimes (reference counterpart: scipy lstsq, bruteforce.py:205-207):

- `dense_solve`: materialize K once with an MXU-friendly augmented matmul
  and factorize (Cholesky for SPD kernels, LU for the indefinite
  inverse-distance matrix).  Right choice while K fits in HBM
  (M <~ 40k at f32 on a 16GB chip).

- `cg_solve`: matrix-free (preconditioned) conjugate gradient whose matvec
  is the streaming Pallas kernel product — O(M) memory, scales to M ~ 10^6
  and shards across chips (kernel row-sums and dot products are psum-able).
  For the indefinite inverse-distance kernel the default is MINRES on the
  symmetric K itself (one matvec per iteration at condition kappa); CG on
  the normal equations (K^2 b = K a, two matvecs per iteration at
  kappa^2) remains as the preconditioned fallback.

All iterations run in float32 with float32 scalar reductions; iteration
counts are recorded so the harness can report convergence behavior
(reference get_additional hook, base.py:44).
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kmb_tpu.ops.kernels import get_kernel
from kmb_tpu.ops.product import kernel_matvec

# Kernels whose Gram matrix is symmetric positive (semi-)definite on
# distinct points; CG applies directly.  The zero-diagonal
# inverse-distance matrix is symmetric indefinite -> normal equations.
SPD_KERNELS = frozenset({"gaussian", "absolute-exponential", "exponential"})


def kernel_matrix_xla(x, y, *, kernel_name: str, precision: str = "float32",
                      mask_diagonal: Optional[bool] = None):
    """Dense (N, M) kernel matrix via one HIGHEST-precision MXU matmul."""
    spec = get_kernel(kernel_name)
    if mask_diagonal is None:
        mask_diagonal = spec.zero_diagonal
    dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    mxu = (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
           else jax.lax.Precision.HIGHEST)
    x = x.astype(dtype)
    y = y.astype(dtype)
    if spec.on == "dot":
        form = jnp.matmul(x, y.T, precision=mxu).astype(jnp.float32)
    elif x.shape[1] <= 8:
        # Cancellation-safe difference form at small D (matching
        # ops/product.py): the BLAS form below rounds the squared
        # distance of near-coincident pairs to <= 0 at f32, which the
        # singular inverse-distance kernel turns into inf on REAL
        # off-diagonal entries.
        form = None
        for kdim in range(x.shape[1]):
            diff = (x[:, kdim:kdim + 1].astype(jnp.float32)
                    - y[:, kdim:kdim + 1].astype(jnp.float32).T)
            term = diff * diff
            form = term if form is None else form + term
    else:
        xsq = jnp.sum(x.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        ysq = jnp.sum(y.astype(jnp.float32) ** 2, axis=1, keepdims=True).T
        form = xsq + ysq - 2.0 * jnp.matmul(
            x, y.T, precision=mxu).astype(jnp.float32)
    k = spec.fn(form)
    if mask_diagonal:
        n, m = k.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
        k = jnp.where(rows == cols, 0.0, k)
    return k


@functools.partial(jax.jit, static_argnames=("kernel_name", "precision",
                                              "method"))
def dense_factor(y, *, kernel_name: str, precision: str = "float32",
                 method: str = "lu"):
    """Materialize K and factorize it (the timed `fit` phase of a solver).

    Pivoted LU by default: robust for both the indefinite inverse-distance
    matrix and ill-conditioned smooth SPD kernels at float32 (where an
    unpivoted Cholesky can break down).  method="cholesky" opts into the
    cheaper SPD factorization; method="svd" into the truncated-SVD
    pseudo-inverse — the float32 analog of the reference's LAPACK
    least-squares solve (bruteforce.py:205-207), far more accurate on
    numerically singular smooth kernels than exact LU.
    """
    k = kernel_matrix_xla(y, y, kernel_name=kernel_name, precision=precision)
    if method == "cholesky":
        return jax.scipy.linalg.cholesky(k, lower=True)
    if method == "svd":
        # K is symmetric, so the truncated pseudo-inverse comes from an
        # eigendecomposition (|w| thresholding covers the indefinite
        # inverse-distance matrix too).  eigh needs far less HBM workspace
        # than general SVD — M=10^4 general SVD OOMs a 16 GB chip.
        return jnp.linalg.eigh(0.5 * (k + k.T))
    return jax.scipy.linalg.lu_factor(k)


@functools.partial(jax.jit, static_argnames=("method",))
def dense_apply(factor, rhs, *, method: str = "lu", rcond: float = 1e-6):
    """Back-substitution against a stored factorization (the timed query)."""
    rhs = rhs.astype(jnp.float32)
    if method == "cholesky":
        return jax.scipy.linalg.cho_solve((factor, True), rhs)
    if method == "svd":
        w, v = factor
        mm = functools.partial(jnp.matmul,
                               precision=jax.lax.Precision.HIGHEST)
        keep = jnp.abs(w) > rcond * jnp.max(jnp.abs(w))
        w_inv = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
        return mm(v, w_inv[:, None] * mm(v.T, rhs))
    return jax.scipy.linalg.lu_solve(factor, rhs)


def dense_solve(y, rhs, *, kernel_name: str, precision: str = "float32",
                method: str = "lu", rcond: float = 1e-6):
    """Factorize-and-solve K b = rhs with K materialized in HBM."""
    factor = dense_factor(y, kernel_name=kernel_name, precision=precision,
                          method=method)
    return dense_apply(factor, rhs, method=method, rcond=rcond)


def _default_matvec(y, *, kernel_name, precision):
    def matvec(v):
        return kernel_matvec(y, y, v, kernel_name=kernel_name,
                             precision=precision)
    return matvec


class NormalEquationsOp:
    """K^2 matvec with hashing stable under the wrapped matvec.

    Lets `_pcg`'s jit cache hit across calls: a fresh lambda per call
    would force a full retrace + compile of the CG while_loop inside the
    timed query (observed ~0.9 s per solve regardless of iteration
    count).
    """

    def __init__(self, matvec: Callable):
        self.matvec = matvec

    def __call__(self, *args):
        # Variadic like every split matvec: leading args are the wrapped
        # matvec's runtime arrays (`_split_static` / `matvec_args`), the
        # final argument is the vector.  A matvec parameterized over
        # large device arrays (e.g. BLR factor tiers) must ship them as
        # runtime args here too, or the lowered module bakes them in as
        # constants — the remote-compile payload cap (HTTP 413).
        *mv_args, v = args
        return self.matvec(*mv_args, self.matvec(*mv_args, v))

    def __hash__(self):
        return hash(("normal-equations", self.matvec))

    def __eq__(self, other):
        return (isinstance(other, NormalEquationsOp)
                and self.matvec == other.matvec)


PCG_STALL_WINDOW = 60

# MINRES requires an SPD preconditioner: r' M^-1 r is its squared Lanczos
# beta, and a negative value means M^-1 is indefinite — user error.  The
# production path clamps to 0 (degrading gracefully, like the rest of the
# float32 pipeline); KMB_DEBUG_SPD_PRECOND=1 switches to a NaN-propagating
# sqrt so the misuse surfaces immediately instead of stalling (the
# debug-mode analog of SciPy minres's "non-symmetric matrix" error).
_DEBUG_SPD_PRECOND = os.environ.get("KMB_DEBUG_SPD_PRECOND", "0") == "1"


def _beta_sq(value):
    return value if _DEBUG_SPD_PRECOND else jnp.maximum(value, 0.0)


def _split_static(fn: Optional[Callable]):
    """Split a callable into (static_fn, dynamic_args) for jit caching.

    A `functools.partial` bound over device arrays — e.g. the Nystrom
    preconditioner factors, (M, rank) at up to hundreds of MB — must not
    be closed over as a *static* jit argument: tracing would embed the
    arrays into the lowered module as dense constants (268 MB at
    M=131072, rank=512, past the remote-compile payload cap on an axon
    chip).  Splitting keeps the function object static (stable jit cache
    key) while the bound arrays travel as ordinary runtime arguments.
    """
    if isinstance(fn, functools.partial) and not fn.keywords:
        return fn.func, fn.args
    return fn, ()


@functools.partial(jax.jit, static_argnames=("precond",))
def _pcg_init(rhs, precond: Optional[Callable] = None, precond_args=()):
    rhs = rhs.astype(jnp.float32)
    b0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = r0 if precond is None else precond(*precond_args, r0)
    rz0 = jnp.sum(r0 * z0, axis=0)
    rs0 = jnp.sum(r0 * r0, axis=0)
    state = (b0, r0, z0, rz0, rs0, b0, rs0, jnp.int32(0), jnp.int32(0))
    return state, jnp.sum(rhs * rhs, axis=0)


@functools.partial(jax.jit, static_argnames=("matvec", "precond"))
def _pcg_segment(matvec: Callable, state, target_sq, max_iters, seg_end,
                 precond: Optional[Callable] = None, precond_args=(),
                 matvec_args=()):
    """One bounded segment of CG iterations (device while_loop).

    `matvec_args` (like `precond_args`) carries device arrays the matvec
    is parameterized over as RUNTIME arguments: a matvec that closes
    over large arrays would bake them into the lowered module as dense
    constants — hundreds of MB for the BLR factor tiers, past the
    remote-compile payload cap on an axon chip (HTTP 413).  See
    `_split_static`.
    """
    if precond is None:
        apply_precond = lambda v: v  # noqa: E731
    else:
        apply_precond = lambda v: precond(*precond_args, v)  # noqa: E731

    def cond(state):
        _, _, _, _, rs, _, _, stall, it = state
        return jnp.logical_and(
            jnp.logical_and(
                jnp.logical_and(it < max_iters, it < seg_end),
                stall < PCG_STALL_WINDOW),
            jnp.any(rs > target_sq))

    def body(state):
        b, r, p, rz_old, _, best_b, best_rs, stall, it = state
        kp = matvec(*matvec_args, p)
        denom = jnp.sum(p * kp, axis=0)
        alpha = jnp.where(denom != 0.0, rz_old / denom, 0.0)
        b = b + alpha * p
        r = r - alpha * kp
        z = apply_precond(r)
        rz_new = jnp.sum(r * z, axis=0)
        beta = jnp.where(rz_old != 0.0, rz_new / rz_old, 0.0)
        p = z + beta * p
        rs_new = jnp.sum(r * r, axis=0)
        improved = rs_new < best_rs
        best_b = jnp.where(improved[None, :], b, best_b)
        best_rs = jnp.minimum(rs_new, best_rs)
        stall = jnp.where(jnp.any(improved), 0, stall + 1)
        return b, r, p, rz_new, rs_new, best_b, best_rs, stall, it + 1

    return jax.lax.while_loop(cond, body, state)


CG_SEGMENT_START = 16
CG_SEGMENT_MAX = 2048


def _pcg(matvec: Callable, rhs, tol: float, max_iters: int,
         precond: Optional[Callable] = None, precond_args=(),
         matvec_args=()):
    """Multi-RHS preconditioned conjugate gradient.

    Runs all E columns jointly; per-column alpha/beta scalars.  Stops when
    every column satisfies ||r|| <= tol * ||rhs|| (true residual, not the
    preconditioned one), at max_iters, or after PCG_STALL_WINDOW
    iterations with no best-residual improvement (float32 CG on
    ill-conditioned systems hits a rounding floor above tight tolerances;
    grinding to max_iters there wastes the whole iteration budget).
    Always returns the best iterate visited, never a later diverged one.

    The device while_loop runs in host-driven SEGMENTS: one unbounded
    loop would be a single device execution lasting minutes at M >= 10^5
    (2 matvecs x ~0.1s x 1000 iterations), past the point where
    remote-chip transports (the axon tunnel) declare the device hung and
    fault it.  Segments start at CG_SEGMENT_START iterations and are
    re-sized from the measured rate toward KMB_CG_SEGMENT_SECONDS
    (default 20s) of device time; the host replicates the stop
    conditions between segments, so the iterate sequence is identical
    to the single-loop form.

    The callables are static jit arguments: callers must pass *stable*
    function objects (bound methods, functools.partial built once) or
    they pay a retrace per call inside the timed region.
    """
    import time

    state, rhs_sq = _pcg_init(rhs, precond=precond,
                              precond_args=precond_args)
    rhs_sq_host = np.asarray(rhs_sq)
    target_sq_host = (float(tol) ** 2) * rhs_sq_host
    target_sq = jnp.asarray(target_sq_host)
    max_iters_dev = jnp.int32(max_iters)
    target_seconds = float(os.environ.get("KMB_CG_SEGMENT_SECONDS", "20"))
    segment = CG_SEGMENT_START
    compile_pass = True
    while True:
        rs_host = np.asarray(state[4])
        stall_host = int(state[7])
        iters_host = int(state[8])
        if (iters_host >= max_iters or stall_host >= PCG_STALL_WINDOW
                or not np.any(rs_host > target_sq_host)):
            break
        seg_end = jnp.int32(min(iters_host + segment, max_iters))
        t0 = time.perf_counter()
        state = _pcg_segment(matvec, state, target_sq, max_iters_dev,
                             seg_end, precond=precond,
                             precond_args=precond_args,
                             matvec_args=matvec_args)
        ran = int(state[8]) - iters_host  # blocks on the segment
        elapsed = time.perf_counter() - t0
        if not compile_pass and ran > 0 and elapsed > 0:
            segment = int(np.clip(target_seconds * ran / elapsed,
                                  CG_SEGMENT_START, CG_SEGMENT_MAX))
        compile_pass = False

    best_b, best_rs = state[5], np.asarray(state[6])
    residual = float(np.sqrt(
        (best_rs / np.maximum(rhs_sq_host, 1e-30)).max()))
    return best_b, int(state[8]), residual


@functools.partial(jax.jit, static_argnames=("precond",))
def _minres_init(rhs, precond: Optional[Callable] = None, precond_args=()):
    rhs = rhs.astype(jnp.float32)
    y = rhs if precond is None else precond(*precond_args, rhs)
    beta1_sq = _beta_sq(jnp.sum(rhs * y, axis=0))           # (E,)
    beta1 = jnp.sqrt(beta1_sq)
    zeros = jnp.zeros_like(rhs)
    zcol = jnp.zeros_like(beta1)
    # (x, r1, r2, y, w, w2,
    #  oldb, beta, dbar, epsln, phibar, cs, sn,
    #  best_x, best_rs, stall, it)
    state = (zeros, rhs, rhs, y, zeros, zeros,
             zcol, beta1, zcol, zcol, beta1, -jnp.ones_like(beta1), zcol,
             zeros, beta1_sq, jnp.int32(0), jnp.int32(0))
    return state, beta1_sq


@functools.partial(jax.jit, static_argnames=("matvec", "precond"))
def _minres_segment(matvec: Callable, state, target_sq, max_iters, seg_end,
                    precond: Optional[Callable] = None, precond_args=(),
                    matvec_args=()):
    """One bounded segment of (preconditioned) MINRES iterations.

    Paige–Saunders MINRES with an SPD preconditioner (the structure of
    SciPy's `minres`), vectorized over RHS columns with per-column
    Lanczos/Givens scalars.  One matvec + one preconditioner application
    per iteration on the symmetric (possibly INDEFINITE) operator —
    against CG on the normal equations (two matvecs per iteration on K²,
    squaring the condition number), this is the right Krylov method for
    the zero-diagonal inverse-distance matrix.  `phibar` is the
    M⁻¹-norm residual of the minimum-residual iterate in exact
    arithmetic (the plain 2-norm when unpreconditioned); float32 drift
    is covered by the final true-residual report in `_minres`.
    """
    if precond is None:
        psolve = lambda v: v  # noqa: E731
    else:
        psolve = lambda v: precond(*precond_args, v)  # noqa: E731
    tiny = jnp.finfo(jnp.float32).tiny

    def cond(state):
        phibar, stall, it = state[10], state[15], state[16]
        return jnp.logical_and(
            jnp.logical_and(
                jnp.logical_and(it < max_iters, it < seg_end),
                stall < PCG_STALL_WINDOW),
            jnp.any(phibar * phibar > target_sq))

    def body(state):
        (x, r1, r2, y, w, w2,
         oldb, beta, dbar, epsln, phibar, cs, sn,
         best_x, best_rs, stall, it) = state
        beta_safe = jnp.where(beta > 0.0, beta, 1.0)
        v = y / beta_safe[None, :]
        p = matvec(*matvec_args, v)
        # Lanczos three-term recurrence (first iteration has no r1 term).
        oldb_safe = jnp.where(oldb > 0.0, oldb, 1.0)
        coef = jnp.where(it >= 1, beta / oldb_safe, 0.0)
        p = p - coef[None, :] * r1
        alfa = jnp.sum(v * p, axis=0)
        p = p - (alfa / beta_safe)[None, :] * r2
        r1, r2 = r2, p
        y = psolve(r2)
        oldb = beta
        beta = jnp.sqrt(_beta_sq(jnp.sum(r2 * y, axis=0)))
        # Two previous Givens rotations applied to the new tridiagonal
        # column, then the new rotation annihilating beta.
        oldeps = epsln
        delta = cs * dbar + sn * alfa
        gbar = sn * dbar - cs * alfa
        epsln = sn * beta
        dbar = -cs * beta
        gamma = jnp.maximum(jnp.sqrt(gbar * gbar + beta * beta), tiny)
        cs = gbar / gamma
        sn = beta / gamma
        phi = cs * phibar
        phibar = sn * phibar
        w1 = w2
        w2 = w
        w = (v - oldeps[None, :] * w1 - delta[None, :] * w2) \
            / gamma[None, :]
        x = x + phi[None, :] * w
        rs_new = phibar * phibar
        improved = rs_new < best_rs
        best_x = jnp.where(improved[None, :], x, best_x)
        best_rs = jnp.minimum(rs_new, best_rs)
        stall = jnp.where(jnp.any(improved), 0, stall + 1)
        return (x, r1, r2, y, w, w2,
                oldb, beta, dbar, epsln, phibar, cs, sn,
                best_x, best_rs, stall, it + 1)

    return jax.lax.while_loop(cond, body, state)


def _minres(matvec: Callable, rhs, tol: float, max_iters: int,
            precond: Optional[Callable] = None, precond_args=(),
            matvec_args=()):
    """Host-segmented multi-RHS (preconditioned) MINRES (same protocol
    as `_pcg`: bounded device segments sized toward
    KMB_CG_SEGMENT_SECONDS, stall window on the residual estimate,
    best-iterate return).  `precond` must apply an SPD M⁻¹; the
    in-loop tolerance is relative in the M⁻¹-norm.

    Returns (b, iterations, relative_residual) with the relative
    residual measured from one TRUE residual matvec at the end (the
    in-loop `phibar` estimate can drift in float32).
    """
    import time

    state, rhs_sq = _minres_init(rhs, precond=precond,
                                 precond_args=precond_args)
    rhs_sq_host = np.asarray(rhs_sq)
    target_sq_host = (float(tol) ** 2) * rhs_sq_host
    target_sq = jnp.asarray(target_sq_host)
    max_iters_dev = jnp.int32(max_iters)
    target_seconds = float(os.environ.get("KMB_CG_SEGMENT_SECONDS", "20"))
    segment = CG_SEGMENT_START
    compile_pass = True
    while True:
        phibar_host = np.asarray(state[10])
        stall_host = int(state[15])
        iters_host = int(state[16])
        if (iters_host >= max_iters or stall_host >= PCG_STALL_WINDOW
                or not np.any(phibar_host * phibar_host > target_sq_host)):
            break
        seg_end = jnp.int32(min(iters_host + segment, max_iters))
        t0 = time.perf_counter()
        state = _minres_segment(matvec, state, target_sq, max_iters_dev,
                                seg_end, precond=precond,
                                precond_args=precond_args,
                                matvec_args=matvec_args)
        ran = int(state[16]) - iters_host  # blocks on the segment
        elapsed = time.perf_counter() - t0
        if not compile_pass and ran > 0 and elapsed > 0:
            segment = int(np.clip(target_seconds * ran / elapsed,
                                  CG_SEGMENT_START, CG_SEGMENT_MAX))
        compile_pass = False

    best_x = state[13]
    # The final report is always the plain 2-norm relative residual
    # (rhs_sq above is the M⁻¹-norm when preconditioned).
    rhs_f = np.asarray(rhs, dtype=np.float32)
    true_r = np.asarray(rhs_f - matvec(*matvec_args, best_x))
    res_sq = np.sum(true_r * true_r, axis=0)
    rhs2 = np.sum(rhs_f * rhs_f, axis=0)
    residual = float(np.sqrt(
        (res_sq / np.maximum(rhs2, 1e-30)).max()))
    return best_x, int(state[16]), residual


@functools.partial(jax.jit, static_argnames=("kernel_name",))
def _block_abs_factors(ypts, valid, *, kernel_name: str):
    """Batched |K_block|^-1 spectral factors of the diagonal kernel blocks.

    ypts (B, leaf, D) blocked points, valid (B, leaf) real-point mask
    (pads duplicate a real row of their own block; pad rows/columns are
    masked to identity so pad solve components pass through and are
    dropped by the scatter).  One spectral path serves both regimes:

    - SPD kernels (|K_b| = K_b): the eigenvalue floor makes this robust
      where float32 Cholesky reliably breaks down — a 512-point gaussian
      unit-cube block has numerical rank ~40 and rounding-scale negative
      eigenvalues ~leaf*eps, producing NaN factors under any fixed
      jitter.
    - Indefinite kernels (inverse-distance: zero diagonal, singular
      decay): |K_b| = V |w| V^T is the canonical SPD surrogate — it
      shares K_b's eigenbasis and magnitudes, so |K_b|^-1 K has a
      clustered local spectrum, exactly what preconditioned MINRES
      wants (it requires an SPD preconditioner).

    Returns (V, winv) with winv = 1 / max(|w|, floor).
    """

    def one(yb, vb):
        k = kernel_matrix_xla(yb, yb, kernel_name=kernel_name)
        mask = jnp.logical_and(vb[:, None], vb[None, :])
        k = jnp.where(mask, k, 0.0)
        k = k + jnp.diag(jnp.where(vb, 0.0, 1.0))
        w, v = jnp.linalg.eigh(k)
        aw = jnp.abs(w)
        floor = jnp.maximum(jnp.max(aw) * 1e-6,
                            jnp.finfo(jnp.float32).tiny)
        return v, 1.0 / jnp.maximum(aw, floor)

    return jax.vmap(one)(ypts, valid)


@jax.jit
def apply_block_abs_jacobi(v, winv, gather, out_pos, x):
    """P^-1 x for the block spectral-absolute-value preconditioner."""
    xb = x.astype(jnp.float32)[gather]                      # (B, leaf, E)
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    sol = mm(v, winv[:, :, None] * mm(v.transpose(0, 2, 1), xb))
    return sol.reshape(-1, x.shape[1])[out_pos]


def block_jacobi_preconditioner(y, *, kernel_name: str, leaf: int = 512):
    """Block-Jacobi preconditioner from a balanced geometric clustering.

    The classic H-matrix-adjacent alternative to the Nyström spectral
    preconditioner: cluster the points with the BLR balanced bisection
    (ops/blr.py), factor every (leaf, leaf) diagonal kernel block once
    (batched spectral factorization — see _block_abs_factors for why
    not Cholesky), and apply all block solves as batched matmuls.
    Where Nyström flattens the global top spectrum (best for fast
    spectral decay — Gaussian), block-Jacobi captures the strong LOCAL
    coupling of slowly-decaying kernels like absolute-exponential, whose
    spectrum Nyström cannot summarize at practical ranks
    (VERDICT round-2 #5; reference accuracy bar: bruteforce.py:205-207).

    Returns a `functools.partial(apply_block_abs_jacobi, ...)` ready to
    pass as `precond` to `cg_solve` (stable jit identity via
    _split_static).
    """
    from kmb_tpu.ops.blr import _cluster

    y = np.asarray(y)
    gather, gid = _cluster(np.asarray(y, np.float64), leaf)
    ypts = jnp.asarray(y[gather], jnp.float32)
    valid = jnp.asarray(gid >= 0)
    out_pos = np.empty(y.shape[0], dtype=np.int64)
    flat_gid = gid.reshape(-1)
    real = flat_gid >= 0
    out_pos[flat_gid[real]] = np.nonzero(real)[0]
    v, winv = _block_abs_factors(ypts, valid, kernel_name=kernel_name)
    return functools.partial(apply_block_abs_jacobi, v, winv,
                             jnp.asarray(gather), jnp.asarray(out_pos))


def nystrom_preconditioner(matvec: Callable, m: int, rank: int, *,
                           key=None, method: str = "svd",
                           reduce_out_sharding=None):
    """Randomized Nyström preconditioner factors (U, lam) for an SPD op.

    Sketch K with a Gaussian test matrix and form the rank-`rank`
    Nyström approximation K ≈ U diag(lam) U^T (the shift-stabilized
    algorithm of Frangella, Tropp & Udell, "Randomized Nyström
    Preconditioning", 2021 — public method, reimplemented here).  The
    sketch costs `rank` kernel matvecs, fused into ONE streaming engine
    call with E=rank, i.e. a perfect MXU workload.

    method="svd" (single-chip default): orthonormalize the test matrix
    with tall QR and extract U from a tall SVD — the most accurate
    float32 route.

    method="gram": no tall dense factorization at all — the whitening
    and the eigenbasis both come from (rank, rank) Gram eigendecomposi-
    tions, and every tall operation is a tall-skinny matmul.  This is
    the DISTRIBUTED path: with `matvec` a sharded ring matvec and omega
    row-sharded, XLA lowers the Gram products to local matmuls + psum,
    whereas tall QR/SVD reject sharded operands outright
    (ShardingTypeError).  Gram squaring caps the resolvable spectrum at
    sqrt(eps_f32) ~ 3e-4 of lam_0 — far below `apply_nystrom_precond`'s
    1e-4 relative floor, so preconditioning quality is unaffected.

    `reduce_out_sharding` (gram path only): under an EXPLICIT-mode mesh
    (jax.make_mesh default), contractions over the sharded row axis are
    ambiguous and need the replicated output sharding spelled out — pass
    `PartitionSpec()`.

    Returns (U, lam): U (m, rank) orthonormal, lam (rank,) >= 0
    descending.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    # All small matmuls at HIGHEST: on TPU the default bf16 passes perturb
    # the r x r Gram enough to make it indefinite (NaN factorizations).
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    reduce_kw = ({} if reduce_out_sharding is None
                 else {"out_sharding": reduce_out_sharding})
    tiny = jnp.finfo(jnp.float32).tiny
    omega = jax.random.normal(key, (m, rank), jnp.float32)
    if method == "svd":
        omega, _ = jnp.linalg.qr(omega)
    sketch = matvec(omega)                                  # K @ Omega
    # Stabilizing shift at the float32 noise scale of the sketch.
    nu = jnp.sqrt(jnp.asarray(m, jnp.float32)) * jnp.finfo(jnp.float32).eps \
        * jnp.linalg.norm(sketch)
    sketch_nu = sketch + nu * omega
    gram = mm(omega.T, sketch_nu, **reduce_kw)
    gram = 0.5 * (gram + gram.T)
    # eigh-based inverse square root instead of Cholesky: tolerates the
    # residual indefiniteness a float32 Gram can carry.  (The Nyström
    # formula K_hat = S (Omega^T S)^-1 S^T needs no orthonormal Omega,
    # so the gram path's skipped QR only affects conditioning.)
    w, v = jnp.linalg.eigh(gram)
    w = jnp.maximum(w, tiny)
    half = mm(sketch_nu, v / jnp.sqrt(w)[None, :])          # (m, rank)
    if method == "svd":
        u, s, _ = jnp.linalg.svd(half, full_matrices=False)
        lam = jnp.maximum(s * s - nu, 0.0)
        return u, lam
    # Gram route: half = U diag(s) V^T  =>  half^T half = V s^2 V^T.
    g2 = mm(half.T, half, **reduce_kw)
    g2 = 0.5 * (g2 + g2.T)
    s2, v2 = jnp.linalg.eigh(g2)                            # ascending
    # Clamp RELATIVE to the spectrum, not to float32 tiny: an eigenvalue
    # at numerical zero (rank above the sketch's numerical rank) divided
    # under sqrt at the ~1e-38 absolute floor would produce a garbage
    # O(1e19) column in U that corrupts the preconditioner apply.  At
    # eps_f32 * lam_max the column stays bounded and the corresponding
    # direction degrades to (scaled) noise the rel_floor in
    # `apply_nystrom_precond` already tolerates.
    s2 = jnp.maximum(s2, jnp.maximum(
        jnp.finfo(jnp.float32).eps * s2[-1], tiny))
    u = mm(half, v2 / jnp.sqrt(s2)[None, :])
    u = u[:, ::-1]                                          # descending
    lam = jnp.maximum(s2[::-1] - nu, 0.0)
    return u, lam


def _nystrom_apply(u, lam, v, reduce_kw, rel_floor: float = 1e-4):
    """Shared P^-1 math; `reduce_kw` carries the out_sharding for the
    row-axis contraction when u/v are sharded under an explicit-mode
    mesh (parallel/sharded.py ShardedNystromApply)."""
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    lam_r = jnp.maximum(
        jnp.maximum(lam[-1], rel_floor * lam[0]),
        jnp.finfo(jnp.float32).tiny)
    lam_safe = jnp.maximum(lam, lam_r)
    utv = mm(u.T, v, **reduce_kw)
    return mm(u, (lam_r / lam_safe)[:, None] * utv) + (v - mm(u, utv))


def apply_nystrom_precond(u, lam, v, *, rel_floor: float = 1e-4):
    """P^-1 v for P = U diag(max(lam, floor)) U^T + floor (I - U U^T).

    With mu = 0 (unregularized solve), the preconditioned operator's top
    spectrum is flattened to the floor level, collapsing CG's iteration
    count when the kernel spectrum decays fast.  The floor is
    max(lam_r, rel_floor * lam_0): for spectra that decay below float32
    resolution (Gaussian kernels), trailing near-zero Nyström eigenvalues
    would otherwise make the scale ratios astronomically large and PCG
    diverge — below the floor the preconditioner smoothly degrades to the
    identity.
    """
    return _nystrom_apply(u, lam, v, {}, rel_floor)


def f64_residual_matvec(y, *, kernel_name: str):
    """Float64 HOST matvec v -> K v for iterative refinement.

    Uses the in-tree OpenMP C++ oracle when built (native/kmb_native.cpp,
    the same code that generates dataset ground truth) and falls back to
    the blocked NumPy oracle.  Both stream K in row slabs — O(M) memory —
    and both mask the inverse-distance diagonal exactly like the
    reference oracle (bruteforce.py:8-15).
    """
    y64 = np.ascontiguousarray(np.asarray(y), dtype=np.float64)

    def matvec(v):
        v64 = np.ascontiguousarray(np.asarray(v), dtype=np.float64)
        from kmb_tpu import native
        if native.is_available():
            return native.native_kernel_product(
                kernel=kernel_name, source_points=y64, source_signal=v64)
        from kmb_tpu.algorithms.bruteforce_numpy import (
            blocked_kernel_product)
        return blocked_kernel_product(
            kernel=kernel_name, source_points=y64, source_signal=v64)

    return matvec


def ir_solve(y, rhs, *, kernel_name: str, precision: str = "float32",
             tol: float = 1e-9, max_iters: int = 1000,
             inner_tol: float = 1e-5, refine_iters: int = 3,
             matvec: Optional[Callable] = None,
             precond: Optional[Callable] = None,
             indefinite_method: str = "auto",
             residual_matvec: Optional[Callable] = None,
             inner_solve: Optional[Callable] = None):
    """Mixed-precision iterative-refinement solve of K b = rhs.

    The SURVEY §7 "mixed-precision CG" plan: the outer loop keeps the
    iterate and TRUE residual in float64 on the host (residual matvec =
    the float64 native/NumPy oracle, `f64_residual_matvec`), while each
    correction K δ = r is solved in float32 on the TPU by the matrix-free
    Krylov engine (`cg_solve`, reusing one preconditioner across all
    outer iterations).  Classic Wilkinson refinement: each outer
    iteration contracts the residual by ~max(inner_tol, κ(K)·eps_f32),
    pushing far below the ~1e-4–1e-5 float32 CG floor toward the
    reference's float64 LAPACK accuracy (bruteforce.py:205-207) at
    streaming-TPU scale, where a dense f64 factorization cannot even
    store K.

    The correction rhs is rescaled to unit column norm before the f32
    inner solve (the residual shrinks by orders of magnitude per outer
    iteration; rescaling keeps the inner solver in well-scaled f32).

    `inner_solve` overrides the default `cg_solve` correction solver: a
    callable (M, E) f32 rhs -> (delta, iterations, residual).  This is
    how the BLR-accelerated solver refines past its compression floor —
    inner iterations ride the cheap compressed matvec while the outer
    float64 residual is exact (the H-matrix + refinement combination
    Htool's ecosystem never wired into the reference, htool.py:106-132).

    Returns:
        (b, info): b float64 (M, E); info dict with outer/inner iteration
        counts and the float64 relative-residual history.
    """
    if residual_matvec is None:
        residual_matvec = f64_residual_matvec(y, kernel_name=kernel_name)
    rhs64 = np.ascontiguousarray(np.asarray(rhs), dtype=np.float64)
    rhs_norms = np.linalg.norm(rhs64, axis=0)
    rhs_norms = np.maximum(rhs_norms, np.finfo(np.float64).tiny)
    b64 = np.zeros_like(rhs64)
    r64 = rhs64.copy()
    history = []
    total_inner = 0
    rel = float(np.max(np.linalg.norm(r64, axis=0) / rhs_norms))
    for _ in range(int(refine_iters)):
        if rel <= tol:
            break
        scale = float(np.max(np.linalg.norm(r64, axis=0)))
        if scale == 0.0:
            break
        r_scaled = jnp.asarray(r64 / scale, jnp.float32)
        if inner_solve is not None:
            delta, inner_iters, _ = inner_solve(r_scaled)
        else:
            delta, inner_iters, _ = cg_solve(
                y, r_scaled, kernel_name=kernel_name, precision=precision,
                tol=inner_tol, max_iters=max_iters, matvec=matvec,
                precond=precond, indefinite_method=indefinite_method)
        total_inner += int(inner_iters)
        b_new = b64 + np.asarray(delta, dtype=np.float64) * scale
        r_new = rhs64 - residual_matvec(b_new)
        rel_new = float(np.max(np.linalg.norm(r_new, axis=0) / rhs_norms))
        if rel_new >= rel:
            # Refinement floor reached (κ·eps_f32 ≥ 1 territory): keep
            # the best iterate rather than drift.  rel is initialized
            # from the raw rhs, so this also guards the FIRST
            # correction — a diverging inner solve never replaces the
            # best iterate, even on outer pass 1.
            history.append(rel_new)
            break
        b64, r64, rel = b_new, r_new, rel_new
        history.append(rel)
    return b64, {
        "outer_iterations": len(history),
        "inner_iterations": total_inner,
        "relative_residual": rel,
        "history": history,
    }


def cg_solve(y, rhs, *, kernel_name: str, precision: str = "float32",
             tol: float = 1e-6, max_iters: int = 1000,
             matvec: Optional[Callable] = None,
             precond: Optional[Callable] = None,
             indefinite_method: str = "auto"):
    """Matrix-free (preconditioned) Krylov solve of K b = rhs.

    For SPD kernels, (preconditioned) CG on K.  For indefinite kernels
    (inverse-distance), MINRES directly on the symmetric K — one matvec
    per iteration at condition kappa(K), against CG on the normal
    equations (two matvecs per iteration on K² at kappa²), available as
    indefinite_method="normal".  The "auto" default keeps the
    historical routing: MINRES when unpreconditioned, normal equations
    when a preconditioner is supplied (assumed to be the K²-flavored
    Nyström factors).  indefinite_method="minres" WITH a precond runs
    preconditioned MINRES — the precond must then be an SPD M⁻¹ of K
    itself, e.g. the spectral block_jacobi_preconditioner.
    `precond` applies M^-1 of the operator actually iterated on.

    Returns:
        (b, iterations, relative_residual) — the residual is relative to
        the operator iterated on (K for MINRES, with one true-residual
        check; K² b = K rhs for the normal-equations path).
    """
    if matvec is None:
        matvec = _default_matvec(y, kernel_name=kernel_name,
                                 precision=precision)
    precond_fn, precond_args = _split_static(precond)
    # The matvec gets the same static/dynamic split as the precond: a
    # functools.partial over large device arrays (e.g. the BLR factor
    # tiers, BlrOperator.matvec_partial) travels as runtime args instead
    # of being baked into the lowered module as constants.
    matvec_fn, matvec_args = _split_static(matvec)
    if kernel_name in SPD_KERNELS:
        return _pcg(matvec_fn, rhs, tol, max_iters, precond=precond_fn,
                    precond_args=precond_args, matvec_args=matvec_args)

    if indefinite_method == "auto":
        # Historical default: MINRES when unpreconditioned; a supplied
        # preconditioner is assumed to be the K²-flavored Nyström factors
        # and routes to the normal equations.
        indefinite_method = "minres" if precond is None else "normal"
    if indefinite_method == "minres":
        # Preconditioned MINRES on K directly; `precond` (if any) must
        # apply an SPD M⁻¹ of K itself — e.g. the block spectral-
        # absolute-value preconditioner.  A K²-flavored preconditioner
        # (Nyström on the normal equations) belongs to
        # indefinite_method="normal" instead.
        return _minres(matvec_fn, jnp.asarray(rhs, jnp.float32), tol,
                       max_iters, precond=precond_fn,
                       precond_args=precond_args, matvec_args=matvec_args)
    k_rhs = matvec(rhs.astype(jnp.float32))
    # Same static/dynamic split as the MINRES route above: the K² wrap
    # forwards `matvec_args` to the inner matvec, so a partial-over-
    # arrays matvec reaching this path stays within the payload cap.
    return _pcg(NormalEquationsOp(matvec_fn), k_rhs, tol, max_iters,
                precond=precond_fn, precond_args=precond_args,
                matvec_args=matvec_args)
