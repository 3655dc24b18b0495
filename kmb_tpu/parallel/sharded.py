"""Sharded kernel products and solves over a jax.sharding.Mesh.

The reference has no distributed compute at all (SURVEY.md §2.5: its
"parallelism" is BLAS threading plus a serial experiment queue); this module
is the new first-class capability.  The design follows the standard TPU
recipe: pick a mesh, shard with PartitionSpecs inside shard_map, and let
XLA schedule the collectives over ICI.

Schedules:

- "allpairs" (2-D mesh (tgt, src)): targets are data-parallel on one axis,
  sources on the other.  Every device computes the deferred combination
  state for its (target-shard x source-shard) block with the local engine
  (Pallas on TPU, blocked XLA on CPU meshes), then source-axis psum / the
  exact flash-state merge produce the full rows.  One collective per call;
  peak memory O(N/pt + M/ps) per device.

- "ring" (1-D mesh): targets, sources and signal are all sharded on one
  axis; (y, b) shards rotate around the ring with lax.ppermute while each
  device folds the visiting chunk into its running combination state —
  ring attention generalized to any kernel (and to the plain product /
  CG matvec).  Peak memory O((N + M)/p) per device; communication is
  neighbor-only and overlaps with compute.

Both schedules reuse the engines' deferred state + global-offset contract
(ops/product.py), so singular-kernel diagonal masking and row
normalization stay exact under any sharding.

The distributed CG solver builds its matvec from the ring schedule: kernel
row partial sums ride the ring, and CG's dot products are computed on the
sharded global arrays where XLA inserts the psums automatically.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kmb_tpu.ops.kernels import get_kernel
from kmb_tpu.ops.product import FLASH_NEG_INF, _ceil_to, kernel_matvec
from kmb_tpu.ops.solve import (
    SPD_KERNELS, NormalEquationsOp, _minres, _nystrom_apply, _pcg,
    _split_static, nystrom_preconditioner)


def make_mesh(shape=None, axis_names=None, devices=None) -> Mesh:
    """Create a device mesh.

    Defaults to a 1-D mesh over all local devices with axis "shard".
    Pass shape=(pt, ps), axis_names=("tgt", "src") for the 2-D all-pairs
    layout.
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    if axis_names is None:
        axis_names = ("shard",) if len(shape) == 1 else ("tgt", "src")
    return jax.make_mesh(tuple(shape), tuple(axis_names),
                         devices=np.asarray(devices))


def _slice_rows(arr, n, mesh=None):
    """Slice away global padding rows of a sharded result.

    A mid-shard slice isn't expressible as a sharded op, so gather the
    (small, N x E) output to replicated layout first, then slice.
    """
    if arr.shape[0] == n:
        return arr
    if mesh is not None:
        arr = jax.jit(
            lambda a: a,
            out_shardings=NamedSharding(mesh, P()))(arr)
    return arr[:n]


def _pad_rows(arr, target):
    if arr.shape[0] == target:
        return arr
    return jnp.pad(arr, [(0, target - arr.shape[0])] + [(0, 0)] *
                   (arr.ndim - 1))


# -- deferred-state algebra ---------------------------------------------------

def merge_flash_states(a, b):
    """Exactly merge two flash (acc, m, l) states over disjoint sources.

    States carry BASE-2 running-max logits (the engines run the online
    softmax entirely in exp2 — see kmb_tpu.ops.product), so rescaling
    uses exp2 here too.
    """
    acc_a, m_a, l_a = a
    acc_b, m_b, l_b = b
    m_new = jnp.maximum(m_a, m_b)
    sa = jnp.exp2(m_a - m_new)
    sb = jnp.exp2(m_b - m_new)
    return acc_a * sa + acc_b * sb, m_new, l_a * sa + l_b * sb


def combine_flash_psum(state, axis_name):
    """Merge flash states across a mesh axis via pmax + psum."""
    acc, m, l = state
    m_g = jax.lax.pmax(m, axis_name)
    scale = jnp.exp2(m - m_g)
    return (jax.lax.psum(acc * scale, axis_name), m_g,
            jax.lax.psum(l * scale, axis_name))


def _finalize(state, use_flash, normalize_rows, density_estimation):
    if use_flash:
        acc, _, l = state
        # Guard padded (fully-masked) rows where the normalizer is 0.
        return acc / jnp.where(l > 0.0, l, 1.0)
    num, den = state  # den is None for a plain product (engine contract)
    if density_estimation and not normalize_rows:
        return den if den is not None else num
    if normalize_rows:
        return num / den
    return num


def _merge_direct(a, b):
    """Sum two deferred (num, den) states; den may be None on both."""
    return (a[0] + b[0], None if a[1] is None else a[1] + b[1])


# -- all-pairs schedule (2-D mesh, psum over the source axis) -----------------

def allpairs_kernel_matvec(x, y, b, *, mesh: Mesh, kernel_name: str,
                           normalize_rows: bool = False,
                           density_estimation: bool = False,
                           precision: str = "float32",
                           block_n=None, block_m=None):
    """Sharded product on a 2-D (tgt, src) mesh with one psum."""
    spec = get_kernel(kernel_name)
    tgt, src = mesh.axis_names
    pt, ps = mesh.shape[tgt], mesh.shape[src]
    n, m = x.shape[0], y.shape[0]
    if density_estimation and normalize_rows:
        return jnp.ones((n, 1), dtype=jnp.float32)
    if b is None:
        b = jnp.ones((m, 1), dtype=jnp.float32)
    e = b.shape[1]

    n_pad = _ceil_to(n, pt * 8)
    m_pad = _ceil_to(m, ps * 8)
    x = _pad_rows(jnp.asarray(x, jnp.float32), n_pad)
    y = _pad_rows(jnp.asarray(y, jnp.float32), m_pad)
    b = _pad_rows(jnp.asarray(b, jnp.float32), m_pad)
    local_n, local_m = n_pad // pt, m_pad // ps
    use_flash = normalize_rows and spec.log_fn is not None

    fn = _allpairs_jit(
        mesh, tgt, src, kernel_name, normalize_rows, density_estimation,
        precision, block_n, block_m, local_n, local_m, n, m, use_flash,
        n_pad == n, m_pad == m)
    out = fn(x, y, b)
    return _slice_rows(out, n, mesh)


@functools.lru_cache(maxsize=256)
def _allpairs_jit(mesh, tgt, src, kernel_name, normalize_rows,
                  density_estimation, precision, block_n, block_m,
                  local_n, local_m, n, m, use_flash, rows_aligned,
                  cols_aligned):
    """Cached jitted all-pairs program.

    `jax.jit` caches by function identity; building the shard_map wrapper
    inline would retrace (and re-hash the whole Pallas program) on every
    call, a ~seconds-scale constant cost at north-star sizes.  Keying on
    the static parameters restores proper caching.
    """

    def shard_fn(xs, ys, bs):
        ti = jax.lax.axis_index(tgt)
        si = jax.lax.axis_index(src)
        state = kernel_matvec(
            xs, ys, bs, kernel_name=kernel_name,
            normalize_rows=normalize_rows,
            density_estimation=density_estimation,
            precision=precision, block_n=block_n, block_m=block_m,
            deferred=True,
            row_offset=ti * local_n, col_offset=si * local_m,
            col_limit=m, row_limit=n,
            # Mask-elision promises (see kernel_matvec_pallas): with no
            # global padding, row/col limits can never clip a real local
            # row/column on any shard.
            rows_aligned=rows_aligned, cols_aligned=cols_aligned)
        if use_flash:
            state = combine_flash_psum(state, src)
        else:
            state = tuple(None if s is None else jax.lax.psum(s, src)
                          for s in state)
        return _finalize(state, use_flash, normalize_rows,
                         density_estimation)

    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(tgt, None), P(src, None), P(src, None)),
        out_specs=P(tgt, None),
        # Pallas outputs carry no varying-mesh-axes metadata, so the vma
        # checker cannot see through them; correctness is covered by the
        # CPU-mesh oracle tests.
        check_vma=False,
    ))


# -- ring schedule (1-D mesh, ppermute) ---------------------------------------

def _ring_shard_fn(xs, ys, bs, *, axis, kernel_name, normalize_rows,
                   density_estimation, precision, block_n, block_m,
                   local_n, local_m, m_global, n_global, e_width,
                   use_flash, rows_aligned, cols_aligned):
    p = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    row_off = me * local_n
    perm = [(i, (i + 1) % p) for i in range(p)]
    needs_den = normalize_rows or density_estimation  # b is explicit here

    def compute(s, y_cur, b_cur):
        owner = jax.lax.rem(me - s + p, p)   # whose chunk we hold now
        return kernel_matvec(
            xs, y_cur, b_cur, kernel_name=kernel_name,
            normalize_rows=normalize_rows,
            density_estimation=density_estimation,
            precision=precision, block_n=block_n, block_m=block_m,
            deferred=True,
            row_offset=row_off, col_offset=owner * local_m,
            col_limit=m_global, row_limit=n_global,
            rows_aligned=rows_aligned, cols_aligned=cols_aligned)

    if p == 1:
        # Degenerate ring: one chunk, no rotation, no merge — identical
        # compute to the direct engine (the single-chip overhead target).
        state = compute(0, ys, bs)
        return _finalize(state, use_flash, normalize_rows,
                         density_estimation)

    if use_flash:
        init = (jnp.zeros((local_n, e_width), jnp.float32),
                jnp.full((local_n, 1), FLASH_NEG_INF, jnp.float32),
                jnp.zeros((local_n, 1), jnp.float32))
    else:
        init = (jnp.zeros((local_n, e_width), jnp.float32),
                jnp.zeros((local_n, 1), jnp.float32) if needs_den else None)
    # Constants are axis-invariant; the loop carry becomes device-varying
    # after the first step, so mark the initial state varying too.
    init = jax.tree.map(
        lambda a: jax.lax.pcast(a, (axis,), to="varying"), init)

    def step(s, carry):
        state, y_cur, b_cur = carry
        # Issue the rotation FIRST: collective-permute-start depends only
        # on (y_cur, b_cur), never on the chunk compute below, so XLA's
        # latency-hiding scheduler overlaps the ICI transfer with the
        # whole Pallas chunk — double buffering without explicit
        # async_remote_copy plumbing.
        y_next = jax.lax.ppermute(y_cur, axis, perm)
        b_next = jax.lax.ppermute(b_cur, axis, perm)
        part = compute(s, y_cur, b_cur)
        if use_flash:
            state = merge_flash_states(state, part)
        else:
            state = _merge_direct(state, part)
        return state, y_next, b_next

    # Only p-1 rotations are needed: the last visiting chunk is consumed
    # without being forwarded (the step's final ppermute would be dead
    # ICI traffic).
    state, y_last, b_last = jax.lax.fori_loop(0, p - 1, step, (init, ys, bs))
    part = compute(p - 1, y_last, b_last)
    state = (merge_flash_states(state, part) if use_flash
             else _merge_direct(state, part))
    return _finalize(state, use_flash, normalize_rows, density_estimation)


def ring_kernel_matvec(x, y, b, *, mesh: Mesh, kernel_name: str,
                       normalize_rows: bool = False,
                       density_estimation: bool = False,
                       precision: str = "float32",
                       block_n=None, block_m=None,
                       axis: Optional[str] = None,
                       keep_padded: bool = False,
                       n_valid: Optional[int] = None,
                       m_valid: Optional[int] = None):
    """Ring-scheduled product on a 1-D mesh (ring attention, generalized).

    x, y, b are all sharded on the same axis; (y, b) rotate around the ICI
    ring while each device folds the visiting source chunk into its
    combination state.  n and m may differ.

    n_valid / m_valid override the row/column validity bounds when the
    caller passes already-padded arrays (e.g. CG iterating in padded
    space); keep_padded returns the padded sharded output unsliced.
    """
    spec = get_kernel(kernel_name)
    axis = axis or mesh.axis_names[0]
    p = mesh.shape[axis]
    n = n_valid if n_valid is not None else x.shape[0]
    m = m_valid if m_valid is not None else y.shape[0]
    if density_estimation and normalize_rows:
        return jnp.ones((n, 1), dtype=jnp.float32)
    if b is None:
        b = jnp.ones((m, 1), dtype=jnp.float32)
    e = b.shape[1]

    n_pad = _ceil_to(x.shape[0], p * 8)
    m_pad = _ceil_to(y.shape[0], p * 8)
    x = _pad_rows(jnp.asarray(x, jnp.float32), n_pad)
    y = _pad_rows(jnp.asarray(y, jnp.float32), m_pad)
    b = _pad_rows(jnp.asarray(b, jnp.float32), m_pad)
    local_n, local_m = n_pad // p, m_pad // p
    use_flash = normalize_rows and spec.log_fn is not None

    fn = _ring_jit(
        mesh, axis, kernel_name, normalize_rows, density_estimation,
        precision, block_n, block_m, local_n, local_m, m, n, e,
        use_flash, n_pad == n, m_pad == m)
    out = fn(x, y, b)
    if keep_padded:
        return out
    return _slice_rows(out, n, mesh)


@functools.lru_cache(maxsize=256)
def _ring_jit(mesh, axis, kernel_name, normalize_rows, density_estimation,
              precision, block_n, block_m, local_n, local_m, m_global,
              n_global, e_width, use_flash, rows_aligned, cols_aligned):
    """Cached jitted ring program (see `_allpairs_jit` for the rationale:
    a fresh jit wrapper per call would retrace every time)."""
    shard_fn = functools.partial(
        _ring_shard_fn, axis=axis, kernel_name=kernel_name,
        normalize_rows=normalize_rows,
        density_estimation=density_estimation, precision=precision,
        block_n=block_n, block_m=block_m, local_n=local_n,
        local_m=local_m, m_global=m_global, n_global=n_global,
        e_width=e_width, use_flash=use_flash,
        rows_aligned=rows_aligned, cols_aligned=cols_aligned)
    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False,
    ))


def sharded_kernel_matvec(x, y, b, *, mesh: Mesh, schedule="auto", **kwargs):
    """Dispatch on mesh shape: 2-D -> all-pairs psum, 1-D -> ring."""
    if schedule == "auto":
        schedule = "allpairs" if len(mesh.shape) == 2 else "ring"
    if schedule == "allpairs":
        return allpairs_kernel_matvec(x, y, b, mesh=mesh, **kwargs)
    if schedule == "ring":
        return ring_kernel_matvec(x, y, b, mesh=mesh, **kwargs)
    raise ValueError(f"Unknown schedule {schedule!r}.")


# -- distributed CG ------------------------------------------------------------

class RingMatvec:
    """Stable callable: ring-scheduled K @ v on pre-padded sharded data.

    Built once per (points, mesh, kernel) via `prepare_sharded_cg`; its
    stability lets the jitted CG loop (`_pcg`, static matvec) cache
    across repeated solves instead of retracing inside the timed query.
    """

    def __init__(self, y_pad, *, mesh, kernel_name, precision, m):
        self.y_pad = y_pad
        self.mesh = mesh
        self.kernel_name = kernel_name
        self.precision = precision
        self.m = m

    def __call__(self, v):
        return ring_kernel_matvec(
            self.y_pad, self.y_pad, v, mesh=self.mesh,
            kernel_name=self.kernel_name, precision=self.precision,
            keep_padded=True, n_valid=self.m, m_valid=self.m)


def prepare_sharded_cg(y, *, mesh: Mesh, kernel_name: str,
                       precision: str = "float32", precond_rank: int = 0):
    """Shard + pad the source points and build the stable CG matvec.

    With `precond_rank > 0`, also builds the Nyström preconditioner from
    the RING matvec itself — the sketch is `rank` sharded kernel matvecs
    fused into one ring pass, and the resulting (m_pad, rank) factors
    live as ordinary device arrays that XLA reshards into the CG loop
    (the preconditioner apply is two tall-skinny matmuls whose row
    dimension follows the iterate's sharding).  Same routing as the
    single-chip solver (ops/solve.py cg_solve): the sketch operator is K
    for SPD kernels and K² (normal equations) for the indefinite
    inverse-distance kernel.  Padded rows: K's pad rows/cols are masked
    to zero, so the sketch — and hence U — has zero pad rows, and the
    identity leg of the preconditioner passes pad rows through; pad
    residual rows start zero and stay zero, exactly as without
    preconditioning.
    """
    axis = mesh.axis_names[0]
    p = mesh.shape[axis]
    m = y.shape[0]
    m_pad = _ceil_to(m, p * 8)
    sharding = NamedSharding(mesh, P(axis, None))
    # Padded rows/cols of K are masked to exactly zero (row_limit /
    # col_limit), so CG in padded space iterates identically to the
    # unpadded problem: padded residual rows start and stay zero.
    y_pad = jax.device_put(
        _pad_rows(jnp.asarray(y, jnp.float32), m_pad), sharding)
    matvec = RingMatvec(y_pad, mesh=mesh, kernel_name=kernel_name,
                        precision=precision, m=m)
    prepared = (matvec, sharding, m_pad, None)
    if precond_rank > 0:
        prepared = build_sharded_precond(
            prepared, kernel_name=kernel_name, precond_rank=precond_rank)
    return prepared


class ShardedNystromApply:
    """Nyström P⁻¹ apply with explicit-mode-safe contractions.

    `jax.make_mesh` produces EXPLICIT-mode meshes: contracting the
    sharded row axis of (m, rank) U against the sharded iterate is
    ambiguous to the type system, so the (rank, E) product must request
    a replicated output sharding.  A class (rather than a closure) so
    `_pcg`'s static-precond jit cache hits across solves: hash/eq are
    by mesh + floor, and the factor arrays travel as dynamic args via
    `functools.partial(instance, u, lam)` (ops/solve.py _split_static).
    """

    def __init__(self, mesh: Mesh, rel_floor: float = 1e-4):
        self.mesh = mesh
        self.rel_floor = float(rel_floor)

    def __call__(self, u, lam, v):
        reduce_kw = {"out_sharding": NamedSharding(self.mesh, P())}
        return _nystrom_apply(u, lam, v, reduce_kw, self.rel_floor)

    def __hash__(self):
        return hash(("sharded-nystrom-apply", self.mesh, self.rel_floor))

    def __eq__(self, other):
        return (isinstance(other, ShardedNystromApply)
                and self.mesh == other.mesh
                and self.rel_floor == other.rel_floor)


def build_sharded_precond(prepared, *, kernel_name: str, precond_rank: int):
    """Attach Nyström factors (built from the ring matvec) to `prepared`.

    Split from `prepare_sharded_cg` so the harness wrapper can stage the
    sharded points untimed and run the preconditioner build inside the
    TIMED `fit`, matching the single-chip solver's phase accounting.
    """
    matvec, sharding, m_pad, _ = prepared
    rank = min(int(precond_rank), matvec.m)
    op = (matvec if kernel_name in SPD_KERNELS
          else NormalEquationsOp(matvec))
    # method="gram": the build stays fully sharded — tall-skinny matmuls
    # + (rank, rank) eighs, no tall QR/SVD (which reject sharded
    # operands).  The factors inherit the iterate's row sharding; the
    # explicit-mode mesh needs the replicated Gram output spelled out.
    u, lam = nystrom_preconditioner(
        op, m_pad, rank, method="gram",
        reduce_out_sharding=NamedSharding(matvec.mesh, P()))
    precond = functools.partial(ShardedNystromApply(matvec.mesh), u, lam)
    return matvec, sharding, m_pad, precond


def sharded_cg_solve(y, rhs, *, mesh: Mesh, kernel_name: str,
                     precision: str = "float32", tol: float = 1e-6,
                     max_iters: int = 1000, schedule: str = "ring",
                     precond_rank: int = 0, prepared=None):
    """Matrix-free (preconditioned) CG whose matvec is the sharded
    kernel product.

    The iteration state lives as sharded global arrays; dot products are
    global reductions XLA lowers to psums over the mesh.  Iteration counts
    are deterministic and identical to the single-chip solver because the
    matvec is numerically identical (same tiles, same masks).

    `precond_rank > 0` enables the Nyström preconditioner built from the
    ring matvec (see `prepare_sharded_cg`): the same spectral
    preconditioning the single-chip solver demonstrates (1.3–1.6×), now
    psum-compatible — the apply is two (m, rank) matmuls on the sharded
    iterate.  For the indefinite inverse-distance kernel the
    preconditioned path routes to CG on the NORMAL equations with the
    K²-flavored factors, mirroring ops/solve.py cg_solve's "auto".

    `prepared` (from `prepare_sharded_cg`) reuses the sharded points,
    the stable matvec, and the preconditioner factors across repeated
    solves — required for the jit cache of the CG loop to hit on runs
    after the first.
    """
    del schedule  # the ring schedule is the memory-scalable CG matvec
    m = y.shape[0]
    if prepared is None:
        prepared = prepare_sharded_cg(
            y, mesh=mesh, kernel_name=kernel_name, precision=precision,
            precond_rank=precond_rank)
    matvec, sharding, m_pad, precond = prepared
    precond_fn, precond_args = _split_static(precond)
    rhs_pad = jax.device_put(
        _pad_rows(jnp.asarray(rhs, jnp.float32), m_pad), sharding)

    if kernel_name in SPD_KERNELS:
        b, iters, residual = _pcg(matvec, rhs_pad, tol, max_iters,
                                  precond=precond_fn,
                                  precond_args=precond_args)
    elif precond is not None:
        # Indefinite + Nyström factors (K²-flavored): normal equations,
        # like the single-chip "auto" routing.
        k_rhs = matvec(rhs_pad)
        b, iters, residual = _pcg(NormalEquationsOp(matvec), k_rhs, tol,
                                  max_iters, precond=precond_fn,
                                  precond_args=precond_args)
    else:
        # Symmetric indefinite (inverse-distance): MINRES on K directly,
        # same choice as the single-chip solver (ops/solve.py cg_solve).
        # Padded rows of K and rhs are exactly zero, so norms/inner
        # products over the padded arrays equal the unpadded ones.
        b, iters, residual = _minres(matvec, rhs_pad, tol, max_iters)
    return _slice_rows(b, m, mesh), iters, residual
