"""Block-low-rank (BLR) kernel-matrix engine — the H-matrix slot, TPU-native.

The reference's only compressed/hierarchical method is the external Htool
C++ library (reference htool.py:15-165): a cluster tree over the points,
an admissibility condition that splits the (N, M) kernel matrix into
near-field blocks (kept dense) and far-field blocks (compressed to low
rank by partialACA), and a compressed matvec.  A pointer-chasing block
tree is the wrong shape for a TPU, so this module re-designs the idea
around static shapes and batched MXU work:

- **Clustering** (host, NumPy): recursive balanced bisection along the
  widest axis produces 2^L geometrically tight clusters of identical size
  `leaf` (short clusters are padded with duplicates of their own points —
  pads carry zero signal and are masked/dropped).  This replaces Htool's
  `build_clusters` (htool.py:106-115); equal-size leaves are what make
  every downstream step a single batched einsum.
- **Admissibility** (host): block pair (i, j) is far-field iff
  `dist(c_i, c_j) >= (r_i + r_j) / eta` — Htool's eta knob
  (htool.py:18-31) with the same monotonicity (bigger eta => more blocks
  compressed).  The pair lists are computed once at build time, so the
  jitted device programs see only static shapes.
- **Compression** (device, TIMED in `fit` like Htool's `build_HMatrix`,
  htool.py:117-132): every far-field (leaf, leaf) kernel tile is formed
  on the fly in VMEM-sized batches and compressed with one shared
  randomized range-finder: U = qr(K @ Omega), V = U^T K.  The batched
  tile-sketch-QR pipeline is pure MXU work, unlike sequential ACA pivot
  chasing.  Only the (leaf, rank) / (rank, leaf) factors are stored.
  Two accuracy knobs, matching Htool's (htool.py:18-31):
  * `rank` — fixed rank for every far block;
  * `epsilon` — Htool's adaptive knob: factors are rotated into
    per-block SVD form (batched eigh of the small V V^T Gram), each
    block keeps the smallest rank whose spectral tail satisfies
    ||K_p - U_p V_p||_F <= epsilon * ||K_p||_F, and blocks are bucketed
    into power-of-two rank *tiers* so the matvec stays a few batched
    static-shape einsums instead of per-block ragged work.
- **Matvec** (device): far-field is two batched skinny matmuls
  `U @ (V @ b_j)`; near-field tiles are *recomputed* on the fly (kernel
  tiles are MXU-cheap, and not storing them keeps HBM at
  O(P_far * leaf * rank) instead of O(P_near * leaf^2)).  Per-target-block
  contributions combine with one `segment_sum`.  Row normalization and
  density estimation use the reference's ones-column trick
  (bruteforce.py:140-150) with pad rows zeroed.

Supported kernels match Htool's list (htool.py:9-12): the squared-distance
family ("gaussian", "absolute-exponential", "inverse-distance").  The
dot-product attention kernel is rejected — Euclidean admissibility does
not bound its off-diagonal rank (the exact engines cover it).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from kmb_tpu.ops.kernels import get_kernel

BLR_KERNELS = ("gaussian", "absolute-exponential", "inverse-distance")

_CHUNK = 64  # far/near pairs processed per lax.map step (bounds VMEM/HBM)


# ---------------------------------------------------------------------------
# Host-side planning (cluster tree + admissibility)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BlrPlan:
    """Static geometry of one BLR operator (everything NumPy, host-side)."""

    leaf: int
    eta: float
    same_points: bool
    # Target-side blocking: gather_x[i, l] indexes the original x row whose
    # point occupies slot l of block i (pads duplicate a real row);
    # gid_x[i, l] is the original row id, or -1 for pads.
    gather_x: np.ndarray  # (Bx, leaf) int32
    gid_x: np.ndarray  # (Bx, leaf) int32
    # out_pos[t] = flattened (block, slot) position of original target t.
    out_pos: np.ndarray  # (n,) int64
    gather_y: np.ndarray  # (By, leaf) int32
    gid_y: np.ndarray  # (By, leaf) int32
    # Dense (i, j) block pairs applied forward only.  For same_points
    # operators these are just the diagonal blocks; the off-diagonal
    # near-field lives in near_sym_pairs (i < j), each tile computed once
    # per matvec and applied both as K_ij and K_ij^T (Htool's `symmetry`
    # knob, reference htool.py:44-52).
    near_pairs: np.ndarray  # (Pn, 2) int32
    near_sym_pairs: np.ndarray  # (Ps, 2) int32, i < j; empty if not symmetric
    # Compressed (i, j) block pairs.  For same_points only i < j pairs are
    # stored/compressed; the matvec applies the mirror V^T U^T for (j, i).
    far_pairs: np.ndarray  # (Pf, 2) int32

    @property
    def num_x_blocks(self) -> int:
        return self.gather_x.shape[0]

    @property
    def num_y_blocks(self) -> int:
        return self.gather_y.shape[0]


def _cluster(points: np.ndarray, leaf: int) -> Tuple[np.ndarray, np.ndarray]:
    """Balanced bisection into 2^L equal blocks of `leaf` slots.

    Returns (gather, gid), both (B, leaf) int32; pads duplicate the
    block's own first point and carry gid == -1.
    """
    n = points.shape[0]
    num_blocks = 1
    while num_blocks * leaf < n:
        num_blocks *= 2
    blocks = [np.arange(n, dtype=np.int64)]
    while len(blocks) < num_blocks:
        nxt = []
        for idx in blocks:
            pts = points[idx]
            axis = int(np.argmax(pts.max(axis=0) - pts.min(axis=0)))
            order = np.argsort(pts[:, axis], kind="stable")
            half = (len(idx) + 1) // 2
            nxt.append(idx[order[:half]])
            nxt.append(idx[order[half:]])
        blocks = nxt
    gather = np.zeros((num_blocks, leaf), dtype=np.int32)
    gid = np.full((num_blocks, leaf), -1, dtype=np.int32)
    for i, idx in enumerate(blocks):
        k = len(idx)
        assert 0 < k <= leaf
        gather[i, :k] = idx
        gid[i, :k] = idx
        gather[i, k:] = idx[0]  # pads sit on a real point of this block
    return gather, gid


def _centers_radii(points, gather, gid):
    """Per-block bounding centers and radii over the *real* points."""
    pts = points[gather]  # (B, leaf, D); pads duplicate real points
    del gid  # pads coincide with real points, so they never inflate radii
    lo, hi = pts.min(axis=1), pts.max(axis=1)
    centers = 0.5 * (lo + hi)
    radii = 0.5 * np.linalg.norm(hi - lo, axis=1)
    return centers, radii


def build_plan(x: np.ndarray, y: np.ndarray, *, leaf: int = 256,
               eta: float = 2.0, same_points: bool = False) -> BlrPlan:
    """Cluster both clouds and split block pairs by admissibility."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    gather_x, gid_x = _cluster(x, leaf)
    if same_points:
        gather_y, gid_y = gather_x, gid_x
    else:
        gather_y, gid_y = _cluster(y, leaf)

    cx, rx = _centers_radii(x, gather_x, gid_x)
    cy, ry = _centers_radii(y, gather_y, gid_y)
    dist = np.linalg.norm(cx[:, None, :] - cy[None, :, :], axis=2)
    admissible = dist * eta >= (rx[:, None] + ry[None, :])

    far = np.argwhere(admissible).astype(np.int32)
    near = np.argwhere(~admissible).astype(np.int32)
    if same_points:
        # Admissibility is symmetric (dist and radii are), so keep one
        # triangle: far factors are stored once and mirrored at matvec
        # time; off-diagonal near tiles are computed once and applied both
        # ways.  Diagonal blocks (i == j, never admissible: dist == 0)
        # stay in the forward-only near list.
        far = far[far[:, 0] < far[:, 1]]
        near_sym = near[near[:, 0] < near[:, 1]]
        near = near[near[:, 0] == near[:, 1]]
    else:
        near_sym = np.zeros((0, 2), dtype=np.int32)

    out_pos = np.empty(x.shape[0], dtype=np.int64)
    flat_gid = gid_x.reshape(-1)
    real = flat_gid >= 0
    out_pos[flat_gid[real]] = np.nonzero(real)[0]

    return BlrPlan(leaf=leaf, eta=float(eta), same_points=bool(same_points),
                   gather_x=gather_x, gid_x=gid_x, out_pos=out_pos,
                   gather_y=gather_y, gid_y=gid_y,
                   near_pairs=near, near_sym_pairs=near_sym, far_pairs=far)


def _pad_pairs(pairs: np.ndarray, num_x_blocks: int, chunk: int = _CHUNK):
    """Pad an (P, 2) pair list to a chunk multiple.

    Dummy pairs use block (0, 0) but scatter into segment `num_x_blocks`,
    an overflow bucket dropped after segment_sum.  Returns
    (i, j, seg_i, seg_j): seg_i scatters the forward application K_ij@b_j
    into target block i, seg_j the mirrored application K_ij^T@b_i into
    block j; both map dummy pairs to the overflow bucket.
    """
    p = pairs.shape[0]
    padded = max(chunk, ((p + chunk - 1) // chunk) * chunk)
    i = np.zeros(padded, dtype=np.int32)
    j = np.zeros(padded, dtype=np.int32)
    seg_i = np.full(padded, num_x_blocks, dtype=np.int32)
    seg_j = np.full(padded, num_x_blocks, dtype=np.int32)
    i[:p] = pairs[:, 0]
    j[:p] = pairs[:, 1]
    seg_i[:p] = pairs[:, 0]
    seg_j[:p] = pairs[:, 1]
    return (jnp.asarray(i), jnp.asarray(j),
            jnp.asarray(seg_i), jnp.asarray(seg_j))


# ---------------------------------------------------------------------------
# Device-side tiles, compression, matvec
# ---------------------------------------------------------------------------


def _kernel_tile(spec, xb, yb):
    """(leaf, leaf) float32 kernel values for one block pair (unmasked).

    For squared-distance kernels at small D the form is the unrolled
    difference sum (exact-f32, non-negative by construction): near-field
    tiles hold arbitrarily close point pairs, and the BLAS form
    |x|^2+|y|^2-2<x,y> cancels to <= 0 at f32 for pairs closer than
    ~sqrt(eps)*|x| — which turns the singular inverse-distance kernel
    into inf/NaN on REAL off-diagonal entries (observed at M=131072 in
    the unit cube, nearest pairs ~4e-4 apart).  Large D falls back to
    the BLAS form (the difference tensor would be (leaf, leaf, D))."""
    scale = jnp.float32(spec.point_scale)
    xb = xb * scale
    yb = yb * scale
    if spec.on == "dot":
        dots = xb @ yb.T
        form = -dots if spec.form_sign < 0 else dots
    elif xb.shape[1] <= 32:
        sqd = None
        for k in range(xb.shape[1]):
            diff = xb[:, k:k + 1] - yb[:, k:k + 1].T
            term = diff * diff
            sqd = term if sqd is None else sqd + term
        form = -sqd if spec.form_sign < 0 else sqd
    else:
        dots = xb @ yb.T
        xsq = jnp.sum(xb * xb, axis=1, keepdims=True)
        ysq = jnp.sum(yb * yb, axis=1, keepdims=True).T
        if spec.form_sign < 0:
            form = 2.0 * dots - xsq - ysq
        else:
            form = xsq + ysq - 2.0 * dots
    return spec.scaled_fn(form)


@functools.partial(jax.jit, static_argnames=("kernel_name", "rank", "seed"))
def compress_far_blocks(xpts, ypts, far_i, far_j, *, kernel_name: str,
                        rank: int, seed: int = 0):
    """Randomized range-finder factors for every far-field block pair.

    xpts/ypts: (B, leaf, D) blocked points.  Returns U (Pf, leaf, rank)
    and V (Pf, rank, leaf) with K_ij ~= U_p V_p.  One Gaussian test matrix
    is shared across blocks; each pair costs one (leaf, leaf) tile, one
    (leaf, rank) sketch, one thin QR, one (rank, leaf) projection — all
    batched over _CHUNK pairs so the MXU sees deep batched matmuls.

    (A Gram-eigh orthogonalization was tried instead of the thin QR —
    all-MXU, ~2.6x faster post-compile — but the Gram squares the
    spectrum and caps per-block sigma resolution at sqrt(eps_f32) ~
    3e-4, visibly degrading rank >= 64 builds; thin QR keeps the
    f32-native resolution, and the dominant first-build cost is QDWH
    *compile* time, which the harness's best-of-N timing protocol
    already discards with run 1.)
    """
    spec = get_kernel(kernel_name)
    leaf = xpts.shape[1]
    omega = jax.random.normal(jax.random.PRNGKey(seed), (leaf, rank),
                              dtype=jnp.float32)

    def one(i, j):
        # HIGHEST precision on the sketch matmuls: the projection
        # q.T @ k_tile IS the stored V factor, and at the TPU's default
        # bf16-pass precision its ~1e-3 relative noise (a) pollutes the
        # compressed operator and (b) floors every block's sketch
        # spectrum near 1e-6*sigma1^2, so select_block_ranks at
        # epsilon <= 1e-4 retains FULL rank for every pair — 17 GB of
        # factors at M=131072/rank=64 where the true decay needs ~6.
        k_tile = _kernel_tile(spec, xpts[i], ypts[j])
        q, _ = jnp.linalg.qr(jnp.matmul(
            k_tile, omega, precision=jax.lax.Precision.HIGHEST))
        return q, jnp.matmul(q.T, k_tile,
                             precision=jax.lax.Precision.HIGHEST)

    def chunk_fn(pair_chunk):
        return jax.vmap(one)(pair_chunk[0], pair_chunk[1])

    num_chunks = far_i.shape[0] // _CHUNK
    u, v = jax.lax.map(
        chunk_fn,
        (far_i.reshape(num_chunks, _CHUNK), far_j.reshape(num_chunks, _CHUNK)),
    )
    return u.reshape(-1, leaf, rank), v.reshape(-1, rank, leaf)


@jax.jit
def _batched_gram(v):
    """(P, rank, leaf) factors -> (P, rank, rank) Grams V V^T."""
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    return mm(v, jnp.swapaxes(v, -1, -2))


@jax.jit
def _rotate_factors(u, v, rot):
    """Batched rotation into SVD form: U <- U R, V <- R^T V."""
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    return mm(u, rot), mm(jnp.swapaxes(rot, -1, -2), v)


def compress_far_blocks_svd(xpts, ypts, far_i, far_j, *, kernel_name: str,
                            rank: int, seed: int = 0):
    """Range-finder factors rotated into per-block SVD form.

    Same batched sketch-QR as `compress_far_blocks`, followed by an
    eigendecomposition of the small (rank, rank) Gram V V^T: with
    V = W diag(s^2)^(1/2) ... the rotation U <- U W, V <- W^T V orders
    each block's factor rows by decreasing singular value, so truncating
    to the first r rows/columns IS the best rank-r approximation the
    sketch supports.  Returns (U, V, sv2) with sv2 (Pf, rank) the
    squared singular values, descending.

    Work split (device vs host): every O(leaf)-sized operation — kernel
    tiles, sketches, thin QRs, the Grams, the factor rotations — runs
    batched on the MXU; ONLY the tiny (rank, rank) symmetric
    eigendecompositions run on the host (stacked float64 LAPACK,
    milliseconds for thousands of blocks).  A device eigh here lowers
    to QDWH spectral divide-and-conquer whose COLD COMPILE is ~14
    minutes on a remote-compiled chip — it made every adaptive-epsilon
    build unusable inside benchmark budgets while contributing
    negligible runtime.  (select_block_ranks already pulls sv2 to the
    host, so this adds no new synchronization point.)
    """
    u, v = compress_far_blocks(xpts, ypts, far_i, far_j,
                               kernel_name=kernel_name, rank=rank,
                               seed=seed)
    gram = np.asarray(_batched_gram(v), dtype=np.float64)
    w, rot = np.linalg.eigh(gram)                   # ascending, stacked
    sv2 = np.maximum(w[:, ::-1], 0.0)               # descending sigma^2
    rot = np.ascontiguousarray(rot[:, :, ::-1], dtype=np.float32)
    u, v = _rotate_factors(u, v, jnp.asarray(rot))
    return u, v, jnp.asarray(sv2, dtype=jnp.float32)


def select_block_ranks(sv2: np.ndarray, epsilon: float) -> np.ndarray:
    """Per-block rank from the epsilon criterion (host-side, NumPy).

    Smallest r with ||K_p - (U_p V_p)[:r]||_F <= epsilon * ||K_p||_F,
    estimated from the sketch spectrum: residual^2 after keeping r
    components is total - cumsum(sv2)[r-1].  Blocks whose total energy
    is ~0 get rank 0 (dropped from the operator entirely).
    """
    sv2 = np.asarray(sv2, dtype=np.float64)
    total = sv2.sum(axis=1, keepdims=True)
    captured_needed = (1.0 - float(epsilon) ** 2) * total
    ranks = 1 + np.argmax(np.cumsum(sv2, axis=1) >= captured_needed - 1e-30,
                          axis=1)
    # argmax returns 0 when no prefix satisfies the bound -> full rank.
    satisfied = (np.cumsum(sv2, axis=1) >= captured_needed - 1e-30).any(axis=1)
    ranks = np.where(satisfied, ranks, sv2.shape[1])
    return np.where(total[:, 0] > 0.0, ranks, 0).astype(np.int64)


def _rank_tiers(ranks: np.ndarray, rank_max: int):
    """Bucket per-block ranks into power-of-two tiers (static shapes).

    Returns [(tier_rank, indices)] covering every block with rank >= 1;
    rank-0 blocks are dropped (their best approximation is zero).
    """
    tiers = []
    tier = 1
    levels = []
    while tier < rank_max:
        levels.append(tier)
        tier *= 2
    levels.append(rank_max)
    lo = 1
    for level in levels:
        idx = np.nonzero((ranks >= lo) & (ranks <= level))[0]
        if idx.size:
            tiers.append((level, idx.astype(np.int64)))
        lo = level + 1
    return tiers


@functools.partial(
    jax.jit,
    static_argnames=("kernel_name", "num_x_blocks", "mask_diagonal"))
def blr_matvec_blocks(xpts, ypts, gid_x, gid_y, far_groups, mirror_groups,
                      b_blocks, near, near_sym, *,
                      kernel_name: str, num_x_blocks: int,
                      mask_diagonal: bool):
    """Blocked BLR matvec: returns (num_x_blocks*leaf, E) in blocked order.

    b_blocks (By, leaf, E) must carry zeros in pad rows.  Near-field tiles
    are recomputed and masked (pad columns, and the global diagonal when
    `mask_diagonal`, matching reference bruteforce.py:8-15); far-field
    contributions are U @ (V @ b_j), one batched einsum per rank tier in
    `far_groups` (a tuple of (u, v, far_j, far_seg) quadruples).

    Symmetric (same_points) operators exploit K = K^T two ways (Htool's
    `symmetry`/`UPLO` knob, reference htool.py:44-52, done TPU-style):
    `mirror_groups` (gather_i, seg_j) — index arrays only, zipped
    tier-for-tier with `far_groups` for the factors — apply the stored
    i<j far factors transposed, V^T (U^T b_i) -> block j; `near_sym`
    (i, j, seg_i, seg_j) lists i<j near pairs whose tile is computed once
    and applied as both K_ij @ b_j and K_ij^T @ b_i.  `near` is the
    forward-only list (the diagonal blocks when symmetric; everything
    when not).  Pass near_sym=None (and mirror_groups=()) for the
    non-symmetric case.
    """
    spec = get_kernel(kernel_name)
    leaf = xpts.shape[1]
    e = b_blocks.shape[-1]

    def near_one(i, j):
        k_tile = _kernel_tile(spec, xpts[i], ypts[j])
        valid = (gid_y[j] >= 0)[None, :]
        if mask_diagonal:
            valid = jnp.logical_and(
                valid, gid_x[i][:, None] != gid_y[j][None, :])
        k_tile = jnp.where(valid, k_tile, 0.0)
        return k_tile @ b_blocks[j]

    def near_chunk(chunk):
        return jax.vmap(near_one)(chunk[0], chunk[1])

    near_i, near_j, near_seg, _ = near
    nc = near_i.shape[0] // _CHUNK
    near_out = jax.lax.map(
        near_chunk,
        (near_i.reshape(nc, _CHUNK), near_j.reshape(nc, _CHUNK)),
    ).reshape(-1, leaf, e)

    outs = [near_out]
    segs = [near_seg]

    if near_sym is not None:
        # i < j near tiles: one kernel tile, two masked applications.
        # Pad *rows* are zeroed too (the transposed application turns
        # them into columns that would otherwise hit real output rows).
        def sym_one(i, j):
            k_tile = _kernel_tile(spec, xpts[i], ypts[j])
            valid = jnp.logical_and((gid_x[i] >= 0)[:, None],
                                    (gid_y[j] >= 0)[None, :])
            if mask_diagonal:
                valid = jnp.logical_and(
                    valid, gid_x[i][:, None] != gid_y[j][None, :])
            k_tile = jnp.where(valid, k_tile, 0.0)
            return k_tile @ b_blocks[j], k_tile.T @ b_blocks[i]

        def sym_chunk(chunk):
            return jax.vmap(sym_one)(chunk[0], chunk[1])

        sym_i, sym_j, sym_seg_i, sym_seg_j = near_sym
        sc = sym_i.shape[0] // _CHUNK
        fwd, bwd = jax.lax.map(
            sym_chunk,
            (sym_i.reshape(sc, _CHUNK), sym_j.reshape(sc, _CHUNK)))
        outs += [fwd.reshape(-1, leaf, e), bwd.reshape(-1, leaf, e)]
        segs += [sym_seg_i, sym_seg_j]
    for u, v, far_j, far_seg in far_groups:
        outs.append(jnp.einsum(
            "plr,pre->ple", u,
            jnp.einsum("prl,ple->pre", v, b_blocks[far_j]),
            precision=jax.lax.Precision.HIGHEST))
        segs.append(far_seg)
    # Symmetric (same_points) operators store only the i < j factors and
    # apply each one twice: K_ji = K_ij^T ~= V^T U^T (Htool's `symmetry`
    # knob, reference htool.py:44-52, done TPU-style — same batched
    # einsums, transposed contraction).  mirror_groups carries only the
    # (gather_i, seg_j) index arrays; the factors are REUSED from the
    # matching far_groups tier.  Duplicating u/v as separate pytree
    # leaves doubles the jit argument footprint in the AOT compiler's
    # HBM accounting (duplicate leaves become distinct parameters), which
    # rejected programs whose real footprint fit: 15.46G "arguments" for
    # 7.73G of factors at M=131072, leaf=256, rank=32, eta=1.0.
    for (u, v, _fj, _fs), (gather, seg) in zip(far_groups, mirror_groups):
        t = jnp.einsum("plr,ple->pre", u, b_blocks[gather],
                       precision=jax.lax.Precision.HIGHEST)
        outs.append(jnp.einsum("prl,pre->ple", v, t,
                               precision=jax.lax.Precision.HIGHEST))
        segs.append(seg)

    out = jax.ops.segment_sum(
        jnp.concatenate(outs, axis=0),
        jnp.concatenate(segs, axis=0),
        num_segments=num_x_blocks + 1)
    return out[:num_x_blocks].reshape(num_x_blocks * leaf, e)


# ---------------------------------------------------------------------------
# High-level operator
# ---------------------------------------------------------------------------


class _BlrMatvecStatic:
    """Hashable static half of the BLR matvec for the jitted Krylov loops.

    Instances hash/compare by their (small, hashable) configuration, so
    `_pcg`/`_minres` jit caches hit across solves while the factor
    arrays arrive via the partial's dynamic args (ops/solve.py
    `_split_static` — the remote-compile payload cap makes closing over
    the factors a hard failure, not just a slowdown).
    """

    def __init__(self, kernel_name: str, num_x_blocks: int,
                 mask_diagonal: bool):
        self.kernel_name = kernel_name
        self.num_x_blocks = int(num_x_blocks)
        self.mask_diagonal = bool(mask_diagonal)

    def __call__(self, arrays, v):
        (gather_y, valid_y, out_pos, xpts, ypts, gid_x, gid_y,
         far_groups, mirror_groups, near, near_sym) = arrays
        blocked = jnp.asarray(v, jnp.float32)[gather_y]
        blocked = jnp.where(valid_y[:, :, None], blocked, 0.0)
        out = blr_matvec_blocks(
            xpts, ypts, gid_x, gid_y, far_groups, mirror_groups,
            blocked, near, near_sym, kernel_name=self.kernel_name,
            num_x_blocks=self.num_x_blocks,
            mask_diagonal=self.mask_diagonal)
        return out[out_pos]

    def __hash__(self):
        return hash(("blr-matvec", self.kernel_name, self.num_x_blocks,
                     self.mask_diagonal))

    def __eq__(self, other):
        return (isinstance(other, _BlrMatvecStatic)
                and self.kernel_name == other.kernel_name
                and self.num_x_blocks == other.num_x_blocks
                and self.mask_diagonal == other.mask_diagonal)


class BlrOperator:
    """Built BLR approximation of K(x, y): plan + device-side factors.

    `rank` alone: every far block stores fixed-rank factors.  With
    `epsilon` set, `rank` becomes the per-block cap and each block keeps
    the smallest rank meeting the epsilon Frobenius criterion, bucketed
    into power-of-two tiers (Htool's adaptive epsilon knob,
    reference htool.py:18-31).
    """

    def __init__(self, x: np.ndarray, y: np.ndarray, *, kernel_name: str,
                 leaf: int = 256, rank: int = 16, eta: float = 2.0,
                 epsilon: float = None, same_points: bool = False,
                 seed: int = 0):
        if kernel_name not in BLR_KERNELS:
            raise NotImplementedError(
                f"BLR supports {BLR_KERNELS}, not {kernel_name!r} "
                "(Euclidean admissibility needs a squared-distance kernel).")
        rank = int(min(rank, leaf))
        self.kernel_name = kernel_name
        self.rank = rank
        self.epsilon = None if epsilon is None else float(epsilon)
        self.plan = plan = build_plan(
            np.asarray(x), np.asarray(y), leaf=leaf, eta=eta,
            same_points=same_points)
        xf = np.asarray(x, dtype=np.float32)
        yf = xf if same_points else np.asarray(y, dtype=np.float32)
        self.xpts = jax.device_put(jnp.asarray(xf[plan.gather_x]))
        self.ypts = (self.xpts if same_points
                     else jax.device_put(jnp.asarray(yf[plan.gather_y])))
        self.gid_x = jax.device_put(jnp.asarray(plan.gid_x))
        self.gid_y = (self.gid_x if same_points
                      else jax.device_put(jnp.asarray(plan.gid_y)))
        bx = plan.num_x_blocks
        fi, fj, fseg_i, fseg_j = _pad_pairs(plan.far_pairs, bx)
        # Host-segmented compression: one device call over ALL far pairs
        # would be a single execution of minutes at M >= 10^5 (hundreds of
        # thousands of batched tile-QRs), past the point where remote-chip
        # transports declare the device hung (same limit as the segmented
        # CG, ops/solve.py).  Slices are _CHUNK-aligned so at most two
        # program shapes compile.
        seg = int(os.environ.get("KMB_BLR_BUILD_CHUNK", "8192"))
        seg = max(_CHUNK, (seg // _CHUNK) * _CHUNK)

        def segmented(compress_fn):
            outs = []
            total = fi.shape[0]
            for s in range(0, total, seg):
                e_ = min(s + seg, total)
                outs.append(compress_fn(fi[s:e_], fj[s:e_]))
            return tuple(jnp.concatenate(parts, axis=0)
                         for parts in zip(*outs))
        self._near = _pad_pairs(plan.near_pairs, bx)
        # Off-diagonal near pairs of a symmetric operator: each tile is
        # computed once per matvec and applied both ways (see
        # blr_matvec_blocks).  None disables the path (separate trace).
        self._near_sym = (_pad_pairs(plan.near_sym_pairs, bx)
                          if same_points else None)
        pf = plan.far_pairs.shape[0]
        if self.epsilon is None:
            u, v = segmented(lambda i, j: compress_far_blocks(
                self.xpts, self.ypts, i, j, kernel_name=kernel_name,
                rank=rank, seed=seed))
            # Single tier; padded dummy pairs scatter into the overflow
            # segment and are dropped by the matvec.
            self.far_groups = ((u, v, fj, fseg_i),)
            # Symmetric: the same factors, applied transposed, cover the
            # unstored j > i triangle (Htool htool.py:44-52).  Only the
            # index arrays are stored — blr_matvec_blocks reuses the
            # far_groups factors tier-for-tier.
            self.mirror_groups = (((fi, fseg_j),)
                                  if same_points else ())
            self.block_ranks = np.full(pf, rank, dtype=np.int64)
        else:
            # Per-SEGMENT epsilon truncation: the full cap-rank factors of
            # one segment peak at O(seg * leaf * rank) HBM and are sliced
            # down to their per-block epsilon ranks before the next
            # segment's factors are built — materializing the cap-rank
            # factors for ALL pairs first would need
            # 2 * Pf * leaf * rank * 4 bytes (17 GB at M=131072,
            # leaf=256, rank=64: past a 16 GB chip).  select_block_ranks
            # pulls sv2 to the host, which also serializes segments so
            # two full-rank working sets never overlap in flight.
            tier_parts: dict = {}
            ranks_parts = []
            total = fi.shape[0]
            for s in range(0, total, seg):
                e_ = min(s + seg, total)
                u, v, sv2 = compress_far_blocks_svd(
                    self.xpts, self.ypts, fi[s:e_], fj[s:e_],
                    kernel_name=kernel_name, rank=rank, seed=seed)
                ranks_seg = select_block_ranks(np.asarray(sv2),
                                               self.epsilon)
                # Chunk-padding dummy pairs (positions >= pf) get rank 0
                # so the tiers cover exactly the real far pairs.
                real_in_seg = max(0, min(e_, pf) - s)
                ranks_seg[real_in_seg:] = 0
                ranks_parts.append(ranks_seg)
                for tier_rank, idx in _rank_tiers(ranks_seg, rank):
                    sel = jnp.asarray(idx)
                    tier_parts.setdefault(tier_rank, []).append((
                        u[sel, :, :tier_rank], v[sel, :tier_rank, :],
                        fj[s:e_][sel], fseg_i[s:e_][sel],
                        fi[s:e_][sel], fseg_j[s:e_][sel]))
            self.block_ranks = (np.concatenate(ranks_parts)[:pf]
                                if ranks_parts
                                else np.zeros(0, dtype=np.int64))
            groups, mirrors = [], []
            for tier_rank in sorted(tier_parts):
                parts = tier_parts[tier_rank]
                ut = jnp.concatenate([p[0] for p in parts], axis=0)
                vt = jnp.concatenate([p[1] for p in parts], axis=0)
                groups.append((ut, vt,
                               jnp.concatenate([p[2] for p in parts]),
                               jnp.concatenate([p[3] for p in parts])))
                if same_points:
                    mirrors.append((
                        jnp.concatenate([p[4] for p in parts]),
                        jnp.concatenate([p[5] for p in parts])))
            self.far_groups = tuple(groups)
            self.mirror_groups = tuple(mirrors)
        self.n = int(np.asarray(x).shape[0])
        self.m = int(np.asarray(y).shape[0])

    def block_signal(self, b) -> jnp.ndarray:
        """(M, E) signal -> (By, leaf, E) blocked, pad rows zeroed."""
        plan = self.plan
        b = jnp.asarray(np.asarray(b, dtype=np.float32))
        blocked = b[plan.gather_y]
        return jnp.where(
            jnp.asarray(plan.gid_y >= 0)[:, :, None], blocked, 0.0)

    def matvec_blocked(self, b_blocks) -> jnp.ndarray:
        """Blocked-signal matvec, result in blocked target order."""
        return blr_matvec_blocks(
            self.xpts, self.ypts, self.gid_x, self.gid_y, self.far_groups,
            self.mirror_groups, b_blocks, self._near, self._near_sym,
            kernel_name=self.kernel_name,
            num_x_blocks=self.plan.num_x_blocks,
            mask_diagonal=get_kernel(self.kernel_name).zero_diagonal)

    def unblock(self, out_blocked) -> jnp.ndarray:
        """Blocked target order -> original (N, E) order."""
        return out_blocked[jnp.asarray(self.plan.out_pos)]

    def matvec(self, b) -> jnp.ndarray:
        return self.unblock(self.matvec_blocked(self.block_signal(b)))

    def matvec_device(self, b) -> jnp.ndarray:
        """Jit-traceable matvec: (M, E) -> (N, E), device ops only.

        Same math as `matvec`, but with the block gather/scatter done in
        jnp (no host round-trip).  NOTE: as a bound method it closes
        over the factor arrays, so tracing it inside a jitted loop bakes
        hundreds of MB of factors into the module as constants — past
        the remote-compile payload cap on an axon chip (HTTP 413).  For
        the Krylov loops use `matvec_partial()` instead, whose factors
        travel as runtime arguments.
        """
        plan = self.plan
        blocked = jnp.asarray(b, jnp.float32)[plan.gather_y]
        blocked = jnp.where(
            jnp.asarray(plan.gid_y >= 0)[:, :, None], blocked, 0.0)
        return self.matvec_blocked(blocked)[plan.out_pos]

    def matvec_partial(self):
        """(M, E) -> (N, E) matvec as `functools.partial(static, arrays)`.

        The Krylov loops (ops/solve.py `_split_static`) keep the
        `_BlrMatvecStatic` instance as the stable jit cache key while
        every tensor — points, block ids, near-pair lists, and the far
        factor tiers — travels as an ordinary runtime argument, keeping
        the lowered module small (no baked-in factor constants).
        """
        plan = self.plan
        arrays = (jnp.asarray(plan.gather_y),
                  jnp.asarray(plan.gid_y >= 0),
                  jnp.asarray(plan.out_pos),
                  self.xpts, self.ypts, self.gid_x, self.gid_y,
                  self.far_groups, self.mirror_groups,
                  self._near, self._near_sym)
        return functools.partial(
            _BlrMatvecStatic(self.kernel_name, plan.num_x_blocks,
                             get_kernel(self.kernel_name).zero_diagonal),
            arrays)

    @property
    def compression(self) -> float:
        """Dense-entry count over stored+recomputed entry count.

        Mirror groups reuse the stored i<j factors and symmetric near
        tiles are computed once, so symmetry shows up here as ~2x.
        """
        leaf = self.plan.leaf
        tiles = (self.plan.near_pairs.shape[0]
                 + self.plan.near_sym_pairs.shape[0])
        stored = (sum(u.size + v.size for u, v, _, _ in self.far_groups)
                  + tiles * leaf * leaf)
        return float(self.n) * float(self.m) / float(max(stored, 1))
