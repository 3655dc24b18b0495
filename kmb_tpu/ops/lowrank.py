"""Approximate (compressed) kernel products: Nyström and random features.

This is the TPU-native answer to the slot the reference reserves for the
Htool C++ hierarchical-matrix library (htool.py:15-165): *approximate*
methods with an explicit accuracy <-> time knob that populate the Pareto
front between the exact engines and the fast-but-wrong end.  Instead of
H-matrix block compression (pointer-chasing cluster trees — hostile to the
MXU), we use two classic global low-rank schemes that map onto large dense
matmuls, which is exactly what the TPU systolic array wants:

1. **Nyström** — pick `rank` landmark points L ⊂ y, factor
       K(x, y) ≈ K(x, L) · W⁺ · K(L, y),      W = K(L, L)
   (W⁺ a clipped eigendecomposition pseudo-inverse).  Build cost
   O((N + M)·r·D + r³); a product query is two (tall, r) matmuls:
   O((N + M)·r·E).  The analog of Htool's `epsilon`/`maxblocksize` is
   `rank`.

2. **Random features** — an explicit feature map φ with
   E[φ(x)ᵀ φ(y)] = k(x, y), so  K @ b ≈ Φx (Φyᵀ b):
   - "gaussian"              exp(-|x-y|²): random Fourier features,
     ω ~ N(0, 2·I), φ(x) = sqrt(2/F)·cos(ωᵀx + u)  (Rahimi & Recht 2007).
   - "absolute-exponential"  exp(-|x-y|): same construction with ω drawn
     from the kernel's spectral measure, the isotropic multivariate
     Cauchy (Student-t, ν=1): ω = z / |g|, z ~ N(0, I), g ~ N(0, 1).
   - "exponential"           exp(<x,y>): *positive* random features
     φ(x) = exp(ωᵀx − |x|²/2) / sqrt(F), ω ~ N(0, I)  — the Performer /
     FAVOR+ estimator, unbiased for exp(<x,y>) and safe to row-normalize
     (attention) because every feature is positive.

Both schemes exclude the singular "inverse-distance" kernel: it is not
positive-definite and has no spectral measure; the exact streaming engine
(ops/product.py) covers it.

Row normalization (attention) and density estimation reuse the harness-wide
ones-column trick (reference bruteforce.py:140-145): a ones column appended
to b yields the approximate kernel row sums from the same matmuls.

All matmuls run at float32 with HIGHEST MXU precision (see
ops/product._mxu_precision for why DEFAULT f32 would silently be bf16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LOWRANK_KERNELS = ("gaussian", "absolute-exponential", "exponential")

_HI = jax.lax.Precision.HIGHEST


def _check_kernel(kernel_name: str):
    if kernel_name not in LOWRANK_KERNELS:
        raise NotImplementedError(
            f"Low-rank approximation does not support {kernel_name!r} "
            f"(supported: {LOWRANK_KERNELS}).")


def _cross_kernel(x, landmarks, kernel_name: str):
    """Dense (n, r) kernel block K(x, L) — r is small, so materializing
    this tall-skinny block is the point of the compression."""
    if kernel_name == "exponential":
        form = jnp.matmul(x, landmarks.T, precision=_HI)
        return jnp.exp(form)
    xsq = jnp.sum(x * x, axis=1, keepdims=True)
    lsq = jnp.sum(landmarks * landmarks, axis=1, keepdims=True).T
    sqd = jnp.maximum(xsq + lsq - 2.0 * jnp.matmul(
        x, landmarks.T, precision=_HI), 0.0)
    if kernel_name == "gaussian":
        return jnp.exp(-sqd)
    return jnp.exp(-jnp.sqrt(sqd))  # absolute-exponential


def select_landmarks(y, rank: int, seed: int = 0):
    """`rank` landmark rows of y, uniformly without replacement."""
    m = y.shape[0]
    rank = min(rank, m)
    idx = jax.random.choice(
        jax.random.PRNGKey(seed), m, shape=(rank,), replace=False)
    return y[jnp.sort(idx)]


@functools.partial(jax.jit, static_argnames=("kernel_name", "rcond"))
def nystrom_core(landmarks, kernel_name: str, rcond: float = 1e-6):
    """Clipped pseudo-inverse factor of W = K(L, L).

    Returns (u, inv_lam) with W⁺ = u · diag(inv_lam) · uᵀ; eigenvalues
    below rcond·λ_max are dropped (their inverse set to 0), which is what
    keeps the Nyström extension stable when landmarks nearly coincide.
    """
    w = _cross_kernel(landmarks, landmarks, kernel_name)
    lam, u = jnp.linalg.eigh(w)
    cutoff = rcond * jnp.max(jnp.abs(lam))
    inv_lam = jnp.where(lam > cutoff, 1.0 / lam, 0.0)
    return u, inv_lam


@functools.partial(jax.jit, static_argnames=("kernel_name",))
def nystrom_factors(x, y, landmarks, kernel_name: str):
    """The two tall-skinny cross blocks K(x, L) (n, r) and K(y, L) (m, r)."""
    return (_cross_kernel(x, landmarks, kernel_name),
            _cross_kernel(y, landmarks, kernel_name))


@functools.partial(jax.jit, static_argnames=("kernel_name",))
def nystrom_factor(x, landmarks, kernel_name: str):
    """One tall-skinny cross block K(x, L) (n, r) — the same_points case,
    where targets and sources share a single factor."""
    return _cross_kernel(x, landmarks, kernel_name)


@functools.partial(
    jax.jit,
    static_argnames=("normalize_rows", "density_estimation"))
def nystrom_apply(zx, zy, u, inv_lam, b, *, normalize_rows=False,
                  density_estimation=False):
    """a ≈ K(x,L) W⁺ K(L,y) b, with row sums from a riding ones column.

    zx: (n, r) = K(x, L); zy: (m, r) = K(y, L); (u, inv_lam) from
    `nystrom_core`.  b: (m, E) or None (density estimation).
    """
    m = zy.shape[0]
    if density_estimation and normalize_rows:
        return jnp.ones((zx.shape[0], 1), jnp.float32)
    if b is None:
        b = jnp.ones((m, 1), jnp.float32)
    ones = jnp.ones((m, 1), b.dtype)
    b_aug = jnp.concatenate([b, ones], axis=1)        # (m, E+1)
    t = jnp.matmul(zy.T, b_aug, precision=_HI)        # (r, E+1)
    s = u @ (inv_lam[:, None] * (u.T @ t))            # W⁺ t
    out = jnp.matmul(zx, s, precision=_HI)            # (n, E+1)
    num, den = out[:, :-1], out[:, -1:]
    if density_estimation:
        return den
    if normalize_rows:
        return num / den
    return num


@functools.partial(jax.jit, static_argnames=("kernel_name", "rcond"))
def nystrom_solver_build(y, landmarks, kernel_name: str,
                         rcond: float = 1e-6):
    """Build the Woodbury workspace for approximate solves with K̂.

    Factor the Nyström approximation as K̂ = C Cᵀ with
    C = K(y, L) · u · diag(inv_lam)^{1/2} (m, r), then precompute the
    (r, r) Gram block G = CᵀC.  The ridge-regularized solve
        (λI + C Cᵀ)⁻¹ a = (a − C (λI_r + G)⁻¹ Cᵀ a) / λ
    (Woodbury identity) then costs two tall matmuls + one (r, r)
    factorization per λ — the approximate-solver counterpart of the
    compressed product.
    """
    u, inv_lam = nystrom_core(landmarks, kernel_name, rcond=rcond)
    z = _cross_kernel(y, landmarks, kernel_name)          # (m, r)
    c = jnp.matmul(z, u * jnp.sqrt(inv_lam)[None, :], precision=_HI)
    gram = jnp.matmul(c.T, c, precision=_HI)              # (r, r)
    return c, gram


@jax.jit
def nystrom_solver_apply(c, gram, rhs, lam):
    """(λI + C Cᵀ)⁻¹ rhs via Woodbury; rhs (m, E), lam > 0."""
    r = gram.shape[0]
    inner = lam * jnp.eye(r, dtype=gram.dtype) + gram
    t = jnp.matmul(c.T, rhs, precision=_HI)               # (r, E)
    s = jax.scipy.linalg.solve(inner, t, assume_a="pos")
    return (rhs - jnp.matmul(c, s, precision=_HI)) / lam


def random_feature_params(dimension: int, kernel_name: str,
                          num_features: int, seed: int = 0):
    """Spectral parameters of the feature map — tiny: (D, F) + (F,).

    Returns (omega, phase); phase is None for the positive (Performer)
    "exponential" features.  Splitting the parameters from the feature
    matrix lets huge-M paths stream blocks of Φ without ever
    materializing the (M, F) matrix (see `feature_apply_streamed`).
    """
    _check_kernel(kernel_name)
    key = jax.random.PRNGKey(seed)
    k_omega, k_phase, k_nu = jax.random.split(key, 3)
    if kernel_name == "exponential":
        # Positive features (Performer FAVOR+): unbiased for exp(<x,y>)
        # and strictly positive, so attention normalization stays sane.
        omega = jax.random.normal(
            k_omega, (dimension, num_features), jnp.float32)
        return omega, None
    if kernel_name == "gaussian":
        # exp(-|x-y|^2) = RBF with gamma=1  =>  ω ~ N(0, 2 I).
        omega = jnp.sqrt(2.0) * jax.random.normal(
            k_omega, (dimension, num_features), jnp.float32)
    else:  # absolute-exponential: spectral measure = isotropic Cauchy.
        z = jax.random.normal(
            k_omega, (dimension, num_features), jnp.float32)
        g = jax.random.normal(k_nu, (1, num_features), jnp.float32)
        omega = z / jnp.maximum(jnp.abs(g), 1e-20)
    phase = jax.random.uniform(
        k_phase, (num_features,), jnp.float32, 0.0, 2.0 * jnp.pi)
    return omega, phase


def _feature_block(omega, phase, pts):
    """Φ for one block of points: (blk, D) -> (blk, F)."""
    pts = pts.astype(jnp.float32)
    num_features = omega.shape[1]
    if phase is None:
        proj = jnp.matmul(pts, omega, precision=_HI)
        log_phi = proj - 0.5 * jnp.sum(pts * pts, axis=1, keepdims=True)
        # Stabilize per-feature-map (cancels in the x·y product only for
        # normalized attention; for raw products keep it exact):
        return jnp.exp(log_phi) / jnp.sqrt(float(num_features))
    proj = jnp.matmul(pts, omega, precision=_HI) + phase
    return jnp.sqrt(2.0 / num_features) * jnp.cos(proj)


@functools.partial(
    jax.jit, static_argnames=("kernel_name", "num_features"))
def random_feature_map(points, kernel_name: str, num_features: int,
                       seed: int = 0):
    """(n, F) feature matrix Φ with E[Φ(x) Φ(y)ᵀ] = K(x, y)."""
    omega, phase = random_feature_params(
        points.shape[1], kernel_name, num_features, seed=seed)
    return _feature_block(omega, phase, points)


def _pad_rows(a, block):
    pad = (-a.shape[0]) % block
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
    return a


@functools.partial(
    jax.jit,
    static_argnames=("normalize_rows", "density_estimation", "block"))
def feature_apply_streamed(omega, phase, x, y, b, *, normalize_rows=False,
                           density_estimation=False, block=16384):
    """`feature_apply` without materializing Φx / Φy — O(block·F) memory.

    At M = 2^20 and F = 4096 the (M, F) float32 feature matrix is 17 GB,
    past a 16 GB chip's HBM (measured RESOURCE_EXHAUSTED on the GloVe-
    geometry dataset); this version streams y (then x) in row blocks
    through the feature map inside two `lax.scan` loops, accumulating
    the (F, E+1) bridge t = Φyᵀ [b, 1] exactly as the materialized path
    does.  Same estimator, same precision (f32, HIGHEST), identical
    math per block — only the schedule changes.
    """
    n = x.shape[0]
    m = y.shape[0]
    if density_estimation and normalize_rows:
        return jnp.ones((n, 1), jnp.float32)
    if b is None:
        b = jnp.ones((m, 1), jnp.float32)
    # The ones column (kernel row sums) must be zero on pad rows, so the
    # padding is applied to the augmented signal, not per-column.
    b_aug = jnp.concatenate(
        [b.astype(jnp.float32), jnp.ones((m, 1), jnp.float32)], axis=1)
    yb = _pad_rows(y.astype(jnp.float32), block).reshape(
        -1, block, y.shape[1])
    bb = _pad_rows(b_aug, block).reshape(-1, block, b_aug.shape[1])

    def y_step(t, args):
        y_blk, b_blk = args
        phi = _feature_block(omega, phase, y_blk)
        return t + jnp.matmul(phi.T, b_blk, precision=_HI), None

    t0 = jnp.zeros((omega.shape[1], b_aug.shape[1]), jnp.float32)
    t, _ = jax.lax.scan(y_step, t0, (yb, bb))

    xb = _pad_rows(x.astype(jnp.float32), block).reshape(
        -1, block, x.shape[1])

    def x_step(_, x_blk):
        phi = _feature_block(omega, phase, x_blk)
        return None, jnp.matmul(phi, t, precision=_HI)

    _, outs = jax.lax.scan(x_step, None, xb)
    out = outs.reshape(-1, b_aug.shape[1])[:n]
    num, den = out[:, :-1], out[:, -1:]
    if density_estimation:
        return den
    if normalize_rows:
        return num / den
    return num


@functools.partial(
    jax.jit,
    static_argnames=("normalize_rows", "density_estimation"))
def feature_apply(phi_x, phi_y, b, *, normalize_rows=False,
                  density_estimation=False):
    """a ≈ Φx (Φyᵀ [b, 1]):  two matmuls, row sums from the ones column."""
    m = phi_y.shape[0]
    if density_estimation and normalize_rows:
        return jnp.ones((phi_x.shape[0], 1), jnp.float32)
    if b is None:
        b = jnp.ones((m, 1), jnp.float32)
    ones = jnp.ones((m, 1), b.dtype)
    b_aug = jnp.concatenate([b, ones], axis=1)
    t = jnp.matmul(phi_y.T, b_aug, precision=_HI)     # (F, E+1)
    out = jnp.matmul(phi_x, t, precision=_HI)         # (n, E+1)
    num, den = out[:, :-1], out[:, -1:]
    if density_estimation:
        return den
    if normalize_rows:
        return num / den
    return num
