"""Closed-form symmetric 3x3 eigendecomposition, batched and jit-friendly.

The reference computes per-point eigenvalues/vectors with Eigen's iterative
``EigenSolver`` inside an OpenMP loop (reference: partition/ply_c/ply_c.cpp:415-434).
On TPU an iterative per-matrix solver is hostile to SIMD; instead we use the
analytic trigonometric method (Smith 1961 / "noniterative eigen for 3x3") which is
pure element-wise VPU work and vmaps over millions of matrices at once.

Eigenvalues are returned in descending order; eigenvectors are column-stacked to
match (each column i pairs with eigenvalue i).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-20


def eigh3x3(cov: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Eigendecomposition of a batch of symmetric 3x3 matrices.

    Args:
      cov: [..., 3, 3] symmetric matrices (float32/float64).

    Returns:
      (eigvals, eigvecs): eigvals [..., 3] descending; eigvecs [..., 3, 3] with
      eigvecs[..., :, i] the unit eigenvector for eigvals[..., i].
    """
    a00 = cov[..., 0, 0]
    a11 = cov[..., 1, 1]
    a22 = cov[..., 2, 2]
    a01 = cov[..., 0, 1]
    a02 = cov[..., 0, 2]
    a12 = cov[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))

    # B = (A - q I) / p ; r = det(B) / 2 in [-1, 1]
    b00 = (a00 - q) / p
    b11 = (a11 - q) / p
    b22 = (a22 - q) / p
    b01 = a01 / p
    b02 = a02 / p
    b12 = a12 / p
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    two_pi_3 = 2.0 * jnp.pi / 3.0
    lam0 = q + 2.0 * p * jnp.cos(phi)            # largest
    lam2 = q + 2.0 * p * jnp.cos(phi + two_pi_3)  # smallest
    lam1 = 3.0 * q - lam0 - lam2

    # Degenerate (near-diagonal / isotropic) matrices: fall back to sorted diagonal.
    diag_sorted = jnp.sort(jnp.stack([a00, a11, a22], axis=-1), axis=-1)[..., ::-1]
    is_diag = p2 <= _EPS * 10.0
    lams = jnp.stack([lam0, lam1, lam2], axis=-1)
    lams = jnp.where(is_diag[..., None], diag_sorted, lams)

    vecs = jnp.stack(
        [_eigvec(cov, lams[..., i]) for i in range(3)], axis=-1
    )  # [..., 3, 3] columns
    return lams, vecs


def _eigvec(cov: jax.Array, lam: jax.Array) -> jax.Array:
    """Unit eigenvector of symmetric 3x3 `cov` for eigenvalue `lam`.

    Rows of (A - lam I) span the orthogonal complement of the eigenspace; the
    cross product of two independent rows is an eigenvector. We take all three
    pairwise cross products and pick the longest for numerical robustness
    (standard approach; handles rank-deficient rows). For (near-)multiple
    eigenvalues any unit vector in the eigenspace is valid — downstream features
    only use |v| weighted by lambda, so the degenerate direction is immaterial.
    """
    lamI = lam[..., None, None] * jnp.eye(3, dtype=cov.dtype)
    m = cov - lamI
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.stack([n01, n02, n12], axis=-1)
    idx = jnp.argmax(best, axis=-1)
    cands = jnp.stack([c01, c02, c12], axis=-2)  # [..., 3cand, 3]
    v = jnp.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]
    norm2 = jnp.sum(v * v, axis=-1, keepdims=True)
    # Fully degenerate (isotropic) case: every vector is an eigenvector; use e_z
    # so the verticality feature stays well-defined.
    fallback = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=cov.dtype), v.shape
    )
    v = jnp.where(norm2 > _EPS, v * jax.lax.rsqrt(jnp.maximum(norm2, _EPS)), fallback)
    return v


def eigvals3x3_cols(a00, a11, a22, a01, a02, a12):
    """Eigenvalues (descending) of symmetric 3x3 matrices given as six 1-D
    coefficient columns. Same analytic method as `eigh3x3`, but the batch
    never materializes an [..., 3, 3] array — on TPU a [N, 3, 3] tensor is
    tiled to [N, 8, 128] (128x the payload), which OOMed the device SPG
    build at 2e6 points. Returns (lam0, lam1, lam2) column vectors."""
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))
    b00 = (a00 - q) / p
    b11 = (a11 - q) / p
    b22 = (a22 - q) / p
    b01 = a01 / p
    b02 = a02 / p
    b12 = a12 / p
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = 2.0 * jnp.pi / 3.0
    lam0 = q + 2.0 * p * jnp.cos(phi)
    lam2 = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    lam1 = 3.0 * q - lam0 - lam2
    # near-diagonal fallback: sorted diagonal
    is_diag = p2 <= _EPS * 10.0
    dmax = jnp.maximum(jnp.maximum(a00, a11), a22)
    dmin = jnp.minimum(jnp.minimum(a00, a11), a22)
    dmid = a00 + a11 + a22 - dmax - dmin
    lam0 = jnp.where(is_diag, dmax, lam0)
    lam1 = jnp.where(is_diag, dmid, lam1)
    lam2 = jnp.where(is_diag, dmin, lam2)
    return lam0, lam1, lam2
