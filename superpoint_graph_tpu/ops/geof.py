"""Per-point local geometric features (linearity/planarity/scattering/verticality).

Behavioral spec from the reference's OpenMP C++ kernel
(partition/ply_c/ply_c.cpp:384-462, `compute_geof`): for each point, form the
(k+1, 3) position matrix of [self; k neighbors], compute the covariance
normalized by (k+1), eigendecompose, sort eigenvalues descending, clamp at 0,
then

  linearity   = (sqrt(l1) - sqrt(l2)) / sqrt(l1)
  planarity   = (sqrt(l2) - sqrt(l3)) / sqrt(l1)
  scattering  = sqrt(l3) / sqrt(l1)
  verticality = z-component of unit(sum_i l_i * |v_i|)

TPU-first design: the neighbor index table is a dense [n, k] int array (the
reference passes a flat length n*k target list), the whole computation is one
fused gather + covariance + analytic eigen (ops/eigen3.py) pass — pure VPU work,
no per-point loop. Padding rows (index < 0 handled by caller via clamping) give
garbage that the caller masks out.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .eigen3 import eigh3x3

_EPS = 1e-10


@partial(jax.jit, static_argnames=("chunk",))
def compute_geof(xyz: jax.Array, neighbors: jax.Array, chunk: int | None = None) -> jax.Array:
    """Geometric features for each point of a cloud.

    Args:
      xyz: [n, 3] float32 point coordinates.
      neighbors: [n, k] int32 neighbor indices into ``xyz`` (self excluded, as in
        the reference's kNN target list; the point itself is prepended here).
      chunk: unused hook for future HBM-chunked execution (kept static).

    Returns:
      [n, 4] float32 features: linearity, planarity, scattering, verticality.
    """
    del chunk
    return compute_geof_rows(xyz, xyz, neighbors)


@jax.jit
def compute_geof_rows(
    xyz_full: jax.Array, xyz_rows: jax.Array, neighbors_rows: jax.Array
) -> jax.Array:
    """`compute_geof` for a row slice of a larger cloud: `xyz_rows` [m, 3]
    are the query points, `neighbors_rows` [m, k] index into `xyz_full`.
    Lets giant clouds bound the [m, k+1, 3] gather transient (5.5 GB at
    1e7 x 45 if done in one shot — pipeline_big chunks it)."""
    k = neighbors_rows.shape[1]
    pos_nei = xyz_full[neighbors_rows]            # [m, k, 3]
    pos = jnp.concatenate([xyz_rows[:, None, :], pos_nei], axis=1)
    mean = jnp.mean(pos, axis=1, keepdims=True)
    centered = pos - mean
    # covariance normalized by (k+1), matching ply_c.cpp:414
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / float(k + 1)

    lams, vecs = eigh3x3(cov)
    lams = jnp.maximum(lams, 0.0)
    s0 = jnp.sqrt(lams[:, 0] + _EPS)
    s1 = jnp.sqrt(lams[:, 1])
    s2 = jnp.sqrt(lams[:, 2])

    linearity = (s0 - s1) / s0
    planarity = (s1 - s2) / s0
    scattering = s2 / s0

    # unary vector: sum_i lambda_i * |v_i| (ply_c.cpp:443-448)
    unary = jnp.einsum("ni,nji->nj", lams, jnp.abs(vecs))  # [n, 3]
    norm = jnp.sqrt(jnp.sum(unary * unary, axis=-1) + _EPS)
    verticality = unary[:, 2] / norm

    return jnp.stack([linearity, planarity, scattering, verticality], axis=-1).astype(
        jnp.float32
    )


def compute_geof_numpy(xyz, neighbors):
    """NumPy oracle mirroring the reference kernel exactly (for golden tests)."""
    import numpy as np

    n, k = neighbors.shape
    out = np.zeros((n, 4), dtype=np.float32)
    for i in range(n):
        pos = np.concatenate([xyz[i : i + 1], xyz[neighbors[i]]], axis=0)
        centered = pos - pos.mean(axis=0, keepdims=True)
        cov = centered.T @ centered / float(k + 1)
        ev, evec = np.linalg.eigh(cov)
        order = np.argsort(-ev)
        lam = np.maximum(ev[order], 0.0)
        v = evec[:, order]
        s = np.sqrt(lam)
        out[i, 0] = (s[0] - s[1]) / (s[0] + 1e-30)
        out[i, 1] = (s[1] - s[2]) / (s[0] + 1e-30)
        out[i, 2] = s[2] / (s[0] + 1e-30)
        unary = (np.abs(v) * lam[None, :]).sum(axis=1)
        out[i, 3] = unary[2] / (np.linalg.norm(unary) + 1e-30)
    return out
