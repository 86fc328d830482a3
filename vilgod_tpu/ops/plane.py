"""Plane estimation: fixed-iteration vectorized RANSAC + masked PCA fit.

TPU-native equivalent of the reference's two-stage pyransac3d ground-plane
refit (`/root/reference/src/utils/pointcloud_utils.py:375-387`): stage 1
RANSAC on all points (threshold 0.1), stage 2 RANSAC restricted to the
stage-1 inliers. Fixed iteration counts and precomputed sample indices
keep shapes static under jit. Also provides the PCA (least-eigenvector)
plane fit used per CZM patch by the ground segmentation
(`third_party/patchwork-plusplus/patchworkpp/src/patchworkpp.cpp:48-76`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def plane_from_triplet(p0: jax.Array, p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Plane [a, b, c, d] through 3 points, |n| = 1 (0 if degenerate)."""
    n = jnp.cross(p1 - p0, p2 - p0)
    norm = jnp.linalg.norm(n)
    n = n / jnp.where(norm > 1e-9, norm, 1.0)
    d = -jnp.dot(n, p0)
    return jnp.concatenate([n, d[None]])


def point_plane_distance(points: jax.Array, plane: jax.Array) -> jax.Array:
    """Unsigned distances; plane normal assumed unit (RANSAC planes are)."""
    return jnp.abs(points @ plane[:3] + plane[3])


@partial(jax.jit, static_argnames=("iters",))
def ransac_plane(
    points: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    threshold: float = 0.1,
    iters: int = 100,
) -> tuple[jax.Array, jax.Array]:
    """One RANSAC stage: (plane (4,), inlier_mask (N,)).

    Samples index triples uniformly over valid points via Gumbel top-k on
    masked logits (no rejection loops — static shapes).
    """
    n = points.shape[0]
    logits = jnp.where(mask, 0.0, -jnp.inf)
    gumbel = jax.random.gumbel(key, (iters, n))
    _, triples = jax.lax.top_k(logits[None, :] + gumbel, 3)  # (iters, 3)

    p = points[triples]  # (iters, 3, 3)
    planes = jax.vmap(lambda t: plane_from_triplet(t[0], t[1], t[2]))(p)
    dists = jnp.abs(jnp.einsum("nk,ik->in", points[:, :3], planes[:, :3]) + planes[:, 3:4])
    inliers = (dists <= threshold) & mask[None, :]
    counts = jnp.sum(inliers, axis=1)
    degenerate = jnp.linalg.norm(planes[:, :3], axis=1) < 0.5
    counts = jnp.where(degenerate, -1, counts)
    best = jnp.argmax(counts)
    return planes[best], inliers[best]


def refine_plane_lsq(points: jax.Array, mask: jax.Array) -> jax.Array:
    """Least-squares (PCA) plane through masked points, unit normal with
    positive z (the reference flips to n_z >= 0, pointcloud_utils.py:382-383)."""
    n = jnp.maximum(jnp.sum(mask), 1)
    mean = jnp.sum(jnp.where(mask[:, None], points[:, :3], 0.0), axis=0) / n
    centered = jnp.where(mask[:, None], points[:, :3] - mean, 0.0)
    cov = centered.T @ centered / jnp.maximum(n - 1, 1)
    _, vecs = jnp.linalg.eigh(cov)
    normal = vecs[:, 0]  # smallest eigenvalue
    normal = jnp.where(normal[2] < 0, -normal, normal)
    d = -jnp.dot(normal, mean)
    return jnp.concatenate([normal, d[None]])


@partial(jax.jit, static_argnames=("iters",))
def fit_ground_plane(
    points: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    threshold: float = 0.1,
    iters: int = 100,
) -> jax.Array:
    """Two-stage RANSAC ground fit (pointcloud_utils.py:375-387):
    stage 1 over all points, stage 2 over stage-1 inliers; final plane is
    the least-squares fit of the stage-2 inliers, normal flipped to +z.
    Returns [a, b, c, d] with unit normal.
    """
    k1, k2 = jax.random.split(key)
    _, inl1 = ransac_plane(points, mask, k1, threshold, iters)
    plane2, inl2 = ransac_plane(points, mask & inl1, k2, threshold, iters)
    plane = refine_plane_lsq(points, inl2)
    return plane


def pca_plane_stats(points: jax.Array, mask: jax.Array):
    """Patch plane fit for ground segmentation: returns
    (normal (3,), mean (3,), d, singular_values (3,) ascending).

    Mirrors `estimate_plane` (patchworkpp.cpp:48-76): covariance eigh,
    least-eigenvector as normal flipped to +z, d = -n.mean. Singular
    values are the eigenvalue sqrt magnitudes in ascending order.
    """
    cnt = jnp.sum(mask)
    n = jnp.maximum(cnt, 1)
    mean = jnp.sum(jnp.where(mask[:, None], points[:, :3], 0.0), axis=0) / n
    centered = jnp.where(mask[:, None], points[:, :3] - mean, 0.0)
    cov = centered.T @ centered / jnp.maximum(n - 1, 1)
    eigvals, vecs = jnp.linalg.eigh(cov)  # ascending
    normal = vecs[:, 0]
    normal = jnp.where(normal[2] < 0, -normal, normal)
    d = -jnp.dot(normal, mean)
    # JacobiSVD singular values of the covariance == |eigenvalues|,
    # descending in the reference; we return ascending eigvals clipped at 0
    sv = jnp.maximum(eigvals, 0.0)
    return normal, mean, d, sv
