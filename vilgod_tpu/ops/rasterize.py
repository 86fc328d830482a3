"""Multi-view depth-image rendering of point clusters (PointCLIPv2-style).

TPU-native, fully fused equivalent of the reference's
`RealisticProjection` + `points2grid` + `GridToImage`
(`/root/reference/src/utils/mv_utils.py`), and of the cluster view
normalization `transform_cluster_points_to_origin`
(`src/utils/pointcloud_utils.py:390-412`). The reference renders one
cluster at a time through torch_scatter + MaxPool3d + Conv3d and
round-trips through PIL (`zero_shot_detector.py:389-410`); here the whole
cluster batch renders in one jitted graph:

  normalize -> 4-view rotate -> 112^3 grid scatter-max -> 5x5 maxpool
  densify -> 3x3 Gaussian smooth -> depth-max -> invert -> resize(224)

Output feeds straight into the CLIP image encoder without leaving the
device.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .transforms import euler2mat, rot_x, rot_z

# The 4 fixed views of the reference (mv_utils.py:134-141):
# identity, x -18 deg, y +/- 6 deg.
VIEW_ANGLES = np.array(
    [
        [0.0, 0.0, 0.0],
        [-np.pi / 10, 0.0, 0.0],
        [0.0, np.pi / 30, 0.0],
        [0.0, -np.pi / 30, 0.0],
    ],
    dtype=np.float32,
)
NUM_VIEWS = 4


def cluster_to_origin(points: jax.Array, mask: jax.Array) -> jax.Array:
    """View-normalize one cluster (ego frame) for rendering.

    Mirrors transform_cluster_points_to_origin (pointcloud_utils.py:390-412):
    median-center xy, yaw-align to the ego ray, shift 1 m in x, remap axes
    to image coordinates via Rx(pi) @ Rz(pi/2) after a [z, y, x] swap.
    points: (P, 3) masked by ``mask``.
    """
    n = jnp.maximum(jnp.sum(mask), 1)
    # masked median per axis
    big = 1e9
    med = []
    for a in range(3):
        v = jnp.sort(jnp.where(mask, points[:, a], big))
        cnt = jnp.sum(mask)
        lo = jnp.maximum(cnt - 1, 0) // 2
        hi = jnp.maximum(cnt, 1) // 2
        med.append(0.5 * (v[lo] + v[hi]))
    center = jnp.stack(med)
    angle = jnp.arctan2(center[1], center[0])

    pts = points.at[:, :2].add(-center[:2])
    pts = pts @ rot_z(-angle).T
    pts = pts.at[:, 0].add(-1.0)
    pts = jnp.stack([pts[:, 2], pts[:, 1], pts[:, 0]], axis=1)
    remap = rot_x(jnp.asarray(np.pi)) @ rot_z(jnp.asarray(np.pi / 2))
    pts = pts @ remap.T
    return jnp.where(mask[:, None], pts, 0.0)


def _points_to_grid(points: jax.Array, mask: jax.Array, resolution: int,
                    depth: int, obj_ratio: float, depth_bias: float) -> jax.Array:
    """Quantize one (view-rotated) cluster to a z-buffer grid
    (points2grid, mv_utils.py:91-127). points: (P, 3) -> (depth, res, res)
    with image rows = x, cols = y (the reference's final permute)."""
    big = 1e9
    pmax = jnp.max(jnp.where(mask[:, None], points, -big), axis=0)
    pmin = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    pcent = (pmax + pmin) / 2
    prange = jnp.maximum(jnp.max(pmax - pmin), 1e-6)
    p = (points - pcent) / prange * 2.0
    p = p.at[:, :2].multiply(obj_ratio)

    x = jnp.ceil((p[:, 0] + 1) / 2 * resolution)
    y = jnp.ceil((p[:, 1] + 1) / 2 * resolution)
    z = ((p[:, 2] + 1) / 2 + depth_bias) / (1 + depth_bias) * (depth - 2)
    z_int = jnp.clip(jnp.ceil(z), 1, depth - 2).astype(jnp.int32)
    x = jnp.clip(x, 1, resolution - 2).astype(jnp.int32)
    y = jnp.clip(y, 1, resolution - 2).astype(jnp.int32)
    z_val = jnp.clip(z, 1.0, float(depth - 2))

    size = depth * resolution * resolution
    coords = z_int * resolution * resolution + y * resolution + x
    coords = jnp.where(mask, coords, size)
    grid = jnp.zeros(size + 1, points.dtype).at[coords].max(
        jnp.where(mask, z_val, 0.0))[:size]
    grid = grid.reshape(depth, resolution, resolution)
    return jnp.swapaxes(grid, 1, 2)  # rows = x, cols = y (permute 0,1,3,2)


def _gaussian_kernel_2d(ksize: int, sigma: float) -> np.ndarray:
    xs = np.arange(ksize, dtype=np.float32) - ksize // 2
    k1 = np.exp(-(xs**2) / (2 * sigma**2))
    k = k1[:, None] @ k1[None, :]
    return (k / k.sum()).astype(np.float32)


def _grid_to_image(grid: jax.Array, ksize: int = 3, sigma: float = 3.0) -> jax.Array:
    """(B, D, H, W) z-buffer -> (B, H, W) depth image in [0, 1]
    (GridToImage, mv_utils.py:11-37): 5x5 maxpool densify, 3x3 Gaussian
    smooth (per depth slice), max over depth, normalize, invert.
    Output spatial dims shrink by 2 (the reference's 112 -> 110)."""
    b, d, h, w = grid.shape
    pooled = jax.lax.reduce_window(
        grid, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, 5, 5), window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (1, 1), (1, 1)),
    )  # (B, D, H-2, W-2)
    # separable shift-add Gaussian: the 2-D kernel is an exact outer
    # product, and a C=1 conv wastes the MXU — two tap loops on the VPU
    # fuse into one elementwise pass over the (B*D, H, W) stack
    xs = np.arange(ksize, dtype=np.float32) - ksize // 2
    k1 = np.exp(-(xs**2) / (2 * sigma**2))
    k1 = (k1 / k1.sum()).astype(np.float32)
    pad = ksize // 2

    def sep(x, axis):
        widths = [(0, 0)] * x.ndim
        widths[axis] = (pad, pad)
        xp = jnp.pad(x, widths)
        n = x.shape[axis]
        return sum(float(k1[t]) * jax.lax.slice_in_dim(xp, t, t + n, axis=axis)
                   for t in range(ksize))

    smoothed = sep(sep(pooled, 2), 3)
    img = jnp.max(smoothed, axis=1)  # depth max
    peak = jnp.max(img, axis=(1, 2), keepdims=True)
    img = img / jnp.maximum(peak, 1e-9)
    return 1.0 - img


def _resize_bilinear_align_corners(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with align_corners=True (torch interpolate semantics
    used at zero_shot_detector.py:406-407). img: (..., H, W)."""
    h, w = img.shape[-2], img.shape[-1]
    ys = jnp.linspace(0.0, h - 1.0, out_h)
    xs = jnp.linspace(0.0, w - 1.0, out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0).astype(img.dtype)
    wx = (xs - x0).astype(img.dtype)
    top = img[..., y0, :][..., :, x0] * (1 - wy)[:, None] + img[..., y1, :][..., :, x0] * wy[:, None]
    out = top * (1 - wx)[None, :] + (
        img[..., y0, :][..., :, x1] * (1 - wy)[:, None]
        + img[..., y1, :][..., :, x1] * wy[:, None]
    ) * wx[None, :]
    return out


@partial(jax.jit, static_argnames=("resolution", "depth", "image_size"))
def render_cluster_views(
    points: jax.Array,
    mask: jax.Array,
    resolution: int = 112,
    depth: int = 8,
    obj_ratio: float = 0.8,
    depth_bias: float = 0.2,
    image_size: int = 224,
) -> jax.Array:
    """Render a batch of ego-frame clusters to CLIP-ready images.

    points: (B, P, 3) cluster points in ego frame; mask: (B, P).
    Returns (B, V, image_size, image_size) single-channel depth images in
    [0, 1] (replicate to 3 channels at the CLIP embed). Row/col follow the
    reference's net orientation (rows = grid y after the final permute).
    """
    normed = jax.vmap(cluster_to_origin)(points, mask)  # (B, P, 3)
    rots = euler2mat(jnp.asarray(VIEW_ANGLES))  # (V, 3, 3)
    # reference: points @ euler2mat(angle).transpose(1, 2) (mv_utils.py:166,199)
    viewed = jnp.einsum("bpk,vjk->bvpj", normed, rots)  # (B, V, P, 3)

    b, v = viewed.shape[0], viewed.shape[1]
    flat_pts = viewed.reshape(b * v, -1, 3)
    flat_mask = jnp.broadcast_to(mask[:, None, :], (b, v, mask.shape[1])).reshape(b * v, -1)
    grids = jax.vmap(
        lambda p, m: _points_to_grid(p, m, resolution, depth, obj_ratio, depth_bias)
    )(flat_pts, flat_mask)  # (B*V, D, res, res)
    imgs = _grid_to_image(grids)  # (B*V, res-2, res-2)
    imgs = _resize_bilinear_align_corners(imgs, image_size, image_size)
    # reference final permute(0, 3, 2, 1) transposes H/W before PIL
    imgs = jnp.swapaxes(imgs, -1, -2)
    return imgs.reshape(b, v, image_size, image_size)
