"""SE(3) transforms for points and boxes (pure JAX).

TPU-native equivalent of the reference's numpy/torch ``apply_transform``
(`/root/reference/src/utils/pointcloud_utils.py:21-46`) and the multi-view
``euler2mat`` (`src/utils/mv_utils.py:40-88`). Everything is jittable and
batch-friendly; extra feature columns beyond xyz pass through untouched.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_transform(pts: jax.Array, transformation: jax.Array) -> jax.Array:
    """Apply a 4x4 homogeneous transform to the xyz columns of ``pts``.

    pts: (..., N, D) with D >= 3; columns 3: pass through.
    transformation: (4, 4) (or broadcastable batch (..., 4, 4)).
    """
    xyz = pts[..., :3]
    rot = transformation[..., :3, :3]
    trans = transformation[..., :3, 3]
    new_xyz = jnp.einsum("...ij,...nj->...ni", rot, xyz) + trans[..., None, :]
    return jnp.concatenate([new_xyz, pts[..., 3:]], axis=-1)


def yaw_of(transformation: jax.Array) -> jax.Array:
    """Z-euler (yaw) of a rotation, matching `xyz`-order extraction used by
    the reference for box heading updates (pointcloud_utils.py:42-44)."""
    return jnp.arctan2(transformation[..., 1, 0], transformation[..., 0, 0])


def apply_transform_boxes(boxes: jax.Array, transformation: jax.Array) -> jax.Array:
    """Transform boxes (..., N, 7+) = [cx, cy, cz, l, w, h, yaw, ...]."""
    centers = apply_transform(boxes[..., :3], transformation)
    yaw = boxes[..., 6:7] + yaw_of(transformation)[..., None, None]
    return jnp.concatenate([centers, boxes[..., 3:6], yaw, boxes[..., 7:]], axis=-1)


def rot_z(angle: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation about z."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    zero, one = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], -1),
            jnp.stack([s, c, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )


def rot_x(angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    zero, one = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, c, -s], -1),
            jnp.stack([zero, s, c], -1),
        ],
        -2,
    )


def rot_y(angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    zero, one = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, zero, s], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-s, zero, c], -1),
        ],
        -2,
    )


def euler2mat(angles: jax.Array) -> jax.Array:
    """Euler (x, y, z) angles -> rotation matrix R = Rx @ Ry @ Rz.

    Matches the composition order of the reference multi-view projector
    (mv_utils.py:86). angles: (..., 3) -> (..., 3, 3).
    """
    return rot_x(angles[..., 0]) @ rot_y(angles[..., 1]) @ rot_z(angles[..., 2])


def make_se3(rotation: jax.Array, translation: jax.Array) -> jax.Array:
    """Build (..., 4, 4) from (..., 3, 3) and (..., 3)."""
    batch = rotation.shape[:-2]
    out = jnp.zeros(batch + (4, 4), rotation.dtype)
    out = out.at[..., :3, :3].set(rotation)
    out = out.at[..., :3, 3].set(translation)
    out = out.at[..., 3, 3].set(1.0)
    return out


def invert_se3(transformation: jax.Array) -> jax.Array:
    rot = transformation[..., :3, :3]
    trans = transformation[..., :3, 3]
    rot_t = jnp.swapaxes(rot, -1, -2)
    return make_se3(rot_t, -jnp.einsum("...ij,...j->...i", rot_t, trans))
