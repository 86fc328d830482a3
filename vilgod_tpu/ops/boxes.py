"""Box geometry kernels (pure JAX, static shapes, mask-aware).

TPU-native equivalents of:
- rectangle fitting: `minimum_bounding_rectangle` / `closeness_rectangle` /
  `variance_rectangle` / `PCA_rectangle`
  (`/root/reference/src/utils/pointcloud_utils.py:161-372`) — the hull +
  rotating-calipers / numba angle loops become one dense masked angle
  sweep, vmappable over cluster tables;
- `points_in_boxes` (pcdet `roiaware_pool3d.points_in_boxes_gpu`, used at
  `pointcloud_utils.py:516-522`);
- rotated 3D IoU (pcdet `iou3d_nms.boxes_iou3d_gpu`, used at
  `src/utils/tracking_utils.py:9-20`, `zero_shot_detector.py:737`).

Box layout everywhere: ``[cx, cy, cz, l, w, h, yaw]`` with z the box
*center* (pcdet convention).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e9
_POS = 1e9


# ---------------------------------------------------------------------------
# Rectangle fitting (BEV) over masked point sets
# ---------------------------------------------------------------------------

def _masked_minmax(v: jax.Array, mask: jax.Array):
    vmin = jnp.min(jnp.where(mask, v, _POS), axis=-1)
    vmax = jnp.max(jnp.where(mask, v, _NEG), axis=-1)
    return vmin, vmax


def _corners_from_spans(min_x, max_x, min_y, max_y, angle):
    """Corner order of the reference fits (pointcloud_utils.py:220-226,366-371):
    [[max_x, min_y], [min_x, min_y], [min_x, max_y], [max_x, max_y]] mapped
    back by the angle's rotation components."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    comp = jnp.stack([jnp.stack([c, s]), jnp.stack([-s, c])])  # (2, 2)
    rect = jnp.stack(
        [
            jnp.stack([max_x, min_y]),
            jnp.stack([min_x, min_y]),
            jnp.stack([min_x, max_y]),
            jnp.stack([max_x, max_y]),
        ]
    )  # (4, 2) in rotated frame
    return rect @ comp  # back-rotate: rows are world-frame corners


def _sweep_projections(points_xy: jax.Array, mask: jax.Array, angles: jax.Array):
    """Project masked points onto each sweep angle's axes.

    points_xy: (P, 2); angles: (A,). Returns per-angle spans
    (min_x, max_x, min_y, max_y): each (A,).
    """
    c, s = jnp.cos(angles), jnp.sin(angles)  # (A,)
    px = points_xy[:, 0][None, :] * c[:, None] + points_xy[:, 1][None, :] * s[:, None]
    py = -points_xy[:, 0][None, :] * s[:, None] + points_xy[:, 1][None, :] * c[:, None]
    m = mask[None, :]
    min_x, max_x = _masked_minmax(px, m)
    min_y, max_y = _masked_minmax(py, m)
    return px, py, min_x, max_x, min_y, max_y


def min_area_rect(points_xy: jax.Array, mask: jax.Array, step_deg: float = 0.5):
    """Minimum-area bounding rectangle via dense angle sweep.

    Replaces the convex-hull rotating-calipers search
    (pointcloud_utils.py:309-372) with a TPU-friendly fixed sweep over
    [0, 90] deg; hull edge angles are a subset of this grid up to
    ``step_deg`` resolution, so areas match to first order.

    Degenerate inputs (<3 valid points or zero spread) fall back to a
    0.1 m box at the mean, matching the reference fallback
    (pointcloud_utils.py:322-326).

    Returns (corners (4,2), angle, area).
    """
    angles = jnp.arange(0.0, 90.0 + step_deg, step_deg) * (jnp.pi / 180.0)
    _, _, min_x, max_x, min_y, max_y = _sweep_projections(points_xy, mask, angles)
    areas = (max_x - min_x) * (max_y - min_y)
    best = jnp.argmin(areas)
    angle = angles[best]
    corners = _corners_from_spans(min_x[best], max_x[best], min_y[best], max_y[best], angle)

    n_valid = jnp.sum(mask)
    mean = jnp.sum(jnp.where(mask[:, None], points_xy, 0.0), axis=0) / jnp.maximum(n_valid, 1)
    fallback_corners = mean[None, :] + jnp.array(
        [[-0.05, -0.05], [0.05, -0.05], [0.05, 0.05], [-0.05, 0.05]]
    )
    degenerate = n_valid < 3
    corners = jnp.where(degenerate, fallback_corners, corners)
    angle = jnp.where(degenerate, 0.0, angle)
    area = jnp.where(degenerate, 0.0, areas[best])
    return corners, angle, area


def closeness_rect(points_xy: jax.Array, mask: jax.Array, delta_deg: float = 2.0,
                   delta_zero: float = 1e-2):
    """Closeness-score rectangle (pointcloud_utils.py:169-228).

    Score per angle: sum of 1/max(min(Dx, Dy), delta_zero) where Dx/Dy are
    distances to the nearer rectangle side; pick max score; orient the
    long side along x (swap + pi/2 if needed).
    """
    angles = jnp.arange(0.0, 90.0 + delta_deg, delta_deg) * (jnp.pi / 180.0)
    px, py, min_x, max_x, min_y, max_y = _sweep_projections(points_xy, mask, angles)
    dx = jnp.minimum(px - min_x[:, None], max_x[:, None] - px)
    dy = jnp.minimum(py - min_y[:, None], max_y[:, None] - py)
    beta = 1.0 / jnp.maximum(jnp.minimum(dx, dy), delta_zero)
    score = jnp.sum(jnp.where(mask[None, :], beta, 0.0), axis=-1)
    best = jnp.argmax(score)
    angle = angles[best]
    # long-side orientation swap (pointcloud_utils.py:207-216)
    swap = (max_x[best] - min_x[best]) < (max_y[best] - min_y[best])
    angle = jnp.where(swap, angle + jnp.pi / 2, angle)
    c, s = jnp.cos(angle), jnp.sin(angle)
    px2 = points_xy[:, 0] * c + points_xy[:, 1] * s
    py2 = -points_xy[:, 0] * s + points_xy[:, 1] * c
    mn_x, mx_x = _masked_minmax(px2, mask)
    mn_y, mx_y = _masked_minmax(py2, mask)
    corners = _corners_from_spans(mn_x, mx_x, mn_y, mx_y, angle)
    area = (mx_x - mn_x) * (mx_y - mn_y)
    return corners, angle, area


def variance_rect(points_xy: jax.Array, mask: jax.Array, delta_deg: float = 1.0):
    """Variance-criterion rectangle (pointcloud_utils.py:231-287)."""
    angles = jnp.arange(0.0, 90.0 + delta_deg, delta_deg) * (jnp.pi / 180.0)
    px, py, min_x, max_x, min_y, max_y = _sweep_projections(points_xy, mask, angles)
    dx = jnp.minimum(px - min_x[:, None], max_x[:, None] - px)
    dy = jnp.minimum(py - min_y[:, None], max_y[:, None] - py)

    def neg_var(values, sel):
        cnt = jnp.sum(sel, axis=-1)
        mean = jnp.sum(jnp.where(sel, values, 0.0), axis=-1) / jnp.maximum(cnt, 1)
        var = jnp.sum(jnp.where(sel, (values - mean[:, None]) ** 2, 0.0), axis=-1) / jnp.maximum(cnt, 1)
        return jnp.where(cnt > 0, -var, 0.0)

    m = mask[None, :]
    score = neg_var(dx, m & (dx < dy)) + neg_var(dy, m & (dy < dx))
    best = jnp.argmax(score)
    angle = angles[best]
    swap = (max_x[best] - min_x[best]) < (max_y[best] - min_y[best])
    angle = jnp.where(swap, angle + jnp.pi / 2, angle)
    c, s = jnp.cos(angle), jnp.sin(angle)
    px2 = points_xy[:, 0] * c + points_xy[:, 1] * s
    py2 = -points_xy[:, 0] * s + points_xy[:, 1] * c
    mn_x, mx_x = _masked_minmax(px2, mask)
    mn_y, mx_y = _masked_minmax(py2, mask)
    corners = _corners_from_spans(mn_x, mx_x, mn_y, mx_y, angle)
    return corners, angle, (mx_x - mn_x) * (mx_y - mn_y)


def pca_rect(points_xy: jax.Array, mask: jax.Array):
    """PCA-axis rectangle (pointcloud_utils.py:290-306) via 2x2 eigh."""
    n = jnp.maximum(jnp.sum(mask), 1)
    mean = jnp.sum(jnp.where(mask[:, None], points_xy, 0.0), axis=0) / n
    centered = jnp.where(mask[:, None], points_xy - mean, 0.0)
    cov = centered.T @ centered / jnp.maximum(n - 1, 1)
    _, eigvecs = jnp.linalg.eigh(cov)
    major = eigvecs[:, 1]  # largest eigenvalue last in eigh
    angle = jnp.arctan2(major[1], major[0])
    c, s = jnp.cos(angle), jnp.sin(angle)
    px = points_xy[:, 0] * c + points_xy[:, 1] * s
    py = -points_xy[:, 0] * s + points_xy[:, 1] * c
    mn_x, mx_x = _masked_minmax(px, mask)
    mn_y, mx_y = _masked_minmax(py, mask)
    corners = _corners_from_spans(mn_x, mx_x, mn_y, mx_y, angle)
    return corners, angle, (mx_x - mn_x) * (mx_y - mn_y)


# ---------------------------------------------------------------------------
# Corners / membership
# ---------------------------------------------------------------------------

def box_corners_bev(boxes: jax.Array) -> jax.Array:
    """(..., 7) -> (..., 4, 2) BEV corners."""
    cx, cy = boxes[..., 0], boxes[..., 1]
    l, w, yaw = boxes[..., 3], boxes[..., 4], boxes[..., 6]
    dx = jnp.stack([l / 2, -l / 2, -l / 2, l / 2], -1)
    dy = jnp.stack([-w / 2, -w / 2, w / 2, w / 2], -1)
    c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    x = cx[..., None] + dx * c - dy * s
    y = cy[..., None] + dx * s + dy * c
    return jnp.stack([x, y], -1)


def box_corners_3d(boxes: jax.Array) -> jax.Array:
    """(..., 7) -> (..., 8, 3); z is box center (pcdet convention)."""
    bev = box_corners_bev(boxes)  # (..., 4, 2)
    cz, h = boxes[..., 2], boxes[..., 5]
    low = cz - h / 2
    high = cz + h / 2
    xy = jnp.concatenate([bev, bev], axis=-2)  # (..., 8, 2)
    z = jnp.concatenate(
        [jnp.broadcast_to(low[..., None], bev.shape[:-1]),
         jnp.broadcast_to(high[..., None], bev.shape[:-1])], axis=-1)
    return jnp.concatenate([xy, z[..., None]], axis=-1)


def points_in_boxes(points: jax.Array, boxes: jax.Array,
                    point_mask: jax.Array | None = None,
                    box_mask: jax.Array | None = None) -> jax.Array:
    """Per-point index of the first containing box, -1 if none.

    Mirrors pcdet ``points_in_boxes_gpu`` semantics (z is box center).
    points: (P, 3+), boxes: (B, 7).
    """
    xyz = points[:, :3]
    local = xyz[:, None, :] - boxes[None, :, :3]  # (P, B, 3)
    yaw = boxes[:, 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    lx = local[..., 0] * c[None, :] + local[..., 1] * s[None, :]
    ly = -local[..., 0] * s[None, :] + local[..., 1] * c[None, :]
    inside = (
        (jnp.abs(lx) <= boxes[None, :, 3] / 2)
        & (jnp.abs(ly) <= boxes[None, :, 4] / 2)
        & (jnp.abs(local[..., 2]) <= boxes[None, :, 5] / 2)
    )
    if box_mask is not None:
        inside &= box_mask[None, :]
    if point_mask is not None:
        inside &= point_mask[:, None]
    any_inside = jnp.any(inside, axis=1)
    first = jnp.argmax(inside, axis=1)
    return jnp.where(any_inside, first, -1)


# ---------------------------------------------------------------------------
# Rotated IoU (BEV + 3D) — candidate-point polygon intersection
# ---------------------------------------------------------------------------

def _segment_intersections(a: jax.Array, b: jax.Array):
    """All 16 edge-edge intersection points of two quads a, b: (4, 2) each.

    Returns points (16, 2) and validity (16,).
    """
    a1 = a  # (4,2)
    a2 = jnp.roll(a, -1, axis=0)
    b1 = b
    b2 = jnp.roll(b, -1, axis=0)
    # pairwise (4,4)
    p = a1[:, None, :]
    r = (a2 - a1)[:, None, :]
    q = b1[None, :, :]
    s = (b2 - b1)[None, :, :]
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]  # (4,4)
    qp = q - p
    t = (qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]) / jnp.where(denom == 0, 1.0, denom)
    u = (qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]) / jnp.where(denom == 0, 1.0, denom)
    valid = (jnp.abs(denom) > 1e-12) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts = p + t[..., None] * r
    return pts.reshape(16, 2), valid.reshape(16)


def _corners_inside(corners: jax.Array, box: jax.Array, eps: float = 1e-6):
    local = corners - box[:2]
    c, s = jnp.cos(box[6]), jnp.sin(box[6])
    lx = local[..., 0] * c + local[..., 1] * s
    ly = -local[..., 0] * s + local[..., 1] * c
    return (jnp.abs(lx) <= box[3] / 2 + eps) & (jnp.abs(ly) <= box[4] / 2 + eps)


def _overlap_bev_single(box_a: jax.Array, box_b: jax.Array) -> jax.Array:
    """Intersection area of two rotated BEV rectangles.

    Candidate vertices = corners of A in B + corners of B in A + all
    edge-edge intersections (24 candidates); sort the valid ones by angle
    around their centroid; shoelace with invalid slots pinned to the first
    valid vertex so the cyclic sum is unaffected.
    """
    ca = box_corners_bev(box_a)
    cb = box_corners_bev(box_b)
    inter_pts, inter_valid = _segment_intersections(ca, cb)
    a_in = _corners_inside(ca, box_b)
    b_in = _corners_inside(cb, box_a)
    pts = jnp.concatenate([ca, cb, inter_pts], axis=0)  # (24, 2)
    valid = jnp.concatenate([a_in, b_in, inter_valid], axis=0)  # (24,)

    n = jnp.sum(valid)
    centroid = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / jnp.maximum(n, 1)
    ang = jnp.arctan2(pts[:, 1] - centroid[1], pts[:, 0] - centroid[0])
    ang = jnp.where(valid, ang, _POS)
    order = jnp.argsort(ang)
    pts_sorted = pts[order]
    valid_sorted = valid[order]
    first = pts_sorted[0]  # if any valid, slot 0 is valid after sort
    pts_closed = jnp.where(valid_sorted[:, None], pts_sorted, first[None, :])
    nxt = jnp.roll(pts_closed, -1, axis=0)
    cross = pts_closed[:, 0] * nxt[:, 1] - nxt[:, 0] * pts_closed[:, 1]
    area = 0.5 * jnp.abs(jnp.sum(cross))
    return jnp.where(n >= 3, area, 0.0)


@jax.jit
def iou_bev_matrix(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """(A, 7), (B, 7) -> (A, B) rotated BEV IoU."""
    overlap = jax.vmap(lambda a: jax.vmap(lambda b: _overlap_bev_single(a, b))(boxes_b))(boxes_a)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    union = jnp.maximum(area_a + area_b - overlap, 1e-9)
    return overlap / union


@jax.jit
def iou3d_matrix(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """(A, 7), (B, 7) -> (A, B) rotated 3D IoU (pcdet ``boxes_iou3d_gpu``)."""
    overlap_bev = jax.vmap(
        lambda a: jax.vmap(lambda b: _overlap_bev_single(a, b))(boxes_b)
    )(boxes_a)
    za_max = boxes_a[:, 2] + boxes_a[:, 5] / 2
    za_min = boxes_a[:, 2] - boxes_a[:, 5] / 2
    zb_max = boxes_b[:, 2] + boxes_b[:, 5] / 2
    zb_min = boxes_b[:, 2] - boxes_b[:, 5] / 2
    z_overlap = jnp.maximum(
        jnp.minimum(za_max[:, None], zb_max[None, :])
        - jnp.maximum(za_min[:, None], zb_min[None, :]),
        0.0,
    )
    inter = overlap_bev * z_overlap
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    union = jnp.maximum(vol_a + vol_b - inter, 1e-9)
    return inter / union


@jax.jit
def get_box_heights(points: jax.Array, boxes: jax.Array,
                    point_mask: jax.Array | None = None) -> jax.Array:
    """Re-derive each box's z center and height from its contained points
    (`/root/reference/src/utils/pointcloud_utils.py:144-158`): boxes with
    points get z = zmin + h/2 and h = z extent; empty boxes unchanged.
    points: (P, 3+), boxes: (B, 7) -> (B, 7).
    """
    idx = points_in_boxes(points, boxes, point_mask=point_mask)
    b = boxes.shape[0]
    onehot = idx[:, None] == jnp.arange(b)[None, :]  # (P, B)
    z = points[:, 2][:, None]
    zmin = jnp.min(jnp.where(onehot, z, _POS), axis=0)
    zmax = jnp.max(jnp.where(onehot, z, _NEG), axis=0)
    has = jnp.any(onehot, axis=0)
    h = zmax - zmin
    new_z = jnp.where(has, zmin + h / 2, boxes[:, 2])
    new_h = jnp.where(has, h, boxes[:, 5])
    return boxes.at[:, 2].set(new_z).at[:, 5].set(new_h)


def bin_angles(angles: jax.Array, mask: jax.Array, n_bins: int = 45):
    """Orientation histogram over [0, pi) (pointcloud_utils.py:525-560),
    jittable over padded angle sets. Returns (counts (n_bins,),
    mean-of-fullest-bin). The reference returns the fullest bin's angle
    list; its only consumer takes the mean (zero_shot_detector.py:756-759).
    """
    norm = jnp.mod(angles, 2 * jnp.pi)
    norm = jnp.where(norm > jnp.pi, jnp.mod(norm, jnp.pi), norm)
    bins = jnp.clip((norm / (jnp.pi / n_bins)).astype(jnp.int32), 0, n_bins - 1)
    counts = jax.ops.segment_sum(jnp.where(mask, 1, 0), bins, num_segments=n_bins)
    best = jnp.argmax(counts)
    sel = mask & (bins == best)
    mean = jnp.sum(jnp.where(sel, norm, 0.0)) / jnp.maximum(jnp.sum(sel), 1)
    return counts, mean
