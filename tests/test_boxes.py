import numpy as np
import jax.numpy as jnp

from vilgod_tpu.ops import boxes as B


# ------------------------- numpy oracles -------------------------

def min_area_rect_oracle(points):
    """Convex-hull rotating calipers (reference algorithm,
    pointcloud_utils.py:309-372) as the exact oracle."""
    from scipy import spatial

    hull_points = points[spatial.ConvexHull(points).vertices]
    edges = hull_points[1:] - hull_points[:-1]
    angles = np.arctan2(edges[:, 1], edges[:, 0])
    angles = np.abs(np.mod(angles, np.pi / 2))
    angles = np.unique(angles)
    best_area = np.inf
    for a in angles:
        comp = np.array([[np.cos(a), np.sin(a)], [-np.sin(a), np.cos(a)]])
        proj = hull_points @ comp.T
        area = (proj[:, 0].max() - proj[:, 0].min()) * (proj[:, 1].max() - proj[:, 1].min())
        if area < best_area:
            best_area = area
    return best_area


def pad(points, total):
    out = np.zeros((total, points.shape[1]), np.float32)
    out[: len(points)] = points
    mask = np.zeros(total, bool)
    mask[: len(points)] = True
    return out, mask


def test_min_area_rect_close_to_hull_oracle(rng):
    for _ in range(10):
        n = rng.integers(10, 200)
        pts = rng.normal(size=(n, 2)).astype(np.float32) * rng.uniform(0.5, 3.0)
        padded, mask = pad(pts, 256)
        corners, angle, area = B.min_area_rect(jnp.asarray(padded), jnp.asarray(mask), 0.25)
        oracle = min_area_rect_oracle(pts)
        # The reference's hull-edge enumeration skips the wrap-around edge,
        # so the dense sweep may find a slightly *smaller* rect; allow both
        # directions within a small band.
        assert float(area) >= oracle * 0.9 - 1e-4
        assert float(area) <= oracle * 1.02 + 1e-4  # dense sweep within 2%


def test_min_area_rect_axis_aligned():
    pts = np.array([[0, 0], [4, 0], [4, 2], [0, 2], [2, 1]], np.float32)
    padded, mask = pad(pts, 64)
    corners, angle, area = B.min_area_rect(jnp.asarray(padded), jnp.asarray(mask), 0.5)
    assert np.isclose(float(area), 8.0, atol=1e-3)
    corners = np.asarray(corners)
    # l (c0-c1) should be the x-extent 4, w (c0-c3) the y-extent 2 (or swapped)
    l = np.linalg.norm(corners[0] - corners[1])
    w = np.linalg.norm(corners[0] - corners[3])
    assert sorted([round(l, 2), round(w, 2)]) == [2.0, 4.0]
    c = (corners[0] + corners[2]) / 2
    np.testing.assert_allclose(c, [2.0, 1.0], atol=1e-3)


def test_min_area_rect_degenerate():
    pts = np.array([[1.0, 1.0], [1.0, 1.0]], np.float32)
    padded, mask = pad(pts, 16)
    corners, angle, area = B.min_area_rect(jnp.asarray(padded), jnp.asarray(mask))
    assert float(area) == 0.0
    np.testing.assert_allclose(np.asarray(corners).mean(axis=0), [1.0, 1.0], atol=1e-5)


def test_points_in_boxes():
    boxes = np.array(
        [
            [0, 0, 0, 4, 2, 2, 0],
            [10, 0, 0, 2, 2, 2, np.pi / 4],
        ],
        np.float32,
    )
    pts = np.array(
        [
            [0, 0, 0],       # in box 0
            [1.9, 0.9, 0.9],  # in box 0 (corner)
            [2.5, 0, 0],     # outside
            [10, 0, 0],      # in box 1
            [10 + 1.35, 0, 0],  # outside box 1 (rotated: half-diag along x is ~1.414 but box is 2x2 -> corner at 1.414; x=1.35 inside? local x = 1.35*cos45=0.95<1, local y=-0.95<1 -> inside)
        ],
        np.float32,
    )
    idx = np.asarray(B.points_in_boxes(jnp.asarray(pts), jnp.asarray(boxes)))
    assert idx[0] == 0 and idx[1] == 0 and idx[2] == -1 and idx[3] == 1
    assert idx[4] == 1  # see comment above


def iou_mc_oracle(a, b, n=200_000, seed=0):
    """Monte-Carlo 3D IoU oracle."""
    rng = np.random.default_rng(seed)
    corners = []
    for box in (a, b):
        c = np.asarray(B.box_corners_3d(jnp.asarray(box[None])))[0]
        corners.append(c)
    allc = np.concatenate(corners, 0)
    lo, hi = allc.min(0) - 0.1, allc.max(0) + 0.1
    pts = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    idx_a = np.asarray(B.points_in_boxes(jnp.asarray(pts), jnp.asarray(a[None])))
    idx_b = np.asarray(B.points_in_boxes(jnp.asarray(pts), jnp.asarray(b[None])))
    in_a = idx_a == 0
    in_b = idx_b == 0
    inter = np.sum(in_a & in_b)
    union = np.sum(in_a | in_b)
    return inter / max(union, 1)


def test_iou3d_identical():
    box = np.array([[1, 2, 0, 4, 2, 1.5, 0.3]], np.float32)
    iou = np.asarray(B.iou3d_matrix(jnp.asarray(box), jnp.asarray(box)))
    assert np.isclose(iou[0, 0], 1.0, atol=1e-4)


def test_iou3d_disjoint():
    a = np.array([[0, 0, 0, 2, 2, 2, 0]], np.float32)
    b = np.array([[10, 0, 0, 2, 2, 2, 0.5]], np.float32)
    iou = np.asarray(B.iou3d_matrix(jnp.asarray(a), jnp.asarray(b)))
    assert iou[0, 0] == 0.0


def test_iou3d_vs_monte_carlo(rng):
    for i in range(6):
        a = np.array([0, 0, 0, rng.uniform(1, 4), rng.uniform(1, 3),
                      rng.uniform(1, 2), rng.uniform(0, np.pi)], np.float32)
        b = a.copy()
        b[:2] += rng.uniform(-1.5, 1.5, size=2)
        b[6] = rng.uniform(0, np.pi)
        iou = float(np.asarray(B.iou3d_matrix(jnp.asarray(a[None]), jnp.asarray(b[None])))[0, 0])
        mc = iou_mc_oracle(a, b, seed=i)
        assert abs(iou - mc) < 0.02, (iou, mc, a, b)


def test_iou_bev_axis_aligned():
    a = np.array([[0, 0, 0, 2, 2, 1, 0]], np.float32)
    b = np.array([[1, 0, 0, 2, 2, 1, 0]], np.float32)
    iou = float(np.asarray(B.iou_bev_matrix(jnp.asarray(a), jnp.asarray(b)))[0, 0])
    # overlap = 1*2 = 2; union = 4+4-2 = 6
    assert np.isclose(iou, 2 / 6, atol=1e-4)


def test_closeness_rect_recovers_l_shape(rng):
    # L-shaped vehicle-like outline at a known heading
    theta = 0.4
    rot = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    xs = np.concatenate([np.linspace(0, 4, 60), np.zeros(30)])
    ys = np.concatenate([np.zeros(60), np.linspace(0, 1.8, 30)])
    pts = (np.stack([xs, ys], 1) @ rot.T).astype(np.float32)
    pts += rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
    padded, mask = pad(pts, 128)
    corners, angle, area = B.closeness_rect(jnp.asarray(padded), jnp.asarray(mask), 2.0)
    # recovered heading mod pi/2 should be close to theta
    diff = abs((float(angle) - theta + np.pi / 4) % (np.pi / 2) - np.pi / 4)
    assert diff < np.deg2rad(4.0)


def test_pca_rect_runs(rng):
    pts = rng.normal(size=(50, 2)).astype(np.float32)
    pts[:, 0] *= 5
    padded, mask = pad(pts, 64)
    corners, angle, area = B.pca_rect(jnp.asarray(padded), jnp.asarray(mask))
    assert abs((float(angle) + np.pi) % np.pi) < 0.4 or abs((float(angle) + np.pi) % np.pi - np.pi) < 0.4


# ---------------- reference-fit oracles for the configured methods ---------


def _sweep_rect_oracle(pts, criterion, delta_deg, delta_zero=1e-2):
    """Numpy transcription of the reference's closeness/variance sweeps
    (pointcloud_utils.py:169-287): score every angle in [0, 90] deg,
    pick the best, re-project, long-side swap, corners in the fixed
    [max/min x, min/max y] order."""
    best_score, best_angle = -np.inf, 0.0
    for adeg in np.arange(0.0, 90.0 + delta_deg, delta_deg):
        a = np.deg2rad(adeg)
        px = pts[:, 0] * np.cos(a) + pts[:, 1] * np.sin(a)
        py = -pts[:, 0] * np.sin(a) + pts[:, 1] * np.cos(a)
        dx = np.minimum(px - px.min(), px.max() - px)
        dy = np.minimum(py - py.min(), py.max() - py)
        if criterion == "closeness":
            score = float(np.sum(1.0 / np.maximum(np.minimum(dx, dy),
                                                  delta_zero)))
        else:  # variance criterion
            score = 0.0
            if np.any(dx < dy):
                score -= float(np.var(dx[dx < dy]))
            if np.any(dy < dx):
                score -= float(np.var(dy[dy < dx]))
        if score > best_score:
            best_score, best_angle = score, a
    a = best_angle
    px = pts[:, 0] * np.cos(a) + pts[:, 1] * np.sin(a)
    py = -pts[:, 0] * np.sin(a) + pts[:, 1] * np.cos(a)
    if (px.max() - px.min()) < (py.max() - py.min()):
        a += np.pi / 2
        px = pts[:, 0] * np.cos(a) + pts[:, 1] * np.sin(a)
        py = -pts[:, 0] * np.sin(a) + pts[:, 1] * np.cos(a)
    comp = np.array([[np.cos(a), np.sin(a)], [-np.sin(a), np.cos(a)]])
    rect = np.array([[px.max(), py.min()], [px.min(), py.min()],
                     [px.min(), py.max()], [px.max(), py.max()]])
    return rect @ comp, a, (px.max() - px.min()) * (py.max() - py.min())


def _cluster_cloud(rng, n=90):
    theta = float(rng.uniform(0, np.pi / 2))
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    base = np.stack([rng.uniform(0, 4.2, n), rng.uniform(0, 1.8, n)], 1)
    return (base @ rot.T + rng.normal(scale=0.02, size=(n, 2))).astype(np.float32)


def test_closeness_rect_matches_reference_oracle(rng):
    for _ in range(5):
        pts = _cluster_cloud(rng)
        padded, mask = pad(pts, 128)
        corners, angle, area = B.closeness_rect(
            jnp.asarray(padded), jnp.asarray(mask), delta_deg=2.0)
        oc, oa, oarea = _sweep_rect_oracle(pts.astype(np.float64),
                                           "closeness", 2.0)
        np.testing.assert_allclose(np.asarray(corners), oc, atol=2e-3)
        assert abs(float(area) - oarea) < 5e-3


def test_variance_rect_matches_reference_oracle(rng):
    for _ in range(5):
        pts = _cluster_cloud(rng)
        padded, mask = pad(pts, 128)
        corners, angle, area = B.variance_rect(
            jnp.asarray(padded), jnp.asarray(mask), delta_deg=1.0)
        oc, oa, oarea = _sweep_rect_oracle(pts.astype(np.float64),
                                           "variance", 1.0)
        np.testing.assert_allclose(np.asarray(corners), oc, atol=2e-3)
        assert abs(float(area) - oarea) < 5e-3


def test_pca_rect_matches_reference_oracle(rng):
    """PCA fit vs a covariance-eigenvector oracle (the reference uses
    sklearn PCA, pointcloud_utils.py:290-306; principal axes are equal
    up to sign, so compare the spanned rectangle, not the angle)."""
    for _ in range(5):
        pts = _cluster_cloud(rng)
        padded, mask = pad(pts, 128)
        corners, angle, area = B.pca_rect(jnp.asarray(padded),
                                          jnp.asarray(mask))
        c = pts - pts.mean(0)
        evals, evecs = np.linalg.eigh(c.T @ c / (len(pts) - 1))
        major = evecs[:, 1]
        a = np.arctan2(major[1], major[0])
        px = pts[:, 0] * np.cos(a) + pts[:, 1] * np.sin(a)
        py = -pts[:, 0] * np.sin(a) + pts[:, 1] * np.cos(a)
        oarea = (px.max() - px.min()) * (py.max() - py.min())
        assert abs(float(area) - oarea) < 5e-3
