import numpy as np
import jax
import jax.numpy as jnp

from vilgod_tpu.ops import plane as P
from vilgod_tpu.ops import segment as S
from vilgod_tpu.ops import cluster as C


def pad_pts(points, total):
    out = np.zeros((total, points.shape[1]), np.float32)
    out[: len(points)] = points
    mask = np.zeros(total, bool)
    mask[: len(points)] = True
    return out, mask


def test_ransac_ground_plane(rng):
    # tilted ground plane + outlier structure
    n = 500
    xy = rng.uniform(-20, 20, size=(n, 2))
    z = 0.05 * xy[:, 0] - 0.02 * xy[:, 1] + 1.0 + rng.normal(scale=0.02, size=n)
    ground = np.column_stack([xy, z]).astype(np.float32)
    wall = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32) * [1, 1, 3] + [5, 5, 4]
    pts = np.concatenate([ground, wall])
    padded, mask = pad_pts(pts, 1024)
    plane = np.asarray(P.fit_ground_plane(jnp.asarray(padded), jnp.asarray(mask),
                                          jax.random.PRNGKey(0), 0.1, 100))
    # expected normal ∝ (-0.05, 0.02, 1)
    expected = np.array([-0.05, 0.02, 1.0])
    expected /= np.linalg.norm(expected)
    assert abs(np.dot(plane[:3], expected)) > 0.999
    # distances of true ground points should be tiny
    d = np.abs(ground @ plane[:3] + plane[3])
    assert np.median(d) < 0.05


def test_pca_plane_stats(rng):
    pts = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
    pts[:, 2] = 0.3 + rng.normal(scale=0.01, size=200)
    padded, mask = pad_pts(pts, 256)
    normal, mean, d, sv = P.pca_plane_stats(jnp.asarray(padded), jnp.asarray(mask))
    normal = np.asarray(normal)
    assert abs(normal[2]) > 0.999
    assert abs(float(mean[2]) - 0.3) < 0.01
    sv = np.asarray(sv)
    assert sv[0] < sv[1] <= sv[2]
    assert sv[0] < 1e-3  # flat


def test_segment_stats(rng):
    labels = np.array([0, 0, 0, 1, 1, -1, 1, 0], np.int32)
    mask = np.ones(8, bool)
    pts = rng.normal(size=(8, 3)).astype(np.float32)
    table, tmask = C.build_cluster_table(jnp.asarray(labels), jnp.asarray(mask), 4, 8)
    gathered = S.gather_cluster_points(jnp.asarray(pts), table, tmask)

    for cid, sel in [(0, labels == 0), (1, labels == 1)]:
        np.testing.assert_allclose(
            np.asarray(S.seg_mean(gathered, tmask))[cid], pts[sel].mean(0), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(S.seg_median(gathered, tmask))[cid], np.median(pts[sel], 0), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(S.seg_min(gathered, tmask))[cid], pts[sel].min(0), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(S.seg_max(gathered, tmask))[cid], pts[sel].max(0), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(S.seg_count(tmask))[:2], [4, 3])


def test_seg_percentile(rng):
    vals = rng.normal(size=(1, 37)).astype(np.float32)
    mask = np.ones((1, 37), bool)
    for q in [0, 20, 30, 50, 77, 100]:
        got = float(np.asarray(S.seg_percentile(jnp.asarray(vals), jnp.asarray(mask), q))[0])
        expected = np.percentile(vals[0], q)
        assert abs(got - expected) < 1e-5, (q, got, expected)


def test_hull_area():
    # independent per-draw seeds: the session rng made this test's inputs
    # depend on suite order, and rare draws sit right at the support-
    # polygon approximation's worst case
    from scipy import spatial
    for seed in range(12):
        r = np.random.default_rng(seed)
        pts = r.normal(size=(60, 2)).astype(np.float32) * [3, 1]
        padded, mask = pad_pts(pts, 64)
        got = float(np.asarray(S.convex_hull_area_bev(jnp.asarray(padded), jnp.asarray(mask))))
        hull = spatial.ConvexHull(pts)
        assert abs(got - hull.volume) / hull.volume < 0.01  # 2D 'volume' is area


def test_seg_stats_by_label(rng):
    """By-label median/percentile/count (flat-cloud sorted runs) match
    numpy per-cluster statistics exactly."""
    n, C = 4096, 16
    labels = rng.integers(-1, C, n).astype(np.int32)
    valid = rng.random(n) < 0.9
    vals = rng.normal(0, 5, (n, 3)).astype(np.float32)
    ent = rng.random(n).astype(np.float32)
    med = np.asarray(S.seg_median_by_label(jnp.asarray(vals),
                                           jnp.asarray(labels),
                                           jnp.asarray(valid & (labels >= 0)), C))
    pct = np.asarray(S.seg_percentile_by_label(jnp.asarray(ent),
                                               jnp.asarray(labels),
                                               jnp.asarray(valid & (labels >= 0)),
                                               C, 30.0))
    cnt = np.asarray(S.seg_count_by_label(jnp.asarray(labels),
                                          jnp.asarray(valid & (labels >= 0)), C))
    for c in range(C):
        sel = (labels == c) & valid
        assert cnt[c] == sel.sum()
        if sel.sum():
            np.testing.assert_allclose(med[c], np.median(vals[sel], 0),
                                       rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(pct[c], np.percentile(ent[sel], 30.0),
                                       rtol=1e-5, atol=1e-6)
        else:
            assert (med[c] == 0).all() and pct[c] == 0


def test_seg_minmax_and_hull_by_label(rng):
    """Scatter-based by-label min/max and the streaming support-function
    hull must match numpy / the per-cluster hull kernel."""
    n, C = 4096, 12
    labels = rng.integers(-1, C, n).astype(np.int32)
    valid = rng.random(n) < 0.9
    pts = rng.normal(0, 4, (n, 3)).astype(np.float32)
    sel_any = valid & (labels >= 0)
    mn = np.asarray(S.seg_min_by_label(jnp.asarray(pts), jnp.asarray(labels),
                                       jnp.asarray(sel_any), C))
    mx = np.asarray(S.seg_max_by_label(jnp.asarray(pts), jnp.asarray(labels),
                                       jnp.asarray(sel_any), C))
    hull = np.asarray(S.hull_area_by_label(jnp.asarray(pts[:, :2]),
                                           jnp.asarray(labels),
                                           jnp.asarray(sel_any), C))
    for c in range(C):
        sel = (labels == c) & valid
        if sel.sum():
            np.testing.assert_allclose(mn[c], pts[sel].min(0), rtol=1e-6)
            np.testing.assert_allclose(mx[c], pts[sel].max(0), rtol=1e-6)
        else:
            assert (mn[c] == 0).all() and (mx[c] == 0).all()
        # same geometry as the per-cluster support-function kernel
        cap = 512
        padded = np.zeros((cap, 2), np.float32)
        m = np.zeros(cap, bool)
        k = min(sel.sum(), cap)
        padded[:k] = pts[sel][:k, :2]
        m[:k] = True
        ref = float(np.asarray(S.convex_hull_area_bev(jnp.asarray(padded),
                                                      jnp.asarray(m))))
        if sel.sum() <= cap:
            np.testing.assert_allclose(hull[c], ref, rtol=1e-4, atol=1e-5)
