import numpy as np
import jax.numpy as jnp

from vilgod_tpu.ops import neighbors as N
from vilgod_tpu.ops import entropy as E


def pad_pts(points, total):
    out = np.zeros((total, 3), np.float32)
    out[: len(points)] = points
    mask = np.zeros(total, bool)
    mask[: len(points)] = True
    return out, mask


def test_radius_count_matches_bruteforce(rng):
    q = rng.normal(size=(150, 3)).astype(np.float32)
    d = rng.normal(size=(300, 3)).astype(np.float32)
    qp, qm = pad_pts(q, 256)
    dp, dm = pad_pts(d, 512)
    r = 0.5
    counts = np.asarray(N.radius_count(jnp.asarray(qp), jnp.asarray(qm),
                                       jnp.asarray(dp), jnp.asarray(dm), r,
                                       max_count=1000, block_size=128))
    from scipy.spatial import cKDTree
    tree = cKDTree(d)
    expected = np.array([len(tree.query_ball_point(p, r)) for p in q])
    np.testing.assert_array_equal(counts[:150], expected)
    assert np.all(counts[150:] == 0)


def test_radius_count_self_excludes_self(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    pp, pm = pad_pts(pts, 128)
    counts = np.asarray(N.radius_count_self(jnp.asarray(pp), jnp.asarray(pm), 0.4, block_size=64))
    from scipy.spatial import cKDTree
    tree = cKDTree(pts)
    expected = np.array([len(tree.query_ball_point(p, 0.4)) - 1 for p in pts])
    np.testing.assert_array_equal(counts[:100], expected)


def test_knn_matches_bruteforce(rng):
    q = rng.normal(size=(80, 3)).astype(np.float32)
    d = rng.normal(size=(200, 3)).astype(np.float32)
    qp, qm = pad_pts(q, 128)
    dp, dm = pad_pts(d, 256)
    dists, idx = N.knn(jnp.asarray(qp), jnp.asarray(qm), jnp.asarray(dp), jnp.asarray(dm),
                       k=4, block_size=64)
    dists, idx = np.asarray(dists), np.asarray(idx)
    full = ((q[:, None, :] - d[None, :, :]) ** 2).sum(-1)
    exp_idx = np.argsort(full, axis=1)[:, :4]
    exp_d = np.take_along_axis(full, exp_idx, axis=1)
    np.testing.assert_allclose(dists[:80], exp_d, rtol=1e-4, atol=1e-5)
    # indices may differ on ties; distances must match
    got_d = np.take_along_axis(full, idx[:80], axis=1)
    np.testing.assert_allclose(got_d, exp_d, rtol=1e-4, atol=1e-5)


def test_knn_labels_threshold(rng):
    data = np.array([[0, 0, 0], [5, 5, 5]], np.float32)
    labels = np.array([3, 7])
    query = np.array([[0.1, 0, 0], [9, 9, 9]], np.float32)
    qp, qm = pad_pts(query, 8)
    dp, dm = pad_pts(data, 8)
    out, _ = N.knn_labels(jnp.asarray(qp), jnp.asarray(qm), jnp.asarray(dp), jnp.asarray(dm),
                          jnp.asarray(np.pad(labels, (0, 6))), dist_threshold=0.2)
    out = np.asarray(out)
    assert out[0] == 3       # within sqrt(0.2)
    assert out[1] == -1      # too far
    assert np.all(out[2:] == -1)  # masked queries


def test_entropy_static_vs_moving():
    """Static structure appears in every window frame -> high entropy;
    a point present only in one frame -> low entropy."""
    rng = np.random.default_rng(0)
    wall = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    w_frames = 8
    window = np.stack([wall + rng.normal(scale=0.02, size=wall.shape).astype(np.float32)
                       for _ in range(w_frames)])
    # moving object: only near the query frame (frame 3)
    obj = np.array([[10.0, 0.0, 0.0]], np.float32)
    query = np.concatenate([wall, obj], axis=0)
    qm = np.ones(len(query), bool)
    # insert the object into frame 3's cloud only
    window_padded = np.zeros((w_frames, 256, 3), np.float32)
    window_mask = np.zeros((w_frames, 256), bool)
    for i in range(w_frames):
        pts = window[i]
        if i == 3:
            pts = np.concatenate([pts, obj + 0.01], axis=0)
        window_padded[i, : len(pts)] = pts
        window_mask[i, : len(pts)] = True
    qp = np.zeros((256, 3), np.float32)
    qmask = np.zeros(256, bool)
    qp[: len(query)] = query
    qmask[: len(query)] = True

    h = np.asarray(E.entropy_scores_window(
        jnp.asarray(qp), jnp.asarray(qmask), jnp.asarray(window_padded),
        jnp.asarray(window_mask), jnp.asarray(3), radius=0.3, block_size=64))
    static_h = h[: len(wall)]
    moving_h = h[len(wall)]
    assert np.median(static_h) > 0.95
    assert moving_h < 0.2


def test_entropy_from_counts_uniform():
    counts = np.ones((10, 15), np.int32) * 7
    h = np.asarray(E.entropy_from_counts(jnp.asarray(counts)))
    np.testing.assert_allclose(h, 1.0, atol=1e-5)
