import numpy as np
import jax.numpy as jnp

from vilgod_tpu.ops import rasterize as R


def test_resize_matches_torch_align_corners(rng):
    import torch
    img = rng.normal(size=(2, 110, 110)).astype(np.float32)
    out = np.asarray(R._resize_bilinear_align_corners(jnp.asarray(img), 224, 224))
    t = torch.nn.functional.interpolate(
        torch.from_numpy(img)[:, None], size=(224, 224), mode="bilinear",
        align_corners=True)[:, 0].numpy()
    np.testing.assert_allclose(out, t, rtol=1e-3, atol=1e-3)


def make_cluster(rng, center=(8.0, 2.0, 0.0), size=(4.0, 2.0, 1.5), n=600, total=1024):
    pts = rng.uniform(-0.5, 0.5, size=(n, 3)) * np.asarray(size) + np.asarray(center)
    out = np.zeros((total, 3), np.float32)
    out[:n] = pts
    mask = np.zeros(total, bool)
    mask[:n] = True
    return out, mask


def test_render_shapes_and_range(rng):
    pts1, m1 = make_cluster(rng)
    pts2, m2 = make_cluster(rng, center=(-5, 10, 0.5))
    points = jnp.asarray(np.stack([pts1, pts2]))
    mask = jnp.asarray(np.stack([m1, m2]))
    imgs = np.asarray(R.render_cluster_views(points, mask))
    assert imgs.shape == (2, 4, 224, 224)
    assert imgs.min() >= -1e-5 and imgs.max() <= 1.0 + 1e-5
    # background should be bright (1.0 after inversion), object darker
    for b in range(2):
        for v in range(4):
            im = imgs[b, v]
            assert (im > 0.99).mean() > 0.4   # plenty of background
            assert (im < 0.9).mean() > 0.01   # some object pixels


def test_render_views_differ(rng):
    pts, m = make_cluster(rng)
    imgs = np.asarray(R.render_cluster_views(jnp.asarray(pts[None]), jnp.asarray(m[None])))
    base = imgs[0, 0]
    for v in range(1, 4):
        assert np.abs(imgs[0, v] - base).mean() > 1e-4


def test_cluster_to_origin_centers(rng):
    pts, m = make_cluster(rng, center=(10.0, -3.0, 0.2))
    out = np.asarray(R.cluster_to_origin(jnp.asarray(pts), jnp.asarray(m)))
    valid = out[m.astype(bool)]
    # after normalization the cluster should sit near the origin
    assert np.linalg.norm(np.median(valid, axis=0)) < 2.5
    assert not np.any(out[~m.astype(bool)])


def test_grid_nonempty_deterministic(rng):
    pts, m = make_cluster(rng)
    a = np.asarray(R.render_cluster_views(jnp.asarray(pts[None]), jnp.asarray(m[None])))
    b = np.asarray(R.render_cluster_views(jnp.asarray(pts[None]), jnp.asarray(m[None])))
    np.testing.assert_array_equal(a, b)
