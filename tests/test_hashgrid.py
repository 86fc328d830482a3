"""Spatial hash grid vs brute-force oracles."""
import jax.numpy as jnp
import numpy as np
import pytest

from vilgod_tpu.ops.hashgrid import (grid_min_label, grid_nearest,
                                     grid_radius_count, grid_radius_count3)


def scene(rng, n_clusters=5, n_bg=600, n_pts=300):
    parts = []
    for _ in range(n_clusters):
        c = rng.uniform(-30, 30, 3)
        c[2] = 1.0
        parts.append(rng.normal(scale=[1.0, 0.5, 0.4], size=(n_pts, 3)) + c)
    parts.append(rng.uniform(-35, 35, (n_bg, 3)))
    return np.concatenate(parts).astype(np.float32)


def brute_counts(q, qm, d, dm, r):
    d2 = ((q[:, None, :].astype(np.float64) - d[None].astype(np.float64)) ** 2).sum(-1)
    d2 = np.where(dm[None, :], d2, np.inf)
    return np.where(qm, (d2 <= r * r).sum(1), 0)


def test_grid_radius_count_matches_brute(rng):
    q = scene(rng)
    d = scene(rng, n_clusters=4)
    qm = rng.uniform(size=len(q)) < 0.95
    dm = rng.uniform(size=len(d)) < 0.95
    got = np.asarray(grid_radius_count(
        jnp.asarray(q), jnp.asarray(qm), jnp.asarray(d), jnp.asarray(dm),
        0.3, cell=1.0, dims=128, cap=1024, qblock=512))
    want = brute_counts(q, qm, d, dm, 0.3)
    np.testing.assert_array_equal(got, want)


def test_grid_count3_self_excluding(rng):
    p = scene(rng, n_clusters=3)
    m = np.ones(len(p), bool)
    levels = np.array([0.15, 0.21, 0.3], np.float32)
    got = np.asarray(grid_radius_count3(
        jnp.asarray(p), jnp.asarray(m), jnp.asarray(levels),
        cell=1.0, dims=128, cap=1024, qblock=512))
    for i, lv in enumerate(levels):
        want = brute_counts(p, m, p, m, lv) - 1
        np.testing.assert_array_equal(got[:, i], want)


def test_grid_nearest_matches_brute(rng):
    q = scene(rng, n_clusters=2, n_bg=300)
    d = scene(rng, n_clusters=2, n_bg=300)
    qm = np.ones(len(q), bool)
    dm = rng.uniform(size=len(d)) < 0.9
    bd, bi = grid_nearest(jnp.asarray(q), jnp.asarray(qm),
                          jnp.asarray(d), jnp.asarray(dm),
                          cell=1.0, dims=128, cap=1024, qblock=512)
    bd, bi = np.asarray(bd), np.asarray(bi)
    d2 = ((q[:, None, :].astype(np.float64) - d[None].astype(np.float64)) ** 2).sum(-1)
    d2 = np.where(dm[None, :], d2, np.inf)
    want_d = d2.min(1)
    # the grid only sees the 3x3 neighborhood: beyond ~1 cell the result
    # may be inf; compare only where the true nearest is within one cell
    near = want_d <= 1.0
    np.testing.assert_allclose(bd[near], want_d[near], rtol=1e-5)
    same = bd[near] == want_d[near]
    assert np.all(d2[np.flatnonzero(near), bi[near]][same[:len(same)]]
                  <= want_d[near][same] + 1e-9)


def test_grid_min_label_one_pass(rng):
    p = scene(rng, n_clusters=3, n_bg=200)
    n = len(p)
    core = rng.uniform(size=n) < 0.8
    r2 = np.full(n, 0.09, np.float32)
    labels = np.where(core, np.arange(n), 2**30).astype(np.int32)
    got = np.asarray(grid_min_label(
        jnp.asarray(p), jnp.asarray(core), jnp.asarray(r2), jnp.asarray(labels),
        cell=1.0, dims=128, cap=1024, qblock=512))
    d2 = ((p[:, None, :].astype(np.float64) - p[None].astype(np.float64)) ** 2).sum(-1)
    adj = (d2 <= 0.09) & core[None, :]
    want = np.where(adj, np.where(core[None, :], np.arange(n)[None, :], 2**30),
                    2**30).min(1)
    want = np.where(core, np.minimum(want, 2**30), 2**30)
    np.testing.assert_array_equal(got[core], want[core])


def test_grid_5d_features(rng):
    """Clustering uses 5-D features; binning stays xy but distances use
    all columns."""
    p3 = scene(rng, n_clusters=2, n_bg=200)
    extra = rng.uniform(0, 1, (len(p3), 2)).astype(np.float32)
    p = np.concatenate([p3, extra], axis=1)
    m = np.ones(len(p), bool)
    got = np.asarray(grid_radius_count(
        jnp.asarray(p), jnp.asarray(m), jnp.asarray(p), jnp.asarray(m),
        0.3, cell=1.0, dims=128, cap=1024, qblock=512))
    want = brute_counts(p, m, p, m, 0.3)
    np.testing.assert_array_equal(got, want)
