import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vilgod_tpu.ops import cluster as C


def pad(points, total):
    f = points.shape[1]
    out = np.zeros((total, f), np.float32)
    out[: len(points)] = points
    mask = np.zeros(total, bool)
    mask[: len(points)] = True
    return out, mask


def make_blobs(rng, centers, n_per, scale=0.03):
    pts = []
    for c in centers:
        pts.append(rng.normal(scale=scale, size=(n_per, len(c))) + np.asarray(c))
    return np.concatenate(pts).astype(np.float32)


def ari(a, b):
    from sklearn.metrics import adjusted_rand_score
    return adjusted_rand_score(a, b)


def test_dbscan_matches_sklearn_blobs(rng):
    pts = make_blobs(rng, [[0, 0, 0], [2, 0, 0], [0, 3, 0.5]], 60)
    noise = rng.uniform(-5, 5, size=(40, 3)).astype(np.float32)
    allp = np.concatenate([pts, noise])
    perm = rng.permutation(len(allp))
    allp = allp[perm]
    padded, mask = pad(allp, 256)

    labels, probs = C.dbscan_labels(
        jnp.asarray(padded), jnp.asarray(mask), eps=0.15, min_samples=10,
        min_cluster_size=15, block_size=64)
    labels = np.asarray(labels)[: len(allp)]

    from sklearn.cluster import DBSCAN
    sk = DBSCAN(eps=0.15, min_samples=10).fit(allp).labels_
    # drop clusters < 15 from sklearn labels for a fair comparison
    for lid, cnt in zip(*np.unique(sk[sk >= 0], return_counts=True)):
        if cnt < 15:
            sk[sk == lid] = -1
    assert ari(labels, sk) > 0.95
    # noise agreement
    assert np.mean((labels == -1) == (sk == -1)) > 0.95


def test_dbscan_min_cluster_size():
    rng = np.random.default_rng(1)
    small = rng.normal(scale=0.02, size=(8, 3)).astype(np.float32)  # < min_cluster_size
    big = rng.normal(scale=0.02, size=(40, 3)).astype(np.float32) + 5
    allp = np.concatenate([small, big])
    padded, mask = pad(allp, 64)
    labels, _ = C.dbscan_labels(jnp.asarray(padded), jnp.asarray(mask),
                                eps=0.15, min_samples=5, min_cluster_size=15, block_size=64)
    labels = np.asarray(labels)[: len(allp)]
    assert np.all(labels[:8] == -1)
    assert len(np.unique(labels[8:])) == 1 and labels[8] >= 0


def test_dbscan_probabilities(rng):
    pts = make_blobs(rng, [[0, 0, 0]], 50, scale=0.02)
    padded, mask = pad(pts, 64)
    labels, probs = C.dbscan_labels(jnp.asarray(padded), jnp.asarray(mask),
                                    eps=0.15, min_samples=10, min_cluster_size=15, block_size=64)
    probs = np.asarray(probs)[:50]
    labels = np.asarray(labels)[:50]
    assert np.all(probs[labels >= 0] > 0)
    assert np.all(probs[labels >= 0] <= 1.0)


def test_compact_labels():
    # labels are root point indices in [0, N)
    labels = np.array([-1, 5, 2, 5, 2, 6, -1], np.int32)
    out = np.asarray(C.compact_labels(jnp.asarray(labels), 8))
    np.testing.assert_array_equal(out, [-1, 1, 0, 1, 0, 2, -1])


def test_build_cluster_table():
    labels = np.array([0, 1, 0, -1, 1, 1], np.int32)
    mask = np.array([True, True, True, True, True, False])
    table, tmask = C.build_cluster_table(jnp.asarray(labels), jnp.asarray(mask), 4, 3)
    table, tmask = np.asarray(table), np.asarray(tmask)
    assert set(table[0][tmask[0]]) == {0, 2}
    assert set(table[1][tmask[1]]) == {1, 4}
    assert not tmask[2].any() and not tmask[3].any()


def test_cluster_sizes():
    labels = np.array([0, 1, 0, -1, 1, 1], np.int32)
    mask = np.ones(6, bool)
    sizes = np.asarray(C.cluster_sizes(jnp.asarray(labels), jnp.asarray(mask), 4))
    np.testing.assert_array_equal(sizes, [2, 3, 0, 0])


def test_dbscan_5d_features(rng):
    """Cluster in 5-D (xyz + entropy + frame tag) like the pipeline does."""
    a = make_blobs(rng, [[0, 0, 0]], 40, scale=0.02)
    b = a.copy()
    a5 = np.concatenate([a, np.full((40, 1), 0.2), np.zeros((40, 1))], 1).astype(np.float32)
    # same xyz but distant frame tag => separate cluster when tag differs a lot
    b5 = np.concatenate([b, np.full((40, 1), 0.2), np.full((40, 1), 1.0)], 1).astype(np.float32)
    allp = np.concatenate([a5, b5])
    padded, mask = pad(allp, 128)
    labels, _ = C.dbscan_labels(jnp.asarray(padded), jnp.asarray(mask),
                                eps=0.15, min_samples=10, min_cluster_size=15, block_size=64)
    labels = np.asarray(labels)[:80]
    assert labels[:40].max() != labels[40:].max() or (labels[:40] != labels[40:]).any()
    assert len(np.unique(labels[labels >= 0])) == 2


@pytest.mark.slow
def test_fidelity_vs_hdbscan_realistic_scene(rng):
    """Fidelity harness for the sanctioned HDBSCAN substitution
    (BASELINE.json): on a Waymo-density scene fragment (objects at ~0.07 m
    surface spacing + sparse background), our radius-graph clustering must
    agree with hdbscan(cluster_selection_epsilon=0.15, min_cluster_size=15)
    at high ARI."""
    objs = []
    for cx, cy, ext in [(0, 0, (4.4, 1.9, 1.6)), (8, 4, (0.6, 0.6, 1.7)),
                        (-6, 5, (1.8, 0.6, 1.7)), (5, -6, (4.4, 1.9, 1.6))]:
        n = int(np.prod(ext) ** (2 / 3) * 600) + 150
        pts = rng.uniform(-0.5, 0.5, (n, 3)) * np.asarray(ext)
        pts[:, :2] += (cx, cy)
        # surface-ish: push to the box shell
        ax = rng.integers(0, 3, n)
        for a in range(3):
            sel = ax == a
            pts[sel, a] = np.sign(pts[sel, a] + 1e-9) * ext[a] / 2 + (cx, cy, 0)[a]
        objs.append(pts)
    background = rng.uniform(-15, 15, (400, 3))
    allp = np.concatenate(objs + [background]).astype(np.float32)
    perm = rng.permutation(len(allp))
    allp = allp[perm]

    padded, mask = pad(allp, 1 << int(np.ceil(np.log2(len(allp)))))
    labels, _ = C.dbscan_labels(jnp.asarray(padded), jnp.asarray(mask),
                                eps=0.15, min_samples=5, min_cluster_size=15,
                                block_size=512)
    labels = np.asarray(labels)[: len(allp)]

    from sklearn.cluster import HDBSCAN
    h = HDBSCAN(min_cluster_size=15, cluster_selection_epsilon=0.15,
                metric="euclidean").fit(allp)
    score = ari(labels, h.labels_)
    assert score > 0.85, f"ARI vs HDBSCAN = {score:.3f}"


@pytest.mark.slow
def test_fidelity_vs_hdbscan_on_pipeline_features():
    """VERDICT r1 #7: pin the radius-graph kernel against sklearn HDBSCAN
    on the ACTUAL stage-3 cluster input — 5-D [xyz, entropy, frame-tag]
    features built by the production selection path on a synthetic
    sequence (ground removal + windowed entropy + moving/static
    subsampling), across >= 3 frames."""
    from functools import partial

    from vilgod_tpu.config.presets import waymo_config
    from vilgod_tpu.data import SyntheticDataset
    from vilgod_tpu.pipeline import ZeroShotDetector
    from vilgod_tpu.pipeline.stages_geometry import (
        calculate_entropy_scores, frame_bucket, frame_select_stats_all,
        mask_ground_points, select_cluster_input)

    cap = {"max_points": 16384, "max_ng_points": 8192, "max_clusters": 64,
           "max_cluster_points": 2048, "max_tracks": 64,
           "max_cluster_input": 8192, "clip_batch": 8}
    cfg = waymo_config(capacity=cap)
    ds = SyntheticDataset(n_sequences=1, n_frames=16, seed=5, n_ground=3000,
                          n_vehicles=3, n_pedestrians=1, n_moving=2)
    zsd = ZeroShotDetector(ds.sequence("synth_0"), "synth_0", cfg)
    st = zsd.state
    mask_ground_points(st, cfg)
    calculate_entropy_scores(st, cfg, n_neighbouring_frames=15)

    f_pad = frame_bucket(st.n_frames)
    n_ng = st.ng_bucket()
    fv = np.zeros(f_pad, bool)
    fv[: st.n_frames] = True
    dev = (st.device("ng_xyz", f_pad, n_ng), st.device("ng_mask", f_pad, n_ng),
           st.device("ng_entropy", f_pad, n_ng), jnp.asarray(fv))
    stats = frame_select_stats_all(*dev)
    sel = jax.jit(partial(select_cluster_input, n_frames_window=2,
                          cap_in=4096))

    from sklearn.cluster import HDBSCAN
    scores = []
    for fnr in (2, 7, 12):
        feats, fm, _, _ = sel(*dev, fnr, 666, stats)
        feats, fm = np.asarray(feats), np.asarray(fm)
        ours, _ = C.dbscan_labels(jnp.asarray(feats), jnp.asarray(fm),
                                  eps=0.15, min_samples=5,
                                  min_cluster_size=15, block_size=512)
        ours = np.asarray(ours)[fm]
        real = feats[fm]
        assert fm.sum() > 500, "selection kept too few points to be meaningful"
        h = HDBSCAN(min_cluster_size=15, cluster_selection_epsilon=0.15,
                    metric="euclidean").fit(real)
        scores.append(ari(ours, h.labels_))
    assert min(scores) > 0.85, f"ARI per frame: {[f'{s:.3f}' for s in scores]}"


@pytest.mark.slow
def test_dbscan_paged_equals_per_frame(rng):
    """The paged multi-frame clustering must reproduce per-frame runs
    exactly (pages are cell- and distance-isolated)."""
    from vilgod_tpu.ops.cluster import (compact_labels_any,
                                        dbscan_labels_paged)

    pages_n, n = 4, 4096
    feats = np.zeros((pages_n, n, 5), np.float32)
    masks = np.zeros((pages_n, n), bool)
    for p in range(pages_n):
        pts = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
        for b in range(8):
            c = rng.uniform(-25, 25, 3)
            pts[b * 300:(b + 1) * 300] = c + rng.normal(0, 0.08, (300, 3))
        feats[p, :, :3] = pts
        feats[p, :, 3] = rng.uniform(0.3, 0.7, n)
        masks[p, : n - 200] = True

    flat = jnp.asarray(feats.reshape(-1, 5))
    fm = jnp.asarray(masks.reshape(-1))
    pages = jnp.repeat(jnp.arange(pages_n, dtype=jnp.int32), n)
    lab_p, prob_p = dbscan_labels_paged(flat, fm, pages, pages_n, eps=0.15,
                                        min_samples=5, min_cluster_size=15)
    lab_p = np.asarray(lab_p).reshape(pages_n, n)
    prob_p = np.asarray(prob_p).reshape(pages_n, n)

    from sklearn.metrics import adjusted_rand_score
    for p in range(pages_n):
        lab_f, prob_f = C.dbscan_labels(jnp.asarray(feats[p]),
                                        jnp.asarray(masks[p]), eps=0.15,
                                        min_samples=5, min_cluster_size=15)
        cp = np.asarray(compact_labels_any(jnp.asarray(lab_p[p]), 64))
        cf = np.asarray(C.compact_labels(lab_f, 64))
        assert adjusted_rand_score(cp, cf) == 1.0, f"page {p}"
        np.testing.assert_array_equal(cp == -1, cf == -1)
        np.testing.assert_allclose(prob_p[p], np.asarray(prob_f), atol=1e-6)


@pytest.mark.slow
def test_knn_labels_paged_equals_per_frame(rng):
    """The paged label transfer must reproduce per-frame knn_labels
    exactly (same kernel arithmetic, pages distance-isolated)."""
    from vilgod_tpu.ops.neighbors import knn_labels, knn_labels_paged

    pages_n, nq, nd = 4, 8192, 4096
    q = np.zeros((pages_n, nq, 3), np.float32)
    qm = np.zeros((pages_n, nq), bool)
    d = np.zeros((pages_n, nd, 3), np.float32)
    dm = np.zeros((pages_n, nd), bool)
    lab = np.zeros((pages_n, nd), np.int32)
    prob = np.zeros((pages_n, nd), np.float32)
    for p in range(pages_n):
        pts = rng.uniform(-30, 30, (nd, 3)).astype(np.float32)
        for b in range(8):
            c = rng.uniform(-25, 25, 3)
            pts[b * 300:(b + 1) * 300] = c + rng.normal(0, 0.1, (300, 3))
        d[p] = pts
        dm[p, : nd - 150] = True
        lab[p] = rng.integers(-1, 40, nd)
        prob[p] = rng.uniform(0, 1, nd)
        # queries: data points jittered + fresh uniform points
        q[p, :nd] = pts + rng.normal(0, 0.05, (nd, 3)).astype(np.float32)
        q[p, nd:] = rng.uniform(-30, 30, (nq - nd, 3)).astype(np.float32)
        qm[p, : nq - 100] = True

    q_pages = jnp.repeat(jnp.arange(pages_n, dtype=jnp.int32), nq)
    d_pages = jnp.repeat(jnp.arange(pages_n, dtype=jnp.int32), nd)
    lab_pg, prob_pg = knn_labels_paged(
        jnp.asarray(q.reshape(-1, 3)), jnp.asarray(qm.reshape(-1)), q_pages,
        jnp.asarray(d.reshape(-1, 3)), jnp.asarray(dm.reshape(-1)), d_pages,
        pages_n, jnp.asarray(lab.reshape(-1)),
        jnp.asarray(prob.reshape(-1)), dist_threshold=0.2)
    lab_pg = np.asarray(lab_pg).reshape(pages_n, nq)
    prob_pg = np.asarray(prob_pg).reshape(pages_n, nq)

    for p in range(pages_n):
        lf, pf = knn_labels(jnp.asarray(q[p]), jnp.asarray(qm[p]),
                            jnp.asarray(d[p]), jnp.asarray(dm[p]),
                            jnp.asarray(lab[p]), jnp.asarray(prob[p]),
                            dist_threshold=0.2)
        np.testing.assert_array_equal(lab_pg[p], np.asarray(lf), f"page {p}")
        # probs only matter where a label landed
        sel = lab_pg[p] >= 0
        np.testing.assert_array_equal(prob_pg[p][sel], np.asarray(pf)[sel])


@pytest.mark.slow
def test_knn_labels_paged_middle_tier(rng):
    """A locally-dense cell that overflows the 1x band must route to the
    2x-band tier (same kernel, wider window) and still return the exact
    nearest-neighbor labels — never the quadratic full pass. (Compared
    against numpy, not per-frame knn_labels: the per-frame path's
    MXU-form distances are allowed to mis-rank near-coincident points.)"""
    from vilgod_tpu.ops.neighbors import knn_labels_paged

    pages_n, nq_pp, nd_pp = 2, 2048, 32768
    q = np.zeros((pages_n, nq_pp, 3), np.float32)
    d = np.zeros((pages_n, nd_pp, 3), np.float32)
    lab = np.zeros((pages_n, nd_pp), np.int32)
    prob = np.zeros((pages_n, nd_pp), np.float32)
    for p in range(pages_n):
        pts = rng.uniform(-30, 30, (nd_pp, 3)).astype(np.float32)
        # ~16k points crammed into one grid cell: the covering window for
        # blocks in that cell exceeds w_band (12288) but not 2x
        pts[:16000] = np.array([5.0, 5.0, 0.0]) + rng.normal(
            0, 0.15, (16000, 3))
        d[p] = pts
        lab[p] = rng.integers(-1, 30, nd_pp)
        prob[p] = rng.uniform(0, 1, nd_pp)
        q[p] = pts[rng.integers(0, nd_pp, nq_pp)] + rng.normal(
            0, 0.05, (nq_pp, 3)).astype(np.float32)
    qm = np.ones((pages_n, nq_pp), bool)
    dm = np.ones((pages_n, nd_pp), bool)

    q_pages = jnp.repeat(jnp.arange(pages_n, dtype=jnp.int32), nq_pp)
    d_pages = jnp.repeat(jnp.arange(pages_n, dtype=jnp.int32), nd_pp)
    lab_pg, _ = knn_labels_paged(
        jnp.asarray(q.reshape(-1, 3)), jnp.asarray(qm.reshape(-1)), q_pages,
        jnp.asarray(d.reshape(-1, 3)), jnp.asarray(dm.reshape(-1)), d_pages,
        pages_n, jnp.asarray(lab.reshape(-1)),
        jnp.asarray(prob.reshape(-1)), dist_threshold=0.2)
    lab_pg = np.asarray(lab_pg).reshape(pages_n, nq_pp)
    for p in range(pages_n):
        # exact f32-difference-form nearest, like the kernel computes
        want = np.empty(nq_pp, np.int32)
        for i0 in range(0, nq_pp, 256):
            diff = (q[p][i0:i0 + 256, None, :] - d[p][None, :, :])
            d2 = (diff * diff).sum(-1)
            idx = d2.argmin(1)
            w = lab[p][idx]
            w[d2[np.arange(len(idx)), idx] > np.float32(0.2 + 1.25e-5)] = -1
            want[i0:i0 + 256] = w
        same = (lab_pg[p] == want).mean()
        assert same > 0.999, f"page {p}: {same}"


@pytest.mark.slow
def test_direct_transfer_matches_full_knn(rng):
    """Big-page label transfer: selected points take their own labels
    directly (their nearest data point is themselves at distance 0) and
    only the unselected remainder runs the kNN pass. Must equal the
    reference formulation (every point through the kNN) bit-for-bit."""
    from functools import partial

    from vilgod_tpu.pipeline.stages_geometry import (cluster_frames_chunk,
                                                     frame_select_stats_all)

    f_pad, n_ng = 4, 8192  # cap_in 16384 (big-page branch) needs 2*n_ng >= cap_in
    xyz = np.zeros((f_pad, n_ng, 3), np.float32)
    m = np.zeros((f_pad, n_ng), bool)
    for f in range(f_pad):
        pts = make_blobs(rng, [(0, 0, 1), (4, 1, 1), (-3, 5, 1)], 500,
                         scale=0.05)
        pts = np.concatenate(
            [pts, rng.uniform(-8, 8, (400, 3)).astype(np.float32)])
        n = len(pts)
        xyz[f, :n] = pts
        m[f, :n] = True
    ent = rng.uniform(0, 1, (f_pad, n_ng)).astype(np.float32)
    fv = jnp.ones(f_pad, bool)
    stats = frame_select_stats_all(jnp.asarray(xyz), jnp.asarray(m),
                                   jnp.asarray(ent), fv)

    run = partial(cluster_frames_chunk, jnp.asarray(xyz), jnp.asarray(m),
                  jnp.asarray(ent), fv, stats, 0, 666, chunk=f_pad,
                  cap_in=16384, max_clusters=32, capacity=512)
    fast = run(direct_transfer=True)
    ref = run(direct_transfer=False)
    for a, b, name in zip(fast, ref, ("labels", "probs", "det_n",
                                      "det_center", "det_static", "table")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
