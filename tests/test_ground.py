import numpy as np
import jax.numpy as jnp

from vilgod_tpu.ground import (
    GroundConfig, init_ground_state, segment_ground, segment_sequence,
)


def make_scene(rng, n_ground=12000, sensor_height=1.723):
    """Flat ground at z=-sensor_height + boxes/walls sticking up."""
    r = np.sqrt(rng.uniform(2.0**2, 30.0**2, size=n_ground))
    th = rng.uniform(0, 2 * np.pi, size=n_ground)
    gx, gy = r * np.cos(th), r * np.sin(th)
    gz = -sensor_height + rng.normal(scale=0.02, size=n_ground)
    ground = np.column_stack([gx, gy, gz]).astype(np.float32)

    objs = []
    for cx, cy in [(8, 0), (-10, 5), (5, -12), (15, 14)]:
        n = 400
        ox = rng.uniform(cx - 1, cx + 1, n)
        oy = rng.uniform(cy - 1, cy + 1, n)
        oz = rng.uniform(-sensor_height + 0.3, -sensor_height + 2.0, n)
        objs.append(np.column_stack([ox, oy, oz]))
    objects = np.concatenate(objs).astype(np.float32)

    pts = np.concatenate([ground, objects])
    intensity = np.full((len(pts), 1), 0.5, np.float32)
    labels = np.concatenate([np.ones(len(ground), bool), np.zeros(len(objects), bool)])
    perm = rng.permutation(len(pts))
    return np.hstack([pts, intensity])[perm].astype(np.float32), labels[perm]


def pad(points, labels, total):
    out = np.zeros((total, points.shape[1]), np.float32)
    out[: len(points)] = points
    mask = np.zeros(total, bool)
    mask[: len(points)] = True
    lab = np.zeros(total, bool)
    lab[: len(points)] = labels
    return out, mask, lab


CFG = GroundConfig(patch_capacity=256)


def test_segment_ground_flat_scene(rng):
    pts, labels = make_scene(rng)
    padded, mask, lab = pad(pts, labels, 16384)
    state = init_ground_state(CFG)
    ground, state2, aux = segment_ground(jnp.asarray(padded), jnp.asarray(mask), state, CFG)
    ground = np.asarray(ground)

    recall = (ground & lab).sum() / lab.sum()
    # object points wrongly labeled ground
    obj = mask & ~lab
    fp = (ground & obj).sum() / max(obj.sum(), 1)
    assert recall > 0.9, recall
    assert fp < 0.15, fp
    assert not ground[~mask].any()


def test_segment_sequence_adapts(rng):
    frames = []
    masks = []
    labs = []
    for _ in range(4):
        pts, labels = make_scene(rng, n_ground=8000)
        p, m, l = pad(pts, labels, 12288)
        frames.append(p)
        masks.append(m)
        labs.append(l)
    frames = np.stack(frames)
    masks = np.stack(masks)
    ground, state = segment_sequence(jnp.asarray(frames), jnp.asarray(masks), CFG)
    ground = np.asarray(ground)
    # sensor height should self-calibrate near the true 1.723
    assert abs(float(state.sensor_height) - 1.723) < 0.2
    # recall improves/stays high over frames
    rec_last = (ground[-1] & labs[-1]).sum() / labs[-1].sum()
    assert rec_last > 0.9
    # elevation thresholds should be near the ground z (~0 after offset... here
    # no z_offset applied: ground sits at -1.723, thresholds adapt around it)
    assert np.all(np.asarray(state.elevation_thr) < 0.0)


def test_sloped_ground(rng):
    """Patch-wise fitting should handle a mild slope that a single global
    plane cannot."""
    n = 12000
    r = np.sqrt(rng.uniform(2.0**2, 30.0**2, size=n))
    th = rng.uniform(0, 2 * np.pi, size=n)
    gx, gy = r * np.cos(th), r * np.sin(th)
    gz = -1.723 + 0.05 * gx + rng.normal(scale=0.02, size=n)
    pts = np.column_stack([gx, gy, gz, np.full(n, 0.5)]).astype(np.float32)
    padded, mask, lab = pad(pts, np.ones(n, bool), 16384)
    ground, _, _ = segment_ground(jnp.asarray(padded), jnp.asarray(mask),
                                  init_ground_state(CFG), CFG)
    ground = np.asarray(ground)
    assert (ground & lab).sum() / lab.sum() > 0.85


def test_rnr_removes_reflections(rng):
    pts, labels = make_scene(rng, n_ground=8000)
    # reflected noise: far below ground, low intensity, steep down angle
    noise = np.column_stack([
        rng.uniform(3, 6, 50), rng.uniform(-1, 1, 50),
        rng.uniform(-5.5, -4.5, 50), np.full(50, 0.05),
    ]).astype(np.float32)
    allp = np.concatenate([pts, noise])
    lab = np.concatenate([labels, np.zeros(50, bool)])
    padded, mask, lab = pad(allp, lab, 12288)
    ground, _, aux = segment_ground(jnp.asarray(padded), jnp.asarray(mask),
                                    init_ground_state(CFG), CFG)
    noise_mask = np.asarray(aux["noise"])
    # the injected reflections must be flagged as noise and not ground
    start = len(pts)
    assert noise_mask[start:start + 50].all()
    assert not np.asarray(ground)[start:start + 50].any()


def test_chained_scan_equals_per_chunk_scans(rng):
    """segment_sequence_chained's exactness contract (the single-device
    ground_chains path): equality with independent per-chunk full scans —
    the same contract parallel.sharded_ground pins across a mesh."""
    import jax.numpy as jnp
    from vilgod_tpu.ground.patchwork import (GroundConfig, segment_sequence,
                                             segment_sequence_chained)

    cfg = GroundConfig(patch_capacity=256)
    f, n = 16, 4096
    pts = np.zeros((f, n, 4), np.float32)
    for i in range(f):
        g = rng.uniform(-30, 30, (3000, 2))
        z = rng.normal(0.0, 0.05, 3000) - 1.7
        obj = rng.uniform(-10, 10, (500, 3)) * [1, 1, 0.1]
        pts[i, :3000, :2], pts[i, :3000, 2] = g, z
        pts[i, 3000:3500, :3] = obj + [0, 0, 0.5]
        pts[i, :, 3] = 0.5
    mask = np.zeros((f, n), bool)
    mask[:, :3500] = True
    pts_d, mask_d = jnp.asarray(pts), jnp.asarray(mask)

    chained = np.asarray(segment_sequence_chained(pts_d, mask_d, cfg, 0.0,
                                                  chains=4))
    per_chunk = np.concatenate([
        np.asarray(segment_sequence(pts_d[i:i + 4], mask_d[i:i + 4],
                                    cfg, 0.0)[0]) for i in range(0, f, 4)])
    np.testing.assert_array_equal(chained, per_chunk)
