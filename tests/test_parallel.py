"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vilgod_tpu.ops.entropy import entropy_scores_window
from vilgod_tpu.parallel import global_detection_count, make_mesh, sharded_entropy


def _reference_entropy(frames, masks, window, skip_frames, radius):
    """Single-device oracle with the reference window layout."""
    f_total = frames.shape[0]
    skip = skip_frames + 1
    sampled = list(range(window))[::skip]
    out = []
    for fnr in range(f_total):
        start = int(np.clip(fnr, 0, f_total - window))
        seek = fnr - start
        idx = [start + s for s in sampled]
        seek_pos = sampled.index(seek) if seek in sampled else -1
        out.append(np.asarray(entropy_scores_window(
            jnp.asarray(frames[fnr]), jnp.asarray(masks[fnr]),
            jnp.asarray(frames[idx]), jnp.asarray(masks[idx]),
            jnp.asarray(seek_pos), radius=radius, block_size=64)))
    return np.stack(out)


def test_sharded_entropy_matches_single_device(rng):
    n_dev = jax.device_count()
    assert n_dev == 8, "conftest must force 8 virtual CPU devices"
    window, chunk = 4, 4
    f_total, n = n_dev * chunk, 96
    frames = rng.normal(size=(f_total, n, 3)).astype(np.float32)
    # a persistent structure so entropy is non-trivial
    frames[:, :32] = rng.normal(size=(1, 32, 3)).astype(np.float32)
    # production clouds are 5 mm-quantized; on-lattice coords plus the
    # nudged threshold guarantee no pair sits within fp noise of the
    # radius (continuous coords can land 1 ULP from r^2, where XLA's
    # per-graph FMA contraction makes equally-valid paths disagree)
    frames = (np.round(frames / 0.005) * 0.005).astype(np.float32)
    masks = np.ones((f_total, n), bool)
    masks[:, 90:] = False

    mesh = make_mesh()
    got = np.asarray(sharded_entropy(mesh, jnp.asarray(frames),
                                     jnp.asarray(masks), window=window,
                                     skip_frames=1, radius=0.5, block_size=64))
    want = _reference_entropy(frames, masks, window, 1, 0.5)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_entropy_pad_aware_matches_single_device(rng):
    """VERDICT r2 #5: a padded frame bucket (real sequences are never a
    multiple of the bucket — Waymo is 199 -> 200) must still take the
    mesh and match the single-device program on the REAL frames, with
    the padded tail masked to 1.0."""
    n_dev = jax.device_count()
    window, chunk = 4, 8
    f_pad, n = n_dev * chunk, 96
    f_real = f_pad - 3  # tail (3) + window (4) <= chunk (8)
    frames = rng.normal(size=(f_pad, n, 3)).astype(np.float32)
    frames[:, :32] = rng.normal(size=(1, 32, 3)).astype(np.float32)
    frames = (np.round(frames / 0.005) * 0.005).astype(np.float32)
    masks = np.ones((f_pad, n), bool)
    masks[:, 90:] = False
    masks[f_real:] = False  # how the padded tail arrives in production

    mesh = make_mesh()
    got = np.asarray(sharded_entropy(mesh, jnp.asarray(frames),
                                     jnp.asarray(masks), f_real=f_real,
                                     window=window,
                                     skip_frames=1, radius=0.5, block_size=64))
    want = _reference_entropy(frames[:f_real], masks[:f_real], window, 1, 0.5)
    np.testing.assert_allclose(got[:f_real], want, atol=1e-5)
    assert (got[f_real:] == 1.0).all()


def test_sharded_entropy_rejects_oversized_tail():
    mesh = make_mesh()
    frames = jnp.zeros((8 * 8, 16, 3))
    masks = jnp.ones((8 * 8, 16), bool)
    with pytest.raises(ValueError, match="padded tail"):
        sharded_entropy(mesh, frames, masks, f_real=8 * 8 - 6, window=4)


def test_sharded_entropy_rejects_small_chunks():
    mesh = make_mesh()
    frames = jnp.zeros((8, 16, 3))
    masks = jnp.ones((8, 16), bool)
    with pytest.raises(ValueError, match="frames per device"):
        sharded_entropy(mesh, frames, masks, window=4)


def test_global_detection_count_psum():
    mesh = make_mesh()
    det_valid = jnp.arange(8 * 6).reshape(8, 6) % 3 == 0
    total = global_detection_count(mesh, det_valid)
    assert int(total) == int(jnp.sum(det_valid))


@pytest.mark.slow
def test_full_geometry_pipeline_sharded_matches_single_device():
    """VERDICT r1 #5: the production pipeline routes entropy through the
    mesh when devices are available; the full geometry pipeline on the
    8-device CPU mesh must match the single-device run bit-for-bit."""
    from vilgod_tpu.config.presets import waymo_config
    from vilgod_tpu.data import SyntheticDataset
    from vilgod_tpu.pipeline import ZeroShotDetector

    cap = {"max_points": 16384, "max_ng_points": 8192, "max_clusters": 64,
           "max_cluster_points": 2048, "max_tracks": 64,
           "max_cluster_input": 8192, "clip_batch": 8}
    stages = ["mask_ground_points", "calculate_entropy_scores",
              "spatial_clustering", "filter_detections"]
    # F=32 == frame bucket and 32/8 = 4 frames/device >= window 4, so the
    # sharded path is actually taken (mask_ground_points asserts below)
    overrides = dict(capacity=cap, pipeline_active=stages)
    kwargs = dict(n_sequences=1, n_frames=32, seed=3, n_ground=2500,
                  n_vehicles=2, n_pedestrians=1, n_moving=1)

    def run(shard: bool):
        cfg = waymo_config(**overrides)
        # shard_ground off: the sharded ground contract is per-chunk
        # equality (its own tests below), NOT bit-equality with the full
        # scan, and this test pins the bit-exact chain
        cfg["parallel"] = {"shard_frames": shard, "shard_ground": False}
        cfg["pipeline"] = [
            {**p, "args": {**p.get("args", {}), "n_neighbouring_frames": 4}}
            if p["name"] == "calculate_entropy_scores" else p
            for p in cfg["pipeline"]]
        ds = SyntheticDataset(**kwargs)
        zsd = ZeroShotDetector(ds.sequence("synth_0"), "synth_0", cfg)
        zsd.process()
        st = zsd.state
        return (st.ng_entropy.copy(), st.labels.copy(), st.probs.copy(),
                st.det_valid.copy(), st.det_center.copy())

    sharded = run(True)
    single = run(False)
    for a, b, name in zip(sharded, single,
                          ("entropy", "labels", "probs", "valid", "center")):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_sharded_cluster_chunk_matches_single_device(rng):
    """VERDICT r3 #3: the clustering chunk's frame/page axis shards over
    the mesh; each device's paged launch must reproduce the single-device
    chunk bit-for-bit (pages are distance- and cell-isolated, and labels
    compact per frame downstream)."""
    import jax.numpy as jnp

    from vilgod_tpu.parallel import sharded_cluster_chunk
    from vilgod_tpu.pipeline.stages_geometry import (cluster_frames_chunk,
                                                     frame_select_stats_all)

    n_dev = jax.device_count()
    f_pad, n_ng = n_dev, 512
    ng_xyz = rng.normal(scale=4.0, size=(f_pad, n_ng, 3)).astype(np.float32)
    # two dense blobs per frame so real clusters form
    ng_xyz[:, :96] = rng.normal(scale=0.15, size=(1, 96, 3)).astype(np.float32)
    ng_xyz[:, 96:192] = 5.0 + rng.normal(
        scale=0.15, size=(1, 96, 3)).astype(np.float32)
    ng_mask = np.ones((f_pad, n_ng), bool)
    ng_mask[:, 500:] = False
    ng_entropy = rng.uniform(size=(f_pad, n_ng)).astype(np.float32)
    fv = np.ones(f_pad, bool)
    dev_args = (jnp.asarray(ng_xyz), jnp.asarray(ng_mask),
                jnp.asarray(ng_entropy), jnp.asarray(fv))
    stats = frame_select_stats_all(*dev_args)
    kw = dict(chunk=f_pad, n_frames_window=2, cap_in=1024, eps=0.4,
              min_samples=3, min_cluster_size=5, max_clusters=16,
              capacity=256)

    single = cluster_frames_chunk(*dev_args, stats, 0, 666, **kw)
    mesh = make_mesh()
    sharded = sharded_cluster_chunk(mesh, cluster_frames_chunk, dev_args,
                                    stats, 0, 666, **kw)
    names = ("labels", "probs", "det_n", "det_center", "det_static", "table")
    assert int(jnp.max(single[0])) >= 0, "scene produced no clusters"
    for a, b, name in zip(sharded, single, names):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


@pytest.mark.slow
def test_sharded_clustering_stage_matches_single_device():
    """Production-path version of the above: spatial_clustering routes
    chunks through the mesh when ``parallel.shard_cluster`` is on; the
    stage outputs must equal the single-device run bit-for-bit."""
    from vilgod_tpu.config.presets import waymo_config
    from vilgod_tpu.data import SyntheticDataset
    from vilgod_tpu.pipeline import ZeroShotDetector

    cap = {"max_points": 16384, "max_ng_points": 8192, "max_clusters": 64,
           "max_cluster_points": 2048, "max_tracks": 64,
           "max_cluster_input": 8192, "clip_batch": 8}
    stages = ["mask_ground_points", "calculate_entropy_scores",
              "spatial_clustering", "filter_detections"]
    kwargs = dict(n_sequences=1, n_frames=16, seed=3, n_ground=2500,
                  n_vehicles=2, n_pedestrians=1, n_moving=1)

    def run(shard):
        cfg = waymo_config(capacity=cap, pipeline_active=stages)
        cfg["parallel"] = {"shard_frames": False, "shard_cluster": shard}
        ds = SyntheticDataset(**kwargs)
        zsd = ZeroShotDetector(ds.sequence("synth_0"), "synth_0", cfg)
        zsd.process()
        st = zsd.state
        return (st.labels.copy(), st.probs.copy(), st.det_valid.copy(),
                st.det_center.copy(), st.det_n.copy())

    sharded = run(True)
    single = run(False)
    for a, b, name in zip(sharded, single,
                          ("labels", "probs", "valid", "center", "n")):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_sharded_clip_classifier_matches_single_device(rng):
    """VERDICT r2 #5: classification batches shard over the mesh (data
    parallel over the batch axis); the sharded fused render->encode->
    logits program must match the single-device run."""
    import jax.numpy as jnp

    from vilgod_tpu.models.clip import CLIPConfig
    from vilgod_tpu.models.clip_wrapper import ClipWrapper
    from vilgod_tpu.parallel import frame_sharding, make_mesh, replicated

    tiny = CLIPConfig(image_size=32, patch_size=16, vision_width=64,
                      vision_layers=2, vision_heads=2, embed_dim=32,
                      context_length=77, vocab_size=1024, text_width=64,
                      text_heads=2, text_layers=2)
    wrapper = ClipWrapper({"class_list": ["car", "person"],
                           "class_mapping": {"car": "Vehicle",
                                             "person": "Pedestrian"}},
                          model_cfg=tiny)
    f_pad, n_ng, n_clusters, cap = 8, 256, 4, 64
    classify = wrapper.make_cluster_classifier(
        n_clusters, cap, resolution=16, depth=4, image_size=32)

    ng_xyz = rng.normal(scale=3.0, size=(f_pad, n_ng, 3)).astype(np.float32)
    tables = rng.integers(0, n_ng, size=(f_pad, n_clusters, cap)).astype(np.int32)
    table_masks = rng.uniform(size=(f_pad, n_clusters, cap)) < 0.8
    b = 16  # divisible by the 8-device mesh
    fids = rng.integers(0, f_pad, size=b).astype(np.int32)
    cids = rng.integers(0, n_clusters, size=b).astype(np.int32)
    trs = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    trs[:, :3, 3] = rng.normal(scale=1.0, size=(b, 3))

    idx1, sc1 = classify(jnp.asarray(ng_xyz), jnp.asarray(tables),
                         jnp.asarray(table_masks), fids, cids, trs)

    mesh = make_mesh()
    repl, bsh = replicated(mesh), frame_sharding(mesh)
    idx2, sc2 = classify(
        jax.device_put(jnp.asarray(ng_xyz), repl),
        jax.device_put(jnp.asarray(tables), repl),
        jax.device_put(jnp.asarray(table_masks), repl),
        jax.device_put(fids, bsh), jax.device_put(cids, bsh),
        jax.device_put(trs, bsh))
    idx1n, idx2n = np.asarray(idx1), np.asarray(idx2)
    sc1n, sc2n = np.asarray(sc1), np.asarray(sc2)
    np.testing.assert_allclose(sc1n, sc2n, atol=1e-5, rtol=1e-5)
    # near-tied view logits can legitimately flip the argmax when XLA
    # partitions the batch; require exact index agreement only where the
    # winning scores differ beyond the score tolerance (a flip there
    # would be a real divergence, not a tie).
    flips = idx1n != idx2n
    assert np.all(~flips | (np.abs(sc1n - sc2n) <= 2e-5)), (
        "argmax flipped on non-tied scores under the mesh")


def test_sharded_ground_equals_per_chunk_scans():
    """sharded_ground's exactness contract (VERDICT r4 #4): the mesh
    program must reproduce concat(single-device scans of each chunk)
    bit-for-bit — the per-shard A-GLE warmup IS the semantics, not a
    tolerance."""
    from vilgod_tpu.data import SyntheticDataset
    from vilgod_tpu.ground.patchwork import GroundConfig, segment_sequence
    from vilgod_tpu.parallel import sharded_ground

    mesh = make_mesh()
    d = mesh.shape["dp"]
    f_total, chunk = 16, 16 // d
    ds = SyntheticDataset(n_sequences=1, n_frames=f_total, seed=9,
                          n_ground=1200, n_vehicles=1, n_moving=0)
    seq = ds.sequence("synth_0")
    n_pts = 2048
    pts = np.zeros((f_total, n_pts, 4), np.float32)
    msk = np.zeros((f_total, n_pts), bool)
    for f in range(f_total):
        p = seq.get_lidar_points(f)[:n_pts]
        pts[f, : len(p), : p.shape[1]] = p[:, :4]
        msk[f, : len(p)] = True
    gcfg = GroundConfig(patch_capacity=128)

    got = np.asarray(sharded_ground(mesh, jnp.asarray(pts), jnp.asarray(msk),
                                    gcfg, z_offset=1.723))
    want = np.concatenate([
        np.asarray(segment_sequence(jnp.asarray(pts[c * chunk:(c + 1) * chunk]),
                                    jnp.asarray(msk[c * chunk:(c + 1) * chunk]),
                                    gcfg, 1.723)[0])
        for c in range(d)])
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_sharded_ground_stage_quality():
    """AP-neutrality proxy for the per-shard warmup: the stage routed
    through the mesh must keep the e2e ground-quality bands (recall /
    object-point loss) that the single-device path holds — the warmup
    may flip individual points at chunk heads but not degrade the
    segmentation."""
    from vilgod_tpu.config.presets import waymo_config
    from vilgod_tpu.data import SyntheticDataset
    from vilgod_tpu.pipeline import ZeroShotDetector

    cap = {"max_points": 16384, "max_ng_points": 8192, "max_clusters": 64,
           "max_cluster_points": 2048, "max_tracks": 64,
           "max_cluster_input": 8192, "clip_batch": 8}
    cfg = waymo_config(capacity=cap, pipeline_active=["mask_ground_points"])
    cfg["parallel"] = {"shard_frames": True, "shard_ground": True}
    # 64 frames / 8 devices = 8 per chunk — exactly the mesh gate's
    # minimum, so the sharded path IS taken (chunk heads at 0, 8, 16, ...)
    ds = SyntheticDataset(n_sequences=1, n_frames=64, seed=3, n_ground=2500,
                          n_vehicles=2, n_pedestrians=1, n_moving=1)
    seq = ds.sequence("synth_0")
    zsd = ZeroShotDetector(seq, "synth_0", cfg)
    zsd.process()
    st = zsd.state
    assert st.done.get("mask_ground_points")
    for fnr in (0, 8, 9, 32, 63):  # chunk heads AND mid-chunk frames
        n_g = seq.n_ground_in_frame[fnr]
        n_valid = int(np.sum(st.points_mask[fnr]))
        pred = st.ground_mask[fnr]
        recall = np.sum(pred[:n_g]) / n_g
        obj_fp = np.sum(pred[n_g:n_valid]) / max(n_valid - n_g, 1)
        assert recall > 0.7, f"frame {fnr}: ground recall {recall:.2f}"
        assert obj_fp < 0.35, f"frame {fnr}: object points lost {obj_fp:.2f}"


def test_sharded_filter_metrics_matches_single_device(rng):
    """sharded_filter_metrics: BIT-IDENTICAL to filter_metrics_all (the
    per-frame RANSAC key folds in the global frame index, carried in
    explicitly; frames are otherwise independent)."""
    from vilgod_tpu.parallel import sharded_filter_metrics
    from vilgod_tpu.pipeline.stages_geometry import filter_metrics_all

    mesh = make_mesh()
    f_pad, n_pts, n_ng, C = 8, 4096, 2048, 16
    pts = rng.uniform(-30, 30, (f_pad, n_pts, 3)).astype(np.float32)
    pts[..., 2] = rng.normal(-1.7, 0.2, (f_pad, n_pts))
    pm = np.ones((f_pad, n_pts), bool)
    pm[:, 3500:] = False
    gm = pts[..., 2] < -1.5
    tr = np.tile(np.eye(4, dtype=np.float32), (f_pad, 1, 1))
    nx = rng.uniform(-30, 30, (f_pad, n_ng, 3)).astype(np.float32)
    ne = rng.uniform(0, 1, (f_pad, n_ng)).astype(np.float32)
    lb = rng.integers(-1, C, (f_pad, n_ng)).astype(np.int32)
    nm = np.ones((f_pad, n_ng), bool)
    nm[:, 1800:] = False
    args = tuple(map(jnp.asarray, (pts, pm, gm, tr, nx, ne, lb, nm)))

    got = sharded_filter_metrics(mesh, *args, 666, 20.0,
                                 ransac_iters=25, max_clusters=C)
    want = filter_metrics_all(*args, 666, 20.0,
                              ransac_iters=25, max_clusters=C)
    for k in want:
        if k == "ephe_p":
            # the percentile's a*(1-f)+b*f interpolation FMA-contracts
            # differently between the shard_map and plain-jit programs
            # (1 ULP); everything else is bit-identical
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(want[k]), rtol=0,
                                       atol=1.5e-7, err_msg=k)
        else:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(want[k]), err_msg=k)
