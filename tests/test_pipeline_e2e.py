"""End-to-end pipeline test on a procedural scene (geometry-only: no CLIP).

Checks the full stage chain — ground masking, entropy, clustering,
filtering, tracking, box fitting, label propagation, export — recovers
the synthetic ground truth: static objects produce static tracks with
boxes near the true footprint, the moving object is flagged moving, and
the export format matches the reference's per-frame dicts
(`/root/reference/src/vilgod/zero_shot_detector.py:852-857`).
"""
import numpy as np
import pytest

from vilgod_tpu.config.presets import waymo_config
from vilgod_tpu.data import SyntheticDataset
from vilgod_tpu.pipeline import ZeroShotDetector

GEOMETRY_STAGES = [
    "mask_ground_points", "calculate_entropy_scores", "spatial_clustering",
    "filter_detections", "track_clusters", "fit_bounding_boxes_simple",
    "propagate_labels", "evaluate_sequence",
]

TEST_CAPACITY = {
    "max_points": 16384, "max_ng_points": 8192, "max_clusters": 64,
    "max_cluster_points": 4096, "max_tracks": 64, "max_cluster_input": 8192,
    "clip_batch": 8,
}


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    cfg = waymo_config(capacity=TEST_CAPACITY, pipeline_active=GEOMETRY_STAGES)
    ds = SyntheticDataset(n_sequences=1, n_frames=18, seed=3, n_ground=3000,
                          n_vehicles=2, n_pedestrians=1, n_moving=1)
    seq = ds.sequence("synth_0")
    cache = tmp_path_factory.mktemp("cache")
    zsd = ZeroShotDetector(seq, "synth_0", cfg, cache_dir=cache)
    results = zsd.process()
    return cfg, ds, seq, zsd, results, cache


@pytest.mark.slow
def test_ground_points_removed(pipeline_run):
    _, _, seq, zsd, _, _ = pipeline_run
    st = zsd.state
    # frames are ordered [ground..., object...], so the true split is known
    for fnr in (0, 9, 17):
        n_g = seq.n_ground_in_frame[fnr]
        n_valid = int(np.sum(st.points_mask[fnr]))
        pred = st.ground_mask[fnr]
        recall = np.sum(pred[:n_g]) / n_g
        obj_fp = np.sum(pred[n_g:n_valid]) / (n_valid - n_g)
        assert recall > 0.7, f"frame {fnr}: ground recall {recall:.2f}"
        assert obj_fp < 0.35, f"frame {fnr}: object points lost {obj_fp:.2f}"
        assert np.sum(st.ng_mask[fnr]) > 2000  # objects kept


@pytest.mark.slow
def test_entropy_separates_moving(pipeline_run):
    _, _, seq, zsd, _, _ = pipeline_run
    st = zsd.state
    fnr = 9
    t = st.transform_to_ref(fnr)
    moving_objs = [o for o in seq.objects if o.moving]
    static_objs = [o for o in seq.objects if not o.moving]
    ng = st.ng_xyz[fnr][st.ng_mask[fnr]]
    ent = st.ng_entropy[fnr][st.ng_mask[fnr]]

    def obj_entropy(obj):
        c = obj.center(fnr)  # world frame == ref frame here (pose 0 = identity-ish)
        d = np.linalg.norm(ng[:, :2] - c[None, :2], axis=1)
        sel = d < max(obj.size[:2]) / 2 + 0.3
        return np.median(ent[sel]) if np.any(sel) else np.nan

    mov = [obj_entropy(o) for o in moving_objs]
    stat = [obj_entropy(o) for o in static_objs]
    assert np.nanmean(mov) < 0.6, f"moving entropy {mov}"
    assert np.nanmean(stat) > 0.8, f"static entropy {stat}"


@pytest.mark.slow
def test_detections_cover_objects(pipeline_run):
    _, _, seq, zsd, _, _ = pipeline_run
    st = zsd.state
    fnr = 9
    centers = st.det_center[fnr][st.det_valid[fnr]]
    for obj in seq.objects:
        c = obj.center(fnr)
        d = np.linalg.norm(centers[:, :2] - c[None, :2], axis=1)
        assert np.min(d) < 1.0, f"{obj.kind} at {c[:2]} not detected"


@pytest.mark.slow
def test_tracks_and_motion_flags(pipeline_run):
    _, _, seq, zsd, _, _ = pipeline_run
    pool = zsd.state.tracks
    assert pool is not None and pool.n_tracks >= len(seq.objects)
    long_tracks = [t for t in pool.valid_tracks()
                   if len(list(pool.steps(int(t)))) >= 10]
    assert len(long_tracks) >= len(seq.objects)
    assert np.any(~pool.static[: pool.n_tracks])  # the moving object


@pytest.mark.slow
def test_export_format_and_box_quality(pipeline_run):
    _, _, seq, zsd, results, _ = pipeline_run
    assert len(results) == seq.sequence_length
    hits = 0
    for fnr in (5, 9, 13):
        r = results[fnr]
        assert set(r) == {"boxes_lidar", "name", "score", "moving"}
        assert r["boxes_lidar"].shape[1] == 7
        annos = seq.get_annos(fnr)
        for gt_box in annos["gt_boxes_lidar"]:
            if len(r["boxes_lidar"]) == 0:
                continue
            d = np.linalg.norm(r["boxes_lidar"][:, :2] - gt_box[None, :2], axis=1)
            if np.min(d) < 1.0:
                b = r["boxes_lidar"][np.argmin(d)]
                # footprint sane vs GT (loose: geometry-only boxes carry
                # the +0.3 m propagate margin, which alone is a factor
                # ~3.4 on a 0.36 m^2 pedestrian footprint)
                assert 0.3 < (b[3] * b[4]) / (gt_box[3] * gt_box[4]) < 4.5
                hits += 1
    assert hits >= 6  # most objects exported with sane boxes


@pytest.mark.slow
def test_checkpoint_resume(pipeline_run):
    cfg, _, seq, zsd, results, cache = pipeline_run
    cfg2 = dict(cfg)
    # restore + re-export only: stored stage outputs must reproduce the
    # exact same result dicts (full re-runs are NOT byte-identical by
    # design — the reference re-tracks force=True over propagate-filtered
    # detections too, zero_shot_detector.py:299-327)
    cfg2["pipeline_active"] = ["evaluate_sequence"]
    zsd2 = ZeroShotDetector(seq, "synth_0", cfg2, cache_dir=cache)
    assert zsd2.state.done.get("mask_ground_points")
    assert zsd2.state.done.get("spatial_clustering")
    assert zsd2.state.done.get("propagate_labels")
    np.testing.assert_array_equal(zsd2.state.labels, zsd.state.labels)
    np.testing.assert_array_equal(zsd2.state.det_valid, zsd.state.det_valid)
    results2 = zsd2.process()
    assert len(results2) == len(results)
    for r1, r2 in zip(results, results2):
        np.testing.assert_allclose(r1["boxes_lidar"], r2["boxes_lidar"], atol=1e-5)
        np.testing.assert_array_equal(r1["name"], r2["name"])


def test_smoke_e2e():
    """Always-on end-to-end smoke (default tier, VERDICT r4 #6): the
    full geometry stage chain on a tiny scene must produce detections
    near the ground truth with the reference's export schema
    (`zero_shot_detector.py:852-857`). Deep assertions (entropy
    separation, box quality, resume) live in the slow-tier fixture
    tests above."""
    caps = {"max_points": 4096, "max_ng_points": 2048, "max_clusters": 16,
            "max_cluster_points": 512, "max_tracks": 16,
            "max_cluster_input": 2048, "clip_batch": 4}
    cfg = waymo_config(capacity=caps, pipeline_active=GEOMETRY_STAGES)
    ds = SyntheticDataset(n_sequences=1, n_frames=6, seed=11, n_ground=900,
                          n_vehicles=1, n_pedestrians=0, n_moving=0)
    seq = ds.sequence("synth_0")
    results = ZeroShotDetector(seq, "synth_0", cfg).process()
    assert len(results) == seq.sequence_length
    hits = 0
    for fnr, r in enumerate(results):
        assert set(r) == {"boxes_lidar", "name", "score", "moving"}
        if len(r["boxes_lidar"]) == 0:
            continue
        gt = seq.get_annos(fnr)["gt_boxes_lidar"]
        d = np.linalg.norm(r["boxes_lidar"][:, None, :2] - gt[None, :, :2],
                           axis=-1)
        hits += int(np.any(d < 1.5))
    assert hits >= 3, f"vehicle exported in only {hits}/6 frames"


def test_method_dispatch_reaches_kernels():
    """The configured ``method`` {name, args} must reach the rectangle
    kernel (the reference dispatches by name via getattr,
    zero_shot_detector.py:451,477,672): different methods produce
    different boxes on an L-shaped cluster, and unknown names reject."""
    from vilgod_tpu.pipeline.stages_boxes import fit_bounding_boxes_simple
    from vilgod_tpu.pipeline.state import Capacity, SequenceState

    rng = np.random.default_rng(0)
    theta = 0.35
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    xs = np.concatenate([np.linspace(0, 4, 60), np.zeros(30)])
    ys = np.concatenate([np.zeros(60), np.linspace(0, 1.8, 30)])
    xy = (np.stack([xs, ys], 1) @ rot.T
          + rng.normal(scale=0.01, size=(90, 2))).astype(np.float32)
    pts = np.concatenate(
        [xy, rng.uniform(0, 1.6, (90, 1)).astype(np.float32)], axis=1)

    def run(method):
        caps = Capacity(max_points=256, max_ng_points=256, max_clusters=4,
                        max_cluster_points=128, max_tracks=4, clip_batch=2)
        st = SequenceState.allocate("m", 1, caps)
        st._h_ng_xyz[0, :90] = pts
        st._h_ng_mask[0, :90] = True
        st._h_labels[0, :90] = 0
        st.det_n[0, 0] = 90
        st.det_valid[0, 0] = True
        fit_bounding_boxes_simple(st, {}, method=method)
        return st.det_box[0, 0].copy()

    box_min = run(None)  # default minimum_bounding_rectangle
    box_close = run({"name": "closeness_rectangle", "args": {"delta": 2}})
    box_pca = run({"name": "PCA_rectangle"})
    for b in (box_min, box_close, box_pca):
        assert np.all(np.isfinite(b)) and b[3] >= b[4]  # l >= w after swap
        assert 3.5 < b[3] < 5.0, b  # long side ~4 m (+noise, margins)
    # the criteria disagree on this cloud at coarse sweep resolution
    assert not np.allclose(box_min, box_close, atol=1e-6) or \
        not np.allclose(box_min, box_pca, atol=1e-6)
    with pytest.raises(ValueError):
        run({"name": "no_such_fit"})


@pytest.mark.slow
def test_include_ground_points_changes_entropy():
    """`include_ground_points` fills the neighbor window with the FULL
    cloud (zero_shot_detector.py:158-183): scores must actually respond
    to the knob (it was previously swallowed), and scored points remain
    the non-ground set so downstream indexing is unchanged."""
    from vilgod_tpu.pipeline.stages_geometry import calculate_entropy_scores

    cfg = waymo_config(capacity=TEST_CAPACITY,
                       pipeline_active=["mask_ground_points"])
    ds = SyntheticDataset(n_sequences=1, n_frames=8, seed=5, n_ground=3000,
                          n_vehicles=2, n_moving=1)
    seq = ds.sequence("synth_0")
    zsd = ZeroShotDetector(seq, "synth_0", cfg)
    zsd.process()
    st = zsd.state

    calculate_entropy_scores(st, cfg, n_neighbouring_frames=8)
    base = st.ng_entropy.copy()
    calculate_entropy_scores(st, cfg, n_neighbouring_frames=8,
                             include_ground_points=True, force=True)
    full = st.ng_entropy.copy()
    m = st.ng_mask[: seq.sequence_length]
    assert np.all((full[m] >= 0.0) & (full[m] <= 1.0 + 1e-5))
    # ground neighbors shift the per-window counts for points near the
    # ground surface -> the score fields must differ
    assert not np.allclose(base[m], full[m], atol=1e-6)
