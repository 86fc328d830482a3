"""Decision-level parity oracle for the host decision stages.

The reference's box fitting (`/root/reference/src/vilgod/zero_shot_detector.py:422-684`),
label propagation (`:686-824`), and tracker
(`/root/reference/src/vilgod/tracker.py:32-80`,
`src/dataclass/objects.py:202-334`) are pure-Python object-soup loops.
The oracle (tools/parity_oracle.py) transcribes that logic into a small
numpy object model, feeds the oracle and this repo's table-based stages IDENTICAL
detection tables, and asserts decision-level equality: same track
structure, same valid flags, same class codes and scores, same boxes to
tolerance. It is the honest proxy for reference parity available in an
image that cannot run the reference itself (SURVEY.md §4(b)).

Shared numerics, transcribed decisions: both sides call the same
``min_area_rect`` kernel (oracle-tested vs a scipy hull in
test_boxes.py:37) and the same batched KF step functions (filterpy-parity
tested in test_tracking.py), so any mismatch this test reports is a
*decision* divergence, not kernel noise.

The oracle deliberately models the reference's property semantics:
``Detection.cluster_mass_center`` RECOMPUTES ``np.median(cluster_points)``
on every access (objects.py:121-123), which makes the KF smoothed-center
write-back at objects.py:308 dead code — the oracle's mass centers are
therefore always raw medians. A change that fed KF-smoothed centers into
motion vectors or rescue distances would fail this test's box comparison.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tools.parity_oracle import (CLS_KEY, ODet, OTrack, oracle_bin_angles,
                                 oracle_check_box, oracle_fit, oracle_greedy,
                                 oracle_motion_vectors, oracle_propagate,
                                 oracle_simple_fit, oracle_track, rect_fit,
                                 rects_overlap)
from vilgod_tpu.config.presets import waymo_config
from vilgod_tpu.pipeline.stages_boxes import (fit_bounding_boxes_simple,
                                              propagate_labels,
                                              track_clusters)
from vilgod_tpu.pipeline.state import (CLS_NONE, MAPPED_CLASSES, ST_MOVING,
                                       ST_STATIC, ST_UNSET, Capacity,
                                       SequenceState)

CLASS_NAMES = ["Vehicle", "Pedestrian", "Cyclist"]
F = 20
RECT_CAP = 256


# ---------------------------------------------------------------------------
# the shared scenario: six tracks exercising every decision branch
# ---------------------------------------------------------------------------

class Obj:
    def __init__(self, col, base, drift, size, yaw, frames, static,
                 scale_per_frame=0.0, turn_rate=0.0):
        self.col = col
        self.base = np.asarray(base, np.float64)
        self.drift = np.asarray(drift, np.float64)
        self.size = size  # (l, w, h)
        self.yaw = yaw
        self.frames = frames
        self.static = static
        self.scale = scale_per_frame
        # curved paths give the parity test teeth for motion-DIRECTION
        # divergences (straight lines make per-step heading invariant to
        # center smoothing/lag, hiding exactly the KF-write-back class of
        # bug this oracle exists to catch)
        self.turn_rate = turn_rate

    def points(self, fnr):
        if fnr not in self.frames:
            return None
        l, w, h = self.size
        f = 1.0 + self.scale * fnr
        xs = np.linspace(-l / 2, l / 2, 10) * f
        ys = np.linspace(-w / 2, w / 2, 5) * f
        zs = np.array([-h / 2, h / 2])
        g = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1).reshape(-1, 3)
        c, s = np.cos(self.yaw), np.sin(self.yaw)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        pts = g @ rot.T
        # median-preserving symmetric extra pairs make per-frame point
        # counts distinct (the top-k selections use unstable argsort on
        # counts; ties would be legitimately order-dependent)
        extra = np.array([[0.01, 0.01, 0.0], [-0.01, -0.01, 0.0]])
        pts = np.concatenate([pts] + [extra] * (fnr + 1))
        if self.turn_rate:
            speed = np.linalg.norm(self.drift)
            thetas = self.turn_rate * np.arange(fnr)
            center = self.base + speed * np.array(
                [np.sum(np.cos(thetas)), np.sum(np.sin(thetas))])
        else:
            center = self.base + self.drift * fnr
        return (pts + np.array([center[0], center[1], 1.0])).astype(np.float32)


def scenario():
    all_f = range(F)
    return [
        # A: clean static vehicle -> static simple fit, Vehicle >= 0.5
        Obj(0, (10, 5), (0, 0), (4.4, 1.9, 1.5), 0.3, all_f, True),
        # B: fast mover on a CURVED path -> heading fit with per-step
        # angles; mixed classes exercise the relaxed Ped/Cyc label rule
        # (max 0.48 Pedestrian, frac < 0.6)
        Obj(1, (-20, -10), (0.35, 0), (4.0, 1.8, 1.4), 0.0, all_f, False,
            scale_per_frame=0.003, turn_rate=0.09),
        # C: 3-frame track < min_length -> invalidated
        Obj(2, (0, 30), (0, 0), (0.8, 0.8, 1.7), 0.0, range(3, 6), True),
        # D: occluded static track (gap of 3 = max_missed) -> miss steps,
        # rescue-free rematch, trailing-prediction trim; Background >= 0.3
        Obj(3, (25, -15), (0, 0), (4.2, 1.9, 1.5), -0.4,
            list(range(0, 8)) + list(range(11, 17)), True),
        # E: slow mover whose boxes all overlap -> moving->static demotion
        Obj(4, (-5, 25), (0, 0.08), (4.5, 2.0, 1.5), np.pi / 2, all_f, False,
            scale_per_frame=0.003),
        # F: sub-threshold drift -> no far vector -> static fallback with
        # static_track flag; Cyclist frac >= 0.6 at low score
        Obj(5, (40, 0), (0.009, 0), (4.3, 1.9, 1.5), 0.1, all_f, False),
    ]


PLANTED_CLASSES = {
    0: lambda f: ("Vehicle", 0.6),
    1: lambda f: ("Pedestrian", 0.48) if f == 10 else ("Vehicle", 0.45),
    2: lambda f: ("Vehicle", 0.9),
    3: lambda f: ("Background", 0.4),
    4: lambda f: ("Vehicle", 0.55),
    5: lambda f: ("Cyclist", 0.2),
}


def build_state(objs):
    caps = Capacity(max_points=1024, max_ng_points=2048, max_clusters=8,
                    max_cluster_points=RECT_CAP, max_tracks=16, clip_batch=4)
    state = SequenceState.allocate("parity", F, caps)
    for f in range(F):
        pose = np.eye(4, dtype=np.float64)
        pose[:3, 3] = [0.05 * f, 0.02 * f, 0.0]
        state.poses[f] = pose
        row = 0
        for obj in objs:
            pts = obj.points(f)
            if pts is None:
                continue
            n = len(pts)
            state._h_ng_xyz[f, row:row + n] = pts
            state._h_ng_mask[f, row:row + n] = True
            state._h_labels[f, row:row + n] = obj.col
            state.det_n[f, obj.col] = n
            state.det_center[f, obj.col] = np.median(pts, axis=0)
            state.det_valid[f, obj.col] = True
            state.det_static[f, obj.col] = obj.static
            row += n
        # mark a raw point so points_bucket() stays sane
        state.points_mask[f, 0] = True
    return state


@pytest.fixture(scope="module")
def parity_run():
    objs = scenario()
    cfg = waymo_config(capacity={
        "max_points": 1024, "max_ng_points": 2048, "max_clusters": 8,
        "max_cluster_points": RECT_CAP, "max_tracks": 16, "clip_batch": 4})

    # --- our side: table stages over a planted SequenceState ----------
    state = build_state(objs)
    track_clusters(state, cfg)
    for f in range(F):
        for col in range(6):
            if state.det_n[f, col] > 0:
                name, score = PLANTED_CLASSES[col](f)
                state.det_cls[f, col] = MAPPED_CLASSES.index(name)
                state.det_score[f, col] = score
    fit_bounding_boxes_simple(state, cfg)
    propagate_labels(state, cfg)

    # --- oracle: reference object pipeline on identical inputs --------
    frames = []
    for f in range(F):
        dets = []
        for obj in objs:
            pts = obj.points(f)
            if pts is not None:
                dets.append(ODet(pts, obj.static, f, obj.col))
        frames.append(dets)
    tracks = oracle_track(frames)
    for t in tracks:
        for d in t.detections:
            if not d.track_prediction:
                name, score = PLANTED_CLASSES[d.col](d.fnr)
                d.object_class[CLS_KEY] = name
                d.object_class_score[CLS_KEY] = score
    oracle_fit(tracks, state.transform_to_ego)
    oracle_propagate(tracks)
    return state, tracks


def _oracle_real_dets(tracks):
    out = {}
    for t in tracks:
        for d in t.detections:
            if not d.track_prediction:
                out[(d.fnr, d.col)] = (d, t)
    return out


def test_track_structure_matches(parity_run):
    state, tracks = parity_run
    pool = state.tracks
    ours = set()
    for tid in pool.valid_tracks():
        ours.add(frozenset(
            (int(f), int(pool.src_frame[int(tid), f]),
             int(pool.src_cluster[int(tid), f]),
             bool(pool.is_pred[int(tid), f]))
            for f in np.flatnonzero(pool.src_frame[int(tid)] >= 0)))
    oracle = set()
    for t in tracks:
        oracle.add(frozenset(
            (int(fnr), int(d.fnr), int(d.col), bool(d.track_prediction))
            for fnr, d in zip(t.frame_indices, t.detections)))
    assert ours == oracle


def test_valid_flags_match(parity_run):
    state, tracks = parity_run
    for (f, c), (d, t) in _oracle_real_dets(tracks).items():
        assert bool(state.det_valid[f, c]) == bool(d.valid), (f, c)


def test_class_codes_and_scores_match(parity_run):
    state, tracks = parity_run
    checked = 0
    for (f, c), (d, t) in _oracle_real_dets(tracks).items():
        code = int(state.det_cls[f, c])
        name = MAPPED_CLASSES[code] if code != CLS_NONE else None
        assert name == d.object_class[CLS_KEY], (f, c, name)
        assert float(state.det_score[f, c]) == pytest.approx(
            d.object_class_score[CLS_KEY], abs=1e-6), (f, c)
        checked += 1
    assert checked > 50
    # the scenario exercised every label rule
    final = {(f, c): MAPPED_CLASSES[int(state.det_cls[f, c])]
             for (f, c) in _oracle_real_dets(tracks)}
    assert final[(0, 0)] == "Vehicle"      # static >= 0.5
    assert final[(0, 1)] == "Pedestrian"   # relaxed Ped/Cyc rule
    assert final[(0, 3)] == "Background"   # Background >= 0.3 static
    assert final[(0, 4)] == "Vehicle"      # demoted static, >= 0.5
    assert final[(0, 5)] == "Cyclist"      # frac >= 0.6 static


def test_boxes_match(parity_run):
    state, tracks = parity_run
    for (f, c), (d, t) in _oracle_real_dets(tracks).items():
        ours = state.det_box[f, c]
        ref = d.bounding_box
        assert ref is not None and not np.isnan(ours[0]), (f, c)
        # angles compare modulo pi (a rect's heading is pi-periodic and
        # the two implementations may pick opposite directions)
        da = (ours[6] - ref[6]) % np.pi
        da = min(da, np.pi - da)
        np.testing.assert_allclose(ours[:6], ref[:6], atol=2e-3,
                                   err_msg=f"det ({f}, {c})")
        assert da < 1e-3 or abs(ours[3] - ours[4]) < 1e-3, (f, c, da)


def test_static_track_flags_match(parity_run):
    state, tracks = parity_run
    to_code = {None: ST_UNSET, False: ST_MOVING, True: ST_STATIC}
    for (f, c), (d, t) in _oracle_real_dets(tracks).items():
        assert int(state.det_static_track[f, c]) == to_code[d.static_track], (f, c)


def test_generate_detections_masking_matches_reference():
    """Probability masking + per-cluster static flag vs a literal numpy
    transcription of generate_detections (lidar_frame.py:154-248, no-GT
    branch) and filter_by_ephemeral_score (cluster_utils.py:62-64)."""
    from vilgod_tpu.ops import segment as seg_ops
    from vilgod_tpu.ops.cluster import compact_labels_any

    rng = np.random.default_rng(7)
    n, n_clusters = 2048, 9
    labels = rng.integers(-1, n_clusters, n).astype(np.int32)
    # sparse raw label values (paged clustering emits non-dense roots)
    raw_map = np.sort(rng.choice(10_000, n_clusters, replace=False))
    raw = np.where(labels >= 0, raw_map[np.maximum(labels, 0)], -1).astype(np.int32)
    probs = rng.uniform(0, 1, n).astype(np.float32)
    entropy = rng.uniform(0, 1, n).astype(np.float32)
    valid = rng.uniform(0, 1, n) < 0.95
    prob_threshold, percentile, min_score = 0.3, 30.0, 0.5

    # oracle (lidar_frame.py:162-167, 232-243)
    idx = raw.copy()
    idx[probs < prob_threshold] = -1
    idx[~valid] = -1
    oracle = {}
    for cid in np.unique(idx[idx != -1]):
        sel = idx == cid
        moving = not (np.percentile(entropy[sel], percentile) > min_score)
        oracle[int(cid)] = (int(sel.sum()),
                            tuple(np.round(np.median(
                                np.stack([entropy[sel]] * 3, 1), axis=0), 5)),
                            not moving)

    # ours (the post() chain in stages_geometry.cluster_frames_chunk)
    lab = jnp.where((jnp.asarray(probs) < prob_threshold), -1, jnp.asarray(raw))
    lab = jnp.where(jnp.asarray(valid), lab, -1)
    lab = compact_labels_any(lab, 16)
    v = jnp.asarray(valid) & (lab >= 0)
    det_n = np.asarray(seg_ops.seg_count_by_label(lab, v, 16))
    ephe_p = np.asarray(seg_ops.seg_percentile_by_label(
        jnp.asarray(entropy), lab, v, 16, percentile))
    det_static = ephe_p > min_score
    med = np.asarray(seg_ops.seg_median_by_label(
        jnp.stack([jnp.asarray(entropy)] * 3, 1), lab, v, 16))

    # compact_labels_any ranks ascending raw label = np.unique order
    # (lidar_frame.py:167 sorts cluster ids the same way)
    cids = sorted(oracle)
    for rank, cid in enumerate(cids):
        o_n, o_med, o_static = oracle[cid]
        assert det_n[rank] == o_n, (rank, cid)
        np.testing.assert_allclose(med[rank], o_med, atol=1e-5)
        assert bool(det_static[rank]) == o_static, (rank, cid)
    assert det_n[len(cids):].sum() == 0


def test_scenario_branches_were_exercised(parity_run):
    state, tracks = parity_run
    pool = state.tracks
    # C invalidated (min_length)
    assert not state.det_valid[3:6, 2].any()
    # D has prediction steps mid-track and trimmed trailing predictions
    tid_d = int(state.det_tid[0, 3])
    assert pool.is_pred[tid_d, 8:11].all()
    assert pool.src_frame[tid_d, 17:].max() < 0
    # B stayed moving, E was demoted to static
    tid_b = int(state.det_tid[0, 1])
    tid_e = int(state.det_tid[0, 4])
    assert not pool.static[tid_b]
    assert pool.static[tid_e]
    assert (state.det_static_track[0, 4] == ST_STATIC)
    # F fell back to static fit with static_track set
    assert (state.det_static_track[0, 5] == ST_STATIC)
    # A's static_track was never touched (no branch sets it)
    assert (state.det_static_track[0, 0] == ST_UNSET)
