"""Decision-level parity oracle for the host decision stages.

The reference's box fitting (`/root/reference/src/vilgod/zero_shot_detector.py:422-684`),
label propagation (`:686-824`), and tracker
(`/root/reference/src/vilgod/tracker.py:32-80`,
`src/dataclass/objects.py:202-334`) are pure-Python object-soup loops.
This file transcribes that logic into a small numpy object model (the
"oracle"), feeds the oracle and this repo's table-based stages IDENTICAL
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
import numpy as np
import jax.numpy as jnp
import pytest

from vilgod_tpu.config.presets import waymo_config
from vilgod_tpu.ops.boxes import min_area_rect
from vilgod_tpu.pipeline.stages_boxes import (fit_bounding_boxes_simple,
                                              propagate_labels,
                                              track_clusters)
from vilgod_tpu.pipeline.state import (CLS_NONE, MAPPED_CLASSES, ST_MOVING,
                                       ST_STATIC, ST_UNSET, Capacity,
                                       SequenceState)
from vilgod_tpu.tracking.kalman import kf_init, kf_predict, kf_update

CLS_KEY = "clip"
CLASS_NAMES = ["Vehicle", "Pedestrian", "Cyclist"]
F = 20
RECT_CAP = 256


# ---------------------------------------------------------------------------
# shared rect-fit kernel (both sides; decisions are what differ here)
# ---------------------------------------------------------------------------

def rect_fit(points2d: np.ndarray):
    p = np.zeros((RECT_CAP, 2), np.float32)
    m = np.zeros(RECT_CAP, bool)
    p[: len(points2d)] = points2d
    m[: len(points2d)] = True
    corners, rz, area = min_area_rect(jnp.asarray(p), jnp.asarray(m),
                                      step_deg=0.5)
    return np.asarray(corners), float(rz), float(area)


# ---------------------------------------------------------------------------
# the oracle: reference object model, transcribed decisions
# ---------------------------------------------------------------------------

class ODet:
    """Detection object model (objects.py:37-127)."""

    def __init__(self, pts, static, fnr, col):
        self.cluster_points = pts
        self.valid = True
        self.static = static
        self.static_track = None
        self.track_prediction = False
        self.object_class = {}
        self.object_class_score = {}
        self.bounding_box = None
        self.fnr, self.col = fnr, col  # bookkeeping for table comparison

    @property
    def cluster_mass_center(self):
        # objects.py:121-123 — recomputed on EVERY access; this is what
        # makes the KF write-back at objects.py:308 dead code
        return np.median(self.cluster_points, axis=0)

    @property
    def n_points(self):
        return len(self.cluster_points)


class OTrack:
    """Track object model (objects.py:202-334), KF via the shared
    batched step functions on single rows."""

    def __init__(self):
        self.detections = []
        self.frame_indices = []
        self.valid = True
        self.active = True
        self.static = True
        self.miss = 0
        self.kf_x = self.kf_p = self.pred = None

    def init(self, det, fnr):
        x, p = kf_init(det.cluster_mass_center[None, :2])
        self.kf_x, self.kf_p = x[0], p[0]
        self.detections.append(det)
        self.frame_indices.append(fnr)
        self.pred = det.cluster_mass_center.copy()  # objects.py:283-289

    def predict(self):
        x, p = kf_predict(self.kf_x[None], self.kf_p[None])
        self.kf_x, self.kf_p = x[0], p[0]
        self.pred[:2] = self.kf_x[:2]
        self.pred[2] = self.detections[-1].cluster_mass_center[2]

    def update(self, det, fnr):
        if det is not None:  # objects.py:300-308
            self.miss = 0
            x, p = kf_update(self.kf_x[None], self.kf_p[None],
                             det.cluster_mass_center[None, :2])
            self.kf_x, self.kf_p = x[0], p[0]
            # objects.py:308 writes kf.x[:2] into cluster_mass_center —
            # dead: the property recomputes the raw median on next access
        else:  # miss: clone last detection (objects.py:309-317)
            src = self.detections[-1]
            det = ODet(src.cluster_points, src.static, src.fnr, src.col)
            det.object_class = dict(src.object_class)
            det.object_class_score = dict(src.object_class_score)
            det.track_prediction = True
            self.miss += 1
        self.detections.append(det)
        self.frame_indices.append(fnr)

    def finalize(self):
        """Trim trailing prediction steps (objects.py:322-334)."""
        self.active = False
        cnt = 0
        for d in reversed(self.detections):
            if not d.track_prediction:
                break
            cnt += 1
        if cnt:
            self.detections = self.detections[:-cnt]
            self.frame_indices = self.frame_indices[:-cnt]


def oracle_greedy(det_xy, trk_xy, max_distance):
    """assign_detections_greedy (tracking_utils.py:54-95)."""
    if len(det_xy) == 0 or len(trk_xy) == 0:
        return np.empty((0, 2), int), np.array([], bool)
    cost = np.linalg.norm(det_xy[:, None, :2] - trk_xy[None, :, :2], axis=-1)
    d, t = cost.shape
    order = np.argsort(cost.reshape(-1))
    du = [-1] * d
    tu = [-1] * t
    matches = []
    for flat in order:
        di, ti = int(flat // t), int(flat % t)
        if du[di] == -1 and tu[ti] == -1:
            du[di], tu[ti] = ti, di
            matches.append([di, ti])
    matches = np.array(matches).reshape(-1, 2)
    overlap = np.full(d, max_distance + 1.0)
    overlap[matches[:, 0]] = cost[matches[:, 0], matches[:, 1]]
    return matches, overlap < max_distance


def oracle_track(frames, max_distance=1.0, max_missed=3):
    """Tracker.next loop (tracker.py:32-80)."""
    tracks = []
    for fnr, dets in enumerate(frames):
        active = [t for t in tracks if t.active]
        for t in active:
            t.predict()
        trk_xy = np.array([t.pred[:2] for t in active]).reshape(-1, 2)
        det_xy = np.array([d.cluster_mass_center[:2] for d in dets]
                          ).reshape(-1, 2)
        matches_all, mask = oracle_greedy(det_xy, trk_xy, max_distance)
        matches = (matches_all[mask[matches_all[:, 0]]]
                   if len(matches_all) else matches_all)
        for t_idx, t in enumerate(active):
            if len(matches) and t_idx in matches[:, 1]:
                d_idx = int(matches[matches[:, 1] == t_idx, 0][0])
                t.update(dets[d_idx], fnr)
            elif len(matches_all) and t_idx in matches_all[:, 1]:
                # rescue check (tracker.py:55-64)
                d_idx = int(matches_all[matches_all[:, 1] == t_idx, 0][0])
                n1, n2 = dets[d_idx].n_points, t.detections[-1].n_points
                c1 = dets[d_idx].cluster_mass_center
                c2 = t.detections[-1].cluster_mass_center
                if (min(n1, n2) / max(n1, n2) > 0.7
                        and np.linalg.norm(c1 - c2) < 5):
                    t.update(dets[d_idx], fnr)
                else:
                    t.update(None, fnr)
            else:
                if t.miss >= max_missed:
                    t.finalize()
                else:
                    t.update(None, fnr)
        # spawn for dets not in the FILTERED matches (tracker.py:71-76)
        for d_idx, det in enumerate(dets):
            if len(matches) == 0 or d_idx not in matches[:, 0]:
                t = OTrack()
                t.init(det, fnr)
                tracks.append(t)
    for t in tracks:
        if t.active:
            t.finalize()
    return [t for t in tracks if t.valid]


def angle_between_deg(v1, v2):
    """common_utils.angle_between_vectors (common_utils.py:73-76)."""
    with np.errstate(invalid="ignore"):
        cos = v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2))
    cos = np.clip(cos, -0.9999, 0.9999)
    return np.rad2deg(np.arccos(cos))


def oracle_motion_vectors(cluster_points_list):
    """calc_motion_vectors (zero_shot_detector.py:491-568)."""
    centers_xy, center_indices = [], []
    for p_idx, pts in enumerate(cluster_points_list):
        if pts.shape[0] > 0:
            centers_xy.append(np.median(pts[..., :2], axis=0))
            center_indices.append(p_idx)
    centers_xy = np.array(centers_xy)
    motion_vectors, mv_index = [], []
    vector_far = None
    for c_idx, centers in enumerate(centers_xy):
        c_idx_far = min(c_idx + 10 - 1, len(centers_xy) - 1)
        vector_far_ = centers_xy[c_idx_far] - centers
        if np.linalg.norm(vector_far_) < 0.5 and vector_far is None:
            k = 1
            while (np.linalg.norm(vector_far_) < 0.5
                   and (c_idx_far + k) < len(centers_xy)):
                vector_far_ = centers_xy[c_idx_far + k] - centers
                k += 1
            if np.linalg.norm(vector_far_) >= 0.5:
                vector_far = vector_far_
        elif np.linalg.norm(vector_far_) < 0.5:
            pass  # keep last far vector
        else:
            vector_far = vector_far_
        if vector_far is None:
            return [], []
        vectors, mean_norm = [], 0.0
        for i in range(c_idx + 1, c_idx_far):
            vn = centers_xy[i] - centers
            if angle_between_deg(vector_far, vn) < 60 and np.linalg.norm(vn) > 0.3:
                vectors.append(vn * (0.95 ** (i + 1)))
                mean_norm += 0.9 ** (i + 1)
        if vectors:
            mv = np.mean(vectors, axis=0) / mean_norm
            if motion_vectors:
                mv = mv * 0.5 + motion_vectors[-1] * 0.5
            motion_vectors.append(mv)
        elif motion_vectors:
            motion_vectors.append(motion_vectors[-1])
        else:
            motion_vectors.append(vector_far)
        mv_index.append(center_indices[c_idx])
    return motion_vectors, mv_index


def oracle_simple_fit(pts):
    """Static simple fit (zero_shot_detector.py:450-461)."""
    corners, rz, _ = rect_fit(pts[:, :2])
    l = np.linalg.norm(corners[0] - corners[1])
    w = np.linalg.norm(corners[0] - corners[-1])
    c = (corners[0] + corners[2]) / 2
    if w > l:
        l, w = w, l
        rz += np.pi / 2
    h = pts[:, 2].max() - pts[:, 2].min()
    return np.array([c[0], c[1], pts[:, 2].min() + h / 2, l, w, h + 0.3, rz])


def oracle_fit(tracks, transform_to_ego):
    """fit_bounding_boxes_simple, tracked branch (zsd.py:464-684)."""
    for track in tracks:
        possibly_moving = any(not d.static for d in track.detections)
        if not possibly_moving:
            for d in track.detections:
                d.bounding_box = oracle_simple_fit(d.cluster_points)
            continue
        cluster_points = [d.cluster_points for d in track.detections]
        motion_vectors, _ = oracle_motion_vectors(cluster_points)
        boxes, corner_list = [], []
        for c_idx, direction in enumerate(motion_vectors):
            angle = np.arctan2(direction[1], direction[0])
            c, s = np.cos(angle), np.sin(angle)
            rot_mat = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
            center = np.median(cluster_points[c_idx][..., :3], axis=0)
            proj = np.dot(cluster_points[c_idx][..., :3] - center, rot_mat)
            min_x, max_x = proj[:, 0].min(), proj[:, 0].max()
            min_y, max_y = proj[:, 1].min(), proj[:, 1].max()
            rval = np.array([[max_x, min_y], [min_x, min_y],
                             [min_x, max_y], [max_x, max_y]], np.float32)
            corners = np.dot(rval, rot_mat[:2, :2].T) + center[:2]
            w = np.linalg.norm(corners[0] - corners[1])
            l = np.linalg.norm(corners[0] - corners[-1])
            cc = (corners[0] + corners[2]) / 2
            corner_list.append(corners)
            height = (cluster_points[c_idx][:, 2].max()
                      - cluster_points[c_idx][:, 2].min())
            boxes.append(np.array([cc[0], cc[1],
                                   cluster_points[c_idx][:, 2].min() + height / 2,
                                   w, l, height, angle]))
        if len(boxes) > 0:
            boxes = np.array(boxes)
            k_idx = np.argsort([len(cp) for cp in cluster_points])[-3:]
            heights = np.array([np.max(cp[..., 2]) for cp in cluster_points])
            median_box = np.median(boxes[k_idx], axis=0)
            # closest corner to ego per step (zsd.py:617-621)
            cc_idxs = []
            for c_idx, f_idx in enumerate(track.frame_indices):
                t = transform_to_ego(f_idx)
                ego = corner_list[c_idx] @ t[:3, :3][:2, :2].T + t[:2, 3]
                cc_idxs.append(int(np.argmin(np.linalg.norm(ego, axis=1))))
            for cc_idx, cc in enumerate(cc_idxs):  # zsd.py:627-658
                diff_w = median_box[3] - boxes[cc_idx, 3]
                diff_l = median_box[4] - boxes[cc_idx, 4]
                a = np.arctan2(motion_vectors[cc_idx][1],
                               motion_vectors[cc_idx][0])
                sw = diff_w / 2 * np.cos(a), diff_w / 2 * np.sin(a)
                sl = diff_l / 2 * np.sin(-a), diff_l / 2 * np.cos(-a)
                if cc == 0:
                    boxes[cc_idx, 0] += -sw[0] + sl[0]
                    boxes[cc_idx, 1] += -sw[1] + sl[1]
                elif cc == 1:
                    boxes[cc_idx, 0] += sw[0] + sl[0]
                    boxes[cc_idx, 1] += sw[1] + sl[1]
                elif cc == 2:
                    boxes[cc_idx, 0] += sw[0] - sl[0]
                    boxes[cc_idx, 1] += sw[1] - sl[1]
                else:
                    boxes[cc_idx, 0] += -sw[0] - sl[0]
                    boxes[cc_idx, 1] += -sw[1] - sl[1]
            boxes[:, 3:6] = median_box[3:6]
            boxes[:, 2] = heights - median_box[5] / 2
            for b_idx in range(len(boxes)):
                track.detections[b_idx].bounding_box = boxes[b_idx]
                track.detections[b_idx].static_track = False
            track.static = False
        else:  # no derivable motion (zsd.py:668-682)
            for d in track.detections:
                d.static_track = True
                d.bounding_box = oracle_simple_fit(d.cluster_points)


def oracle_check_box(box):
    """check_box size prior (zsd.py:691-701)."""
    l, w, h = box[3:6]
    if 0.8 < h <= 2.3 and 0.2 < w <= 1 and 0.2 < l <= 1:
        return "Pedestrian"
    if 1.4 < h <= 2 and 0.5 < w <= 1 and 1 < l <= 2.5:
        return "Cyclist"
    if 0.5 < w <= 3 and 0.5 < l <= 8.0 and 1 < h <= 3:
        return "Vehicle"
    return "Background"


def oracle_bin_angles(angles, n_bins=45):
    """bin_angles (pointcloud_utils.py:525-560), digitize semantics."""
    edges = np.linspace(0, np.pi, n_bins + 1)
    counts = [0] * n_bins
    binned = [[] for _ in range(n_bins)]
    for a in angles:
        na = a % (2 * np.pi)
        if na > np.pi:
            na %= np.pi
        bi = int(np.digitize(na, edges, right=False)) - 1
        if 0 <= bi < n_bins:
            counts[bi] += 1
            binned[bi].append(na)
    return counts, binned[int(np.argmax(counts))]


def _rect_corners(box):
    cx, cy, dx, dy, a = box[0], box[1], box[3], box[4], box[6]
    c, s = np.cos(a), np.sin(a)
    rot = np.array([[c, -s], [s, c]])
    local = np.array([[dx / 2, dy / 2], [dx / 2, -dy / 2],
                      [-dx / 2, -dy / 2], [-dx / 2, dy / 2]])
    return local @ rot.T + np.array([cx, cy])


def rects_overlap(b1, b2):
    """BEV rotated-rectangle overlap via separating axes (stands in for
    iou3d > 0 over z-flattened slabs, zsd.py:727-738)."""
    c1, c2 = _rect_corners(b1), _rect_corners(b2)
    for a in (b1[6], b2[6]):
        for axis in (np.array([np.cos(a), np.sin(a)]),
                     np.array([-np.sin(a), np.cos(a)])):
            p1, p2 = c1 @ axis, c2 @ axis
            if p1.max() <= p2.min() or p2.max() <= p1.min():
                return False
    return True


def oracle_propagate(tracks, min_length=5):
    """propagate_labels (zsd.py:686-824)."""
    for track in tracks:
        if len(track.detections) < min_length:  # zsd.py:704-708
            for d in track.detections:
                d.valid = False
            continue
        max_score, class_name, class_count = 0.0, "Background", {}
        for d in track.detections:  # zsd.py:713-724
            if d.track_prediction:
                continue
            if d.object_class_score[CLS_KEY] > max_score:
                max_score = d.object_class_score[CLS_KEY]
                class_name = d.object_class[CLS_KEY]
            cn = d.object_class[CLS_KEY]
            class_count[cn] = class_count.get(cn, 0) + 1
        if not track.static:  # demotion (zsd.py:727-741)
            boxes = np.array([d.bounding_box for d in track.detections])
            ref = boxes[np.argmax(np.prod(boxes[:, 3:5], axis=1))]
            if all(rects_overlap(ref, b) for b in boxes):
                track.static = True
                for d in track.detections:
                    d.static_track = True
        if track.static:  # static median box + size gate (zsd.py:744-769)
            boxes, n_points = [], []
            for d in track.detections:
                if d.track_prediction:
                    continue
                boxes.append(d.bounding_box)
                n_points.append(len(d.cluster_points))
            if len(boxes) > 0:
                boxes = np.array(boxes)[np.argsort(n_points)[::-1][:10]]
                _, angles = oracle_bin_angles(boxes[:, 6])
                median_box = np.median(boxes, axis=0)
                median_box[6] = np.mean(angles)
                l, w, h = median_box[3:6]
                if l < 0.2 or l > 20 or w < 0.2 or w > 3.5 or h < 0.5 or h > 4:
                    track.valid = False
                    for d in track.detections:
                        d.valid = False
                    continue
                for d in track.detections:
                    d.bounding_box = median_box.copy()
        n_dets = len(track.detections)
        if not track.static:  # zsd.py:771-801
            for d in track.detections:
                if d.track_prediction:
                    continue
                frac = class_count.get(class_name, 0) / n_dets
                if class_name in CLASS_NAMES and (max_score >= 0.5 or frac >= 0.6):
                    d.object_class[CLS_KEY] = class_name
                    d.object_class_score[CLS_KEY] = max_score
                elif (class_name in CLASS_NAMES
                      and class_name in ("Cyclist", "Pedestrian")
                      and (max_score >= 0.35 or frac >= 0.6)):
                    d.object_class[CLS_KEY] = class_name
                    d.object_class_score[CLS_KEY] = 0.7
                elif class_name == "Background" and max_score >= 0.3:
                    d.object_class[CLS_KEY] = class_name
                    d.object_class_score[CLS_KEY] = max_score
                else:
                    d.object_class[CLS_KEY] = oracle_check_box(d.bounding_box)
                    d.object_class_score[CLS_KEY] = 0.5
                d.static_track = False
                box = d.bounding_box.copy()
                box[3:5] += 0.3
                d.bounding_box = box
        else:  # zsd.py:802-822
            for d in track.detections:
                if d.track_prediction:
                    continue
                frac = class_count.get(class_name, 0) / n_dets
                if class_name in CLASS_NAMES and (max_score >= 0.5 or frac >= 0.6):
                    d.object_class[CLS_KEY] = class_name
                    d.object_class_score[CLS_KEY] = max_score
                elif class_name == "Background" and max_score >= 0.3:
                    d.object_class[CLS_KEY] = "Background"
                    d.object_class_score[CLS_KEY] = 1.0
                box = d.bounding_box.copy()
                box[3:5] += 0.3
                d.bounding_box = box


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
