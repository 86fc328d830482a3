"""Track, box-fit, label-propagation, and export stages (stages 5, 7-9).

TPU-native re-implementations of
`/root/reference/src/vilgod/zero_shot_detector.py:299-327` (tracking),
`:422-684` (box fitting), `:686-824` (label propagation) and `:826-857`
(evaluation export). Rectangle fits and IoU run batched in jitted kernels;
the per-track sequential logic (motion vectors, label rules) is tiny
host-side numpy over the track pool tables.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import segment as seg_ops
from ..ops.boxes import (closeness_rect, iou3d_matrix, min_area_rect,
                         pca_rect, variance_rect)
from ..ops.cluster import build_cluster_table
from ..tracking.tracker import Tracker
from .state import (CLS_NONE, MAPPED_CLASSES, ST_MOVING, ST_STATIC, ST_UNSET,
                    SequenceState)

BACKGROUND = MAPPED_CLASSES.index("Background")


# ---------------------------------------------------------------------------
# Stage 5: track_clusters  (zero_shot_detector.py:299-327)
# ---------------------------------------------------------------------------

def track_clusters(state: SequenceState, cfg, valid_only: bool = True,
                   force: bool = True, **_):
    if state.done.get("track_clusters") and not force:
        return
    state.det_tid[...] = -1
    track_cfg = cfg.get("preprocessor", {}).get("tracking", {}).get("cluster", {})
    tracker = Tracker(state.n_frames, track_cfg, cap=state.caps.max_tracks)
    for fnr in range(state.n_frames):
        sel = state.det_valid[fnr] if valid_only else (state.det_n[fnr] > 0)
        clusters = np.flatnonzero(sel)
        tids = tracker.next(fnr, clusters, state.det_center[fnr, clusters],
                            state.det_n[fnr, clusters])
        state.det_tid[fnr, clusters] = tids
    state.tracks = tracker.finish()
    state.done["track_clusters"] = True


# ---------------------------------------------------------------------------
# Stage 7: fit_bounding_boxes_simple  (zero_shot_detector.py:422-684)
# ---------------------------------------------------------------------------

# rectangle-fit dispatch table: the reference resolves the configured
# method by name (`getattr(pointcloud_utils, method['name'])`,
# zero_shot_detector.py:451,477,672); kwargs translate the reference's
# parameter names to the kernels' (pointcloud_utils.py:195,231).
_RECT_FITS = {
    "minimum_bounding_rectangle": (min_area_rect, {}),
    "closeness_rectangle": (closeness_rect, {"delta": "delta_deg",
                                             "delta_zero": "delta_zero"}),
    "variance_rectangle": (variance_rect, {"delta": "delta_deg"}),
    "PCA_rectangle": (pca_rect, {}),
}


def _parse_method(method) -> tuple[str, tuple]:
    """Normalize a pipeline ``method`` config entry ({name, args}) to a
    hashable (name, ((k, v), ...)) pair for the jitted fit programs."""
    if not method:
        return "minimum_bounding_rectangle", ()
    name = method.get("name", "minimum_bounding_rectangle")
    if name not in _RECT_FITS:
        raise ValueError(f"unknown rectangle fit method {name!r}; "
                         f"known: {sorted(_RECT_FITS)}")
    rename = _RECT_FITS[name][1]
    args = tuple(sorted((rename.get(k, k), float(v))
                        for k, v in (method.get("args") or {}).items()))
    return name, args


@partial(jax.jit, static_argnames=("step_deg", "method", "margs"))
def _fit_static_boxes(pts, table_mask, step_deg=0.5,
                      method="minimum_bounding_rectangle", margs=()):
    """Batched simple fit: configured rect fit + z extent + 0.3 m height
    pad (zero_shot_detector.py:450-461). pts: (B, P, 3). Returns (B, 7)."""
    fit_fn, _ = _RECT_FITS[method]
    kw = dict(margs)
    if method == "minimum_bounding_rectangle":
        kw.setdefault("step_deg", step_deg)

    def one(p, m):
        corners, rz, _ = fit_fn(p[:, :2], m, **kw)
        l = jnp.linalg.norm(corners[0] - corners[1])
        w = jnp.linalg.norm(corners[0] - corners[3])
        c = (corners[0] + corners[2]) / 2
        swap = w > l
        l, w = jnp.where(swap, w, l), jnp.where(swap, l, w)
        rz = jnp.where(swap, rz + jnp.pi / 2, rz)
        zmin = jnp.min(jnp.where(m, p[:, 2], 1e9))
        zmax = jnp.max(jnp.where(m, p[:, 2], -1e9))
        h = zmax - zmin
        return jnp.array([c[0], c[1], zmin + h / 2, l, w, h + 0.3, rz])

    return jax.vmap(one)(pts, table_mask)


@jax.jit
def _batch_medians(pts, table_mask):
    """(B, P, 3) -> (B, 3) masked medians."""
    return jax.vmap(lambda p, m: seg_ops.seg_median(p[None], m[None])[0])(
        pts, table_mask)


@jax.jit
def _fit_heading_packed(ng_xyz, tables, table_masks, frame_ids, cluster_ids,
                        angles):
    """Heading fits packed as (B, 16) = [box(7), corners(8), zmax(1)] so
    the host pays one tunnel round trip, not three."""
    boxes, corners, zmaxs = fit_heading_from_tables(
        ng_xyz, tables, table_masks, frame_ids, cluster_ids, angles)
    return jnp.concatenate(
        [boxes, corners.reshape(-1, 8), zmaxs[:, None]], axis=1)


@jax.jit
def fit_heading_from_tables(ng_xyz, tables, table_masks, frame_ids,
                            cluster_ids, angles):
    """Motion-aligned fits for a (frame, cluster) batch gathered from the
    shared device tables (no host point gathers)."""
    rows = jnp.maximum(tables[frame_ids, cluster_ids], 0)
    rmask = table_masks[frame_ids, cluster_ids] & (cluster_ids >= 0)[:, None]
    pts = ng_xyz[frame_ids[:, None], rows]
    pts = jnp.where(rmask[..., None], pts, 0.0)
    safe = rmask.at[:, 0].set(True)
    return _fit_heading_boxes(pts, safe, angles)


@jax.jit
def _fit_heading_boxes(pts, table_mask, angles):
    """Batched motion-aligned fit (zero_shot_detector.py:576-604):
    median-center, rotate by heading, axis-aligned spans. Returns
    (boxes (B, 7) [cx, cy, zmin+h/2, w, l, h, angle], corners (B, 4, 2))
    — note the reference's w-before-l ordering in this branch."""

    def one(p, m, angle):
        center = seg_ops.seg_median(p[None], m[None])[0]
        c, s = jnp.cos(angle), jnp.sin(angle)
        rot = jnp.array([[c, -s], [s, c]])
        proj = (p[:, :2] - center[:2]) @ rot  # np.dot(pts, rot_mat)
        big = 1e9
        min_x = jnp.min(jnp.where(m, proj[:, 0], big))
        max_x = jnp.max(jnp.where(m, proj[:, 0], -big))
        min_y = jnp.min(jnp.where(m, proj[:, 1], big))
        max_y = jnp.max(jnp.where(m, proj[:, 1], -big))
        rect = jnp.array([[max_x, min_y], [min_x, min_y],
                          [min_x, max_y], [max_x, max_y]])
        corners = rect @ rot[:2, :2].T + center[:2]
        w = jnp.linalg.norm(corners[0] - corners[1])
        l = jnp.linalg.norm(corners[0] - corners[3])
        cc = (corners[0] + corners[2]) / 2
        zmin = jnp.min(jnp.where(m, p[:, 2], big))
        zmax = jnp.max(jnp.where(m, p[:, 2], -big))
        h = zmax - zmin
        box = jnp.array([cc[0], cc[1], zmin + h / 2, w, l, h, angle])
        return box, corners, zmax

    return jax.vmap(one)(pts, table_mask, angles)


def _gather_cluster_pts(state: SequenceState, fnr: int, cluster: int) -> np.ndarray:
    idx = np.flatnonzero(state.ng_mask[fnr] & (state.labels[fnr] == cluster))
    return state.ng_xyz[fnr, idx]


def _batch_tables(state: SequenceState, dets: list[tuple[int, int]],
                  pad_to: int | None = None):
    """Gather (frame, cluster) detections into a padded (B, P, 3) batch.

    ``pad_to`` fixes the batch dimension so downstream jits compile once
    (variable trailing-chunk sizes would otherwise recompile per shape).
    """
    cap = state.caps.max_cluster_points
    b = pad_to if pad_to is not None else len(dets)
    pts = np.zeros((b, cap, 3), np.float32)
    mask = np.zeros((b, cap), bool)
    for i, (f, c) in enumerate(dets):
        p = _gather_cluster_pts(state, f, c)[:cap]
        pts[i, : len(p)] = p
        mask[i, : len(p)] = True
    mask[len(dets):, 0] = True  # keep padded rows' reductions finite
    return pts, mask


@partial(jax.jit, static_argnames=("step_deg", "method", "margs"))
def fit_static_from_tables(ng_xyz, tables, table_masks, frame_ids,
                           cluster_ids, step_deg=0.5,
                           method="minimum_bounding_rectangle", margs=()):
    """Simple-fit a (frame, cluster) batch gathered from the shared
    device tables — only the requested detections pay the angle sweep
    (a whole-frame fit would run 256 mostly-empty clusters per frame)."""
    rows = jnp.maximum(tables[frame_ids, cluster_ids], 0)
    rmask = table_masks[frame_ids, cluster_ids] & (cluster_ids >= 0)[:, None]
    pts = ng_xyz[frame_ids[:, None], rows]
    pts = jnp.where(rmask[..., None], pts, 0.0)
    safe = rmask.at[:, 0].set(True)
    return _fit_static_boxes(pts, safe, step_deg=step_deg, method=method,
                             margs=margs)


def _fit_static_chunked(state: SequenceState, dets: list[tuple[int, int]],
                        method=None):
    """Simple-fit a detection list in ONE device program over the shared
    gather tables (no host point gathers, no per-frame dispatches)."""
    from .stages_geometry import frame_bucket

    if not dets:
        return
    mname, margs = _parse_method(method)
    f_pad = frame_bucket(state.n_frames)
    n_ng = state.ng_bucket()
    ng_xyz = state.device("ng_xyz", f_pad, n_ng)
    tables, table_masks = state.det_tables(f_pad, n_ng)
    b = _pad_pow2(len(dets), lo=64)
    fids = np.zeros(b, np.int32)
    cids = np.full(b, -1, np.int32)
    fids[: len(dets)] = [f for f, _ in dets]
    cids[: len(dets)] = [c for _, c in dets]
    boxes = np.asarray(fit_static_from_tables(
        ng_xyz, tables, table_masks, jnp.asarray(fids), jnp.asarray(cids),
        method=mname, margs=margs))
    for i, (f, c) in enumerate(dets):
        state.det_box[f, c] = boxes[i]


def _pad_pow2(n: int, lo: int = 32) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _angle_between_deg(v1, v2):
    """Reference common_utils.angle_between_vectors (degrees)."""
    n1, n2 = np.linalg.norm(v1), np.linalg.norm(v2)
    if n1 == 0 or n2 == 0:
        return 180.0
    cosang = np.clip(np.dot(v1, v2) / (n1 * n2), -1.0, 1.0)
    return np.degrees(np.arccos(cosang))


def _calc_motion_vectors(centers_xy: np.ndarray):
    """Decayed-mean motion direction per step (zero_shot_detector.py:491-568).

    centers_xy: (S, 2) per-step cluster medians (prediction steps carry the
    source detection's median, exactly like the reference's clones).
    Returns list of (S,) vectors or [] when no direction can be derived.
    """
    s = len(centers_xy)
    motion_vectors = []
    vector_far = None
    for c_idx in range(s):
        c_idx_far = min(c_idx + 9, s - 1)
        vector_far_ = centers_xy[c_idx_far] - centers_xy[c_idx]
        if np.linalg.norm(vector_far_) < 0.5 and vector_far is None:
            idx_counter = 1
            while (np.linalg.norm(vector_far_) < 0.5
                   and (c_idx_far + idx_counter) < s):
                vector_far_ = centers_xy[c_idx_far + idx_counter] - centers_xy[c_idx]
                idx_counter += 1
            if np.linalg.norm(vector_far_) >= 0.5:
                vector_far = vector_far_
        elif np.linalg.norm(vector_far_) < 0.5:
            pass  # keep last far vector
        else:
            vector_far = vector_far_

        if vector_far is None:
            return []
        vectors = []
        mean_vector_norm = 0.0
        for i in range(c_idx + 1, c_idx_far):
            vector_next = centers_xy[i] - centers_xy[c_idx]
            if (_angle_between_deg(vector_far, vector_next) < 60
                    and np.linalg.norm(vector_next) > 0.3):
                vectors.append(vector_next * (0.95 ** (i + 1)))
                mean_vector_norm += 0.9 ** (i + 1)
        if vectors:
            mean_vector = np.mean(vectors, axis=0) / mean_vector_norm
            if motion_vectors:
                mean_vector = mean_vector * 0.5 + motion_vectors[-1] * 0.5
            motion_vectors.append(mean_vector)
        elif motion_vectors:
            motion_vectors.append(motion_vectors[-1])
        else:
            motion_vectors.append(vector_far)
    return motion_vectors


def fit_bounding_boxes_simple(state: SequenceState, cfg, method=None,
                              valid_only: bool = True, force: bool = True, **_):
    if state.done.get("fit_bounding_boxes_simple") and not force:
        return
    state.det_box[...] = np.nan
    pool = state.tracks

    if pool is None or len(pool.valid_tracks()) == 0:
        # no tracking: per-detection simple fit (zero_shot_detector.py:444-462)
        dets = [(f, c) for f in range(state.n_frames)
                for c in np.flatnonzero(state.det_valid[f] if valid_only
                                        else state.det_n[f] > 0)]
        _fit_static_chunked(state, dets, method=method)
        state.done["fit_bounding_boxes_simple"] = True
        return

    static_dets: list[tuple[int, int]] = []
    moving_jobs = []  # (tid, steps)
    for tid in pool.valid_tracks():
        steps = list(pool.steps(int(tid)))
        # possibly moving if any step's source detection is non-static
        possibly_moving = any(not state.det_static[sf, sc] for _, sf, sc, _ in steps)
        if not possibly_moving:
            static_dets.extend({(sf, sc) for _, sf, sc, _ in steps})
        else:
            moving_jobs.append((int(tid), steps))

    # batched static fits
    _fit_static_chunked(state, sorted(set(static_dets)), method=method)

    # moving tracks: motion-vector-aligned boxes with closest-corner
    # re-anchoring (zero_shot_detector.py:489-682). All tracks' heading
    # fits batch into ONE device call; the tiny per-track anchoring
    # arithmetic stays on host over the downloaded batch.
    from .stages_geometry import frame_bucket
    f_pad = frame_bucket(state.n_frames)
    n_ng = state.ng_bucket()
    ng_xyz_d = state.device("ng_xyz", f_pad, n_ng)
    tables_d, table_masks_d = state.det_tables(f_pad, n_ng)

    jobs = []       # (tid, steps, sfs, scs, angles, offset)
    fallback_static: list[tuple[int, list]] = []
    total = 0
    for tid, steps in moving_jobs:
        sfs = np.array([sf for _, sf, sc, _ in steps], np.int32)
        scs = np.array([sc for _, sf, sc, _ in steps], np.int32)
        # per-step mass centers are the RAW per-detection medians. The
        # reference's KF write-back (objects.py:308 writes kf.x[:2] into
        # detection.cluster_mass_center) is dead code: cluster_mass_center
        # is a property that RECOMPUTES np.median(cluster_points) on every
        # access (objects.py:121-123), so the smoothed value is clobbered
        # before calc_motion_vectors (zero_shot_detector.py:496-500) or the
        # rescue check (tracker.py:59) ever reads it. Raw medians ARE the
        # reference behavior; see PARITY.md and tests/test_reference_parity.py.
        centers = state.det_center[sfs, scs]
        motion_vectors = _calc_motion_vectors(centers[:, :2])
        if len(motion_vectors) > 0:
            angles = np.arctan2([v[1] for v in motion_vectors],
                                [v[0] for v in motion_vectors])
            jobs.append((tid, steps, sfs, scs, angles, total))
            total += len(steps)
        else:
            fallback_static.append((tid, steps))

    if jobs:
        pad_s = _pad_pow2(total)
        fids = np.zeros(pad_s, np.int32)
        cids = np.full(pad_s, -1, np.int32)
        angles_p = np.zeros(pad_s, np.float32)
        for _, steps, sfs, scs, angles, off in jobs:
            s = len(steps)
            fids[off:off + s], cids[off:off + s] = sfs, scs
            angles_p[off:off + s] = angles
        packed = np.asarray(_fit_heading_packed(
            ng_xyz_d, tables_d, table_masks_d, jnp.asarray(fids),
            jnp.asarray(cids), jnp.asarray(angles_p)))  # one download
        all_boxes = packed[:, :7].copy()
        all_corners = packed[:, 7:15].reshape(-1, 4, 2)
        all_zmaxs = packed[:, 15]

    for tid, steps, sfs, scs, angles, off in jobs:
        s = len(steps)
        boxes = all_boxes[off:off + s].copy()
        corners = all_corners[off:off + s]
        n_points = state.det_n[sfs, scs]
        heights = all_zmaxs[off:off + s]
        k_idx = np.argsort(n_points, kind="stable")[-3:]
        median_box = np.median(boxes[k_idx], axis=0)
        # closest corner to ego per step (corners are world-frame;
        # transform to that step's ego frame, zero_shot_detector.py:618-621)
        cc_idxs = []
        for s_idx, (f, _, _, _) in enumerate(steps):
            t = state.transform_to_ego(f)
            ego = corners[s_idx] @ t[:3, :3][:2, :2].T + t[:2, 3]
            cc_idxs.append(int(np.argmin(np.linalg.norm(ego, axis=1))))
        for s_idx, cc in enumerate(cc_idxs):
            diff_w = median_box[3] - boxes[s_idx, 3]
            diff_l = median_box[4] - boxes[s_idx, 4]
            a = angles[s_idx]
            # corner cases follow zero_shot_detector.py:627-658 exactly:
            if cc == 0:
                boxes[s_idx, 0] += -(diff_w / 2) * np.cos(a) + (diff_l / 2) * np.sin(-a)
                boxes[s_idx, 1] += -(diff_w / 2) * np.sin(a) + (diff_l / 2) * np.cos(-a)
            elif cc == 1:
                boxes[s_idx, 0] += (diff_w / 2) * np.cos(a) + (diff_l / 2) * np.sin(-a)
                boxes[s_idx, 1] += (diff_w / 2) * np.sin(a) + (diff_l / 2) * np.cos(-a)
            elif cc == 2:
                boxes[s_idx, 0] += (diff_w / 2) * np.cos(a) - (diff_l / 2) * np.sin(-a)
                boxes[s_idx, 1] += (diff_w / 2) * np.sin(a) - (diff_l / 2) * np.cos(-a)
            else:
                boxes[s_idx, 0] += -(diff_w / 2) * np.cos(a) - (diff_l / 2) * np.sin(-a)
                boxes[s_idx, 1] += -(diff_w / 2) * np.sin(a) - (diff_l / 2) * np.cos(-a)
        boxes[:, 3:6] = median_box[3:6]
        boxes[:, 2] = heights - median_box[5] / 2
        for s_idx, (f, sf, sc, is_pred) in enumerate(steps):
            if not is_pred:
                state.det_box[sf, sc] = boxes[s_idx]
            state.det_static_track[sf, sc] = ST_MOVING
        pool.static[tid] = False

    # no derivable motion direction: static fit + static_track flag
    # (zero_shot_detector.py:668-682)
    fb_dets = sorted({(sf, sc) for _, steps in fallback_static
                      for _, sf, sc, _ in steps})
    _fit_static_chunked(state, fb_dets, method=method)
    for _, steps in fallback_static:
        for _, sf, sc, _ in steps:
            state.det_static_track[sf, sc] = ST_STATIC
    state.done["fit_bounding_boxes_simple"] = True


# ---------------------------------------------------------------------------
# Stage 8: propagate_labels  (zero_shot_detector.py:686-824)
# ---------------------------------------------------------------------------

def _check_box(box) -> int:
    """Size-prior class fallback (zero_shot_detector.py:691-701)."""
    l, w, h = box[3:6]
    if 0.8 < h <= 2.3 and 0.2 < w <= 1 and 0.2 < l <= 1:
        return MAPPED_CLASSES.index("Pedestrian")
    if 1.4 < h <= 2 and 0.5 < w <= 1 and 1 < l <= 2.5:
        return MAPPED_CLASSES.index("Cyclist")
    if 0.5 < w <= 3 and 0.5 < l <= 8.0 and 1 < h <= 3:
        return MAPPED_CLASSES.index("Vehicle")
    return BACKGROUND


def _check_box_geometry(box) -> int:
    """Size prior for the geometry-only ablation's unclassified fallback.

    The static fit pads height by +0.3 m (zero_shot_detector.py:460), so
    a true cyclist extent of ~1.8 m arrives here as ~2.1 m and busts the
    Cyclist prior's ``h <= 2`` ceiling, landing in the Vehicle bucket —
    measured as cyc_ap == 0.0 in every geometry bench. The reference
    never faces this (check_box is only a low-score fallback behind CLIP,
    and the geometry-only config cannot run there at all), so this
    ablation-only variant undoes the pad before applying the priors;
    the CLIP-backed paths keep the reference-exact :func:`_check_box`.
    """
    unpadded = np.asarray(box, np.float64).copy()
    unpadded[5] -= 0.3
    return _check_box(unpadded)


def _bin_angles(angles: np.ndarray, n_bins: int = 45):
    """Orientation histogram over [0, pi) (pointcloud_utils.py:525-560):
    returns the angles of the fullest bin."""
    edges = np.linspace(0, np.pi, n_bins + 1)
    norm = np.mod(angles, 2 * np.pi)
    norm = np.where(norm > np.pi, np.mod(norm, np.pi), norm)
    bins = np.clip(np.digitize(norm, edges, right=False) - 1, 0, n_bins - 1)
    counts = np.bincount(bins, minlength=n_bins)
    best = int(np.argmax(counts))
    return counts, norm[bins == best]


@jax.jit
def _demotion_iou_jit(refs, flats):
    """(T, 7) reference boxes x (T, S, 7) track boxes -> (T, S) IoU."""
    return jax.vmap(lambda r, f: iou3d_matrix(r[None], f)[0])(refs, flats)


def _batch_demotion_checks(state: SequenceState, pool, candidates):
    """Moving -> static demotion test for every candidate track in ONE
    device call (zero_shot_detector.py:727-741): flatten each track's
    boxes to BEV slabs and check that ALL of them overlap the
    largest-footprint one. candidates: {tid: steps}.

    Both batch dims pad to pow2 buckets: data-dependent shapes here used
    to recompile the vmapped IoU program once per SEQUENCE (~1.3 s each,
    ~90% of this stage's wall on the tunneled v5e)."""
    if not candidates:
        return {}
    max_s = _pad_pow2(max(len(s) for s in candidates.values()), lo=8)
    tids = sorted(candidates)
    n_pad = _pad_pow2(len(tids), lo=8)
    refs = np.zeros((n_pad, 7), np.float32)
    flats = np.zeros((n_pad, max_s, 7), np.float32)
    counts = np.zeros(n_pad, np.int64)
    for i, tid in enumerate(tids):
        boxes = np.array([state.det_box[sf, sc]
                          for _, sf, sc, _ in candidates[tid]])
        boxes = boxes[~np.isnan(boxes[:, 0])]
        if not len(boxes):
            continue
        ref = boxes[int(np.argmax(np.prod(boxes[:, 3:5], axis=1)))].copy()
        flat = boxes[:, :7].copy()
        ref[2], ref[5] = 0.0, 1.0
        flat[:, 2], flat[:, 5] = 0.0, 1.0
        refs[i] = ref[:7]
        flats[i, : len(flat)] = flat
        counts[i] = len(flat)
    iou = np.asarray(_demotion_iou_jit(jnp.asarray(refs), jnp.asarray(flats)))
    out = {}
    for i, tid in enumerate(tids):
        n = int(counts[i])
        out[tid] = n > 0 and np.count_nonzero(iou[i][:n]) == n
    return out


def propagate_labels(state: SequenceState, cfg, min_length: int = 5,
                     classification_key: str = "clip", **_):
    pool = state.tracks
    if pool is None:
        return
    class_names = cfg.get("preprocessor", {}).get(
        "class_names", ["Vehicle", "Pedestrian", "Cyclist"])
    fg_codes = {MAPPED_CLASSES.index(c) for c in class_names}

    # one device call for every track's demotion IoU test (the per-track
    # loop would pay a tunnel round-trip each)
    demote = _batch_demotion_checks(state, pool, {
        int(tid): list(pool.steps(int(tid))) for tid in pool.valid_tracks()
        if not pool.static[int(tid)]
        and len(list(pool.steps(int(tid)))) >= min_length})

    for tid in pool.valid_tracks():
        tid = int(tid)
        steps = list(pool.steps(tid))
        if len(steps) < min_length:
            for _, sf, sc, _ in steps:
                state.det_valid[sf, sc] = False
            continue

        real = [(sf, sc) for _, sf, sc, is_pred in steps if not is_pred]
        # class stats over real steps (zero_shot_detector.py:710-724)
        max_score, class_code = 0.0, BACKGROUND
        class_count: dict[int, int] = {}
        unclassified = all(state.det_cls[sf, sc] == CLS_NONE for sf, sc in real)
        for sf, sc in real:
            code = int(state.det_cls[sf, sc])
            score = float(state.det_score[sf, sc])
            if code == CLS_NONE:
                code, score = BACKGROUND, 0.0  # geometry-only runs
            if score > max_score:
                max_score, class_code = score, code
            class_count[code] = class_count.get(code, 0) + 1

        # moving -> static demotion when all boxes mutually overlap the
        # largest one (zero_shot_detector.py:727-741); the IoU tests ran
        # batched above
        if not pool.static[tid] and demote.get(tid, False):
            pool.static[tid] = True
            for _, sf, sc, _ in steps:
                state.det_static_track[sf, sc] = ST_STATIC

        # static-track median box + size gate (zero_shot_detector.py:744-769)
        if pool.static[tid]:
            boxes, n_points = [], []
            for sf, sc in real:
                if not np.isnan(state.det_box[sf, sc, 0]):
                    boxes.append(state.det_box[sf, sc])
                    n_points.append(state.det_n[sf, sc])
            if boxes:
                boxes = np.array(boxes)[np.argsort(n_points, kind="stable")[::-1][:10]]
                _, bin_angle_vals = _bin_angles(boxes[:, 6])
                median_box = np.median(boxes, axis=0)
                median_box[6] = np.mean(bin_angle_vals)
                l, w, h = median_box[3:6]
                if l < 0.2 or l > 20 or w < 0.2 or w > 3.5 or h < 0.5 or h > 4:
                    pool.valid[tid] = False
                    for _, sf, sc, _ in steps:
                        state.det_valid[sf, sc] = False
                    continue
                for _, sf, sc, _ in steps:
                    state.det_box[sf, sc] = median_box

        # label rules (zero_shot_detector.py:771-822)
        n_steps = len(steps)
        frac = class_count.get(class_code, 0) / n_steps
        for sf, sc in real:
            if not pool.static[tid]:
                if class_code in fg_codes and (max_score >= 0.5 or frac >= 0.6):
                    state.det_cls[sf, sc] = class_code
                    state.det_score[sf, sc] = max_score
                elif (class_code in fg_codes
                      and MAPPED_CLASSES[class_code] in ("Cyclist", "Pedestrian")
                      and (max_score >= 0.35 or frac >= 0.6)):
                    state.det_cls[sf, sc] = class_code
                    state.det_score[sf, sc] = 0.7
                elif class_code == BACKGROUND and max_score >= 0.3:
                    state.det_cls[sf, sc] = class_code
                    state.det_score[sf, sc] = max_score
                else:
                    state.det_cls[sf, sc] = _check_box(state.det_box[sf, sc])
                    state.det_score[sf, sc] = 0.5
                state.det_static_track[sf, sc] = ST_MOVING
            else:
                if unclassified and not np.isnan(state.det_box[sf, sc, 0]):
                    # geometry-only ablation (no CLIP stage): fall back to
                    # the size prior — the reference cannot run this config
                    # at all (object_class[cls_key] would KeyError). Score
                    # by cluster support so the PR sweep has a ranking
                    # (ground remnants are small, real objects dense)
                    state.det_cls[sf, sc] = _check_box_geometry(
                        state.det_box[sf, sc])
                    n = float(state.det_n[sf, sc])
                    state.det_score[sf, sc] = n / (n + 200.0)
                elif class_code in fg_codes and (max_score >= 0.5 or frac >= 0.6):
                    state.det_cls[sf, sc] = class_code
                    state.det_score[sf, sc] = max_score
                elif class_code == BACKGROUND and max_score >= 0.3:
                    state.det_cls[sf, sc] = BACKGROUND
                    state.det_score[sf, sc] = 1.0
            # enlarge box by a small margin (zsd.py:798-801, 819-822)
            if not np.isnan(state.det_box[sf, sc, 0]):
                state.det_box[sf, sc, 3:5] += 0.3
    state.done["propagate_labels"] = True


# ---------------------------------------------------------------------------
# Stage 9: evaluate_sequence  (zero_shot_detector.py:826-857)
# ---------------------------------------------------------------------------

def evaluate_sequence(state: SequenceState, cfg, modes=("detection_3d",),
                      classification_key: str = "clip", **_) -> list[dict]:
    """Assemble per-frame detection dicts in the ego frame."""
    class_names = cfg.get("preprocessor", {}).get(
        "class_names", ["Vehicle", "Pedestrian", "Cyclist"])
    fg_codes = {MAPPED_CLASSES.index(c): c for c in class_names}
    results = []
    for fnr in range(state.n_frames):
        t = state.transform_to_ego(fnr)
        yaw = np.arctan2(t[1, 0], t[0, 0])
        boxes, names, scores, moving = [], [], [], []
        for c in np.flatnonzero(state.det_valid[fnr]):
            code = int(state.det_cls[fnr, c])
            if code in fg_codes and not np.isnan(state.det_box[fnr, c, 0]):
                b = state.det_box[fnr, c].copy()
                b[:3] = b[:3] @ t[:3, :3].T + t[:3, 3]
                b[6] += yaw
                boxes.append(b)
                names.append(fg_codes[code])
                scores.append(float(state.det_score[fnr, c]))
                moving.append(state.det_static_track[fnr, c] == ST_MOVING)
        results.append({
            "boxes_lidar": np.array(boxes).reshape(-1, 7),
            "name": np.array(names),
            "score": np.array(scores),
            "moving": np.array(moving, bool),
        })
    state.detection_3d_result_list = results
    return results
