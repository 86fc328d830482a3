"""Geometry pipeline stages: ground masking, entropy, clustering, filters.

TPU-native re-implementations of the reference orchestrator's stages 1-4
(`/root/reference/src/vilgod/zero_shot_detector.py:129-297`). Each stage
is a pure function ``stage(state, cfg, **args)`` mutating the host-side
:class:`SequenceState`; the per-frame heavy lifting happens in jitted
kernels over padded arrays.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ground.patchwork import ground_config_from_cfg, init_ground_state, segment_ground
from ..ops import boxes as box_ops
from ..ops import segment as seg_ops
from ..ops.cluster import build_cluster_table, compact_labels, dbscan_labels
from ..ops.entropy import entropy_scores_window
from ..ops.neighbors import knn, knn_labels, radius_count_self
from ..ops.plane import fit_ground_plane
from .state import SequenceState


def _points_ref(state: SequenceState, fnr: int) -> np.ndarray:
    """World-frame ("ref") xyz of frame ``fnr`` (lidar_frame.py:66-69)."""
    t = state.transform_to_ref(fnr)
    return state.points[fnr, :, :3] @ t[:3, :3].T + t[:3, 3]


# ---------------------------------------------------------------------------
# Stage 1: mask_ground_points  (zero_shot_detector.py:129-151)
# ---------------------------------------------------------------------------

def mask_ground_points(state: SequenceState, cfg, min_range: float = 1.5,
                       z_offset: float = 1.723, **_):
    """Patchwork++-style ground segmentation, scanned over frames.

    The A-GLE/TGR adaptive state threads across frames exactly like the
    C++ singleton does (patchworkpp.cpp:339-465); the z offset mirrors
    mask_ground_points_patchwork_pp (pointcloud_utils.py:49-56).
    """
    if state.done.get("mask_ground_points"):
        return
    gcfg = ground_config_from_cfg(cfg, min_range=min_range)
    gstate = init_ground_state(gcfg)
    for fnr in range(state.n_frames):
        pts = jnp.asarray(state.points[fnr])
        pts = pts.at[:, 2].add(-z_offset)
        ground, gstate, _ = segment_ground(pts, jnp.asarray(state.points_mask[fnr]),
                                           gstate, gcfg)
        state.ground_mask[fnr] = np.asarray(ground) & state.points_mask[fnr]
        state.compact_non_ground(fnr, _points_ref(state, fnr))
    state.done["mask_ground_points"] = True


def rebuild_ng_buffers(state: SequenceState):
    """Recompute the compacted world-frame non-ground buffers from the raw
    frames + ground masks (after a checkpoint load: cluster points are
    never stored, they re-derive from indices — lidar_frame.py:136-147)."""
    for fnr in range(state.n_frames):
        state.compact_non_ground(fnr, _points_ref(state, fnr))


# ---------------------------------------------------------------------------
# Stage 2: calculate_entropy_scores  (zero_shot_detector.py:153-195)
# ---------------------------------------------------------------------------

def calculate_entropy_scores(state: SequenceState, cfg,
                             n_neighbouring_frames: int = 15,
                             skip_frames: int = 1,
                             max_neighbor_point_dist: float = 0.3,
                             max_neighbor_points: int = 1000,
                             force: bool = False, **_):
    """MODEST-style ephemerality scores over a sliding frame window.

    Window layout matches the reference exactly: the window starts at
    ``clamp(fnr, 0, F - W)`` and the query's position inside it is
    ``fnr - start`` (zero_shot_detector.py:165-184); with ``skip_frames``
    = 1 only every other window frame is sampled
    (pointcloud_utils.py:74-81).
    """
    if state.done.get("calculate_entropy_scores") and not force:
        return
    f_total = state.n_frames
    w = min(n_neighbouring_frames, f_total)
    skip = skip_frames + 1
    sampled = list(range(w))[::skip]

    for fnr in range(f_total):
        start = int(np.clip(fnr, 0, f_total - w))
        seek = fnr - start
        frames = [start + s for s in sampled]
        window = jnp.asarray(state.ng_xyz[frames])            # (Ws, N, 3)
        window_mask = jnp.asarray(state.ng_mask[frames])
        seek_pos = sampled.index(seek) if seek in sampled else -1
        scores = entropy_scores_window(
            jnp.asarray(state.ng_xyz[fnr]), jnp.asarray(state.ng_mask[fnr]),
            window, window_mask, jnp.asarray(seek_pos),
            radius=max_neighbor_point_dist,
            max_neighbor_points=max_neighbor_points,
        )
        state.ng_entropy[fnr] = np.asarray(scores)
    state.done["calculate_entropy_scores"] = True


# ---------------------------------------------------------------------------
# Stage 3: spatial_clustering  (zero_shot_detector.py:197-259)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("subsample_denom",))
def _cluster_frame_mask(xyz, mask, entropy, rand_keep, subsample_denom=2):
    """Per-frame cluster-input selection (zero_shot_detector.py:217-228):

    - drop points with no same-cloud neighbor within 0.2 m;
    - drop moving points (entropy < 0.6) from the random subsample,
      re-admitting those with >= 2 moving neighbors within sqrt(0.1) m
      (the reference compares *squared* kNN distances against 0.1);
    - the random 1/n_frames subsample comes in via ``rand_keep``.
    """
    counts = radius_count_self(xyz, mask, 0.2, max_count=100)
    entropy_mask = mask & (entropy < 0.6)
    moving_mask = entropy_mask
    dists, _ = knn(xyz, moving_mask, xyz, moving_mask, k=4)
    dense_moving = jnp.sum(dists[:, 1:] < 0.1, axis=1) > 1
    keep = rand_keep & mask
    keep &= counts >= 1  # reference: counts-with-self < 2 removed
    keep = jnp.where(entropy_mask, dense_moving & mask, keep)
    return keep


@partial(jax.jit, static_argnames=("max_clusters", "capacity", "eps", "min_cluster_size",
                                   "min_samples"))
def _cluster_and_label(features, feat_mask, query_xyz, query_mask, query_entropy,
                       prob_threshold, ephe_percentile, ephe_min_score,
                       eps=0.15, min_cluster_size=15, min_samples=5,
                       max_clusters=256, capacity=4096):
    """Cluster the 5-D feature buffer, transfer labels to the full frame
    cloud, build detection tables.

    Returns (labels, probs, det_n, det_center, det_static, table, table_mask).
    """
    raw_labels, raw_probs = dbscan_labels(
        features, feat_mask, eps=eps, min_samples=min_samples,
        min_cluster_size=min_cluster_size)
    # kNN label transfer on xyz only, squared-distance cutoff 0.2
    # (pointcloud_utils.py:496-513 via knn over [..., :3])
    labels, probs = knn_labels(query_xyz, query_mask, features[:, :3], feat_mask,
                               raw_labels, raw_probs, dist_threshold=0.2)
    # probability < threshold -> noise (lidar_frame.py:163-165)
    labels = jnp.where(probs < prob_threshold, -1, labels)
    labels = compact_labels(labels, max_clusters)
    table, table_mask = build_cluster_table(labels, query_mask, max_clusters, capacity)
    det_n = seg_ops.seg_count(table_mask).astype(jnp.int32)
    pts = seg_ops.gather_cluster_points(query_xyz, table, table_mask)
    det_center = seg_ops.seg_median(pts, table_mask)
    # static flag via entropy-score filter (lidar_frame.py:238-243)
    ent = jnp.where(table_mask, query_entropy[jnp.maximum(table, 0)], 0.0)
    p = seg_ops.seg_percentile(ent, table_mask, ephe_percentile)
    det_static = p > ephe_min_score  # static = not moving (cluster_utils.py:62-64)
    return labels, probs, det_n, det_center, det_static, table, table_mask


def spatial_clustering(state: SequenceState, cfg, n_frames: int = 2,
                       force: bool = False, **_):
    """Spatio-temporal density clustering + detection-table generation."""
    if state.done.get("spatial_clustering") and not force:
        return
    caps = state.caps
    f_total = state.n_frames
    pre = cfg.get("preprocessor", {})
    model = pre.get("clustering", {}).get("model", {})
    eps = model.get("cluster_selection_epsilon", 0.15)
    min_cluster_size = model.get("min_cluster_size", 15)
    min_samples = model.get("min_samples", 5)
    prob_threshold = pre.get("clustering", {}).get("propability_threshold", 0.3)
    ent_f = pre.get("clustering", {}).get("entropy_score_filter", {})
    ephe_percentile = ent_f.get("percentile", 30)
    ephe_min_score = ent_f.get("min_percentile_pp_score", 0.5)
    seed = cfg.get("random_seed", 666)
    cap_in = cfg.get("capacity", {}).get("max_cluster_input", 65536)

    n = caps.max_ng_points
    for fnr in range(f_total):
        lo = min(fnr, max(f_total - n_frames, 0))
        frames = list(range(lo, min(fnr + n_frames, f_total)))
        feat_list = []
        for f_idx_rel, f in enumerate(frames):
            rng = np.random.default_rng(seed * 100003 + f)
            n_valid = int(np.sum(state.ng_mask[f]))
            rand_keep = np.zeros(n, bool)
            if n_valid > 0:
                pick = rng.choice(n_valid, int(n_valid / len(frames)), replace=False)
                valid_idx = np.flatnonzero(state.ng_mask[f])
                rand_keep[valid_idx[pick]] = True
            keep = np.asarray(_cluster_frame_mask(
                jnp.asarray(state.ng_xyz[f]), jnp.asarray(state.ng_mask[f]),
                jnp.asarray(state.ng_entropy[f]), jnp.asarray(rand_keep)))
            sel = np.flatnonzero(keep)
            feats = np.concatenate(
                [state.ng_xyz[f][sel], state.ng_entropy[f][sel, None],
                 np.full((len(sel), 1), f_idx_rel * 0.1, np.float32)], axis=1)
            feat_list.append(feats)
        # compact the selected cluster input into a fixed-capacity buffer
        # (the selection keeps ~1/2 of each frame, so this is much smaller
        # than the frame buffers; static shape keeps the kernel jittable)
        dense = np.concatenate(feat_list, axis=0).astype(np.float32)[:cap_in]
        features = np.zeros((cap_in, 5), np.float32)
        features[: len(dense)] = dense
        feat_mask = np.zeros(cap_in, bool)
        feat_mask[: len(dense)] = True

        labels, probs, det_n, det_center, det_static, _, _ = _cluster_and_label(
            jnp.asarray(features), jnp.asarray(feat_mask),
            jnp.asarray(state.ng_xyz[fnr]), jnp.asarray(state.ng_mask[fnr]),
            jnp.asarray(state.ng_entropy[fnr]),
            prob_threshold, ephe_percentile, ephe_min_score,
            eps=eps, min_cluster_size=min_cluster_size, min_samples=min_samples,
            max_clusters=caps.max_clusters,
            capacity=caps.max_cluster_points)
        state.labels[fnr] = np.asarray(labels)
        state.probs[fnr] = np.asarray(probs)
        state.det_n[fnr] = np.asarray(det_n)
        state.det_center[fnr] = np.asarray(det_center)
        state.det_static[fnr] = np.asarray(det_static)
        state.det_valid[fnr] = state.det_n[fnr] > 0
    state.done["spatial_clustering"] = True


# ---------------------------------------------------------------------------
# Stage 4: filter_detections  (zero_shot_detector.py:261-297)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("num_clusters", "capacity"))
def _detection_stats(xyz, mask, labels, num_clusters, capacity):
    """Per-cluster stats consumed by the filters: z extent, min/max signed
    plane distance placeholder inputs (plane applied outside), bbox spans."""
    table, table_mask = build_cluster_table(labels, mask, num_clusters, capacity)
    pts = seg_ops.gather_cluster_points(xyz, table, table_mask)
    zmin = seg_ops.seg_min(pts[..., 2], table_mask)
    zmax = seg_ops.seg_max(pts[..., 2], table_mask)
    pmin = seg_ops.seg_min(pts, table_mask)
    pmax = seg_ops.seg_max(pts, table_mask)
    return table, table_mask, pts, zmin, zmax, pmin, pmax


@partial(jax.jit, static_argnames=())
def _plane_distance_stats(pts, table_mask, plane):
    d = (pts @ plane[:3] + plane[3]) / jnp.linalg.norm(plane[:3])
    dmin = seg_ops.seg_min(jnp.where(table_mask, d, 1e9), table_mask)
    dmax = seg_ops.seg_max(jnp.where(table_mask, d, -1e9), table_mask)
    return dmin, dmax


_POS = 1e9


def _hull_areas(pts, table_mask):
    return jax.vmap(seg_ops.convex_hull_area_bev)(pts[..., :2], table_mask)


def filter_detections(state: SequenceState, cfg, force: bool = False, **_):
    """Apply the configured cluster filters to every detection.

    Combinator semantics match Detection.filter (objects.py:158-181):
    valid = (all(and) or any(or)) and all(and+required).
    """
    if state.done.get("filter_detections") and not force:
        return
    pre = cfg.get("preprocessor", {})
    filters = pre.get("clustering", {}).get("filters", [])
    active = pre.get("clustering", {}).get("filters_active", [])
    caps = state.caps

    key = jax.random.PRNGKey(cfg.get("random_seed", 666))
    for fnr in range(state.n_frames):
        # lazy RANSAC ground plane in world frame (lidar_frame.py:97-109)
        if np.any(np.isnan(state.plane_ref[fnr])):
            pts_ref = _points_ref(state, fnr)
            gmask = state.ground_mask[fnr] & state.points_mask[fnr]
            if np.sum(gmask) < 3:
                gmask = state.points_mask[fnr]
            key, sub = jax.random.split(key)
            plane = fit_ground_plane(jnp.asarray(pts_ref), jnp.asarray(gmask), sub)
            state.plane_ref[fnr] = np.asarray(plane)

        table, table_mask, pts, zmin, zmax, pmin, pmax = _detection_stats(
            jnp.asarray(state.ng_xyz[fnr]), jnp.asarray(state.ng_mask[fnr]),
            jnp.asarray(state.labels[fnr]), caps.max_clusters, caps.max_cluster_points)
        n_pts = state.det_n[fnr]
        height = np.asarray(zmax - zmin)
        size = np.asarray(pmax - pmin)  # (C, 3)
        dmin, dmax = _plane_distance_stats(pts, table_mask,
                                           jnp.asarray(state.plane_ref[fnr]))
        dmin, dmax = np.asarray(dmin), np.asarray(dmax)
        ent = np.where(np.asarray(table_mask),
                       state.ng_entropy[fnr][np.maximum(np.asarray(table), 0)], 0.0)
        hull_area = None  # computed lazily if a hull filter is active

        and_v, or_v, req_v = [], [], []
        for flt in filters:
            name = flt["name"]
            if name not in active:
                continue
            args = flt.get("args", {})
            if name == "filter_by_number_points":
                valid = (n_pts >= args.get("min_points", 0)) & (
                    n_pts <= args.get("max_points", 999999))
            elif name == "filter_by_height":
                valid = (height >= args["min_height"]) & (height <= args["max_height"])
            elif name == "filter_by_plane_distance":
                # signed directional distance (cluster_utils.py:51-60)
                valid = (dmin <= args["max_min_height"]) & (dmax >= args["min_max_height"])
            elif name == "filter_by_aspect_ratio":
                mx = np.maximum(size[:, 0], size[:, 1])
                mn = np.maximum(np.minimum(size[:, 0], size[:, 1]), 1e-9)
                ar = mx / mn
                valid = (ar <= args["max_aspect_ratio"]) & (
                    (ar >= args["min_aspect_ratio"])
                    | (size[:, 0] < 1.0) | (size[:, 1] < 1.0))
            elif name in ("filter_by_volume", "filter_by_area"):
                if hull_area is None:
                    hull_area = np.asarray(_hull_areas(pts, table_mask))
                metric = hull_area * height if name == "filter_by_volume" else hull_area
                lo = args.get("min_volume" if name == "filter_by_volume" else "min_area", 0.0)
                valid = (metric >= lo) & (n_pts >= 3)
                hi = args.get("max_volume" if name == "filter_by_volume" else "max_area")
                if hi is not None:
                    valid &= metric <= hi
            elif name == "filter_by_ephemeral_score":
                p = np.asarray(seg_ops.seg_percentile(
                    jnp.asarray(ent), table_mask, args["percentile"]))
                valid = ~(p > args["min_percentile_pp_score"])  # "moving"
            else:
                # unknown filters are skipped silently, mirroring the
                # getattr(...) guard at zero_shot_detector.py:283
                continue
            if args.get("logic") == "and" and args.get("required", False):
                req_v.append(valid)
            elif args.get("logic") == "and":
                and_v.append(valid)
            elif args.get("logic") == "or":
                or_v.append(valid)
        c = caps.max_clusters
        all_and = np.all(and_v, axis=0) if and_v else np.ones(c, bool)
        any_or = np.any(or_v, axis=0) if or_v else np.zeros(c, bool)
        all_req = np.all(req_v, axis=0) if req_v else np.ones(c, bool)
        state.det_valid[fnr] = (all_and | any_or) & all_req & (n_pts > 0)
    state.done["filter_detections"] = True
