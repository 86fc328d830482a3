"""Detection-track assignment algorithms.

Equivalents of `/root/reference/src/utils/tracking_utils.py`:
- :func:`assign_greedy` — sorted-distance greedy matching (adapted there
  from mahalanobis_3d_mot, tracking_utils.py:54-95);
- :func:`assign_hungarian` — scipy ``linear_sum_assignment`` over BEV
  center distance or rotated-3D IoU (tracking_utils.py:23-51); the IoU
  comes from our JAX kernel instead of the pcdet CUDA op.

Cost matrices here are tiny (dets x active tracks per frame), so these
run on host; the heavy geometry stays in jitted kernels.
"""
from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment


def assign_greedy(detections: np.ndarray, tracks: np.ndarray, max_distance: float = 1.0,
                  **_):
    """Greedy sorted-distance matching on BEV centers.

    detections: (D, >=2); tracks: (T, >=2). Returns
    (matches (M, 2) [det_idx, track_idx], det_mask (D,) distance-accepted,
    overlap (D,) matched distance).
    """
    if len(detections) == 0 or len(tracks) == 0:
        return np.empty((0, 2), np.int64), np.array([], bool), np.array([])
    diff = detections[:, None, :2] - tracks[None, :, :2]
    cost = np.sqrt(np.sum(diff * diff, axis=-1))  # (D, T)
    d, t = cost.shape
    order = np.argsort(cost.reshape(-1))
    det_used = np.full(d, -1, np.int64)
    trk_used = np.full(t, -1, np.int64)
    matches = []
    for flat in order:
        di, ti = int(flat // t), int(flat % t)
        if det_used[di] == -1 and trk_used[ti] == -1:
            det_used[di] = ti
            trk_used[ti] = di
            matches.append((di, ti))
    matches = np.array(matches, np.int64).reshape(-1, 2)
    overlap = np.full(d, max_distance + 1.0)
    overlap[matches[:, 0]] = cost[matches[:, 0], matches[:, 1]]
    mask = overlap < max_distance
    return matches, mask, overlap


def assign_hungarian(detections: np.ndarray, tracks: np.ndarray,
                     max_distance: float | None = None,
                     det_overlap_threshold: float | None = None, **_):
    """Hungarian matching over distance or IoU (tracking_utils.py:23-51)."""
    if len(detections) == 0 or len(tracks) == 0:
        return np.empty((0, 2), np.int64), np.array([], bool), np.array([])
    if det_overlap_threshold is not None:
        from ..ops.boxes import iou3d_matrix
        iou = np.asarray(iou3d_matrix(detections[:, :7], tracks[:, :7]))
        cost = -iou
    else:
        diff = detections[:, None, :2] - tracks[None, :, :2]
        cost = np.sqrt(np.sum(diff * diff, axis=-1))
        cost[cost > max_distance] = 1e7
    rows, cols = linear_sum_assignment(cost)
    matches = np.stack([rows, cols], axis=1)
    overlap = np.zeros(len(detections))
    if det_overlap_threshold is not None:
        overlap[rows] = iou[rows, cols]
        mask = overlap >= det_overlap_threshold
    else:
        overlap[rows] = cost[rows, cols]
        mask = overlap < max_distance
    return matches, mask, overlap


ASSIGNMENT_FNS = {
    "assign_detections_greedy": assign_greedy,
    "assign_detections_hungarian": assign_hungarian,
}
