"""Pseudo-label export for detector self-training.

The reference's end goal is feeding the produced pseudo-labels into an
off-the-shelf OpenPCDet training round (`/root/reference/README.md:113-118`).
This module writes the pipeline's per-frame detections as an
OpenPCDet-style infos pickle: each frame entry mirrors the source info
(frame id, point cloud pointer, pose) with its ``annos`` replaced by the
pseudo-labels, so an unmodified OpenPCDet dataset class can train from it.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np


def pseudo_annos(frame_result: dict) -> dict:
    """One frame's detections -> OpenPCDet annos dict."""
    boxes = np.asarray(frame_result["boxes_lidar"], np.float32).reshape(-1, 7)
    n = len(boxes)
    return {
        "name": np.asarray(frame_result["name"]).reshape(-1),
        "gt_boxes_lidar": boxes,
        "score": np.asarray(frame_result["score"], np.float32).reshape(-1),
        # point counts are unknown for pseudo boxes; -1 marks them so
        # difficulty assignment in downstream tooling can special-case
        "num_points_in_gt": np.full(n, -1, np.int32),
        "difficulty": np.zeros(n, np.int32),
        "obj_ids": np.array([f"pseudo_{i}" for i in range(n)]),
        "moving": np.asarray(frame_result.get("moving",
                                              np.zeros(n, bool))).reshape(-1),
    }


def make_pseudo_infos(dataset, results_by_sequence: dict[str, list[dict]]) -> list[dict]:
    """Assemble infos for every processed sequence, in sequence-frame order.

    ``dataset`` provides per-frame metadata; OpenPCDet-backed datasets
    contribute their original info dicts (minus GT annos), synthetic or
    custom sources get a minimal skeleton.
    """
    infos = []
    for name, frames in results_by_sequence.items():
        seq = dataset.sequence(name)
        base_infos = None
        if hasattr(seq, "indices") and hasattr(seq, "dataset"):
            base_infos = [seq.dataset.infos[i] for i in seq.indices]
        for fnr, frame_result in enumerate(frames):
            if base_infos is not None:
                info = dict(base_infos[fnr])
            else:
                info = {
                    "frame_id": f"{name}_{fnr:03d}",
                    "point_cloud": {"lidar_sequence": name, "sample_idx": fnr},
                    "pose": np.asarray(seq.get_pose(fnr)),
                }
            info["annos"] = pseudo_annos(frame_result)
            infos.append(info)
    return infos


def export_pseudo_labels(dataset, results_by_sequence: dict[str, list[dict]],
                         out_path: str | Path) -> Path:
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    infos = make_pseudo_infos(dataset, results_by_sequence)
    with open(out_path, "wb") as f:
        pickle.dump(infos, f)
    return out_path
