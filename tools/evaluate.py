#!/usr/bin/env python
"""Standalone re-scoring CLI: evaluate saved predictions against GT.

Equivalent of the reference's `waymo_eval.py` standalone entry
(`/root/reference/src/datasets/waymo_eval.py:234-258`), which re-scores a
saved prediction pickle. Accepts the runner's per-sequence result `.npz`
files (or a pickle of frame dicts) plus a dataset root for ground truth.

Usage:
  python tools/evaluate.py --results ./results --data /data/waymo \\
      [--dataset waymo|argoverse] [--split val] [--moving|--static] \\
      [--eval-range -50 -20 50 20] [--iou 0.4]
"""
from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def load_results(path: Path) -> dict[str, list[dict]]:
    """Per-sequence frame dicts from runner .npz files or one pickle."""
    out = {}
    if path.is_dir():
        for f in sorted(path.glob("*.npz")):
            with np.load(f, allow_pickle=True) as d:
                out[f.stem] = list(d["results"])
    else:
        with open(path, "rb") as fp:
            data = pickle.load(fp)
        out[path.stem] = list(data)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--dataset", default="waymo",
                    choices=["waymo", "argoverse"])
    ap.add_argument("--split", default="val")
    ap.add_argument("--moving", action="store_true")
    ap.add_argument("--static", action="store_true")
    ap.add_argument("--bev", action="store_true")
    ap.add_argument("--class-agnostic", action="store_true")
    ap.add_argument("--score-thresh", type=float, default=0.0)
    ap.add_argument("--eval-range", type=float, nargs=4,
                    default=[-50.0, -20.0, 50.0, 20.0])
    ap.add_argument("--iou", type=float, default=0.4)
    ap.add_argument("--cluster-eval", action="store_true",
                    help="also print per-sequence cluster recall/precision "
                         "and moving-flag accuracy aggregates")
    args = ap.parse_args(argv)

    if args.dataset == "waymo":
        from vilgod_tpu.data import WaymoSequenceDataset
        ds = WaymoSequenceDataset(args.data, split=args.split)
    else:
        from vilgod_tpu.data import ArgoverseSequenceDataset
        ds = ArgoverseSequenceDataset(args.data, split=args.split)

    results = load_results(Path(args.results))
    det_annos, gt_annos = [], []
    for name in ds.sequence_names():
        if name not in results:
            continue
        seq = ds.sequence(name)
        frames = results[name]
        if len(frames) != seq.sequence_length:
            print(f"warning: {name}: {len(frames)} result frames vs "
                  f"{seq.sequence_length} GT frames", file=sys.stderr)
        n = min(len(frames), seq.sequence_length)
        seq_gt = [seq.get_annos(f) for f in range(n)]
        det_annos.extend(frames[:n])
        gt_annos.extend(seq_gt)
        if args.cluster_eval:
            from vilgod_tpu.eval import evaluate_sequence_quality
            ev = evaluate_sequence_quality(frames[:n], seq_gt)
            cr = ev.cluster_filtered_tracked_results_mean()
            print(f"{name}: box_recall={cr.box_recall:.3f} "
                  f"box_precision={cr.box_precision:.3f} "
                  f"point_recall={cr.point_recall:.3f} "
                  f"moving P={ev.cluster_moving_precision_mean():.3f} "
                  f"R={ev.cluster_moving_recall_mean():.3f} "
                  f"(tp={ev.cluster_moving_tp()} fp={ev.cluster_moving_fp()} "
                  f"fn={ev.cluster_moving_fn()})")
    if not det_annos:
        raise SystemExit("no overlapping sequences between results and dataset")

    from vilgod_tpu.eval import evaluate_detections, print_eval_log
    ap_dict = evaluate_detections(
        det_annos, gt_annos, class_names=tuple(ds.class_names),
        eval_cfg={"iou_thresholds": (args.iou,) * 4, "difficulties": (2,)},
        eval_range=tuple(args.eval_range), score_thresh=args.score_thresh,
        bev=args.bev, class_agnostic=args.class_agnostic,
        moving=args.moving, static=args.static)
    print_eval_log(ap_dict)


if __name__ == "__main__":
    main()
