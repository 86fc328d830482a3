"""Certify the numpy Waymo AP against the official TF implementation.

The numpy metric (`vilgod_tpu/eval/detection_metrics.py`) follows the
official library's documented semantics (`/root/reference/src/datasets/
waymo_eval.py:95-183`) but cannot be diffed in this image because
``waymo_open_dataset`` is absent. This script makes that a 5-minute job
the first time a TF-bearing environment shows up:

    python tools/certify_tf.py            # load fixture, diff numpy vs TF
    python tools/certify_tf.py --regen    # rebuild fixture + expected AP

The committed fixture (`tests/fixtures/tf_cert_annos.npz`) is a
deterministic 6-frame scene with all three classes, score-ranked FPs,
heading errors, L2 (low-point) ground truth and misses — every branch of
the metric. `tests/fixtures/tf_cert_expected.json` pins the numpy AP on
it (regression-guarded by tests/test_waymo_tf.py).
"""
import json
import os
import sys

import numpy as np

# tiny per-frame IoU calls: the tunneled TPU pays a fresh compile per
# frame shape, so this certification runs on CPU unless overridden
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures", "tf_cert_annos.npz")
EXPECTED = FIXTURE.replace("tf_cert_annos.npz", "tf_cert_expected.json")
TOLERANCE = 0.002


def build_annos():
    """Deterministic det/gt anno lists exercising every metric branch."""
    rng = np.random.default_rng(2024)
    classes = ["Vehicle", "Pedestrian", "Cyclist"]
    sizes = {"Vehicle": (4.6, 2.0, 1.7), "Pedestrian": (0.8, 0.8, 1.7),
             "Cyclist": (1.8, 0.7, 1.7)}
    det_annos, gt_annos = [], []
    for f in range(6):
        g_boxes, g_names, g_npts = [], [], []
        d_boxes, d_names, d_scores = [], [], []
        for k in range(8):
            cls = classes[(f + k) % 3]
            c = rng.uniform(-40, 40, 2)
            yaw = rng.uniform(-np.pi, np.pi)
            box = [c[0], c[1], 1.0, *sizes[cls], yaw]
            g_boxes.append(box)
            g_names.append(cls)
            g_npts.append(int(rng.integers(1, 40)))  # some L2 (<=5 pts)
            r = rng.uniform()
            if r < 0.7:  # matched det with jitter + heading error
                jb = np.array(box, np.float64)
                jb[:2] += rng.normal(scale=0.15, size=2)
                jb[6] += rng.normal(scale=0.2)
                d_boxes.append(jb)
                d_names.append(cls)
                d_scores.append(float(rng.uniform(0.3, 1.0)))
            # else: miss
        for _ in range(3):  # false positives, some above TP scores
            cls = classes[int(rng.integers(3))]
            c = rng.uniform(-60, 60, 2)
            d_boxes.append([c[0], c[1], 1.0, *sizes[cls],
                            float(rng.uniform(-np.pi, np.pi))])
            d_names.append(cls)
            d_scores.append(float(rng.uniform(0.1, 0.95)))
        gt_annos.append({"gt_boxes_lidar": np.asarray(g_boxes, np.float64),
                         "name": np.asarray(g_names),
                         "num_points_in_gt": np.asarray(g_npts)})
        det_annos.append({"boxes_lidar": np.asarray(d_boxes, np.float64),
                          "name": np.asarray(d_names),
                          "score": np.asarray(d_scores, np.float64)})
    return det_annos, gt_annos


def save_fixture(det_annos, gt_annos, path=FIXTURE):
    payload = {"n_frames": np.asarray(len(det_annos))}
    for i, (d, g) in enumerate(zip(det_annos, gt_annos)):
        payload[f"det_boxes_{i}"] = d["boxes_lidar"]
        payload[f"det_name_{i}"] = d["name"].astype("U16")
        payload[f"det_score_{i}"] = d["score"]
        payload[f"gt_boxes_{i}"] = g["gt_boxes_lidar"]
        payload[f"gt_name_{i}"] = g["name"].astype("U16")
        payload[f"gt_npts_{i}"] = g["num_points_in_gt"]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **payload)


def load_fixture(path=FIXTURE):
    z = np.load(path)
    det_annos, gt_annos = [], []
    for i in range(int(z["n_frames"])):
        det_annos.append({"boxes_lidar": z[f"det_boxes_{i}"],
                          "name": z[f"det_name_{i}"],
                          "score": z[f"det_score_{i}"]})
        gt_annos.append({"gt_boxes_lidar": z[f"gt_boxes_{i}"],
                         "name": z[f"gt_name_{i}"],
                         "num_points_in_gt": z[f"gt_npts_{i}"]})
    return det_annos, gt_annos


def main():
    from vilgod_tpu.eval import waymo_detection_ap
    from vilgod_tpu.eval.waymo_tf import tf_available, waymo_tf_ap

    if "--regen" in sys.argv:
        det_annos, gt_annos = build_annos()
        save_fixture(det_annos, gt_annos)
        ap = waymo_detection_ap(det_annos, gt_annos)
        with open(EXPECTED, "w") as f:
            json.dump({k: round(v, 6) for k, v in ap.items()}, f, indent=1)
        print(f"wrote {FIXTURE} and {EXPECTED}")
        return

    det_annos, gt_annos = load_fixture()
    ap = waymo_detection_ap(det_annos, gt_annos)
    with open(EXPECTED) as f:
        expected = json.load(f)
    for k, v in expected.items():
        assert abs(ap[k] - v) < 1e-5, f"numpy AP drifted: {k} {ap[k]} != {v}"
    print("numpy AP matches the committed expected values")
    if not tf_available():
        print("waymo_open_dataset NOT available here - numpy-only check "
              "done; run this script where the package exists to certify")
        return
    tf_ap = waymo_tf_ap(det_annos, gt_annos)
    worst = 0.0
    for k, v in expected.items():
        if k in tf_ap:
            d = abs(tf_ap[k] - v)
            worst = max(worst, d)
            flag = "" if d <= TOLERANCE else "   <-- DISAGREES"
            print(f"{k:48s} numpy={v:.4f} tf={tf_ap[k]:.4f} |d|={d:.4f}{flag}")
    print(f"worst |delta| = {worst:.4f} (tolerance {TOLERANCE})")
    sys.exit(0 if worst <= TOLERANCE else 1)


if __name__ == "__main__":
    main()
