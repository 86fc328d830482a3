"""Evaluation subsystem tests: AP math against hand-computed cases, range
masking semantics, and the moving/static split."""
import numpy as np
import pytest

from vilgod_tpu.eval import evaluate_detections, mask_eval_annos, waymo_detection_ap
from vilgod_tpu.eval.format import format_eval_log


def _gt(boxes, names, npts=None, moving=None):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 7)
    n = len(boxes)
    return {
        "gt_boxes_lidar": boxes,
        "name": np.asarray(names),
        "num_points_in_gt": np.asarray(npts if npts is not None else [100] * n),
        "moving": np.asarray(moving if moving is not None else [False] * n, bool),
    }


def _det(boxes, names, scores):
    return {"boxes_lidar": np.asarray(boxes, np.float64).reshape(-1, 7),
            "name": np.asarray(names), "score": np.asarray(scores, np.float64)}


BOX_A = [0.0, 0.0, 1.0, 4.0, 2.0, 1.5, 0.0]
BOX_B = [10.0, 5.0, 1.0, 4.0, 2.0, 1.5, 0.0]
BOX_FAR = [30.0, 10.0, 1.0, 4.0, 2.0, 1.5, 0.0]


def test_perfect_detection_ap_is_one():
    gt = [_gt([BOX_A, BOX_B], ["Vehicle", "Vehicle"])]
    det = [_det([BOX_A, BOX_B], ["Vehicle", "Vehicle"], [0.9, 0.8])]
    ap = waymo_detection_ap(det, gt)
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0, abs=1e-6)
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/APH"] == pytest.approx(1.0, abs=1e-6)


def test_missed_gt_halves_recall():
    gt = [_gt([BOX_A, BOX_B], ["Vehicle", "Vehicle"])]
    det = [_det([BOX_A], ["Vehicle"], [0.9])]
    ap = waymo_detection_ap(det, gt)
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(0.5, abs=1e-6)


def test_false_positive_caps_precision():
    gt = [_gt([BOX_A], ["Vehicle"])]
    # one TP at score 0.9 and one FP at HIGHER score: precision at full
    # recall is 0.5 and the max-interpolated curve keeps it there
    det = [_det([BOX_A, BOX_FAR], ["Vehicle", "Vehicle"], [0.9, 0.95])]
    ap = waymo_detection_ap(det, gt)
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(0.5, abs=1e-6)
    # FP at LOWER score: the high-confidence sweep reaches recall 1 at
    # precision 1 before the FP enters -> AP 1.0
    det2 = [_det([BOX_A, BOX_FAR], ["Vehicle", "Vehicle"], [0.9, 0.2])]
    ap2 = waymo_detection_ap(det2, gt)
    assert ap2["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0, abs=1e-6)


def test_heading_error_lowers_aph_not_ap():
    gt = [_gt([BOX_A], ["Vehicle"])]
    flipped = list(BOX_A)
    flipped[6] = np.pi  # 180-degree heading error, same IoU
    det = [_det([flipped], ["Vehicle"], [0.9])]
    ap = waymo_detection_ap(det, gt)
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0, abs=1e-6)
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/APH"] == pytest.approx(0.0, abs=1e-6)


def test_low_point_gt_is_level2_only():
    gt = [_gt([BOX_A], ["Vehicle"], npts=[3])]  # L2 difficulty
    det = [_det([BOX_A], ["Vehicle"], [0.9])]
    ap = waymo_detection_ap(det, gt, difficulties=(1, 2))
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(0.0, abs=1e-6)
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0, abs=1e-6)


def test_zero_point_gt_dropped():
    gt = [_gt([BOX_A, BOX_B], ["Vehicle", "Vehicle"], npts=[100, 0])]
    det = [_det([BOX_A], ["Vehicle"], [0.9])]
    ap = waymo_detection_ap(det, gt)
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0, abs=1e-6)


def test_range_masking_drops_out_of_range():
    det = [_det([BOX_A, BOX_FAR], ["Vehicle", "Vehicle"], [0.9, 0.9])]
    gt = [_gt([BOX_A, BOX_FAR], ["Vehicle", "Vehicle"])]
    det_m, gt_m = mask_eval_annos(det, gt, ["Vehicle"],
                                  eval_range=(-20.0, -20.0, 20.0, 20.0))
    assert len(det_m[0]["boxes_lidar"]) == 1
    assert len(gt_m[0]["gt_boxes_lidar"]) == 1
    # a box straddling the boundary is dropped (all-corners rule)
    edge = [19.5, 0.0, 1.0, 4.0, 2.0, 1.5, 0.0]
    det2, _ = mask_eval_annos([_det([edge], ["Vehicle"], [0.9])], gt,
                              ["Vehicle"], eval_range=(-20.0, -20.0, 20.0, 20.0))
    assert len(det2[0]["boxes_lidar"]) == 0


def test_moving_split_removes_overlapping_dets():
    gt = [_gt([BOX_A, BOX_B], ["Vehicle", "Vehicle"], moving=[True, False])]
    det = [_det([BOX_A, BOX_B], ["Vehicle", "Vehicle"], [0.9, 0.9])]
    det_m, gt_m = mask_eval_annos(det, gt, ["Vehicle"], moving=True,
                                  eval_range=(-50.0, -20.0, 50.0, 20.0))
    # static GT excluded from GT set; the det overlapping it removed too
    assert len(gt_m[0]["gt_boxes_lidar"]) == 1
    assert len(det_m[0]["boxes_lidar"]) == 1
    np.testing.assert_allclose(det_m[0]["boxes_lidar"][0], BOX_A)


def test_per_cutoff_rematch_is_exact():
    """Adversarial case for per-cutoff re-matching: a suppressed low-score
    detection with HIGHER IoU steals the GT from the surviving detection
    under match-once-filter-later; the official protocol re-matches at
    every cutoff (waymo_eval.py:120-122), so the surviving detection must
    claim the GT once the thief is below the cutoff."""
    gt_box = [0.0, 0.0, 1.0, 4.0, 2.0, 1.5, 0.0]
    det_hi = [0.9, 0.0, 1.0, 4.0, 2.0, 1.5, 0.0]   # IoU ~0.55 vs gt
    det_lo = [0.0, 0.0, 1.0, 4.0, 2.0, 1.5, 0.0]   # IoU 1.0 vs gt
    gt = [_gt([gt_box], ["Vehicle"])]
    det = [_det([det_hi, det_lo], ["Vehicle", "Vehicle"], [0.9, 0.3])]
    ap = waymo_detection_ap(det, gt)
    # at cutoffs in (0.3, 0.9] only det_hi is kept and must match the GT:
    # recall 1.0 at precision 1.0 -> AP == 1.0. Fixed-pairing would leave
    # det_hi unmatched there (precision 0 until det_lo enters).
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0, abs=1e-6)


def test_evaluate_end_to_end_and_format():
    gt = [_gt([BOX_A], ["Vehicle"]), _gt([BOX_B], ["Pedestrian"])]
    det = [_det([BOX_A], ["Vehicle"], [0.9]), _det([], [], [])]
    ap = evaluate_detections(det, gt, class_names=("Vehicle", "Pedestrian", "Cyclist"))
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0, abs=1e-6)
    assert ap["OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_2/AP"] == pytest.approx(0.0, abs=1e-6)
    lines = format_eval_log(ap)
    assert any("Vehicle AP  L2" in ln for ln in lines)
    assert any("1.0000" in ln for ln in lines)


def test_sequence_evaluation_aggregates():
    """ClusterResult/Accuracy/SequenceEvaluation (evaluation.py:5-58):
    perfect predictions aggregate to recall/precision 1; a missed moving
    GT shows up as a moving-flag FN."""
    from vilgod_tpu.eval import SequenceEvaluation, evaluate_sequence_quality

    gt0 = {"gt_boxes_lidar": np.array([BOX_A, BOX_B], np.float32),
           "moving": np.array([True, False]),
           "num_points_in_gt": np.array([100, 50])}
    det_perfect = {"boxes_lidar": np.array([BOX_A, BOX_B], np.float32),
                   "moving": np.array([True, False])}
    ev = evaluate_sequence_quality([det_perfect], [gt0])
    cr = ev.cluster_filtered_tracked_results_mean()
    assert cr.box_recall == pytest.approx(1.0)
    assert cr.box_precision == pytest.approx(1.0)
    assert cr.point_recall == pytest.approx(1.0)
    assert ev.cluster_moving_precision_mean() == pytest.approx(1.0)
    assert ev.cluster_moving_recall_mean() == pytest.approx(1.0)

    # second frame: the moving GT is missed entirely
    det_partial = {"boxes_lidar": np.array([BOX_B], np.float32),
                   "moving": np.array([False])}
    ev2 = evaluate_sequence_quality([det_perfect, det_partial], [gt0, gt0])
    assert ev2.cluster_moving_fn() == 1
    assert ev2.cluster_moving_tp() == 1
    cr2 = ev2.cluster_filtered_tracked_results_mean()
    assert cr2.box_recall == pytest.approx(0.75)
    # point recall weights the miss by its GT point count (100 of 150)
    assert cr2.point_recall == pytest.approx((1.0 + 50.0 / 150.0) / 2)
    assert isinstance(ev2, SequenceEvaluation)


def test_range_breakdown_shards_by_center_range():
    """RANGE breakdown (waymo_eval.py:105-111): a near box matched only
    by a near det and a far box missed entirely give per-bucket APs that
    the aggregate AP blends together."""
    near = BOX_A                                    # |c| ~ 1 -> [0, 30)
    far = [40.0, 0.0, 1.0, 4.0, 2.0, 1.5, 0.0]      # |c| ~ 40 -> [30, 50)
    gt = [_gt([near, far], ["Vehicle", "Vehicle"])]
    det = [_det([near], ["Vehicle"], [0.9])]        # far box missed
    ap = waymo_detection_ap(det, gt, breakdown_range=True)
    assert ap["RANGE_TYPE_VEHICLE_[0, 30)_LEVEL_2/AP"] == pytest.approx(1.0, abs=1e-6)
    assert ap["RANGE_TYPE_VEHICLE_[30, 50)_LEVEL_2/AP"] == pytest.approx(0.0, abs=1e-6)
    assert ap["RANGE_TYPE_VEHICLE_[50, +inf)_LEVEL_2/AP"] == pytest.approx(0.0, abs=1e-6)
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(0.5, abs=1e-6)
    # every RANGE key the formatter knows is emitted for evaluated classes
    lines = format_eval_log(ap)
    assert any("[0, 30)" in ln for ln in lines)
    # default (reference preprocessing.yaml:47) leaves the breakdown off
    ap_default = waymo_detection_ap(det, gt)
    assert not any(k.startswith("RANGE_TYPE") for k in ap_default)
