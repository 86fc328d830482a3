"""Exercise the TF-metrics certification adapter without the package.

``waymo-open-dataset`` (and TensorFlow) are absent in this image, so
``eval/waymo_tf.py`` cannot be certified here. These tests still execute
all of its logic — the flat-tensor conversion directly, and the full
``waymo_tf_ap`` path against a mocked ``waymo_open_dataset``/``tensorflow``
interface — asserting the exact config the reference builds
(`/root/reference/src/datasets/waymo_eval.py:95-124`): OBJECT_TYPE
breakdown, LEVEL_2, Hungarian matcher, per-class IoU thresholds with the
leading 0.0, and 101 score cutoffs.
"""
import sys
import types

import numpy as np
import pytest

from vilgod_tpu.eval.waymo_tf import _flatten, tf_available, waymo_tf_ap


def _annos():
    det = [{
        "name": np.array(["Vehicle", "Pedestrian", "Sign"]),
        "boxes_lidar": np.arange(21, dtype=np.float32).reshape(3, 7),
        "score": np.array([0.9, 0.5, 0.4], np.float32),
    }, {
        "name": np.array([]),
        "boxes_lidar": np.zeros((0, 7), np.float32),
        "score": np.array([]),
    }]
    gt = [{
        "name": np.array(["Vehicle", "Cyclist", "Vehicle"]),
        "gt_boxes_lidar": np.arange(21, dtype=np.float32).reshape(3, 7) + 100,
        "num_points_in_gt": np.array([10, 3, 0]),
    }, {
        "name": np.array(["Pedestrian"]),
        "gt_boxes_lidar": np.ones((1, 7), np.float32),
        "num_points_in_gt": np.array([6]),
    }]
    return det, gt


def test_flatten_layout_and_filters():
    det, gt = _annos()
    (fid_d, box_d, typ_d, score_d,
     fid_g, box_g, typ_g, diff_g) = _flatten(det, gt,
                                             ("Vehicle", "Pedestrian", "Cyclist"))
    # "Sign" det dropped; zero-point GT dropped (waymo_eval.py:46-52)
    assert fid_d.tolist() == [0, 0]
    assert typ_d.tolist() == [1, 2]          # WAYMO_CLASSES indices
    assert score_d.tolist() == pytest.approx([0.9, 0.5])
    assert fid_g.tolist() == [0, 0, 1]
    assert typ_g.tolist() == [1, 4, 2]
    # difficulty: L1 if num_points_in_gt > 5 else L2
    assert diff_g.tolist() == [1, 2, 1]
    np.testing.assert_array_equal(box_d[0], np.arange(7, dtype=np.float32))
    assert box_g.shape == (3, 7)


def _install_mock(monkeypatch, captured):
    """Stub tensorflow + waymo_open_dataset with just the surface
    waymo_tf_ap touches, capturing the config and tensors it passes."""
    tf = types.ModuleType("tensorflow")
    tf.constant = lambda x, dtype=None: np.asarray(x)
    tf.zeros_like = lambda x, dtype=None: np.zeros_like(x, dtype=bool)
    tf.bool = bool
    tf.uint8 = np.uint8

    class _Levels(list):
        def append(self, v):  # proto repeated field
            list.append(self, v)

    class _Difficulty:
        def __init__(self):
            self.levels = _Levels()

    class _Config:
        def __init__(self):
            self.breakdown_generator_ids = []
            self._difficulties = []
            self.matcher_type = None
            self.iou_thresholds = []
            self.box_type = None
            self.score_cutoffs = []

        @property
        def difficulties(self):
            outer = self

            class _Adder:
                def add(self):
                    d = _Difficulty()
                    outer._difficulties.append(d)
                    return d
            return _Adder()

    label_pb2 = types.ModuleType("label_pb2")
    label_pb2.Label = types.SimpleNamespace(
        LEVEL_1=1, LEVEL_2=2, Box=types.SimpleNamespace(TYPE_3D=3))
    metrics_pb2 = types.ModuleType("metrics_pb2")
    metrics_pb2.Config = _Config
    metrics_pb2.MatcherProto = types.SimpleNamespace(TYPE_HUNGARIAN=7)
    breakdown_pb2 = types.ModuleType("breakdown_pb2")
    breakdown_pb2.Breakdown = types.SimpleNamespace(OBJECT_TYPE=11)

    detection_metrics = types.ModuleType("detection_metrics")

    def get_detection_metric_ops(config, **kw):
        captured["config"] = config
        captured["kwargs"] = kw
        return {"OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP": (np.array([0.625]),)}

    detection_metrics.get_detection_metric_ops = get_detection_metric_ops

    wod = types.ModuleType("waymo_open_dataset")
    wod.label_pb2 = label_pb2
    protos = types.ModuleType("waymo_open_dataset.protos")
    protos.breakdown_pb2 = breakdown_pb2
    protos.metrics_pb2 = metrics_pb2
    metrics_mod = types.ModuleType("waymo_open_dataset.metrics")
    metrics_py = types.ModuleType("waymo_open_dataset.metrics.python")
    metrics_py.detection_metrics = detection_metrics

    for name, mod in {
        "tensorflow": tf,
        "waymo_open_dataset": wod,
        "waymo_open_dataset.label_pb2": label_pb2,
        "waymo_open_dataset.protos": protos,
        "waymo_open_dataset.protos.metrics_pb2": metrics_pb2,
        "waymo_open_dataset.protos.breakdown_pb2": breakdown_pb2,
        "waymo_open_dataset.metrics": metrics_mod,
        "waymo_open_dataset.metrics.python": metrics_py,
        "waymo_open_dataset.metrics.python.detection_metrics": detection_metrics,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)


def test_waymo_tf_ap_builds_reference_config(monkeypatch):
    captured = {}
    _install_mock(monkeypatch, captured)
    det, gt = _annos()
    out = waymo_tf_ap(det, gt)
    assert out == {"OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP": 0.625}

    cfg = captured["config"]
    # the exact config the reference builds (waymo_eval.py:95-124)
    assert cfg.breakdown_generator_ids == [11]          # OBJECT_TYPE
    assert [d.levels for d in cfg._difficulties] == [[2]]  # LEVEL_2 only
    assert cfg.matcher_type == 7                        # Hungarian
    assert cfg.iou_thresholds == [0.0, 0.4, 0.4, 0.4, 0.4]
    assert cfg.box_type == 3                            # TYPE_3D
    assert len(cfg.score_cutoffs) == 101
    assert cfg.score_cutoffs[0] == 0.0 and cfg.score_cutoffs[-1] == 1.0

    kw = captured["kwargs"]
    assert kw["prediction_frame_id"].tolist() == [0, 0]
    assert kw["ground_truth_difficulty"].tolist() == [1, 2, 1]
    assert kw["prediction_overlap_nlz"].dtype == bool
    assert not kw["prediction_overlap_nlz"].any()


def test_certification_fixture_pins_numpy_ap():
    """The committed cert fixture (tools/certify_tf.py) must keep scoring
    the pinned numpy AP — any drift here means the TF certification
    baseline silently moved."""
    import json
    import os

    from tools.certify_tf import EXPECTED, FIXTURE, load_fixture
    from vilgod_tpu.eval import waymo_detection_ap

    assert os.path.exists(FIXTURE) and os.path.exists(EXPECTED)
    det_annos, gt_annos = load_fixture()
    ap = waymo_detection_ap(det_annos, gt_annos)
    with open(EXPECTED) as f:
        expected = json.load(f)
    assert expected, "expected-AP json is empty"
    for k, v in expected.items():
        assert ap[k] == pytest.approx(v, abs=1e-5), f"{k}: {ap[k]} != {v}"


def test_tf_available_reflects_environment():
    # in this image the package is absent; on a certification machine
    # this flips True and waymo_tf_ap runs the real ops
    assert tf_available() in (True, False)
