"""Tracking layer tests: batched KF vs. a scalar oracle, greedy
assignment vs. brute force, and full tracker scenarios (miss handling,
finalize trimming, rescue semantics)."""
import numpy as np
import pytest

from vilgod_tpu.tracking import assign_greedy, kf_init, kf_predict, kf_update
from vilgod_tpu.tracking.kalman import F_MAT, H_MAT, P0_MAT, Q_MAT, R_MAT
from vilgod_tpu.tracking.tracker import Tracker


def scalar_kf_steps(z_seq):
    """Reference single-track KF: predict+update per measurement."""
    x = np.array([z_seq[0][0], z_seq[0][1], 0.0, 0.0])
    p = P0_MAT.copy()
    xs = []
    for z in z_seq[1:]:
        x = F_MAT @ x
        p = F_MAT @ p @ F_MAT.T + Q_MAT
        y = z - H_MAT @ x
        s = H_MAT @ p @ H_MAT.T + R_MAT
        k = p @ H_MAT.T @ np.linalg.inv(s)
        x = x + k @ y
        ikh = np.eye(4) - k @ H_MAT
        p = ikh @ p @ ikh.T + k @ R_MAT @ k.T
        xs.append(x.copy())
    return np.array(xs)


def test_batched_kf_matches_scalar(rng):
    t = 5
    z0 = rng.uniform(-10, 10, (t, 2))
    x, p = kf_init(z0)
    zs = [z0]
    xs_batched = []
    for step in range(4):
        z = z0 + 0.3 * (step + 1) * np.array([1.0, -0.5])
        zs.append(z)
        x, p = kf_predict(x, p)
        x, p = kf_update(x, p, z)
        xs_batched.append(x.copy())
    xs_batched = np.stack(xs_batched, axis=1)  # (T, steps, 4)
    for i in range(t):
        oracle = scalar_kf_steps([z[i] for z in zs])
        np.testing.assert_allclose(xs_batched[i], oracle, atol=1e-9)


def test_greedy_assignment_prefers_shortest(rng):
    dets = np.array([[0.0, 0.0], [5.0, 5.0], [0.3, 0.0]])
    trks = np.array([[0.1, 0.0], [5.2, 5.0]])
    matches, mask, overlap = assign_greedy(dets, trks, max_distance=1.0)
    pairs = {tuple(m) for m in matches}
    assert (0, 0) in pairs and (1, 1) in pairs  # det 0 is closer than det 2
    assert mask[0] and mask[1]
    assert overlap[2] > 1.0  # unmatched det keeps the sentinel distance


def test_tracker_continuity_and_miss_trim():
    cfg = {"assignment": {"method": "assign_detections_greedy", "max_distance": 1.0},
           "max_missed": 3}
    n_frames = 12
    tr = Tracker(n_frames, cfg, cap=16)
    # one object moving +x at 0.2/frame, missing at frames 5-6
    for fnr in range(10):
        if fnr in (5, 6):
            tids = tr.next(fnr, np.array([], np.int64), np.zeros((0, 3)),
                           np.array([], np.int64))
            continue
        center = np.array([[0.2 * fnr, 0.0, 1.0]])
        tids = tr.next(fnr, np.array([3]), center, np.array([100]))
        assert tids[0] == 0  # track survives the gap via KF prediction
    pool = tr.finish()
    assert pool.n_tracks == 1
    steps = list(pool.steps(0))
    frames = [s[0] for s in steps]
    assert frames == list(range(10))  # gap filled with prediction steps
    preds = [s[3] for s in steps]
    assert preds[5] and preds[6] and not preds[7]
    # prediction steps point at the last real detection's frame
    assert steps[5][1] == 4 and steps[6][1] == 4


def test_tracker_trailing_predictions_trimmed():
    cfg = {"assignment": {"method": "assign_detections_greedy", "max_distance": 1.0},
           "max_missed": 3}
    tr = Tracker(10, cfg, cap=8)
    for fnr in range(3):
        tr.next(fnr, np.array([0]), np.array([[1.0 * fnr, 0.0, 0.5]]),
                np.array([50]))
    for fnr in range(3, 8):  # disappears -> misses then finalize
        tr.next(fnr, np.array([], np.int64), np.zeros((0, 3)), np.array([], np.int64))
    pool = tr.finish()
    steps = list(pool.steps(0))
    assert [s[0] for s in steps] == [0, 1, 2]  # trailing preds trimmed
    assert not pool.active[0]


def test_tracker_spawns_separate_tracks():
    cfg = {"assignment": {"method": "assign_detections_greedy", "max_distance": 1.0},
           "max_missed": 3}
    tr = Tracker(5, cfg, cap=8)
    centers = np.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]])
    for fnr in range(5):
        tids = tr.next(fnr, np.array([0, 1]), centers, np.array([50, 60]))
        assert tids[0] != tids[1]
    pool = tr.finish()
    assert pool.n_tracks == 2
    assert all(len(list(pool.steps(t))) == 5 for t in range(2))
