"""Composed end-to-end quality parity: real geometry stages feed BOTH
the table decision stages and the transcribed reference oracle
(tools/parity_oracle.py), both detection sets score with the
Waymo-protocol AP against the same GT, and the per-class |ΔAP| must sit
inside the BASELINE bound (|ΔAP| <= 0.5 — and in practice == 0, since
tests/test_reference_parity.py pins the decisions bit-level).

The same measurement runs at bench scale on every official bench
(bench.py records ``delta_ap_max`` in the JSON line)."""
import numpy as np
import pytest

from tools.parity_oracle import measure_delta_ap
from vilgod_tpu.config.presets import waymo_config
from vilgod_tpu.data import SyntheticDataset


@pytest.mark.slow
def test_composed_delta_ap_within_baseline_bound():
    # max_cluster_points sized so no cluster truncates: the table side
    # fits boxes from capacity-capped tables (documented semantics the
    # reference lacks) while the oracle sees full clusters — under
    # truncation a nonzero ΔAP is a capacity artifact, not a decision
    # divergence (measure_delta_ap reports n_truncated for this).
    cap = {"max_points": 16384, "max_ng_points": 8192, "max_clusters": 64,
           "max_cluster_points": 8192, "max_tracks": 64,
           "max_cluster_input": 8192, "clip_batch": 8}
    cfg = waymo_config(capacity=cap)
    # static scene: moving objects' 2-frame-window clusters inflate boxes
    # past IoU 0.4 at this sparse CPU-budget density, which would zero
    # every class's AP and make the ΔAP bound vacuous
    ds = SyntheticDataset(n_sequences=1, n_frames=12, seed=12, n_ground=2500,
                          n_vehicles=3, n_pedestrians=1, n_cyclists=1,
                          n_moving=0, area=40.0)
    out = measure_delta_ap(cfg, ds, ds.sequence_names()[0],
                           eval_range=(-40.0, -40.0, 40.0, 40.0))
    assert out["n_dets_table"] > 0 and out["n_dets_oracle"] > 0
    assert out["n_truncated"] == 0, "scene truncates clusters; grow the cap"
    # at least one class must carry signal for the bound to mean anything
    assert any(v["table"] > 0 for v in out["per_class"].values()), out
    assert out["delta_ap_max"] <= 0.5, out
    # the decisions are transcription-equal, so the composed number should
    # be exactly zero; a nonzero value means a real divergence appeared
    assert out["delta_ap_max"] == 0.0, out
