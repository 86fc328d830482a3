"""Classification-stage e2e test with a tiny random-weight CLIP.

The real checkpoint is not part of the repo; a small CLIPConfig exercises
the full fused path (render -> encode -> vote) at test speed. Numerical
CLIP parity against torch is covered by tests/test_clip.py.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from vilgod_tpu.config.presets import waymo_config
from vilgod_tpu.data import SyntheticDataset
from vilgod_tpu.models.clip import CLIPConfig
from vilgod_tpu.models.clip_wrapper import ClipWrapper
from vilgod_tpu.pipeline import CLS_NONE, MAPPED_CLASSES, ZeroShotDetector

TEST_CAPACITY = {
    "max_points": 16384, "max_ng_points": 8192, "max_clusters": 64,
    "max_cluster_points": 4096, "max_tracks": 64, "max_cluster_input": 8192,
    "clip_batch": 4,
}

SMALL_CLIP = CLIPConfig(image_size=224, patch_size=32, vision_width=64,
                        vision_layers=2, vision_heads=2, embed_dim=32,
                        context_length=77, vocab_size=49408, text_width=32,
                        text_heads=2, text_layers=2, dtype=jnp.float32)


@pytest.mark.slow
def test_classification_stage_sets_classes(tmp_path):
    stages = ["mask_ground_points", "calculate_entropy_scores",
              "spatial_clustering", "filter_detections", "track_clusters",
              "classification"]
    cfg = waymo_config(capacity=TEST_CAPACITY, pipeline_active=stages)
    ds = SyntheticDataset(n_sequences=1, n_frames=6, seed=9, n_ground=2500,
                          n_vehicles=1, n_pedestrians=0, n_moving=0)
    clip_model = ClipWrapper(cfg["preprocessor"]["clip"], model_cfg=SMALL_CLIP)
    assert clip_model.text_features.shape == (24, 32)

    zsd = ZeroShotDetector(ds.sequence("synth_0"), "synth_0", cfg,
                           clip_model=clip_model)
    zsd.process()
    st = zsd.state
    n_classified = 0
    for f in range(st.n_frames):
        for c in np.flatnonzero(st.det_valid[f]):
            code = int(st.det_cls[f, c])
            assert code != CLS_NONE
            assert 0 <= code < len(MAPPED_CLASSES)
            assert 0.0 < st.det_score[f, c] <= 1.0
            n_classified += 1
    assert n_classified > 0
    # invalid detections untouched
    for f in range(st.n_frames):
        for c in np.flatnonzero((st.det_n[f] > 0) & ~st.det_valid[f]):
            assert st.det_cls[f, c] == CLS_NONE


def test_vote_aggregation_rules():
    from vilgod_tpu.pipeline.stages_classify import _vote
    # clear majority: score = mean over that class's views
    name, score = _vote(["Vehicle", "Vehicle", "Vehicle", "Background"],
                        np.array([0.8, 0.6, 0.7, 0.9]))
    assert name == "Vehicle" and score == pytest.approx(0.7)
    # tie: highest per-class mean score wins
    name, score = _vote(["Vehicle", "Vehicle", "Background", "Background"],
                        np.array([0.4, 0.4, 0.9, 0.5]))
    assert name == "Background" and score == pytest.approx(0.7)
