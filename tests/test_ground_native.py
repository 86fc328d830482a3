import numpy as np
import jax.numpy as jnp
import pytest

from vilgod_tpu.ground import GroundConfig, init_ground_state, segment_ground
from vilgod_tpu.ground.native import NativePatchwork

from test_ground import make_scene, pad


@pytest.fixture(scope="module")
def native():
    return NativePatchwork(GroundConfig(patch_capacity=512))


def test_native_flat_scene(native, rng):
    pts, labels = make_scene(rng)
    ground = native.segment(pts)
    recall = (ground & labels).sum() / labels.sum()
    fp = (ground & ~labels).sum() / max((~labels).sum(), 1)
    assert recall > 0.9, recall
    assert fp < 0.15, fp


def test_native_jax_parity(rng):
    """The JAX kernel and the native oracle must produce near-identical
    ground masks on the same frame (fresh state both sides)."""
    cfg = GroundConfig(patch_capacity=512)
    pts, labels = make_scene(rng)
    native = NativePatchwork(cfg)
    g_native = native.segment(pts)

    padded, mask, _ = pad(pts, labels, 16384)
    g_jax, _, _ = segment_ground(jnp.asarray(padded), jnp.asarray(mask),
                                 init_ground_state(cfg), cfg)
    g_jax = np.asarray(g_jax)[: len(pts)]

    inter = (g_native & g_jax).sum()
    union = (g_native | g_jax).sum()
    iou = inter / max(union, 1)
    assert iou > 0.97, iou


def test_native_adapts_sensor_height(rng):
    cfg = GroundConfig(patch_capacity=512)
    native = NativePatchwork(cfg)
    for _ in range(3):
        pts, _ = make_scene(rng, n_ground=8000)
        native.segment(pts)
    assert abs(native.sensor_height - 1.723) < 0.2


def test_native_jax_sequence_parity(rng):
    """Multi-frame parity: the A-GLE/TGR adaptive state threaded through
    `segment_ground` must track the C++ singleton exactly across a
    sequence (patchworkpp.cpp:339-465) — including the recall drift the
    adaptation itself produces."""
    from vilgod_tpu.data import SyntheticDataset

    ds = SyntheticDataset(n_sequences=1, seed=7, n_frames=6, n_ground=8000,
                          n_vehicles=3, n_pedestrians=1, n_moving=1, area=50.0)
    seq = ds.sequence("synth_0")
    cfg = GroundConfig(patch_capacity=512, min_range=1.5)
    native_seq = NativePatchwork(cfg)
    state = init_ground_state(cfg)
    total = 32768
    for f in range(6):
        pts = seq.get_lidar_points(f).astype(np.float32)
        pts[:, 2] -= 1.723
        g_nat = native_seq.segment(pts)
        pp = np.zeros((total, 5), np.float32)
        pp[: len(pts)] = pts
        mm = np.zeros(total, bool)
        mm[: len(pts)] = True
        g_jax, state, _ = segment_ground(jnp.asarray(pp), jnp.asarray(mm),
                                         state, cfg)
        agree = (np.asarray(g_jax)[: len(pts)] == g_nat).mean()
        assert agree > 0.999, f"frame {f}: agreement {agree:.4f}"
