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
