import numpy as np
import jax.numpy as jnp

from vilgod_tpu.ops import transforms as T


def random_se3(rng):
    from scipy.spatial.transform import Rotation as R
    rot = R.random(random_state=np.random.RandomState(rng.integers(1 << 30))).as_matrix()
    t = rng.normal(size=3)
    m = np.eye(4)
    m[:3, :3] = rot
    m[:3, 3] = t
    return m


def test_apply_transform_matches_numpy(rng):
    pts = rng.normal(size=(100, 5)).astype(np.float32)
    m = random_se3(rng).astype(np.float32)
    out = np.asarray(T.apply_transform(jnp.asarray(pts), jnp.asarray(m)))
    # numpy oracle: homogeneous transform on xyz
    h = np.hstack([pts[:, :3], np.ones((100, 1), np.float32)])
    expected = (m @ h.T).T[:, :3]
    np.testing.assert_allclose(out[:, :3], expected, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[:, 3:], pts[:, 3:])


def test_invert_se3(rng):
    m = random_se3(rng).astype(np.float32)
    inv = np.asarray(T.invert_se3(jnp.asarray(m)))
    np.testing.assert_allclose(inv @ m, np.eye(4), atol=1e-5)


def test_box_transform_yaw(rng):
    boxes = np.array([[1.0, 2.0, 0.5, 4.0, 2.0, 1.5, 0.3]], np.float32)
    angle = 0.7
    m = np.eye(4, dtype=np.float32)
    m[:2, :2] = [[np.cos(angle), -np.sin(angle)], [np.sin(angle), np.cos(angle)]]
    out = np.asarray(T.apply_transform_boxes(jnp.asarray(boxes), jnp.asarray(m)))
    assert np.isclose(out[0, 6], 0.3 + angle, atol=1e-5)
    # dims unchanged
    np.testing.assert_allclose(out[0, 3:6], boxes[0, 3:6])


def test_euler2mat_identity():
    m = np.asarray(T.euler2mat(jnp.zeros(3)))
    np.testing.assert_allclose(m, np.eye(3), atol=1e-6)


def test_euler2mat_composition(rng):
    ang = rng.normal(size=3).astype(np.float32)
    m = np.asarray(T.euler2mat(jnp.asarray(ang)))
    from scipy.spatial.transform import Rotation as R
    # Rx @ Ry @ Rz == intrinsic 'xyz'? scipy extrinsic 'zyx' reversed...
    expected = (
        R.from_euler("x", ang[0]).as_matrix()
        @ R.from_euler("y", ang[1]).as_matrix()
        @ R.from_euler("z", ang[2]).as_matrix()
    )
    np.testing.assert_allclose(m, expected, atol=1e-5)
