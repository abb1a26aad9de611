"""Unit tests for rotation math and FK against closed-form values."""
import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from manus_tpu.utils import transforms as T


def _rand_quats(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quaternion_matrix_roundtrip():
    q = _rand_quats(64)
    m = np.asarray(T.quaternion_to_matrix(jnp.asarray(q)))
    # scipy uses xyzw ordering
    m_ref = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(m, m_ref, atol=1e-5)
    q_back = np.asarray(T.matrix_to_quaternion(jnp.asarray(m)))
    # quaternions are sign-ambiguous
    dot = np.abs(np.sum(q_back * q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_axis_angle_roundtrip():
    rng = np.random.RandomState(1)
    aa = rng.normal(size=(32, 3))
    m = np.asarray(T.axis_angle_to_matrix(jnp.asarray(aa)))
    m_ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(m, m_ref, atol=1e-5)
    aa_back = np.asarray(T.matrix_to_axis_angle(jnp.asarray(m)))
    m2 = Rotation.from_rotvec(aa_back).as_matrix()
    np.testing.assert_allclose(m2, m_ref, atol=1e-4)


def test_small_angle_axis_angle():
    aa = jnp.asarray([[1e-8, 0.0, 0.0], [0.0, 0.0, 0.0]])
    q = T.axis_angle_to_quaternion(aa)
    np.testing.assert_allclose(np.asarray(q[:, 0]), 1.0, atol=1e-6)
    back = T.quaternion_to_axis_angle(q)
    np.testing.assert_allclose(np.asarray(back), np.asarray(aa), atol=1e-6)


def test_euler_intrinsic_xyz():
    rng = np.random.RandomState(2)
    e = rng.uniform(-np.pi, np.pi, size=(16, 3))
    m = np.asarray(T.euler_angles_to_matrix(jnp.asarray(e), "XYZ", intrinsic=True))
    # The reference's "intrinsic XYZ" composes Rz(c) @ Ry(b) @ Rx(a), which
    # is scipy's *extrinsic* 'xyz'. We replicate the reference exactly.
    m_ref = Rotation.from_euler("xyz", e).as_matrix()
    np.testing.assert_allclose(m, m_ref, atol=1e-5)


def test_covariance_from_scaling_rotation():
    q = _rand_quats(8, seed=3)
    s = np.random.RandomState(4).uniform(0.1, 1.0, (8, 3))
    cov6 = np.asarray(
        T.covariance_from_scaling_rotation(jnp.asarray(s), jnp.asarray(q))
    )
    R = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    cov_ref = R @ (s[..., None] ** 2 * np.eye(3)) @ np.swapaxes(R, -1, -2)
    full = np.asarray(T.build_symmetric(jnp.asarray(cov6)))
    np.testing.assert_allclose(full, cov_ref, atol=1e-5)
    # strip/build roundtrip
    np.testing.assert_allclose(
        np.asarray(T.strip_symmetric(jnp.asarray(full))), cov6, atol=1e-6
    )


def test_fk_two_bone_chain():
    # Two bones along +Y; bending the child 90 deg about Z should rotate its
    # tail around the parent's tail.
    rest = np.stack([np.eye(4), np.eye(4)])
    rest[1, 1, 3] = 1.0  # child bone head at (0, 1, 0)
    kintree = {"0": -1, "1": 0}
    pose = np.stack([np.eye(3), Rotation.from_euler("z", np.pi / 2).as_matrix()])
    out = T.get_pose_wrt_root(
        jnp.asarray(rest, jnp.float32),
        jnp.asarray(pose, jnp.float32)[None],
        jnp.eye(3, dtype=jnp.float32)[None],
        jnp.zeros((1, 3), jnp.float32),
        kintree,
    )
    out = np.asarray(out)[0]
    np.testing.assert_allclose(out[0], rest[0], atol=1e-6)
    # child: head stays at (0,1,0), local +Y now maps to world -X
    p = out[1] @ np.array([0.0, 1.0, 0.0, 1.0])
    # child tail at rest = (0, 2, 0) -> rotates to (-1, 1, 0)
    np.testing.assert_allclose(p[:3], [-1.0, 1.0, 0.0], atol=1e-5)


def test_project_points():
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    extr = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    pts = np.array([[0.0, 0.0, 2.0], [0.1, -0.1, 1.0]])
    p2d = np.asarray(
        T.project_points(jnp.asarray(pts), jnp.asarray(K), jnp.asarray(extr))
    )
    np.testing.assert_allclose(p2d[0], [32, 32], atol=1e-5)
    np.testing.assert_allclose(p2d[1], [42, 22], atol=1e-4)
