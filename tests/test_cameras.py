import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nice_slam_tpu.core.cameras import (
    Intrinsics, c2w_from_tensor, quat_to_rotmat, rays_from_uv,
    rays_full_image, rotmat_to_quat, tensor_from_c2w)


def random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def test_quat_to_rotmat_orthonormal():
    q = jnp.asarray(random_rotations(32))
    r = quat_to_rotmat(q)
    eye = jnp.einsum('nij,nkj->nik', r, r)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-5)


def test_quat_identity():
    r = quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(r, np.eye(3), atol=1e-6)


def test_quat_roundtrip():
    q = random_rotations(64, seed=3)
    # canonical sign w>=0, as rotmat_to_quat returns
    q = q * np.where(q[:, :1] < 0, -1.0, 1.0)
    r = quat_to_rotmat(jnp.asarray(q))
    q2 = rotmat_to_quat(r)
    np.testing.assert_allclose(q2, q, atol=1e-4)


def test_quat_non_unit_matches_normalized():
    q = np.array([[0.3, -0.2, 0.9, 0.1]])
    r1 = quat_to_rotmat(jnp.asarray(q))
    r2 = quat_to_rotmat(jnp.asarray(q / np.linalg.norm(q)))
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_c2w_tensor_roundtrip():
    rng = np.random.default_rng(1)
    q = random_rotations(16, seed=5)
    q = q * np.where(q[:, :1] < 0, -1.0, 1.0)
    t = rng.normal(size=(16, 3))
    cam7 = jnp.asarray(np.concatenate([q, t], axis=-1), dtype=jnp.float32)
    c2w = c2w_from_tensor(cam7)
    assert c2w.shape == (16, 3, 4)
    back = tensor_from_c2w(c2w)
    np.testing.assert_allclose(back, cam7, atol=1e-4)


def test_rays_camera_convention():
    """Center pixel looks along -z; +x pixel offset tilts +x (OpenGL style)."""
    intr = Intrinsics(H=100, W=100, fx=50.0, fy=50.0, cx=50.0, cy=50.0)
    c2w = jnp.eye(4)
    i = jnp.array([50.0, 100.0, 50.0])
    j = jnp.array([50.0, 50.0, 100.0])
    o, d = rays_from_uv(i, j, c2w, intr)
    np.testing.assert_allclose(o, 0.0, atol=1e-6)
    np.testing.assert_allclose(d[0], [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(d[1], [1, 0, -1], atol=1e-6)  # right => +x
    np.testing.assert_allclose(d[2], [0, -1, -1], atol=1e-6)  # down => -y


def test_rays_rotated_pose():
    intr = Intrinsics(H=10, W=10, fx=5.0, fy=5.0, cx=5.0, cy=5.0)
    rng = np.random.default_rng(7)
    q = random_rotations(1, seed=9)[0]
    t = rng.normal(size=3)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    c2w[:3, 3] = t
    i = jnp.asarray(rng.uniform(0, 10, size=8), dtype=jnp.float32)
    j = jnp.asarray(rng.uniform(0, 10, size=8), dtype=jnp.float32)
    o, d = rays_from_uv(i, j, jnp.asarray(c2w), intr)
    np.testing.assert_allclose(o, np.broadcast_to(t, (8, 3)), atol=1e-5)
    # directions should be R @ local_dir
    local = np.stack([(np.asarray(i) - 5) / 5, -(np.asarray(j) - 5) / 5,
                      -np.ones(8)], axis=-1)
    np.testing.assert_allclose(d, local @ c2w[:3, :3].T, atol=1e-5)


def test_full_image_rays_shape_and_order():
    intr = Intrinsics(H=4, W=6, fx=3.0, fy=3.0, cx=3.0, cy=2.0)
    o, d = rays_full_image(jnp.eye(4), intr)
    assert o.shape == (24, 3) and d.shape == (24, 3)
    # row-major: ray index k = j*W + i
    i, j = 4, 2
    single_o, single_d = rays_from_uv(
        jnp.array([float(i)]), jnp.array([float(j)]), jnp.eye(4), intr)
    np.testing.assert_allclose(d[j * 6 + i], single_d[0], atol=1e-6)
