"""Unit tests for core math: quats, covariance, SH, cameras."""

import numpy as np
import jax.numpy as jnp
import pytest

from gags_tpu.core import (
    quat_to_rotmat,
    build_covariance_3d,
    strip_symmetric,
    eval_sh,
    rgb_to_sh,
    sh_to_rgb,
)
from gags_tpu.core.camera import (
    Camera,
    world_to_view,
    fov_to_focal,
    focal_to_fov,
    intrinsics_from_fov,
    look_at,
)


def test_quat_identity():
    q = jnp.array([[1.0, 0, 0, 0]])
    R = quat_to_rotmat(q)
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)


def test_quat_90deg_z():
    # 90° about z: (w, x, y, z) = (cos45, 0, 0, sin45)
    s = np.sqrt(0.5)
    q = jnp.array([[s, 0, 0, s]])
    R = np.asarray(quat_to_rotmat(q))[0]
    expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
    np.testing.assert_allclose(R, expect, atol=1e-6)


def test_quat_unnormalised_matches_normalised():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(10, 4)).astype(np.float32)
    R1 = quat_to_rotmat(jnp.asarray(q))
    R2 = quat_to_rotmat(jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True)))
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-5)
    # orthonormality
    RtR = np.einsum("nij,nik->njk", np.asarray(R1), np.asarray(R1))
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)


def test_covariance_psd_and_eigvals():
    rng = np.random.default_rng(1)
    scales = np.exp(rng.normal(size=(20, 3))).astype(np.float32)
    quats = rng.normal(size=(20, 4)).astype(np.float32)
    cov = np.asarray(build_covariance_3d(jnp.asarray(scales), jnp.asarray(quats)))
    # symmetric
    np.testing.assert_allclose(cov, np.swapaxes(cov, 1, 2), atol=1e-5)
    # eigenvalues are the squared scales (rotation-invariant)
    for i in range(20):
        ev = np.sort(np.linalg.eigvalsh(cov[i]))
        np.testing.assert_allclose(ev, np.sort(scales[i] ** 2), rtol=1e-3)


def test_strip_symmetric_order():
    cov = jnp.arange(9.0).reshape(1, 3, 3)
    out = np.asarray(strip_symmetric(cov))[0]
    np.testing.assert_allclose(out, [0, 1, 2, 4, 5, 8])


def test_sh_degree0_constant():
    sh = jnp.zeros((5, 3, 16)).at[:, :, 0].set(1.0)
    dirs = jnp.array(np.random.default_rng(2).normal(size=(5, 3)), jnp.float32)
    out = np.asarray(eval_sh(3, sh, dirs))
    np.testing.assert_allclose(out, 0.28209479 * np.ones((5, 3)), rtol=1e-5)


def test_sh_roundtrip_rgb():
    rgb = jnp.array([[0.1, 0.5, 0.9]])
    np.testing.assert_allclose(
        np.asarray(sh_to_rgb(rgb_to_sh(rgb))), np.asarray(rgb), rtol=1e-6
    )


def test_sh_orthogonality_integration():
    # integral of any l>0 band over the sphere is ~0; check via MC that a
    # pure degree-1 SH averages to 0 while degree-0 doesn't
    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(20000, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    sh = np.zeros((1, 1, 4), np.float32)
    sh[0, 0, 2] = 1.0  # a degree-1 coefficient
    vals = np.asarray(
        eval_sh(1, jnp.broadcast_to(jnp.asarray(sh), (20000, 1, 4)), jnp.asarray(dirs))
    )
    assert abs(vals.mean()) < 0.01


def test_fov_focal_roundtrip():
    fov = 1.2
    assert focal_to_fov(fov_to_focal(fov, 640), 640) == pytest.approx(fov)


def test_world_to_view_camera_center():
    rng = np.random.default_rng(4)
    # random valid rotation via QR
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    t = rng.normal(size=3)
    # reference convention: R passed is the transpose of the w2c rotation
    vm = world_to_view(Q.T, t)
    cam_center = -vm[:3, :3].T @ vm[:3, 3]
    # a point at the camera centre maps to the origin
    p = vm[:3, :3] @ cam_center + vm[:3, 3]
    np.testing.assert_allclose(p, 0, atol=1e-5)


def test_camera_resized_scales_K():
    cam = Camera(
        viewmat=jnp.eye(4),
        K=jnp.asarray(intrinsics_from_fov(1.0, 0.8, 640, 480)),
        width=640,
        height=480,
    )
    cam2 = cam.resized(320, 240)
    np.testing.assert_allclose(float(cam2.K[0, 0]), float(cam.K[0, 0]) / 2, rtol=1e-6)
    np.testing.assert_allclose(float(cam2.K[0, 2]), 160.0, rtol=1e-6)
    assert cam2.fovx == pytest.approx(cam.fovx)


def test_look_at_points_forward():
    vm = look_at(np.array([0, 0, -3.0]), np.array([0, 0, 5.0]), np.array([0, -1.0, 0]))
    p = vm[:3, :3] @ np.array([0, 0, 5.0]) + vm[:3, 3]
    assert p[2] > 0  # target in front
    np.testing.assert_allclose(p[:2], 0, atol=1e-6)


def test_camera_is_pytree():
    import jax

    cam = Camera(viewmat=jnp.eye(4), K=jnp.eye(3), width=64, height=32)
    leaves = jax.tree_util.tree_leaves(cam)
    assert len(leaves) == 2  # viewmat, K; width/height are static

    def f(c):
        return jnp.sum(c.viewmat) + jnp.sum(c.K)

    assert jax.jit(f)(cam).shape == ()
