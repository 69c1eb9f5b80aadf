"""Projection (EWA) unit tests against analytic expectations."""

import numpy as np
import jax.numpy as jnp

from gags_tpu.splat.projection import project_gaussians


def _simple_cam(width=64, height=48, f=50.0):
    viewmat = jnp.eye(4)
    K = jnp.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], jnp.float32)
    return viewmat, K, width, height


def test_center_point_projects_to_principal_point():
    vm, K, w, h = _simple_cam()
    means = jnp.array([[0.0, 0.0, 5.0]])
    quats = jnp.array([[1.0, 0, 0, 0]])
    scales = jnp.full((1, 3), 0.1)
    p = project_gaussians(means, quats, scales, vm, K, w, h)
    np.testing.assert_allclose(np.asarray(p.means2d[0]), [w / 2, h / 2], atol=1e-4)
    assert int(p.radii[0]) > 0
    np.testing.assert_allclose(float(p.depths[0]), 5.0)


def test_behind_camera_is_culled():
    vm, K, w, h = _simple_cam()
    means = jnp.array([[0.0, 0.0, -5.0]])
    p = project_gaussians(
        means, jnp.array([[1.0, 0, 0, 0]]), jnp.full((1, 3), 0.1), vm, K, w, h
    )
    assert int(p.radii[0]) == 0


def test_far_offscreen_is_culled():
    vm, K, w, h = _simple_cam()
    means = jnp.array([[100.0, 0.0, 5.0]])  # way outside the frustum
    p = project_gaussians(
        means, jnp.array([[1.0, 0, 0, 0]]), jnp.full((1, 3), 0.01), vm, K, w, h
    )
    assert int(p.radii[0]) == 0


def test_isotropic_cov2d_matches_pinhole_scaling():
    # isotropic gaussian on the optical axis: cov2d ≈ (f*s/z)^2 * I + 0.3 I
    vm, K, w, h = _simple_cam(f=100.0)
    s, z = 0.2, 4.0
    p = project_gaussians(
        jnp.array([[0.0, 0.0, z]]),
        jnp.array([[1.0, 0, 0, 0]]),
        jnp.full((1, 3), s),
        vm,
        K,
        w,
        h,
    )
    sigma2 = (100.0 * s / z) ** 2 + 0.3
    conic = np.asarray(p.conics[0])
    np.testing.assert_allclose(conic[0], 1.0 / sigma2, rtol=1e-4)
    np.testing.assert_allclose(conic[2], 1.0 / sigma2, rtol=1e-4)
    np.testing.assert_allclose(conic[1], 0.0, atol=1e-6)
    # radius = ceil(3 * sigma)
    assert int(p.radii[0]) == int(np.ceil(3.0 * np.sqrt(sigma2)))


def test_radius_grows_with_scale():
    vm, K, w, h = _simple_cam()
    means = jnp.tile(jnp.array([[0.0, 0.0, 5.0]]), (3, 1))
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (3, 1))
    scales = jnp.array([[0.05] * 3, [0.2] * 3, [0.8] * 3])
    p = project_gaussians(means, quats, scales, vm, K, w, h)
    r = np.asarray(p.radii)
    assert r[0] < r[1] < r[2]


def test_rotation_invariance_of_isotropic():
    vm, K, w, h = _simple_cam()
    rng = np.random.default_rng(0)
    quats = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
    means = jnp.tile(jnp.array([[0.3, -0.2, 5.0]]), (5, 1))
    scales = jnp.full((5, 3), 0.1)
    p = project_gaussians(means, quats, scales, vm, K, w, h)
    conics = np.asarray(p.conics)
    for i in range(1, 5):
        np.testing.assert_allclose(conics[i], conics[0], rtol=1e-4, atol=1e-6)


def test_anisotropic_extents_cover_ellipse_and_shrink_rects():
    """radii_x/radii_y bound the 3-sigma ellipse exactly per axis: always
    <= the isotropic max-eigenvalue radius, and elongated splats produce
    strictly smaller binning rects with identical rendered output."""
    import jax.numpy as jnp
    from gags_tpu.splat import tiles as T

    n = 64
    rng = np.random.default_rng(0)
    means = jnp.asarray(
        np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.5, 0.5, n),
                  rng.uniform(4, 8, n)], 1).astype(np.float32))
    # strongly anisotropic: one long axis, two short
    scales = jnp.asarray(
        np.stack([np.full(n, 0.5), np.full(n, 0.02), np.full(n, 0.02)], 1
                 ).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    W, H, F = 128, 64, 80.0
    vm = jnp.eye(4)
    K = jnp.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], jnp.float32)
    p = project_gaussians(means, quats, scales, vm, K, W, H)

    rx, ry, r = np.asarray(p.radii_x), np.asarray(p.radii_y), np.asarray(p.radii)
    alive = r > 0
    assert alive.any()
    assert (rx[alive] <= r[alive]).all() and (ry[alive] <= r[alive]).all()
    # for strongly elongated splats at least one axis must be much tighter
    assert (np.minimum(rx, ry)[alive] < 0.7 * r[alive]).any()

    # instance count shrinks vs the isotropic square
    _, _, _, _, c_iso = T.tile_rects(p.means2d, p.radii, 16, 8, W // 16, H // 8)
    _, _, _, _, c_ani = T.tile_rects(
        p.means2d, p.radii_x, 16, 8, W // 16, H // 8, radii_y=p.radii_y)
    assert int(c_ani.sum()) < int(c_iso.sum())
