"""Tests of the pure-JAX oracle rasterizer against analytic compositing."""

import numpy as np
import jax.numpy as jnp

from gags_tpu.splat.projection import project_gaussians
from gags_tpu.splat.reference import rasterize_reference


def _raster(means, scales, opacities, colors, w=32, h=24, f=40.0, bg=None):
    vm = jnp.eye(4)
    K = jnp.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], jnp.float32)
    n = means.shape[0]
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    p = project_gaussians(means, quats, scales, vm, K, w, h)
    return p, rasterize_reference(
        p.means2d, p.conics, p.depths, p.radii, opacities, colors, w, h, background=bg
    )


def test_single_gaussian_peak_alpha():
    means = jnp.array([[0.0, 0.0, 5.0]])
    scales = jnp.full((1, 3), 0.5)
    op = jnp.array([0.8])
    col = jnp.array([[1.0, 0.0, 0.0]])
    p, (img, alpha) = _raster(means, scales, op, col)
    # centre pixel: vis ~ exp(-tiny) ≈ 1 → alpha ≈ opacity
    cy, cx = 12, 16
    a = float(alpha[cy, cx])
    assert abs(a - 0.8) < 0.02
    np.testing.assert_allclose(np.asarray(img[cy, cx]), [a, 0, 0], atol=1e-5)


def test_two_gaussians_front_to_back():
    # red in front (z=4), blue behind (z=8), same screen position
    means = jnp.array([[0.0, 0.0, 4.0], [0.0, 0.0, 8.0]])
    scales = jnp.full((2, 3), 0.6)
    op = jnp.array([0.5, 0.9])
    col = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    _, (img, alpha) = _raster(means, scales, op, col)
    cy, cx = 12, 16
    r, b = float(img[cy, cx, 0]), float(img[cy, cx, 2])
    # front contributes ~0.5, behind ~0.9*(1-0.5)
    assert abs(r - 0.5) < 0.03
    assert abs(b - 0.45) < 0.05
    assert r > b


def test_depth_order_independence_of_input_order():
    rng = np.random.default_rng(0)
    n = 50
    means = jnp.asarray(
        np.stack(
            [
                rng.uniform(-1, 1, n),
                rng.uniform(-1, 1, n),
                rng.uniform(3, 9, n),
            ],
            1,
        ).astype(np.float32)
    )
    scales = jnp.asarray(np.full((n, 3), 0.3, np.float32))
    op = jnp.asarray(rng.uniform(0.3, 0.9, n).astype(np.float32))
    col = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    _, (img1, a1) = _raster(means, scales, op, col)
    perm = rng.permutation(n)
    _, (img2, a2) = _raster(means[perm], scales[perm], op[perm], col[perm])
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)


def test_background_blend():
    means = jnp.array([[0.0, 0.0, 5.0]])
    scales = jnp.full((1, 3), 0.05)
    op = jnp.array([0.999])
    col = jnp.array([[0.0, 1.0, 0.0]])
    bg = jnp.array([1.0, 1.0, 1.0])
    _, (img, alpha) = _raster(means, scales, op, col, bg=bg)
    # far corner: pure background
    np.testing.assert_allclose(np.asarray(img[0, 0]), [1, 1, 1], atol=1e-3)


def test_feature_channels_16dim():
    rng = np.random.default_rng(1)
    n = 20
    means = jnp.asarray(
        np.stack(
            [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(3, 9, n)], 1
        ).astype(np.float32)
    )
    scales = jnp.asarray(np.full((n, 3), 0.4, np.float32))
    op = jnp.asarray(rng.uniform(0.3, 0.9, n).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    _, (img, alpha) = _raster(means, scales, op, feats)
    assert img.shape == (24, 32, 16)
    assert np.isfinite(np.asarray(img)).all()


def test_saturation_terminates_transmittance():
    # stack of near-opaque gaussians: alpha must clamp near 1 and the back
    # ones contribute ~nothing
    n = 30
    means = jnp.asarray(
        np.stack(
            [np.zeros(n), np.zeros(n), np.linspace(3, 6, n)], 1
        ).astype(np.float32)
    )
    scales = jnp.asarray(np.full((n, 3), 0.5, np.float32))
    op = jnp.asarray(np.full(n, 0.95, np.float32))
    col = jnp.asarray(np.ones((n, 1), np.float32))
    _, (img, alpha) = _raster(means, scales, op, col)
    a = float(alpha[12, 16])
    assert a > 0.999
    assert a <= 1.0 + 1e-6
