"""Full rasterizer VJP (geometry gradients) vs autodiff of the oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from gags_tpu.splat.projection import project_gaussians
from gags_tpu.splat.reference import rasterize_reference
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize

import pytest

pytestmark = pytest.mark.slow  # integration tier: full suite still runs them; `-m 'not slow'` is the fast iteration tier

W, H, F = 48, 24, 40.0
CFG = RasterizeConfig(
    tile_h=8, tile_w=16, chunk=8, budget_factor=8, interpret=True,
    geometry_grads=True,
)


def _scene(n, seed=0, cdim=3, max_op=0.6):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(
        np.stack(
            [rng.uniform(-1.2, 1.2, n), rng.uniform(-0.7, 0.7, n), rng.uniform(3, 9, n)], 1
        ).astype(np.float32)
    )
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    scales = jnp.asarray(np.exp(rng.normal(-1.8, 0.4, size=(n, 3))).astype(np.float32))
    # moderate opacities → no per-pixel saturation, where the early-stop
    # approximation in the alpha-grad path would differ from the oracle
    op = jnp.asarray(rng.uniform(0.15, max_op, n).astype(np.float32))
    col = jnp.asarray(rng.uniform(0, 1, (n, cdim)).astype(np.float32))
    vm = jnp.eye(4)
    K = jnp.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], jnp.float32)
    return means, quats, scales, op, col, vm, K


def test_geometry_grads_match_oracle():
    n = 60
    means, quats, scales, op, col, vm, K = _scene(n, seed=0)
    tgt = jnp.asarray(np.random.default_rng(9).uniform(0, 1, (H, W, 3)).astype(np.float32))
    bg = jnp.array([0.3, 0.2, 0.1])

    def loss_oracle(m, q, s, o, c):
        p = project_gaussians(m, q, s, vm, K, W, H)
        img, alpha = rasterize_reference(
            p.means2d, p.conics, p.depths, p.radii, o * p.compensations, c, W, H,
            background=bg,
        )
        return jnp.mean(jnp.abs(img - tgt)) + 0.1 * jnp.mean(alpha)

    def loss_pallas(m, q, s, o, c):
        res = rasterize(m, q, s, o, c, vm, K, W, H, background=bg, config=CFG)
        return jnp.mean(jnp.abs(res.image - tgt)) + 0.1 * jnp.mean(res.alpha)

    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(means, quats, scales, op, col)
    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(means, quats, scales, op, col)

    names = ["means", "quats", "scales", "opacities", "colors"]
    for name, a, b in zip(names, go, gp):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b, a, atol=2e-4 * scale, rtol=2e-3,
                                   err_msg=f"grad mismatch: {name}")


def test_geometry_grads_finite_difference_spotcheck():
    n = 12
    means, quats, scales, op, col, vm, K = _scene(n, seed=3)

    def loss(m):
        res = rasterize(m, quats, scales, op, col, vm, K, W, H, config=CFG)
        return jnp.sum(res.image**2)

    g = np.asarray(jax.grad(loss)(means))
    eps = 1e-3
    rng = np.random.default_rng(1)
    for _ in range(4):
        i = rng.integers(0, n)
        j = rng.integers(0, 2)  # x or y (z moves binning → skip)
        dm = np.zeros((n, 3), np.float32)
        dm[i, j] = eps
        lp = float(loss(means + jnp.asarray(dm)))
        lm = float(loss(means - jnp.asarray(dm)))
        fd = (lp - lm) / (2 * eps)
        assert abs(fd - g[i, j]) < 0.05 * (abs(fd) + abs(g[i, j]) + 1e-3), (
            i, j, fd, g[i, j]
        )


def test_feature_mode_grads_unaffected():
    """colors-only path still matches when geometry_grads is off."""
    n = 40
    means, quats, scales, op, col, vm, K = _scene(n, seed=5, cdim=8)
    cfg_off = RasterizeConfig(tile_h=8, tile_w=16, chunk=8, budget_factor=8, interpret=True)

    def loss(cfg):
        def f(c):
            res = rasterize(means, quats, scales, op, c, vm, K, W, H, config=cfg)
            return jnp.mean(res.image**2)
        return jax.grad(f)(col)

    g_on = np.asarray(loss(CFG))
    g_off = np.asarray(loss(cfg_off))
    np.testing.assert_allclose(g_on, g_off, atol=1e-6)


def test_means2d_tap_gradient_is_screen_grad():
    """d loss / d means2d via the zero tap == autodiff of the ORACLE wrt an
    identical screen-space shift — the densification signal the reference
    reads through info["means2d"].retain_grad()."""
    n = 40
    means, quats, scales, op, col, vm, K = _scene(n, seed=3)
    tgt = jnp.asarray(
        np.random.default_rng(11).uniform(0, 1, (H, W, 3)).astype(np.float32)
    )

    def loss_pallas(tap):
        res = rasterize(means, quats, scales, op, col, vm, K, W, H,
                        config=CFG, means2d_tap=tap)
        return jnp.mean(jnp.abs(res.image - tgt))

    def loss_oracle(tap):
        p = project_gaussians(means, quats, scales, vm, K, W, H)
        img, _ = rasterize_reference(
            p.means2d + tap, p.conics, p.depths, p.radii,
            op * p.compensations, col, W, H,
        )
        return jnp.mean(jnp.abs(img - tgt))

    zero = jnp.zeros((n, 2), jnp.float32)
    gp = np.asarray(jax.grad(loss_pallas)(zero))
    go = np.asarray(jax.grad(loss_oracle)(zero))
    scale = np.abs(go).max() + 1e-8
    np.testing.assert_allclose(gp / scale, go / scale, atol=2e-4)
    assert np.abs(gp).max() > 0  # signal actually flows


def test_geometry_grads_saturated_rays_match_oracle():
    """Early-terminated (saturated) pixels: the backward's T_fin must be
    the forward's T-after-last-INCLUDED-splat, not the naive carry that
    keeps absorbing excluded splats (the galpha/background gradient term
    was orders too small on such rays before the fix)."""
    n = 80
    # CONCENTRATED near-opaque splats: deep overdraw so rays terminate
    # early (verified ~100 saturated pixels; naive-vs-included final T
    # diverges by up to 1e26 on them)
    rng = np.random.default_rng(7)
    means = jnp.asarray(
        np.stack(
            [rng.uniform(-0.35, 0.35, n), rng.uniform(-0.2, 0.2, n),
             rng.uniform(3, 9, n)], 1
        ).astype(np.float32)
    )
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    scales = jnp.asarray(
        np.exp(rng.normal(-1.2, 0.3, size=(n, 3))).astype(np.float32)
    )
    col = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    vm = jnp.eye(4)
    K = jnp.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], jnp.float32)
    op = jnp.asarray(
        np.random.default_rng(11).uniform(0.85, 0.999, n).astype(np.float32)
    )
    tgt = jnp.asarray(
        np.random.default_rng(9).uniform(0, 1, (H, W, 3)).astype(np.float32)
    )
    bg = jnp.array([0.3, 0.2, 0.1])

    # weighted-alpha-ONLY loss: every geometry gradient flows through the
    # final transmittance, so a wrong T_fin in the backward cannot hide
    # behind the colour terms (this test FAILS against the naive-carry
    # t_final with means grads off by >10x)
    wmap = jnp.asarray(
        np.random.default_rng(13).uniform(0.5, 1.5, (H, W)).astype(np.float32)
    )

    def loss_oracle(m, q, s, o, c):
        p = project_gaussians(m, q, s, vm, K, W, H)
        img, alpha = rasterize_reference(
            p.means2d, p.conics, p.depths, p.radii, o * p.compensations,
            c, W, H, background=bg,
        )
        return jnp.mean(wmap * alpha)

    def loss_pallas(m, q, s, o, c):
        res = rasterize(m, q, s, o, c, vm, K, W, H, background=bg, config=CFG)
        return jnp.mean(wmap * res.alpha)

    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(means, quats, scales, op, col)
    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(means, quats, scales, op, col)
    for name, a, b in zip(["means", "quats", "scales", "opacities", "colors"], go, gp):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b, a, atol=5e-4 * scale, rtol=5e-3,
                                   err_msg=f"saturated grad mismatch: {name}")
