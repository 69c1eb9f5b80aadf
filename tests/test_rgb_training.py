"""RGB pretraining trainer: photometric convergence + densify mechanics."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gags_tpu.rgb.train import (
    RgbConfig,
    create_rgb_state,
    densify_step,
    expon_lr,
    make_rgb_step,
    reset_opacity_step,
    to_scene,
)
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.splat.rasterizer import RasterizeConfig
from gags_tpu.splat.render import render
from gags_tpu.utils.synthetic import make_scene, make_camera

pytestmark = pytest.mark.slow  # integration tier: full suite still runs them; `-m 'not slow'` is the fast iteration tier

W, H, N = 32, 16, 50
RCFG = RasterizeConfig(tile_h=8, tile_w=16, chunk=8, budget_factor=8,
                       interpret=True, geometry_grads=True)


def _initial_scene(seed=0):
    raw = make_scene(N, seed=seed)
    return GaussianScene(
        means=jnp.asarray(raw["means"]),
        sh=jnp.asarray(raw["sh"]),
        opacities_raw=jnp.asarray(np.log(raw["opacities"] / (1 - raw["opacities"]))),
        scales_raw=jnp.asarray(np.log(raw["scales"])),
        quats=jnp.asarray(raw["quats"]),
        semantic_features=None,
    )


def _gt_image(scene, cam):
    out = render(
        cam, means=scene.means, quats=scene.quats, scales=scene.scales,
        opacities=scene.opacities, sh=scene.sh, sh_degree=3,
        bg_color=jnp.zeros((3,)), config=RCFG,
    )
    return out.render


def test_rgb_step_reduces_loss():
    target_scene = _initial_scene(seed=7)
    cam = make_camera(W, H)
    gt = _gt_image(target_scene, cam)

    # perturb the dc colours of the SAME geometry → trainer must recover them
    start = dataclasses.replace(
        target_scene,
        sh=target_scene.sh.at[:, 0, :].add(0.8),
    )
    cfg = RgbConfig(capacity_factor=2, raster=RCFG)
    state = create_rgb_state(start, cfg)
    step = make_rgb_step(cfg, W, H, spatial_scale=1.0)
    batch = dict(viewmat=cam.viewmat, K=cam.K, image=gt)
    losses = []
    for i in range(60):
        lr = expon_lr(jnp.float32(i), cfg.position_lr_init, cfg.position_lr_final,
                      cfg.position_lr_delay_mult, cfg.position_lr_max_steps)
        state, m = step(state, batch, lr, 3)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.6, (losses[0], losses[-1])


def test_densify_clone_split_prune():
    scene = _initial_scene(seed=1)
    cfg = RgbConfig(capacity_factor=3, raster=RCFG)
    state = create_rgb_state(scene, cfg)
    n0 = int(jnp.sum(state.alive))

    # fabricate stats: first 4 gaussians high-grad
    state = dataclasses.replace(
        state,
        grad_accum=state.grad_accum.at[:4].set(10.0),
        denom=state.denom.at[:].set(1.0),
    )
    scales = np.exp(np.asarray(state.scales_raw[:4]).max(1))
    extent = 100.0  # all 4 count as "small" → cloned
    s1 = densify_step(state, 1.0, 0.01, extent, 0.005)
    assert int(jnp.sum(s1.alive)) == n0 + 4
    # clones replicate the parents
    cap = state.means.shape[0]
    new_idx = np.nonzero(np.asarray(s1.alive) & ~np.asarray(state.alive))[0]
    np.testing.assert_allclose(
        np.sort(np.asarray(s1.means[new_idx][:, 0])),
        np.sort(np.asarray(state.means[:4, 0])), rtol=1e-6,
    )

    # split path: tiny extent makes them "large" → 2 children each, parent dies
    s2 = densify_step(state, 1.0, 0.01, 1e-9, 0.005)
    assert int(jnp.sum(s2.alive)) == n0 - 4 + 8
    # children scales shrunk
    kid_idx = np.nonzero(np.asarray(s2.alive) & ~np.asarray(state.alive))[0]
    assert len(kid_idx) == 8
    np.testing.assert_allclose(
        np.asarray(jnp.exp(s2.scales_raw[kid_idx[0]])),
        np.asarray(jnp.exp(state.scales_raw[0])) / 1.6, rtol=1e-5,
    )

    # prune: everything transparent dies
    st = dataclasses.replace(
        state, opacities_raw=jnp.full_like(state.opacities_raw, -10.0),
        grad_accum=jnp.zeros_like(state.grad_accum),
    )
    s3 = densify_step(st, 1.0, 0.01, 100.0, 0.005)
    assert int(jnp.sum(s3.alive)) == 0
    # parked slots sit behind the camera
    assert float(s3.means[:, 2].min()) < -1e8


def test_reset_opacity_and_extract():
    scene = _initial_scene(seed=2)
    cfg = RgbConfig(capacity_factor=2, raster=RCFG)
    state = create_rgb_state(scene, cfg)
    state = reset_opacity_step(state)
    alive = np.asarray(state.alive)
    op = np.asarray(jax.nn.sigmoid(state.opacities_raw))[alive]
    assert op.max() <= 0.0101
    out = to_scene(state, 3)
    assert out.num_gaussians == N
    assert out.semantic_features.shape == (N, 16)
