"""End-to-end GAD train step on a tiny synthetic scene (CPU, interpret).

Checks: step runs under jit, loss decreases over iterations, gradients hit
all three parameter groups, geometry stays frozen by construction.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gags_tpu.gad.train import (
    GadConfig,
    create_train_state,
    frozen_geometry,
    loss_weights,
    make_train_step,
)
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.splat.rasterizer import RasterizeConfig
from gags_tpu.utils.synthetic import make_scene, make_camera

W, H = 32, 16
N = 80
N_MASKS = 6


@pytest.fixture(scope="module")
def setup():
    raw = make_scene(N, seed=0)
    scene = GaussianScene(
        means=jnp.asarray(raw["means"]),
        sh=jnp.asarray(raw["sh"]),
        opacities_raw=jnp.asarray(
            np.log(raw["opacities"] / (1 - raw["opacities"]))
        ),
        scales_raw=jnp.asarray(np.log(raw["scales"])),
        quats=jnp.asarray(raw["quats"]),
        semantic_features=jnp.zeros((N, 8)),
    )
    cam = make_camera(W, H)

    rng = np.random.default_rng(1)
    embed = rng.normal(size=(N_MASKS, 32)).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    # block seg maps: 3 granularity levels with disjoint id ranges
    seg = np.full((H, W, 4), -1, np.int32)
    seg[..., 0] = 0
    seg[:, : W // 2, 1] = 0
    seg[:, W // 2 :, 1] = 1
    seg[: H // 2, :, 2] = 2
    seg[H // 2 :, :, 2] = 3
    seg[..., 3] = 4
    seg[0, 0, :] = -1  # an invalid pixel

    cfg = GadConfig(
        feature_dim=8,
        clip_dim=32,
        max_segments=16,
        feature_lr=5e-3,
        decoder_lr=5e-4,
        raster=RasterizeConfig(tile_h=8, tile_w=16, chunk=8, interpret=True),
    )
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
    raw_step = make_train_step(statics, W, H, cfg)
    geom = frozen_geometry(scene)

    def step(st, batch, ew, rw):
        return raw_step(st, geom, batch, ew, rw)

    batch = dict(
        viewmat=cam.viewmat,
        K=cam.K,
        img_embed=jnp.asarray(embed),
        seg_map=jnp.asarray(seg),
    )
    return state, statics, step, batch, cfg


def test_loss_decreases(setup):
    state, statics, step, batch, cfg = setup
    ew, rw = loss_weights(0, cfg)
    hist = []
    for i in range(500):
        state, metrics = step(state, batch, jnp.float32(ew), jnp.float32(rw))
        hist.append(float(metrics["loss"]))
    assert all(np.isfinite(hist))
    # past the Adam warm-up transient, the distillation must make headway
    peak = max(hist[:10])
    assert hist[-1] < peak * 0.85, (peak, hist[-1])
    assert int(metrics["overflow"]) == 0


def test_all_param_groups_update(setup):
    state, statics, step, batch, cfg = setup
    s1, _ = step(state, batch, jnp.float32(1e-3), jnp.float32(0.1))
    assert float(jnp.abs(s1.features - state.features).max()) > 0
    d0 = jax.tree_util.tree_leaves(state.decoder_params)
    d1 = jax.tree_util.tree_leaves(s1.decoder_params)
    assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(d0, d1))
    c0 = jax.tree_util.tree_leaves(state.scale_params)
    c1 = jax.tree_util.tree_leaves(s1.scale_params)
    assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(c0, c1))
    assert int(s1.step) == int(state.step) + 1


def test_schedule_weights():
    cfg = GadConfig()
    assert loss_weights(1, cfg) == (1e-3, 0.0)
    assert loss_weights(15000, cfg) == (1e-3, 0.0)
    assert loss_weights(15001, cfg) == (2e-3, 0.1)
