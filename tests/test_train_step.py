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

pytestmark = pytest.mark.slow  # integration tier: full suite still runs them; `-m 'not slow'` is the fast iteration tier

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


def test_fused_supervision_matches_generic(setup):
    """fused_supervision_l1 is the same math as the blend+mask+l1_map
    composition — one full train step must agree on loss and every
    parameter update (tolerance covers reduction-order differences)."""
    import dataclasses

    state, statics, step, batch, cfg = setup
    cfg_f = dataclasses.replace(cfg, fused_supervision=True)
    from gags_tpu.gad.train import make_train_step as mts

    raw_fused = mts(statics, W, H, cfg_f)
    ew, rw = jnp.float32(1e-3), jnp.float32(0.1)
    s_ref, m_ref = step(state, batch, ew, rw)

    # the fixture closes over its frozen geometry — rebuild it identically
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
    geom = frozen_geometry(scene)
    s_fus, m_fus = raw_fused(state, geom, batch, ew, rw)

    np.testing.assert_allclose(
        float(m_fus["loss"]), float(m_ref["loss"]), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(s_fus.features), np.asarray(s_ref.features),
        rtol=1e-5, atol=1e-6,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_fus.decoder_params),
        jax.tree_util.tree_leaves(s_ref.decoder_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_fus.scale_params),
        jax.tree_util.tree_leaves(s_ref.scale_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_fused_supervision_vjp_matches_autodiff():
    """Direct check of the custom VJP against jax.grad of the explicit
    composition, including the scale-map cotangent path."""
    from gags_tpu.gad.supervision import (
        blend_gt_feature_map,
        fused_supervision_l1,
    )

    rng = np.random.default_rng(7)
    h, w, d, m = 6, 10, 16, 5
    decoded = jnp.asarray(rng.normal(size=(h, w, d)).astype(np.float32))
    embed = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    seg = rng.integers(-1, m, size=(h, w, 4)).astype(np.int32)
    seg_j = jnp.asarray(seg)
    scale = jnp.asarray(
        rng.uniform(0.1, 1.0, size=(h, w, 3)).astype(np.float32)
    )
    cot = jnp.asarray(rng.normal(size=(h, w)).astype(np.float32))

    def composed(dec_, scale_):
        gt, mask = blend_gt_feature_map(embed, seg_j, scale_)
        maskf = mask.astype(jnp.float32)
        l1 = jnp.mean(jnp.abs(dec_ * maskf - gt * maskf), axis=-1)
        return jnp.sum(l1 * cot)

    def fused(dec_, scale_):
        l1 = fused_supervision_l1(dec_, embed, seg_j[..., 1:4], scale_)
        return jnp.sum(l1 * cot)

    v_ref = composed(decoded, scale)
    v_fus = fused(decoded, scale)
    np.testing.assert_allclose(float(v_fus), float(v_ref), rtol=1e-6)

    g_ref = jax.grad(composed, argnums=(0, 1))(decoded, scale)
    g_fus = jax.grad(fused, argnums=(0, 1))(decoded, scale)
    for a, b in zip(g_fus, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_schedule_weights():
    cfg = GadConfig()
    assert loss_weights(1, cfg) == (1e-3, 0.0)
    assert loss_weights(15000, cfg) == (1e-3, 0.0)
    assert loss_weights(15001, cfg) == (2e-3, 0.1)


def test_decoder_bf16_step_close_to_f32(setup):
    """decoder_bf16 changes compute dtype only: the step must run finite
    and land within bf16 tolerance of the f32 step on the same state."""
    state, statics, step, batch, cfg = setup
    cfg16 = __import__("dataclasses").replace(cfg, decoder_bf16=True)
    raw = make_scene(N, seed=0)
    scene = GaussianScene(
        means=jnp.asarray(raw["means"]), sh=jnp.asarray(raw["sh"]),
        opacities_raw=jnp.asarray(np.log(raw["opacities"] / (1 - raw["opacities"]))),
        scales_raw=jnp.asarray(np.log(raw["scales"])),
        quats=jnp.asarray(raw["quats"]),
        semantic_features=jnp.ones((N, 8)) * 0.1,
    )
    st16, statics16 = create_train_state(scene, jax.random.PRNGKey(0), cfg16)
    step16 = make_train_step(statics16, W, H, cfg16)
    geom = frozen_geometry(scene)
    # run the f32 topology on the same state for the comparison
    st32, statics32 = create_train_state(scene, jax.random.PRNGKey(0), cfg)
    step32 = make_train_step(statics32, W, H, cfg)
    _, m16 = step16(st16, geom, batch, jnp.float32(1e-3), jnp.float32(0.0))
    _, m32 = step32(st32, geom, batch, jnp.float32(1e-3), jnp.float32(0.0))
    assert np.isfinite(float(m16["loss"]))
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]), rtol=3e-2)
