"""Gaussian-axis sharding + tile-strip rasterization on the virtual mesh.

Covers SURVEY.md §2.3(b): parameters sharded over the Gaussian axis,
rasterization sharded over tile rows, exact parity with the single-chip
path (same kernels, y-shifted coordinates).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gags_tpu.gad.train import GadConfig, create_train_state, frozen_geometry, make_train_step
from gags_tpu.parallel import (
    gshard_state,
    make_dp_gshard_train_step,
    make_dp_train_step,
    make_gshard_render,
    make_gshard_train_step,
    make_mesh,
    make_mesh2d,
    pad_seg_map,
    shard_gaussians,
)
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
from gags_tpu.utils.synthetic import make_camera, make_scene
import pytest

pytestmark = pytest.mark.slow  # integration tier: full suite still runs them; `-m 'not slow'` is the fast iteration tier

N, W, H = 75, 32, 32  # H = 8 devices * tile_h 4 — no pad rows
RCFG = RasterizeConfig(tile_h=4, tile_w=16, chunk=8, interpret=True)


def _scene():
    raw = make_scene(N, seed=0)
    return GaussianScene(
        means=jnp.asarray(raw["means"]),
        sh=jnp.asarray(raw["sh"]),
        opacities_raw=jnp.asarray(np.log(raw["opacities"] / (1 - raw["opacities"]))),
        scales_raw=jnp.asarray(np.log(raw["scales"])),
        quats=jnp.asarray(raw["quats"]),
        semantic_features=jnp.asarray(
            np.random.default_rng(3).normal(size=(N, 8)).astype(np.float32)
        ),
    )


def test_gshard_render_matches_single_chip():
    scene = _scene()
    geom = frozen_geometry(scene)
    cam = make_camera(W, H)
    ref = rasterize(
        geom["means"], geom["quats"], geom["scales"], geom["opacities"],
        scene.semantic_features, cam.viewmat, cam.K, W, H,
        background=jnp.zeros((8,)), config=RCFG,
    )
    mesh = make_mesh(8)
    geom_s, feats_s = shard_gaussians(geom, scene.semantic_features, mesh)
    render = make_gshard_render(mesh, W, H, 8, RCFG)
    img, alpha, ovf = render(geom_s, feats_s, cam.viewmat, cam.K)
    assert int(ovf) == 0
    # 2e-4: make_gshard_render now takes the unaligned fast path, whose
    # MXU-bilinear sigma carries ~1e-4 log2-sigma error vs the aligned
    # reference path (see RasterizeConfig.mxu_sigma)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image), atol=2e-4)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha), atol=2e-4)


def test_gshard_render_uneven_n():
    """N not divisible by the mesh: padding Gaussians must not render."""
    scene = _scene()
    geom = frozen_geometry(scene)
    cam = make_camera(W, H)
    assert N % 8 != 0
    ref = rasterize(
        geom["means"], geom["quats"], geom["scales"], geom["opacities"],
        scene.semantic_features, cam.viewmat, cam.K, W, H,
        background=None, config=RCFG,
    )
    mesh = make_mesh(8)
    geom_s, feats_s = shard_gaussians(geom, scene.semantic_features, mesh)
    render = make_gshard_render(mesh, W, H, 8, RasterizeConfig(
        tile_h=4, tile_w=16, chunk=8, interpret=True))
    img, _, _ = render(geom_s, feats_s, cam.viewmat, cam.K)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image), atol=2e-4)


def test_gshard_train_step_matches_single_chip():
    scene = _scene()
    geom = frozen_geometry(scene)
    cam = make_camera(W, H)
    cfg = GadConfig(feature_dim=8, clip_dim=16, max_segments=16, raster=RCFG)
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32))
    seg = rng.integers(-1, 6, size=(H, W, 4)).astype(np.int32)

    # single-chip reference step
    step1 = make_train_step(statics, W, H, cfg)
    batch1 = dict(viewmat=cam.viewmat, K=cam.K, img_embed=emb, seg_map=jnp.asarray(seg))
    s1, metrics1 = step1(state, geom, batch1, jnp.float32(1e-3), jnp.float32(0.1))

    # 8-way gaussian-sharded step
    mesh = make_mesh(8)
    geom_s, _ = shard_gaussians(geom, state.features, mesh)
    gstate = gshard_state(state, mesh)
    stepd = make_gshard_train_step(mesh, statics, W, H, cfg, gstate)
    batchd = dict(
        viewmat=cam.viewmat, K=cam.K, img_embed=emb,
        seg_map=jnp.asarray(pad_seg_map(seg, mesh, cfg.raster)),
    )
    s2, loss2, ovf2 = stepd(gstate, geom_s, batchd, jnp.float32(1e-3), jnp.float32(0.1))
    assert int(ovf2) == 0

    np.testing.assert_allclose(float(loss2), float(metrics1["loss"]), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(s2.features)[:N], np.asarray(s1.features), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(s2.decoder_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(s1.decoder_params)[0]),
        atol=1e-5,
    )
    assert int(s2.step) == 1


def test_dp_gshard_2d_step_matches_dp_step():
    """(2, 4) mesh: camera batch over dp x gaussian shard + tile strips
    over gs must reproduce the plain 2-camera DP step (same camera-mean
    gradient semantics; strip losses are exact full-image losses)."""
    scene = _scene()
    geom = frozen_geometry(scene)
    cams = [make_camera(W, H, dist=0.15 * i) for i in range(2)]
    cfg = GadConfig(feature_dim=8, clip_dim=16, max_segments=16, raster=RCFG)
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(4)
    emb = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
    seg = rng.integers(-1, 6, size=(2, H, W, 4)).astype(np.int32)
    vms = jnp.stack([c.viewmat for c in cams])
    Ks = jnp.stack([c.K for c in cams])

    # oracle: plain camera-DP step over a 2-device mesh
    mesh_dp = make_mesh(2)
    step_dp = make_dp_train_step(mesh_dp, statics, W, H, cfg)
    s1, loss1 = step_dp(
        state, geom,
        dict(viewmat=vms, K=Ks, img_embed=emb, seg_map=jnp.asarray(seg)),
        jnp.float32(1e-3), jnp.float32(0.1),
    )

    # 2-D dp x gs step
    mesh2 = make_mesh2d(2, 4)
    geom_s, _ = shard_gaussians(geom, state.features, mesh2, axis="gs")
    gstate = gshard_state(state, mesh2, axis="gs")
    step2 = make_dp_gshard_train_step(mesh2, statics, W, H, cfg, gstate)
    seg_pad = np.stack(
        [pad_seg_map(seg[i], mesh2, cfg.raster, axis="gs") for i in range(2)]
    )
    s2, loss2, ovf = step2(
        gstate, geom_s,
        dict(viewmat=vms, K=Ks, img_embed=emb, seg_map=jnp.asarray(seg_pad)),
        jnp.float32(1e-3), jnp.float32(0.1),
    )
    assert int(ovf) == 0
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=2e-5)
    # 5e-5: the dp pmean + gs psum reorder gradient summation vs the
    # oracle's single pmean, and adam's eps amplifies ulp-level grad
    # differences near zero moments
    np.testing.assert_allclose(
        np.asarray(s2.features)[:N], np.asarray(s1.features), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(s2.decoder_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(s1.decoder_params)[0]),
        atol=5e-5,
    )
    assert int(s2.step) == 1


def test_gshard_second_step_runs():
    scene = _scene()
    geom = frozen_geometry(scene)
    cam = make_camera(W, H)
    cfg = GadConfig(feature_dim=8, clip_dim=16, max_segments=16, raster=RCFG)
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(8)
    geom_s, _ = shard_gaussians(geom, state.features, mesh)
    gstate = gshard_state(state, mesh)
    stepd = make_gshard_train_step(mesh, statics, W, H, cfg, gstate)
    rng = np.random.default_rng(1)
    batch = dict(
        viewmat=cam.viewmat, K=cam.K,
        img_embed=jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32)),
        seg_map=jnp.asarray(
            pad_seg_map(rng.integers(-1, 6, size=(H, W, 4)).astype(np.int32), mesh, cfg.raster)
        ),
    )
    s1, l1, _ = stepd(gstate, geom_s, batch, jnp.float32(1e-3), jnp.float32(0.0))
    s2, l2, _ = stepd(s1, geom_s, batch, jnp.float32(1e-3), jnp.float32(0.0))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert int(s2.step) == 2


def test_gshard_train_step_reports_overflow():
    """A starved strip budget must surface as a non-zero overflow count, not
    silently truncate the instance list (VERDICT r2 weak #4)."""
    scene = _scene()
    geom = frozen_geometry(scene)
    cam = make_camera(W, H)
    cfg = GadConfig(feature_dim=8, clip_dim=16, max_segments=16, raster=RCFG)
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(8)
    geom_s, _ = shard_gaussians(geom, state.features, mesh)
    gstate = gshard_state(state, mesh)
    # budget_slack tiny -> per-strip budget collapses to the 4*chunk floor,
    # far below the real per-strip instance count
    stepd = make_gshard_train_step(
        mesh, statics, W, H, cfg, gstate, budget_slack=1e-6
    )
    rng = np.random.default_rng(2)
    batch = dict(
        viewmat=cam.viewmat, K=cam.K,
        img_embed=jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32)),
        seg_map=jnp.asarray(
            pad_seg_map(rng.integers(-1, 6, size=(H, W, 4)).astype(np.int32),
                        mesh, cfg.raster)
        ),
    )
    _, _, ovf = stepd(gstate, geom_s, batch, jnp.float32(1e-3), jnp.float32(0.0))
    assert int(ovf) > 0
