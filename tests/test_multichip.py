"""Data-parallel training over the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gags_tpu.gad.train import GadConfig, create_train_state, frozen_geometry
from gags_tpu.parallel import make_mesh, make_dp_train_step
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.splat.rasterizer import RasterizeConfig
from gags_tpu.utils.synthetic import make_scene, make_camera

pytestmark = pytest.mark.slow  # integration tier: full suite still runs them; `-m 'not slow'` is the fast iteration tier

W, H, N = 32, 16, 60


def _setup(n_dev):
    raw = make_scene(N, seed=0)
    scene = GaussianScene(
        means=jnp.asarray(raw["means"]),
        sh=jnp.asarray(raw["sh"]),
        opacities_raw=jnp.asarray(np.log(raw["opacities"] / (1 - raw["opacities"]))),
        scales_raw=jnp.asarray(np.log(raw["scales"])),
        quats=jnp.asarray(raw["quats"]),
        semantic_features=jnp.zeros((N, 8)),
    )
    cfg = GadConfig(
        feature_dim=8,
        clip_dim=16,
        max_segments=16,
        raster=RasterizeConfig(tile_h=8, tile_w=16, chunk=8, interpret=True),
    )
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_dev)
    raw_step = make_dp_train_step(mesh, statics, W, H, cfg)
    geom = frozen_geometry(scene)

    def step(st, batch, ew, rw):
        return raw_step(st, geom, batch, ew, rw)

    rng = np.random.default_rng(1)
    cam = make_camera(W, H)
    b = n_dev
    emb = rng.normal(size=(b, 5, 16)).astype(np.float32)
    seg = rng.integers(-1, 5, size=(b, H, W, 4)).astype(np.int32)
    batch = dict(
        viewmat=jnp.tile(cam.viewmat[None], (b, 1, 1)),
        K=jnp.tile(cam.K[None], (b, 1, 1)),
        img_embed=jnp.asarray(emb),
        seg_map=jnp.asarray(seg),
    )
    return state, step, batch


@pytest.mark.parametrize("n_dev", [2, 8])
def test_dp_step_runs_and_updates(n_dev):
    assert len(jax.devices()) >= n_dev
    state, step, batch = _setup(n_dev)
    s1, loss = step(state, batch, jnp.float32(1e-3), jnp.float32(0.0))
    assert np.isfinite(float(loss))
    assert float(jnp.abs(s1.features - state.features).max()) > 0
    s2, loss2 = step(s1, batch, jnp.float32(1e-3), jnp.float32(0.0))
    assert np.isfinite(float(loss2))
    assert int(s2.step) == 2


def test_dp_binned_step_matches_unbinned():
    """The cached-binning DP fast path must produce the same update."""
    from gags_tpu.splat.rasterizer import prepare_binning

    n_dev = 8
    raw = make_scene(N, seed=0)
    scene = GaussianScene(
        means=jnp.asarray(raw["means"]),
        sh=jnp.asarray(raw["sh"]),
        opacities_raw=jnp.asarray(np.log(raw["opacities"] / (1 - raw["opacities"]))),
        scales_raw=jnp.asarray(np.log(raw["scales"])),
        quats=jnp.asarray(raw["quats"]),
        semantic_features=jnp.zeros((N, 8)),
    )
    cfg = GadConfig(
        feature_dim=8,
        clip_dim=16,
        max_segments=16,
        raster=RasterizeConfig(tile_h=8, tile_w=16, chunk=8, interpret=True),
    )
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_dev)
    geom = frozen_geometry(scene)
    cam = make_camera(W, H)

    rng = np.random.default_rng(1)
    b = n_dev
    batch = dict(
        viewmat=jnp.tile(cam.viewmat[None], (b, 1, 1)),
        K=jnp.tile(cam.K[None], (b, 1, 1)),
        img_embed=jnp.asarray(rng.normal(size=(b, 5, 16)).astype(np.float32)),
        seg_map=jnp.asarray(rng.integers(-1, 5, size=(b, H, W, 4)).astype(np.int32)),
    )
    step_u = make_dp_train_step(mesh, statics, W, H, cfg)
    s_u, loss_u = step_u(state, geom, batch, jnp.float32(1e-3), jnp.float32(0.0))

    bn = prepare_binning(
        geom["means"], geom["quats"], geom["scales"], cam.viewmat, cam.K,
        W, H, cfg.raster,
    )
    batch_b = dict(
        batch,
        inst_gid=jnp.tile(bn.inst_gid[None], (b, 1)),
        tile_starts=jnp.tile(bn.tile_starts[None], (b, 1)),
        tile_counts=jnp.tile(bn.tile_counts[None], (b, 1)),
        order=jnp.tile(bn.order[None], (b, 1)),
        red_slot=jnp.tile(bn.red.slot_to_pos[None], (b, 1)),
        red_rank=jnp.tile(bn.red.slot_rank[None], (b, 1)),
        red_block=jnp.tile(bn.red.chunk_block[None], (b, 1)),
    )
    step_b = make_dp_train_step(mesh, statics, W, H, cfg, binned=True)
    s_b, loss_b = step_b(state, geom, batch_b, jnp.float32(1e-3), jnp.float32(0.0))
    np.testing.assert_allclose(float(loss_b), float(loss_u), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_b.features), np.asarray(s_u.features), atol=1e-6
    )


def test_dp_per_device_batch_accumulation():
    """B = 2 cameras PER DEVICE (16 over the 8-dev mesh) via gradient
    accumulation: with all cameras identical, the accumulated mean equals
    the per-device-batch-1 step exactly."""
    from gags_tpu.gad.train import GadConfig, create_train_state, frozen_geometry
    from gags_tpu.scene.gaussian_data import GaussianScene

    raw = make_scene(N, seed=0)
    scene = GaussianScene(
        means=jnp.asarray(raw["means"]),
        sh=jnp.asarray(raw["sh"]),
        opacities_raw=jnp.asarray(np.log(raw["opacities"] / (1 - raw["opacities"]))),
        scales_raw=jnp.asarray(np.log(raw["scales"])),
        quats=jnp.asarray(raw["quats"]),
        semantic_features=jnp.zeros((N, 8)),
    )
    cfg = GadConfig(
        feature_dim=8, clip_dim=16, max_segments=16,
        raster=RasterizeConfig(tile_h=8, tile_w=16, chunk=8, interpret=True),
    )
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(8)
    stepf = make_dp_train_step(mesh, statics, W, H, cfg)
    geom = frozen_geometry(scene)

    rng = np.random.default_rng(1)
    cam = make_camera(W, H)
    emb1 = rng.normal(size=(1, 5, 16)).astype(np.float32)
    seg1 = rng.integers(-1, 5, size=(1, H, W, 4)).astype(np.int32)

    def batch_of(b):
        return dict(
            viewmat=jnp.tile(cam.viewmat[None], (b, 1, 1)),
            K=jnp.tile(cam.K[None], (b, 1, 1)),
            img_embed=jnp.tile(jnp.asarray(emb1), (b, 1, 1)),
            seg_map=jnp.tile(jnp.asarray(seg1), (b, 1, 1, 1)),
        )

    s8, loss8 = stepf(state, geom, batch_of(8), jnp.float32(1e-3), jnp.float32(0.1))
    s16, loss16 = stepf(state, geom, batch_of(16), jnp.float32(1e-3), jnp.float32(0.1))
    np.testing.assert_allclose(float(loss16), float(loss8), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s16.features), np.asarray(s8.features), atol=1e-6
    )


def test_dp_render_matches_single_chip():
    """Camera-sharded batch inference (make_dp_render): 16 cameras over 8
    devices (2/device via lax.scan) must match per-camera single-chip
    rasterize exactly."""
    from gags_tpu.parallel.sharding import make_dp_render
    from gags_tpu.splat.rasterizer import rasterize

    raw = make_scene(N, seed=0)
    geom = dict(
        means=jnp.asarray(raw["means"]),
        quats=jnp.asarray(raw["quats"]),
        scales=jnp.asarray(raw["scales"]),
        opacities=jnp.asarray(raw["opacities"]),
    )
    colors = jnp.asarray(raw["features"][:, :8])
    cfg = RasterizeConfig(
        tile_h=8, tile_w=16, chunk=8, interpret=True, aligned=False,
        budget_factor=8,
    )
    mesh = make_mesh(8)
    render = make_dp_render(mesh, W, H, cfg)
    cams = [make_camera(W, H, dist=0.1 * i) for i in range(16)]
    vms = jnp.stack([c.viewmat for c in cams])
    Ks = jnp.stack([c.K for c in cams])
    bg = jnp.zeros((8,), jnp.float32)
    imgs, alphas = render(geom, colors, vms, Ks, bg)
    assert imgs.shape == (16, H, W, 8) and alphas.shape == (16, H, W)
    for i in (0, 5, 15):
        ref = rasterize(
            geom["means"], geom["quats"], geom["scales"], geom["opacities"],
            colors, cams[i].viewmat, cams[i].K, W, H, background=bg,
            config=cfg,
        )
        np.testing.assert_allclose(
            np.asarray(imgs[i]), np.asarray(ref.image), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(alphas[i]), np.asarray(ref.alpha), atol=1e-5
        )
