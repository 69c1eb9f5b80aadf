"""Train-step autotuner (gad/autotune.py): on CPU with force=True it must
evaluate every variant combination, keep only loss-equivalent candidates,
and hand back a (config, step) pair that actually trains.

The candidates are numerically-equivalent by construction (fused
supervision is the same math with different residuals; fast_fwd_aligned
shifts the forward within the f32 fuzz contract), so on this tiny scene
all four must pass the loss gate — the returned step's loss must match the
base step's within the tuner's own rtol.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gags_tpu.gad.autotune import autotune_train_step
from gags_tpu.gad.train import (
    GadConfig,
    create_train_state,
    frozen_geometry,
    make_train_step_binned,
)
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.splat.rasterizer import RasterizeConfig, prepare_binning
from gags_tpu.utils.synthetic import make_scene, make_camera

pytestmark = pytest.mark.slow  # integration tier: full suite still runs them; `-m 'not slow'` is the fast iteration tier

W, H = 32, 16
N = 60
N_MASKS = 5


@pytest.fixture(scope="module")
def setup():
    raw = make_scene(N, seed=3)
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
    cfg = GadConfig(
        feature_dim=8,
        clip_dim=32,
        max_segments=16,
        raster=RasterizeConfig(tile_h=8, tile_w=16, chunk=8, interpret=True),
    )
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
    geom = frozen_geometry(scene)

    b = prepare_binning(
        geom["means"], geom["quats"], geom["scales"],
        cam.viewmat, cam.K, W, H, cfg.raster, opacities=geom["opacities"],
    )
    rng = np.random.default_rng(1)
    embed = rng.normal(size=(N_MASKS, 32)).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    seg = np.full((H, W, 4), -1, np.int32)
    seg[..., 0] = 0
    seg[:, : W // 2, 1] = 0
    seg[:, W // 2 :, 1] = 1
    seg[: H // 2, :, 2] = 2
    seg[H // 2 :, :, 2] = 3
    seg[..., 3] = 4
    batch = dict(
        viewmat=cam.viewmat,
        K=cam.K,
        img_embed=jnp.asarray(embed),
        seg_map=jnp.asarray(seg),
        inst_gid=b.inst_gid,
        tile_starts=b.tile_starts,
        tile_counts=b.tile_counts,
        order=b.order,
        red_slot=b.red.slot_to_pos,
        red_rank=b.red.slot_rank,
        red_block=b.red.chunk_block,
    )
    return statics, cfg, state, geom, batch


def test_autotune_returns_equivalent_step(setup):
    statics, cfg, state, geom, batch = setup
    win_cfg, win_step = autotune_train_step(
        statics, W, H, cfg, state, geom, batch, k=1, force=True, verbose=False
    )
    base = make_train_step_binned(statics, W, H, cfg)
    ew, rw = jnp.float32(cfg.entropy_w_early), jnp.float32(0.0)
    _, m_base = base(state, geom, batch, ew, rw)
    st, m_win = win_step(state, geom, batch, ew, rw)
    rel = abs(float(m_win["loss"]) - float(m_base["loss"])) / (
        abs(float(m_base["loss"])) + 1e-12
    )
    assert np.isfinite(float(m_win["loss"]))
    assert rel <= 1e-3
    # the winner must be one of the declared variant combinations
    assert isinstance(win_cfg.fused_supervision, bool)
    assert isinstance(win_cfg.raster.fast_fwd_aligned, bool)
    # and the returned step trains (features actually move)
    assert float(jnp.sum(jnp.abs(st.features - state.features))) > 0.0


def test_cpu_backend_skips_timing(setup):
    """Without force, on the CPU backend the tuner returns the base config
    untouched (timing is meaningless off-device)."""
    statics, cfg, state, geom, batch = setup
    win_cfg, _ = autotune_train_step(
        statics, W, H, cfg, state, geom, batch, verbose=False
    )
    assert win_cfg == cfg
