"""Full GAS→GAD round trip with tiny random-weight SAM + CLIP.

Exercises the entire preprocessing data path end-to-end: depth-adaptive
prompts → SAM auto-mask generation (4 granularities) → GAGS mask NMS →
crop extraction → CLIP embedding → cumulative-offset packing → *_f/_s.npy
on disk → GadDataset load → one jitted GAD step. Mirrors driver config 3
(full GAS then distill) at toy scale.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gags_tpu.gas import masks as gm
from gags_tpu.gas.generator import AutomaticMaskGenerator, GeneratorConfig
from gags_tpu.gas.prompts import build_mindepth_point_grid
from gags_tpu.models.sam import SAM, SAMConfig
from gags_tpu.models.clip import CLIP, CLIPConfig, preprocess_images

pytestmark = pytest.mark.slow  # integration tier: full suite still runs them; `-m 'not slow'` is the fast iteration tier


@pytest.mark.slow
def test_gas_pipeline_to_gad_training(tmp_path):
    rng = np.random.default_rng(0)
    h_img, w_img = 48, 64

    # --- GAS stage C over two synthetic images ------------------------------
    sam_cfg = SAMConfig.tiny()
    sam = SAM(sam_cfg)
    sam_params = sam.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, sam_cfg.image_size, sam_cfg.image_size, 3)),
        jnp.zeros((1, 1, 2)),
        jnp.ones((1, 1), jnp.int32),
    )
    gen = AutomaticMaskGenerator(
        sam, sam_params, sam_cfg,
        GeneratorConfig(points_per_batch=8, pred_iou_thresh=-10.0,
                        stability_score_thresh=-1.0, min_mask_region_area=4),
    )
    clip_cfg = CLIPConfig.tiny()
    clip = CLIP(clip_cfg)
    clip_params = clip.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, clip_cfg.image_size, clip_cfg.image_size, 3)),
        jnp.zeros((1, clip_cfg.context_length), jnp.int32).at[:, 1].set(3),
    )
    embed_crops = jax.jit(
        lambda imgs: clip.apply(clip_params, method="encode_image", images=imgs)
    )

    feat_dir = tmp_path / "language_features"
    os.makedirs(feat_dir)
    names = ["img000", "img001"]
    for ni, name in enumerate(names):
        image = rng.integers(0, 255, (h_img, w_img, 3), np.uint8)
        depth = np.full((h_img, w_img), 6.0, np.float32)
        sample = np.zeros((h_img, w_img), np.float32)
        sample[::6, ::6] = 3.0
        grid, _ = build_mindepth_point_grid(2, depth, sample, 1, rng)
        levels = gen.generate(image, grid)
        levels = [gm.filter_masks(l, iou_thr=0.95, score_thr=-10.0, inner_thr=0.9)
                  for l in levels]
        embeds, segs = {}, {}
        for lname, lvl in zip(["default", "s", "m", "l"], levels):
            if not lvl:
                continue
            crops = gm.extract_mask_crops(lvl, image, size=clip_cfg.image_size)
            e = np.asarray(embed_crops(preprocess_images(jnp.asarray(crops),
                                                         clip_cfg.image_size)))
            e = e / np.linalg.norm(e, axis=-1, keepdims=True)
            embeds[lname] = e.astype(np.float16)
            segs[lname] = gm.masks_to_seg_map(lvl, (h_img, w_img))
        assert embeds, "tiny SAM produced no masks at all"
        img_embed, seg_maps = gm.pack_granularities(embeds, segs)
        np.save(feat_dir / f"{name}_f.npy", img_embed)
        np.save(feat_dir / f"{name}_s.npy", seg_maps.astype(np.float32))
        # packing invariant (reference preprocess.py:325)
        assert img_embed.shape[0] == int(seg_maps.max()) + 1

    # --- GAD consumes the artefacts -----------------------------------------
    from gags_tpu.gad.data import GadDataset
    from gags_tpu.gad.train import GadConfig, create_train_state, frozen_geometry, make_train_step
    from gags_tpu.scene.dataset import CameraInfo
    from gags_tpu.scene.gaussian_data import GaussianScene
    from gags_tpu.splat.rasterizer import RasterizeConfig
    from gags_tpu.utils.synthetic import make_scene

    infos = []
    for i, name in enumerate(names):
        infos.append(CameraInfo(
            uid=i, name=name + ".png", R=np.eye(3), T=np.zeros(3),
            fovx=1.0, fovy=0.8, width=w_img, height=h_img,
            f_path=str(feat_dir / f"{name}_f.npy"),
            s_path=str(feat_dir / f"{name}_s.npy"),
        ))
    ds = GadDataset(infos, resolution=1)
    assert ds.width == w_img and ds.height == h_img
    assert ds.examples[0].img_embed.dtype == np.float16

    raw = make_scene(60, seed=3)
    scene = GaussianScene(
        means=jnp.asarray(raw["means"]),
        sh=jnp.asarray(raw["sh"]),
        opacities_raw=jnp.asarray(np.log(raw["opacities"] / (1 - raw["opacities"]))),
        scales_raw=jnp.asarray(np.log(raw["scales"])),
        quats=jnp.asarray(raw["quats"]),
        semantic_features=jnp.zeros((60, 8)),
    )
    cfg = GadConfig(
        feature_dim=8, clip_dim=clip_cfg.embed_dim, max_segments=64,
        raster=RasterizeConfig(tile_h=8, tile_w=16, chunk=8, interpret=True),
    )
    state, statics = create_train_state(scene, jax.random.PRNGKey(2), cfg)
    step = make_train_step(statics, ds.width, ds.height, cfg)
    geom = frozen_geometry(scene)
    for i in range(3):
        b = ds.batch(i % len(ds))
        b = {k: jnp.asarray(v) for k, v in b.items()}
        state, m = step(state, geom, b, jnp.float32(1e-3), jnp.float32(0.0))
        assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 3
