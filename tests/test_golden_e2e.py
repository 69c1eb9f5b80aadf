"""Golden end-to-end distillation: fixed seeds, stored expected numbers.

Regression armor for the whole GAD stack (render → scale decoder → GT blend
→ losses → Adam): a deterministic 2-region scene is distilled for 300
iterations over 2 cameras; the final loss and the rendered-relevancy IoU of
a text-like query against the true region mask are asserted against stored
goldens. Any numerics change in the rasterizer/losses/supervision shifts
these — tolerances are set to pass across compiler versions but fail on
semantic changes.
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
from gags_tpu.splat.render import render
from gags_tpu.query.relevancy import max_across_levels
from gags_tpu.utils.synthetic import make_camera, make_scene

pytestmark = pytest.mark.slow  # integration tier: full suite still runs them; `-m 'not slow'` is the fast iteration tier

W, H, N, D, FDIM = 32, 16, 120, 24, 8
ITERS = 300

def _setup(fused_supervision: bool = False):
    raw = make_scene(N, seed=5, scale_mean=-1.6)  # fat splats: full image coverage at 32x16
    scene = GaussianScene(
        means=jnp.asarray(raw["means"]),
        sh=jnp.asarray(raw["sh"]),
        opacities_raw=jnp.asarray(
            np.log(raw["opacities"] / (1 - raw["opacities"]))
        ),
        scales_raw=jnp.asarray(np.log(raw["scales"])),
        quats=jnp.asarray(raw["quats"]),
        semantic_features=jnp.zeros((N, FDIM)),
    )
    rng = np.random.default_rng(7)
    embed = rng.normal(size=(6, D)).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    # every granularity splits left/right with DISTINCT embeds, so the
    # left/right semantic difference survives whichever granularity the
    # scale decoder settles on (a uniform level would be a degenerate
    # optimum that collapses the signal)
    seg = np.full((H, W, 4), -1, np.int32)
    seg[..., 0] = 0
    for lvl, base in ((1, 0), (2, 2), (3, 4)):
        seg[:, : W // 2, lvl] = base
        seg[:, W // 2 :, lvl] = base + 1

    cfg = GadConfig(
        feature_dim=FDIM,
        clip_dim=D,
        max_segments=8,
        feature_lr=5e-3,
        decoder_lr=5e-4,
        fused_supervision=fused_supervision,
        raster=RasterizeConfig(tile_h=8, tile_w=16, chunk=8, interpret=True),
    )
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
    geom = frozen_geometry(scene)
    step = make_train_step(statics, W, H, cfg)
    cams = [make_camera(W, H, dist=d) for d in (0.0, 0.5)]
    batches = [
        dict(viewmat=c.viewmat, K=c.K, img_embed=jnp.asarray(embed),
             seg_map=jnp.asarray(seg))
        for c in cams
    ]
    return scene, state, statics, geom, step, batches, cams, embed, seg, cfg


def run_distill(fused_supervision: bool = False):
    scene, state, statics, geom, step, batches, cams, embed, seg, cfg = _setup(
        fused_supervision
    )
    loss = None
    for i in range(ITERS):
        ew, rw = loss_weights(i, cfg)
        state, metrics = step(
            state, geom, batches[i % len(batches)],
            jnp.float32(ew), jnp.float32(rw),
        )
        loss = float(metrics["loss"])

    # rendered relevancy for "query = region-0 embedding"
    out = render(
        cams[0],
        means=scene.means, quats=scene.quats, scales=scene.scales,
        opacities=scene.opacities, semantic_features=state.features,
        feature_mode=True, config=cfg.raster,
    )
    decoded = statics["decoder"].apply(state.decoder_params, out.render)
    # discriminative query: all three left embeds vs all three right
    # embeds, max over prompts — works for any granularity mixture
    pos = embed[[0, 2, 4]]
    neg = embed[[1, 3, 5]]

    def rel_iou(feature_map):
        rel = np.asarray(
            max_across_levels(feature_map[None], jnp.asarray(pos), jnp.asarray(neg))
        )[0].max(axis=0)
        mask = rel > 0.5
        gt = np.zeros((H, W), bool)
        gt[:, : W // 2] = True
        inter = np.logical_and(mask, gt).sum()
        union = np.logical_or(mask, gt).sum()
        return float(inter / max(union, 1))

    iou = rel_iou(decoded)

    # the same distilled state through the bf16 inference pipeline
    # (unaligned fast kernel, bf16 alpha/transmittance + colour rows):
    # downstream relevancy must be insensitive to the ~1e-2 blend error —
    # the measured justification for benching with blend_bf16
    import dataclasses

    cfg16 = dataclasses.replace(
        cfg.raster, aligned=False, fast_color_rows=True, blend_bf16=True
    )
    out16 = render(
        cams[0],
        means=scene.means, quats=scene.quats, scales=scene.scales,
        opacities=scene.opacities, semantic_features=state.features,
        feature_mode=True, config=cfg16,
    )
    decoded16 = statics["decoder"].apply(state.decoder_params, out16.render)
    iou16 = rel_iou(decoded16)
    return loss, iou, iou16


@pytest.mark.slow
def test_golden_distillation_run():
    loss, iou, iou16 = run_distill()
    # stored goldens (recorded by running this file directly on the CPU
    # backend): loss 0.008565, IoU 0.9805 (anisotropic-bbox binning) — bands allow compiler-version
    # noise only; a semantic change in render/supervision/losses breaks out
    assert abs(loss - 0.008565) < 0.004, loss
    assert iou >= 0.9, iou
    assert iou16 >= 0.9, iou16  # bf16 inference preserves grounding


@pytest.mark.slow
def test_golden_distillation_run_fused_supervision():
    """The residual-free fused supervision VJP must land inside the SAME
    golden band over a full 300-iteration distillation — long-horizon
    evidence (beyond single-step equality) that the custom VJP does not
    drift training."""
    loss, iou, iou16 = run_distill(fused_supervision=True)
    assert abs(loss - 0.008565) < 0.004, loss
    assert iou >= 0.9, iou
    assert iou16 >= 0.9, iou16


if __name__ == "__main__":
    loss, iou, iou16 = run_distill()
    print(f"GOLDEN_FINAL_LOSS = {loss:.6f}")
    print(f"GOLDEN_IOU = {iou:.4f}")
    print(f"GOLDEN_IOU_BF16 = {iou16:.4f}")
