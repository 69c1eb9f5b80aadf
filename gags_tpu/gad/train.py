"""GAD distillation: one fused, jitted train step.

Behavioural counterpart of the reference loop body (`train.py:109-228`),
redesigned as a single pure function: render 16-dim features (Pallas) →
scale decode → GT gather/blend → losses → grads → three Adam updates. The
reference's CPU staging of img_embed/seg_map (train.py:51-52,162-165) is
replaced by keeping supervision on-device and double-buffered by the data
loader.

Gradient topology (matches reference exactly):
  * scale decoder sees a stop-gradiented feature map (train.py:149) but
    receives L1 gradient through the scale-blended GT map plus the entropy
    regulariser;
  * Gaussian features + feature decoder train through the distillation L1
    and (after iter 15000) the region-variance loss on the 16-dim map
    (train.py:153 — computed before decoding);
  * geometry is frozen (gaussian_model.py:192-206).

Loss schedule (train.py:161-172 with default flags): region-balanced L1
from iteration 1; weights (entropy_w, regionvar_w) = (0.001, 0) before
iteration 15001, (0.002, 0.1) after — passed as scalars so the schedule
flip doesn't recompile.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gags_tpu.gad import losses
from gags_tpu.gad.supervision import (
    blend_gt_feature_map,
    fused_supervision_l1,
    mixed_seg_map,
)
from gags_tpu.models.decoders import FeatureDecoder, ScaleDecoder
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.splat.rasterizer import (
    RasterizeConfig,
    rasterize,
    rasterize_binned,
)


@dataclasses.dataclass(frozen=True)
class GadConfig:
    feature_dim: int = 16          # distilled dim (512/32 speedup, train.py:68)
    clip_dim: int = 512
    feature_lr: float = 1e-3       # arguments/__init__.py:85
    decoder_lr: float = 1e-4       # train.py:72,76
    adam_eps_features: float = 1e-15  # gaussian_model.py:208
    max_segments: int = 4096       # static cap for segment reductions
    entropy_w_early: float = 1e-3
    entropy_w_late: float = 2e-3
    regionvar_w_late: float = 0.1
    schedule_switch: int = 15001   # scale_regulation_iteration default
    single_scale: str = ""         # "", "s", "m", "l", "mix" (train.py:38-47)
    # residual-free supervision+L1 custom VJP (same math; cuts the
    # gt_map/d_gt HBM round trips — see supervision.fused_supervision_l1).
    # Applies only on the same-resolution default supervision path; other
    # paths silently use the generic composition. Default ON since r5
    # battery 2: with auto-tight budgets it measured 81.1 vs 96.2 ms/step
    # and is bit-identical (reshapes only) where it applies.
    fused_supervision: bool = True
    # mixed-precision decoders: bf16 matmuls/activations, f32 params and
    # f32 final normalise/softmax. The (HW, 256) decoder intermediates are
    # the train step's dominant HBM traffic (r4 profile); the supervision
    # target is itself fp16 CLIP (reference preprocess.py:33-35).
    decoder_bf16: bool = False
    raster: RasterizeConfig = RasterizeConfig()

    def save(self, model_dir: str) -> None:
        import json, os

        with open(os.path.join(model_dir, "gad_cfg.json"), "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @staticmethod
    def load(model_dir: str, **overrides) -> "GadConfig":
        """Rehydrate the training config from a model dir (the "model dir
        carries its config" convention); missing file → defaults."""
        import json, os

        path = os.path.join(model_dir, "gad_cfg.json")
        data = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
        raster = data.pop("raster", None)
        overrides = dict(overrides)
        ov_raster = overrides.pop("raster", None)
        data.update(overrides)
        fields = {f.name for f in dataclasses.fields(GadConfig) if f.name != "raster"}
        cfg = {k: v for k, v in data.items() if k in fields}
        if ov_raster is not None:  # caller override beats the JSON file
            cfg["raster"] = ov_raster
        elif raster is not None:
            rfields = {f.name for f in dataclasses.fields(RasterizeConfig)}
            cfg["raster"] = RasterizeConfig(
                **{k: v for k, v in raster.items() if k in rfields}
            )
        return GadConfig(**cfg)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    features: jnp.ndarray              # (N, F) trainable per-Gaussian features
    decoder_params: Any
    scale_params: Any
    opt_feat: Any
    opt_dec: Any
    opt_scale: Any


def create_train_state(
    scene: GaussianScene, key: jax.Array, cfg: GadConfig
) -> Tuple[TrainState, Dict[str, Any]]:
    """Build state + the static bits (optimisers, module defs)."""
    n = scene.num_gaussians
    if scene.semantic_features is None:
        feats = jnp.zeros((n, cfg.feature_dim), jnp.float32)
    elif scene.semantic_features.shape[1] == cfg.feature_dim:
        feats = scene.semantic_features
    else:
        # silently zeroing trained features while a warm start resumes at
        # iteration N would quietly degrade output — make it loud
        raise ValueError(
            f"scene carries {scene.semantic_features.shape[1]}-dim semantic "
            f"features but cfg.feature_dim={cfg.feature_dim}; pass the "
            "matching feature_dim or strip the features to train fresh"
        )

    dt = jnp.bfloat16 if cfg.decoder_bf16 else None
    dec = FeatureDecoder(output_dim=cfg.clip_dim, dtype=dt)
    scl = ScaleDecoder(dtype=dt)
    k1, k2 = jax.random.split(key)
    dummy = jnp.zeros((1, 1, cfg.feature_dim))
    dec_params = dec.init(k1, dummy)
    scl_params = scl.init(k2, dummy)

    tx_feat = optax.adam(cfg.feature_lr, eps=cfg.adam_eps_features)
    tx_dec = optax.adam(cfg.decoder_lr)
    tx_scale = optax.adam(cfg.decoder_lr)

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        features=feats,
        decoder_params=dec_params,
        scale_params=scl_params,
        opt_feat=tx_feat.init(feats),
        opt_dec=tx_dec.init(dec_params),
        opt_scale=tx_scale.init(scl_params),
    )
    statics = dict(decoder=dec, scale_decoder=scl, tx_feat=tx_feat, tx_dec=tx_dec, tx_scale=tx_scale)
    return state, statics


def loss_weights(step: int, cfg: GadConfig) -> Tuple[float, float]:
    if step < cfg.schedule_switch:
        return cfg.entropy_w_early, 0.0
    return cfg.entropy_w_late, cfg.regionvar_w_late


def frozen_geometry(scene: GaussianScene) -> Dict[str, jnp.ndarray]:
    """Pre-activated frozen geometry arrays, passed to the step as runtime
    arguments. NEVER close over these in a jitted function: XLA would embed
    the N-sized arrays as constants and try to constant-fold the whole
    projection/binning chain at compile time — compile blows up with N."""
    return dict(
        means=scene.means,
        quats=scene.quats,
        scales=scene.scales,
        opacities=scene.opacities,
    )



_SINGLE_SCALE = {"s": (1.0, 0.0, 0.0), "m": (0.0, 1.0, 0.0),
                 "l": (0.0, 0.0, 1.0), "mix": (1 / 3, 1 / 3, 1 / 3)}


def supervised_l1_pix(cfg: GadConfig, decoded, scale_map, batch):
    """Masked per-pixel L1 vs the blended GT map — fused custom-VJP when
    eligible (supervision already at render resolution, default mode),
    generic composition otherwise. Shared by the single-chip, DP and
    gshard-strip loss functions (decoded carries the local render shape,
    3-D (h, w, D) or pre-flattened (h*w, D) — see _supervision_losses)."""
    seg_map = batch["seg_map"]
    lead = decoded.shape[:-1]
    n_px = 1
    for s in lead:
        n_px *= int(s)
    if cfg.fused_supervision and n_px == int(seg_map.shape[0]) * int(
        seg_map.shape[1]
    ):
        return fused_supervision_l1(
            decoded, batch["img_embed"],
            seg_map[..., 1:4].reshape(lead + (3,)), scale_map,
        )
    gt_map, mask = blend_gt_feature_map(batch["img_embed"], seg_map, scale_map)
    maskf = mask.astype(jnp.float32)
    return losses.l1_map(decoded * maskf, gt_map * maskf)


def _scale_map_fn(cfg: GadConfig, scl, scl_params, feat_map):
    """Learned 3-way granularity map, or a fixed one under --single_scale
    (reference create_scale_map, train.py:38-47,146-149). feat_map may be
    (H, W, F) or pre-flattened (H*W, F); the output keeps its leading shape."""
    if cfg.single_scale:
        w = jnp.asarray(_SINGLE_SCALE[cfg.single_scale], jnp.float32)
        return jnp.broadcast_to(w, feat_map.shape[:-1] + (3,))
    return scl.apply(scl_params, jax.lax.stop_gradient(feat_map))


def _supervision_losses(cfg: GadConfig, dec, scl, dec_params, scl_params,
                        feat_map, batch):
    """Scale decode → mixed-seg compose → feature decode → L1/entropy/
    region-variance. Shared by the plain and binned train steps.

    Every D-dim tensor runs FLAT (H*W, ·) when the fused supervision path
    is eligible: the r4 battery-8 HLO profile showed the 3-D (360, 640,
    512) intermediates each paying a {2,1,0}->{1,2,0} layout copy
    (1.43 ms, 3 copies = 4.3 ms/step) to reconcile the decoder conv
    fusions' layout choice with the reduction's — 2-D matmul operands
    leave XLA no 3-D layout freedom. Only the tiny (H, W, 3) scale map is
    ever reshaped back to 3-D (mixed_seg_map's k=5 box smooth is spatial).
    Bit-identical math (reshapes only).

    Returns (l1_feature, ent, regvar, scale_px) — scale_px has the same
    leading shape as the pixels ((..., 3)); metrics take channel means.
    """
    hw = tuple(feat_map.shape[:2])
    flat_ok = cfg.fused_supervision and tuple(batch["seg_map"].shape[:2]) == hw
    px = feat_map.reshape(-1, feat_map.shape[-1]) if flat_ok else feat_map
    scale_px = _scale_map_fn(cfg, scl, scl_params, px)  # (..., 3)
    seg_mixed = mixed_seg_map(batch["seg_map"], scale_px.reshape(hw + (3,)))
    decoded = dec.apply(dec_params, px)  # (..., D)
    l1_pix = supervised_l1_pix(cfg, decoded, scale_px, batch)
    l1_feature = losses.region_balanced_l1(l1_pix, seg_mixed, cfg.max_segments)
    ent = losses.scale_entropy_loss(scale_px)
    regvar = losses.region_variance_loss(px, seg_mixed, cfg.max_segments)
    return l1_feature, ent, regvar, scale_px

def make_train_step(statics: Dict[str, Any], width: int, height: int, cfg: GadConfig):
    """Returns jitted step(state, geom, batch, entropy_w, regionvar_w) →
    (state, metrics).

    `geom`: `frozen_geometry(scene)` arrays (runtime args — see that
    docstring). `batch`: dict with viewmat (4,4), K (3,3), img_embed
    (M, clip_dim), seg_map (H, W, 4) int32.
    """
    dec: FeatureDecoder = statics["decoder"]
    scl: ScaleDecoder = statics["scale_decoder"]
    tx_feat, tx_dec, tx_scale = statics["tx_feat"], statics["tx_dec"], statics["tx_scale"]

    bg = jnp.zeros((cfg.feature_dim,), jnp.float32)

    def loss_fn(params, geom, batch, entropy_w, regionvar_w):
        features, dec_params, scl_params = params
        res = rasterize(
            geom["means"], geom["quats"], geom["scales"], geom["opacities"], features,
            batch["viewmat"], batch["K"], width, height,
            background=bg, config=cfg.raster,
        )
        feat_map = res.image  # (H, W, F)

        l1_feature, ent, regvar, scale_px = _supervision_losses(
            cfg, dec, scl, dec_params, scl_params, feat_map, batch
        )

        total = l1_feature + entropy_w * ent + regionvar_w * regvar
        metrics = dict(
            loss=total,
            l1_feature=l1_feature,
            entropy=ent,
            region_var=regvar,
            scale_mean_s=jnp.mean(scale_px[..., 0]),
            scale_mean_m=jnp.mean(scale_px[..., 1]),
            scale_mean_l=jnp.mean(scale_px[..., 2]),
            overflow=res.overflow,
        )
        return total, metrics

    @jax.jit
    def step(state: TrainState, geom, batch, entropy_w, regionvar_w):
        params = (state.features, state.decoder_params, state.scale_params)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            params, geom, batch, entropy_w, regionvar_w
        )
        g_feat, g_dec, g_scale = grads
        up_f, opt_feat = tx_feat.update(g_feat, state.opt_feat, state.features)
        up_d, opt_dec = tx_dec.update(g_dec, state.opt_dec, state.decoder_params)
        up_s, opt_scale = tx_scale.update(g_scale, state.opt_scale, state.scale_params)
        new_state = TrainState(
            step=state.step + 1,
            features=optax.apply_updates(state.features, up_f),
            decoder_params=optax.apply_updates(state.decoder_params, up_d),
            scale_params=optax.apply_updates(state.scale_params, up_s),
            opt_feat=opt_feat,
            opt_dec=opt_dec,
            opt_scale=opt_scale,
        )
        return new_state, metrics

    return step


def make_train_step_binned(statics: Dict[str, Any], width: int, height: int, cfg: GadConfig):
    """Train step over a precomputed per-camera binning (sorted instance
    list in the batch).

    Geometry is frozen in GAD, so the sort-dominated binning for a given
    camera never changes across the 30k iterations — the loader caches it
    once per camera; this step only re-projects (cheap), gathers and
    blends. The reference pays the full CUDA projection/sort every
    iteration. Extra batch keys: inst_gid (M,) depth ranks, tile_starts,
    tile_counts, order (N,) — all from the cached BinnedInstances.
    """
    dec: FeatureDecoder = statics["decoder"]
    scl: ScaleDecoder = statics["scale_decoder"]
    tx_feat, tx_dec, tx_scale = statics["tx_feat"], statics["tx_dec"], statics["tx_scale"]
    bg = jnp.zeros((cfg.feature_dim,), jnp.float32)

    def loss_fn(params, geom, batch, entropy_w, regionvar_w):
        features, dec_params, scl_params = params
        feat_map, _alpha = rasterize_binned(
            geom["means"], geom["quats"], geom["scales"], geom["opacities"],
            features, batch["viewmat"], batch["K"],
            batch["inst_gid"], batch["tile_starts"], batch["tile_counts"],
            width, height, background=bg, config=cfg.raster,
            order=batch["order"], red_slot=batch["red_slot"],
            red_rank=batch["red_rank"], red_block=batch["red_block"],
        )
        l1_feature, ent, regvar, scale_px = _supervision_losses(
            cfg, dec, scl, dec_params, scl_params, feat_map, batch
        )
        total = l1_feature + entropy_w * ent + regionvar_w * regvar
        metrics = dict(
            loss=total,
            l1_feature=l1_feature,
            entropy=ent,
            region_var=regvar,
            scale_mean_s=jnp.mean(scale_px[..., 0]),
            scale_mean_m=jnp.mean(scale_px[..., 1]),
            scale_mean_l=jnp.mean(scale_px[..., 2]),
            overflow=jnp.zeros((), jnp.int32),  # checked at cache build
        )
        return total, metrics

    @jax.jit
    def step(state: TrainState, geom, batch, entropy_w, regionvar_w):
        params = (state.features, state.decoder_params, state.scale_params)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            params, geom, batch, entropy_w, regionvar_w
        )
        g_feat, g_dec, g_scale = grads
        up_f, opt_feat = tx_feat.update(g_feat, state.opt_feat, state.features)
        up_d, opt_dec = tx_dec.update(g_dec, state.opt_dec, state.decoder_params)
        up_s, opt_scale = tx_scale.update(g_scale, state.opt_scale, state.scale_params)
        new_state = TrainState(
            step=state.step + 1,
            features=optax.apply_updates(state.features, up_f),
            decoder_params=optax.apply_updates(state.decoder_params, up_d),
            scale_params=optax.apply_updates(state.scale_params, up_s),
            opt_feat=opt_feat,
            opt_dec=opt_dec,
            opt_scale=opt_scale,
        )
        return new_state, metrics

    return step


def make_eval_step(statics: Dict[str, Any], width: int, height: int, cfg: GadConfig):
    """Held-out evaluation: the train losses WITHOUT grads, plus the scale
    map for visualisation.

    Counterpart of the reference's `training_report`
    (`/root/reference/train.py:244-286`), which logs train-side scalars and
    scale-map images at test iterations; we additionally run the same loss
    pipeline on held-out cameras (batch comes from a test-camera GadDataset).
    """
    dec: FeatureDecoder = statics["decoder"]
    scl: ScaleDecoder = statics["scale_decoder"]
    bg = jnp.zeros((cfg.feature_dim,), jnp.float32)
    # no gradients here: the unaligned forward layout skips the SAT/dummy
    # binning passes and the gradient ReductionLayout (~1/3 of binning)
    raster_fwd = dataclasses.replace(cfg.raster, aligned=False)

    @jax.jit
    def eval_step(state: TrainState, geom, batch):
        res = rasterize(
            geom["means"], geom["quats"], geom["scales"], geom["opacities"],
            state.features, batch["viewmat"], batch["K"], width, height,
            background=bg, config=raster_fwd,
        )
        feat_map = res.image
        scale_map = _scale_map_fn(cfg, scl, state.scale_params, feat_map)
        seg_mixed = mixed_seg_map(batch["seg_map"], scale_map)
        gt_map, mask = blend_gt_feature_map(
            batch["img_embed"], batch["seg_map"], scale_map
        )
        maskf = mask.astype(jnp.float32)
        decoded = dec.apply(state.decoder_params, feat_map)
        l1_pix = losses.l1_map(decoded * maskf, gt_map * maskf)
        l1_feature = losses.region_balanced_l1(l1_pix, seg_mixed, cfg.max_segments)
        metrics = dict(
            l1_feature=l1_feature,
            l1_pixel_mean=jnp.sum(l1_pix * maskf[..., 0]) / jnp.maximum(jnp.sum(maskf), 1.0),
            region_var=losses.region_variance_loss(feat_map, seg_mixed, cfg.max_segments),
        )
        return metrics, scale_map

    return eval_step


def render_feature_map(statics, geometry: GaussianScene, state: TrainState, viewmat, K, width, height, cfg: GadConfig, decode: bool = False):
    """Inference helper: render the 16-dim map (optionally decode to CLIP)."""
    res = rasterize(
        geometry.means, geometry.quats, geometry.scales, geometry.opacities,
        state.features, viewmat, K, width, height,
        background=jnp.zeros((cfg.feature_dim,), jnp.float32),
        config=dataclasses.replace(cfg.raster, aligned=False),  # forward-only
    )
    if not decode:
        return res.image
    return statics["decoder"].apply(state.decoder_params, res.image)
