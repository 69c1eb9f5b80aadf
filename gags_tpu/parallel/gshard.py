"""Gaussian-axis sharding + tile-space (image-strip) rasterization.

For scenes too large to replicate per chip (SURVEY.md §2.3(b): Mip-NeRF360
scale, ~1M+ Gaussians at 1080p — BASELINE config 4), the scene parameters
are sharded over the mesh's Gaussian axis while rasterization is sharded
over *tile rows* of the image:

  1. each device projects its own Gaussian shard (N/D work);
  2. the per-Gaussian screen-space table (geometry rows, bin info, colour
     rows) is all-gathered over ICI — O(N·(12+C)) floats, one collective;
  3. each device bins + blends ONLY its strip of tile rows (T/D tiles),
     reusing the exact single-chip kernels on y-shifted coordinates;
  4. the output image comes back sharded by rows; feature gradients flow
     through the all-gather, whose transpose is a psum_scatter — each
     device ends up with the exact gradient of its own feature shard.

This replaces the reference's single-GPU assumption (`train.py:51-52` CPU
staging); there is no reference counterpart. The per-strip region losses
are made exact with psum'd segment moments (losses.py `axis_name`).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gags_tpu.gad import losses
from gags_tpu.gad.train import supervised_l1_pix
from gags_tpu.gad.train import GadConfig, TrainState
from gags_tpu.splat import tiles
from gags_tpu.splat.projection import effective_opacity, project_gaussians
from gags_tpu.splat.rasterizer import (
    RasterizeConfig,
    _blend,
    _image_epilogue,
    fast_gather_rows,
    order_ext,
    permute_rows,
)
from gags_tpu.utils.image import mean_smooth


def pad_to_multiple(x: jnp.ndarray, mult: int, axis: int = 0) -> jnp.ndarray:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def shard_gaussians(
    geom: Dict[str, jnp.ndarray], features: jnp.ndarray, mesh: Mesh,
    axis: str | None = None,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Pad N to a mesh multiple and device_put everything sharded on axis 0.

    Adds a `valid` (N_pad,) float mask: padding Gaussians are force-culled
    (radii zeroed) so they never produce instances. `axis` names the mesh
    axis carrying the Gaussian shard (default: the mesh's first axis; pass
    "gs" on the 2-D dp x gs mesh).
    """
    axis = axis or mesh.axis_names[0]
    d = mesh.shape[axis]
    n = geom["means"].shape[0]
    out = {k: pad_to_multiple(v, d) for k, v in geom.items()}
    out["valid"] = (jnp.arange(out["means"].shape[0]) < n).astype(jnp.float32)
    feats = pad_to_multiple(features, d)
    sh = NamedSharding(mesh, P(axis))
    out = {k: jax.device_put(v, sh) for k, v in out.items()}
    return out, jax.device_put(feats, sh)


def _strip_geometry(cfg: RasterizeConfig, height: int, n_dev: int) -> Tuple[int, int]:
    """(tiles_y per device, padded strip height)."""
    tiles_y = -(-height // cfg.tile_h)
    tiles_y_local = -(-tiles_y // n_dev)
    return tiles_y_local, tiles_y_local * cfg.tile_h


def _render_strip(
    axis: str,
    geom_l: Dict[str, jnp.ndarray],
    feats_l: jnp.ndarray,
    viewmat: jnp.ndarray,
    K: jnp.ndarray,
    width: int,
    height: int,
    cfg: RasterizeConfig,
    background: jnp.ndarray | None,
    budget_slack: float = 2.0,
):
    """Per-device body: project local shard, all-gather, bin+blend own strip.

    Returns (strip image (strip_h, W, C), strip alpha (strip_h, W), overflow).
    Differentiable wrt feats_l (through the gather collective).
    """
    # strips are concatenated along H by the caller, which expects
    # (strip_h, W, C) pieces — the layout flags that change call/return
    # shapes do not apply here (fail BEFORE the blend is traced)
    assert not cfg.image_chw, "image_chw is unsupported on the gshard path"
    assert not cfg.soa_geom, "soa_geom is unsupported on the gshard path"
    n_dev = jax.lax.axis_size(axis)
    d = jax.lax.axis_index(axis)
    tiles_y_local, strip_h = _strip_geometry(cfg, height, n_dev)
    tiles_x = -(-width // cfg.tile_w)
    h_pad = strip_h * n_dev

    proj = project_gaussians(
        geom_l["means"], geom_l["quats"], geom_l["scales"], viewmat, K, width, h_pad,
        opacities=geom_l["opacities"] if cfg.opacity_extents else None,
    )
    rx = (proj.radii_x.astype(jnp.float32) * geom_l["valid"]).astype(jnp.int32)
    ry = (proj.radii_y.astype(jnp.float32) * geom_l["valid"]).astype(jnp.int32)
    opac = effective_opacity(geom_l["opacities"], proj.compensations)
    n_l = geom_l["means"].shape[0]
    # [mx, my, ca, cb, cc, opac, rx, ry, depth] — geometry rows + bin info
    # (rx/ry: the tight anisotropic 3-sigma bbox half-extents)
    local_rows = jnp.concatenate(
        [
            proj.means2d,
            proj.conics,
            opac[:, None],
            rx.astype(jnp.float32)[:, None],
            ry.astype(jnp.float32)[:, None],
            proj.depths[:, None],
        ],
        axis=1,
    )  # (n_l, 9)
    rows = jax.lax.all_gather(local_rows, axis, tiled=True)  # (N, 9)
    colors = jax.lax.all_gather(feats_l, axis, tiled=True)  # (N, C) — differentiable

    y_off = (d * strip_h).astype(jnp.float32)
    m2 = rows[:, :2] - jnp.stack([jnp.float32(0.0), y_off])
    n = rows.shape[0]
    binned = tiles.bin_gaussians(
        m2,
        rows[:, 6].astype(jnp.int32),
        rows[:, 8],
        width,
        strip_h,
        cfg.tile_w,
        cfg.tile_h,
        radii_y=rows[:, 7].astype(jnp.int32),
        # instances skew across strips; slack covers imbalance without
        # paying the full replicated budget per device
        budget=max(int(cfg.instance_budget(n) * budget_slack) // n_dev, 4 * cfg.chunk),
        chunk=cfg.chunk,
        aligned=cfg.aligned,
        interpret=cfg.interpret,
        # forward-only strips (make_gshard_render) take the unaligned fast
        # path incl. the exact ellipse-tile cull; rows[:, 5] is already the
        # effective (compensation-folded) opacity
        cull_rows=jnp.concatenate(
            [m2, rows[:, 2:5],
             jnp.log(255.0 * jnp.maximum(rows[:, 5:6], 1e-12))], axis=1
        ) if (cfg.tile_cull and not cfg.aligned) else None,
        fused_keys=cfg.fused_keys,
    )
    # geometry table in strip coordinates, with the zero sentinel row;
    # binned.inst_gid holds depth ranks → permute tables to rank order
    geom_rows = jnp.concatenate(
        [m2, rows[:, 2:6], jnp.zeros((n, 2), jnp.float32)], axis=1
    )
    geom_table = jnp.pad(geom_rows, ((0, 1), (0, 0)))
    inv_order = jnp.argsort(binned.order).astype(jnp.int32)
    bg = background if background is not None else jnp.zeros(
        (colors.shape[1],), jnp.float32
    )
    if binned.red is not None:
        red = binned.red
    else:  # unaligned forward-only strips carry no reduction layout
        red = tiles.ReductionLayout(
            slot_to_pos=jnp.zeros((128,), jnp.int32),
            slot_rank=jnp.full((128,), -1, jnp.int32),
            chunk_block=jnp.zeros((1,), jnp.int32),
        )
    tile_img, tile_alpha = _blend(
        permute_rows(colors, binned.order, inv_order),
        fast_gather_rows(geom_table, order_ext(binned.order)),
        binned.inst_gid,
        binned.tile_starts,
        binned.tile_counts,
        red.slot_to_pos,
        red.slot_rank,
        red.chunk_block,
        bg,
        (tiles_x, tiles_y_local),
        cfg,
    )
    to_img, to_alpha = _image_epilogue(cfg)
    img = to_img(
        tile_img, tiles_x, tiles_y_local, cfg.tile_h, cfg.tile_w, strip_h, width
    )
    alpha = to_alpha(
        tile_alpha, tiles_x, tiles_y_local, cfg.tile_h, cfg.tile_w, strip_h, width
    )
    return img, alpha, binned.overflow


def make_gshard_render(
    mesh: Mesh,
    width: int,
    height: int,
    channels: int,
    cfg: RasterizeConfig,
    budget_slack: float = 2.0,
):
    """Jitted render over Gaussian-sharded inputs.

    fn(geom_sharded, features_sharded, viewmat, K) → (image (H, W, C),
    alpha (H, W), overflow ()). geom/features from `shard_gaussians`.

    Forward-only, so the strips render through the unaligned fast path
    (streaming kernel, no SAT/dummy binning, ellipse-tile cull) whatever
    the caller's training config says.
    """
    import dataclasses

    cfg = dataclasses.replace(cfg, aligned=False)
    axis = mesh.axis_names[0]
    bg = jnp.zeros((channels,), jnp.float32)

    def per_device(geom_l, feats_l, viewmat, K):
        img, alpha, ovf = _render_strip(
            axis, geom_l, feats_l, viewmat, K, width, height, cfg, bg,
            budget_slack=budget_slack,
        )
        return img, alpha, jax.lax.pmax(ovf, axis)

    fn = jax.jit(
        jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P()),
            out_specs=(P(axis), P(axis), P()),
            check_vma=False,
        )
    )

    def render(geom_s, feats_s, viewmat, K):
        img, alpha, ovf = fn(geom_s, feats_s, viewmat, K)
        return img[:height], alpha[:height], ovf

    return render


class GShardState(NamedTuple):
    """Train state with the feature axis sharded over the mesh."""

    step: jnp.ndarray
    features: jnp.ndarray  # (N_pad, F) sharded on axis 0
    decoder_params: Any  # replicated
    scale_params: Any
    opt_feat: Any  # adam moments sharded like features
    opt_dec: Any
    opt_scale: Any


def gshard_state(
    state: TrainState, mesh: Mesh, axis: str | None = None
) -> GShardState:
    """Re-lay a single-chip TrainState onto the mesh (features sharded
    over `axis`, default the mesh's first; everything else replicated)."""
    axis = axis or mesh.axis_names[0]
    d = mesh.shape[axis]
    sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    feats = jax.device_put(pad_to_multiple(state.features, d), sh)
    opt_feat = jax.tree.map(
        lambda x: jax.device_put(pad_to_multiple(x, d), sh)
        if getattr(x, "ndim", 0) == state.features.ndim and x.shape == state.features.shape
        else jax.device_put(x, rep),
        state.opt_feat,
    )
    putrep = lambda t: jax.tree.map(lambda x: jax.device_put(x, rep), t)
    return GShardState(
        step=state.step,
        features=feats,
        decoder_params=putrep(state.decoder_params),
        scale_params=putrep(state.scale_params),
        opt_feat=opt_feat,
        opt_dec=putrep(state.opt_dec),
        opt_scale=putrep(state.opt_scale),
    )


def _halo_smooth(x: jnp.ndarray, k: int, axis: str) -> jnp.ndarray:
    """mean_smooth over row strips with a ppermute halo exchange, exactly
    matching the full-image zero-padded box filter at strip interiors AND
    true image borders."""
    halo = k // 2
    n_dev = jax.lax.axis_size(axis)
    down = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    up = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    top_halo = jax.lax.ppermute(x[-halo:], axis, down)  # comes from device above
    bot_halo = jax.lax.ppermute(x[:halo], axis, up)  # from device below
    idx = jax.lax.axis_index(axis)
    top_halo = jnp.where(idx == 0, jnp.zeros_like(top_halo), top_halo)
    bot_halo = jnp.where(idx == n_dev - 1, jnp.zeros_like(bot_halo), bot_halo)
    padded = jnp.concatenate([top_halo, x, bot_halo], axis=0)
    return mean_smooth(padded, k)[halo:-halo]


def _mixed_seg_map_strip(seg_map, scale_map, axis):
    """mixed_seg_map over a row strip (halo-exchanged k=5 smoothing)."""
    sm = _halo_smooth(scale_map, 5, axis)
    sel = jnp.argmax(sm, axis=-1)
    sml = seg_map[..., 1:4]
    return jnp.take_along_axis(sml, sel[..., None], axis=-1)[..., 0]


def _strip_local_loss(
    axis: str,
    statics: Dict[str, Any],
    width: int,
    height: int,
    cfg: GadConfig,
    budget_slack: float,
):
    """Per-device strip loss over the Gaussian/tile-strip axis `axis`:
    exact full-image GAD loss via psum'd region moments + halo'd scale-map
    smoothing (shared by the 1-D gshard step and the 2-D dp x gs step)."""
    dec = statics["decoder"]
    scl = statics["scale_decoder"]
    bg = jnp.zeros((cfg.feature_dim,), jnp.float32)

    def local_loss(params, geom_l, batch, entropy_w, regionvar_w):
        feats_l, dec_params, scl_params = params
        feat_map, _alpha, ovf = _render_strip(
            axis, geom_l, feats_l, batch["viewmat"], batch["K"],
            width, height, cfg.raster, bg, budget_slack=budget_slack,
        )
        # flat-pixel strip tail when the fused supervision path is
        # eligible (same rationale as gad/train._supervision_losses: 2-D
        # operands kill the 3-D layout copies; bit-identical). The strip
        # smoothing (_mixed_seg_map_strip) still needs the 3-D scale map.
        hw_l = tuple(feat_map.shape[:2])
        flat_ok = (
            cfg.fused_supervision
            and tuple(batch["seg_map"].shape[:2]) == hw_l
        )
        px = feat_map.reshape(-1, feat_map.shape[-1]) if flat_ok else feat_map
        scale_px = scl.apply(scl_params, jax.lax.stop_gradient(px))
        scale_map = scale_px.reshape(hw_l + (3,))
        seg_mixed = _mixed_seg_map_strip(batch["seg_map"], scale_map, axis)
        decoded = dec.apply(dec_params, px)
        l1_pix = supervised_l1_pix(cfg, decoded, scale_px, batch)
        l1_feature = losses.region_balanced_l1(
            l1_pix, seg_mixed, cfg.max_segments, axis_name=axis
        )
        ent = jax.lax.pmean(losses.scale_entropy_loss(scale_px), axis)
        regvar = losses.region_variance_loss(
            px, seg_mixed, cfg.max_segments, axis_name=axis
        )
        loss = l1_feature + entropy_w * ent + regionvar_w * regvar
        return loss, ovf

    return local_loss


def make_gshard_train_step(
    mesh: Mesh,
    statics: Dict[str, Any],
    width: int,
    height: int,
    cfg: GadConfig,
    state_template: GShardState,
    budget_slack: float = 2.0,
):
    """Jitted GAD step with Gaussian-sharded features + strip rasterization.

    batch: viewmat (4,4), K (3,3), img_embed (M, D) — replicated;
    seg_map (H_pad, W, 4) int32 — sharded by rows (H_pad = n_dev * strip_h,
    see `pad_seg_map`). Supervision must be at render resolution (the
    strip-local GT gather cannot resize across strips).

    The loss is the exact full-image loss (psum'd region moments, halo'd
    scale-map smoothing); decoder grads are psum'd; feature grads arrive
    pre-sharded through the all-gather transpose.

    Returns fn(state, geom, batch, entropy_w, regionvar_w) ->
    (new_state, loss, overflow) — overflow is the worst strip's dropped
    instance count; a non-zero value means gradients were computed from a
    truncated instance list and the step should be retried with a larger
    `budget_slack`.
    """
    axis = mesh.axis_names[0]
    tx_feat, tx_dec, tx_scale = statics["tx_feat"], statics["tx_dec"], statics["tx_scale"]
    local_loss = _strip_local_loss(
        axis, statics, width, height, cfg, budget_slack
    )

    def per_device(state: GShardState, geom_l, batch, entropy_w, regionvar_w):
        params = (state.features, state.decoder_params, state.scale_params)
        (loss, ovf), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params, geom_l, batch, entropy_w, regionvar_w
        )
        # a skewed camera can overflow one strip's heuristic budget and
        # silently drop instances — surface it so callers can re-bin with a
        # larger budget_slack (single-chip path: cli/train_gad.py overflow
        # check); pmax because the worst strip is the binding one
        ovf = jax.lax.pmax(ovf, axis)
        g_feat, g_dec, g_scale = grads
        # feature grads are already exact per-shard (all_gather transpose);
        # replicated decoder grads need the cross-strip sum
        g_dec = jax.lax.psum(g_dec, axis)
        g_scale = jax.lax.psum(g_scale, axis)
        up_f, opt_feat = tx_feat.update(g_feat, state.opt_feat, state.features)
        up_d, opt_dec = tx_dec.update(g_dec, state.opt_dec, state.decoder_params)
        up_s, opt_scale = tx_scale.update(g_scale, state.opt_scale, state.scale_params)
        new_state = GShardState(
            step=state.step + 1,
            features=optax.apply_updates(state.features, up_f),
            decoder_params=optax.apply_updates(state.decoder_params, up_d),
            scale_params=optax.apply_updates(state.scale_params, up_s),
            opt_feat=opt_feat,
            opt_dec=opt_dec,
            opt_scale=opt_scale,
        )
        return new_state, loss, ovf

    shard = lambda x: P(axis) if (
        getattr(x, "ndim", 0) == state_template.features.ndim
        and x.shape == state_template.features.shape
    ) else P()
    state_spec = GShardState(
        step=P(),
        features=P(axis),
        decoder_params=jax.tree.map(lambda _: P(), state_template.decoder_params),
        scale_params=jax.tree.map(lambda _: P(), state_template.scale_params),
        opt_feat=jax.tree.map(shard, state_template.opt_feat),
        opt_dec=jax.tree.map(lambda _: P(), state_template.opt_dec),
        opt_scale=jax.tree.map(lambda _: P(), state_template.opt_scale),
    )
    geom_spec = P(axis)
    batch_spec = dict(viewmat=P(), K=P(), img_embed=P(), seg_map=P(axis))
    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(state_spec, geom_spec, batch_spec, P(), P()),
        out_specs=(state_spec, P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def make_dp_gshard_train_step(
    mesh: Mesh,
    statics: Dict[str, Any],
    width: int,
    height: int,
    cfg: GadConfig,
    state_template: GShardState,
    budget_slack: float = 2.0,
):
    """2-D mesh GAD step: camera batch over mesh axis 0 ("dp"), Gaussian
    shard + tile strips over axis 1 ("gs") — the scaling layout for many-
    camera distillation of scenes too large to replicate (composes SURVEY
    §2.3(a) and §2.3(b); no reference counterpart — the reference is
    single-GPU, `train.py:51-52`).

    Every dp row trains a DIFFERENT camera on the same gs-sharded state:
    feature grads arrive exact per-shard through the all-gather transpose
    and are pmean'd over dp; decoder/scale grads are psum'd over gs (strip
    partition) then pmean'd over dp. All dp rows therefore apply the
    identical update and the state stays dp-replicated — the same
    camera-mean semantics as `make_dp_train_step`.

    batch leaves carry a leading camera axis of size mesh.shape["dp"]:
    viewmat (B,4,4), K (B,3,3), img_embed (B,M,D) sharded over dp;
    seg_map (B, H_pad, W, 4) sharded over (dp, gs) — rows padded per
    camera with `pad_seg_map(..., axis="gs")`.

    Returns fn(state, geom_l, batch, entropy_w, regionvar_w) ->
    (new_state, mean_loss, overflow); overflow is the worst strip of any
    camera (pmax over both axes).
    """
    dp_ax, gs_ax = mesh.axis_names
    tx_feat, tx_dec, tx_scale = statics["tx_feat"], statics["tx_dec"], statics["tx_scale"]
    local_loss = _strip_local_loss(
        gs_ax, statics, width, height, cfg, budget_slack
    )

    def per_device(state: GShardState, geom_l, batch, entropy_w, regionvar_w):
        params = (state.features, state.decoder_params, state.scale_params)
        cam = {k: v[0] for k, v in batch.items()}  # one camera per dp row
        (loss, ovf), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params, geom_l, cam, entropy_w, regionvar_w
        )
        ovf = jax.lax.pmax(ovf, (dp_ax, gs_ax))
        g_feat, g_dec, g_scale = grads
        # features: exact per-gs-shard via the all-gather transpose; the
        # camera mean rides the dp axis. decoder/scale: replicated params
        # need the cross-strip sum first, then the camera mean.
        g_feat = jax.lax.pmean(g_feat, dp_ax)
        g_dec = jax.lax.pmean(jax.lax.psum(g_dec, gs_ax), dp_ax)
        g_scale = jax.lax.pmean(jax.lax.psum(g_scale, gs_ax), dp_ax)
        loss = jax.lax.pmean(loss, dp_ax)
        up_f, opt_feat = tx_feat.update(g_feat, state.opt_feat, state.features)
        up_d, opt_dec = tx_dec.update(g_dec, state.opt_dec, state.decoder_params)
        up_s, opt_scale = tx_scale.update(g_scale, state.opt_scale, state.scale_params)
        new_state = GShardState(
            step=state.step + 1,
            features=optax.apply_updates(state.features, up_f),
            decoder_params=optax.apply_updates(state.decoder_params, up_d),
            scale_params=optax.apply_updates(state.scale_params, up_s),
            opt_feat=opt_feat,
            opt_dec=opt_dec,
            opt_scale=opt_scale,
        )
        return new_state, loss, ovf

    shard = lambda x: P(gs_ax) if (
        getattr(x, "ndim", 0) == state_template.features.ndim
        and x.shape == state_template.features.shape
    ) else P()
    state_spec = GShardState(
        step=P(),
        features=P(gs_ax),
        decoder_params=jax.tree.map(lambda _: P(), state_template.decoder_params),
        scale_params=jax.tree.map(lambda _: P(), state_template.scale_params),
        opt_feat=jax.tree.map(shard, state_template.opt_feat),
        opt_dec=jax.tree.map(lambda _: P(), state_template.opt_dec),
        opt_scale=jax.tree.map(lambda _: P(), state_template.opt_scale),
    )
    batch_spec = dict(
        viewmat=P(dp_ax), K=P(dp_ax), img_embed=P(dp_ax),
        seg_map=P(dp_ax, gs_ax),
    )
    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(state_spec, P(gs_ax), batch_spec, P(), P()),
        out_specs=(state_spec, P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def pad_seg_map(
    seg_map: np.ndarray, mesh: Mesh, cfg: RasterizeConfig,
    axis: str | None = None,
) -> np.ndarray:
    """Pad (H, W, 4) seg map rows to n_dev * strip_h with -1 (no mask)."""
    n_dev = mesh.shape[axis or mesh.axis_names[0]]
    _, strip_h = _strip_geometry(cfg, seg_map.shape[0], n_dev)
    h_pad = strip_h * n_dev
    pad = h_pad - seg_map.shape[0]
    if pad <= 0:
        return seg_map
    return np.pad(seg_map, ((0, pad), (0, 0), (0, 0)), constant_values=-1)
