"""Device-mesh parallelism for GAD training.

The reference is strictly single-process single-GPU (SURVEY.md §2.3: no
torch.distributed / NCCL anywhere) — batch size is one camera per step.
Here multi-chip scaling is a first-class design: a 1-D `dp` mesh shards a
*batch of cameras* across chips with `shard_map`; Gaussian parameters and
decoder weights are replicated, and gradients are `psum`-averaged over ICI
before three identical Adam updates — so an 8-chip step is mathematically a
batch-8 step (a strict generalisation of the reference's batch-1 SGD).

Gaussian-axis sharding (for scenes too large to replicate) and tile-space
sharding (for >1080p renders) are the planned extensions; the KNN module is
already embarrassingly row-shardable.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gags_tpu.gad.train import GadConfig, TrainState
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.splat.rasterizer import rasterize, rasterize_binned
from gags_tpu.gad.train import _supervision_losses


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh2d(
    n_dp: int, n_gs: int, axes: tuple[str, str] = ("dp", "gs")
) -> Mesh:
    """(n_dp, n_gs) mesh: camera batch over `dp`, Gaussian shard + tile
    strips over `gs` (see gshard.make_dp_gshard_train_step). On real
    hardware lay `gs` along the faster ICI dimension — its all-gather of
    the per-Gaussian screen table is the big per-step collective; the dp
    pmean is one small decoder-gradient reduction."""
    devs = np.array(jax.devices()[: n_dp * n_gs]).reshape(n_dp, n_gs)
    return Mesh(devs, axes)


def make_dp_train_step(
    mesh: Mesh,
    statics: Dict[str, Any],
    width: int,
    height: int,
    cfg: GadConfig,
    binned: bool = False,
):
    """Jitted data-parallel step over a camera batch of size mesh.size.

    step(state, geom, batch, ew, rw): geom = frozen_geometry(scene)
    (replicated runtime args — never closed over, see gad/train.py);
    batch arrays: viewmat (B,4,4), K (B,3,3), img_embed (B,M,D),
    seg_map (B,H,W,4) — leading axis sharded over `dp`.

    With `binned=True` the batch additionally carries each camera's cached
    binning (inst_gid (B,M'), tile_starts/tile_counts (B,T), order (B,N))
    and the step skips the per-iteration sort — the same fast path as the
    single-chip `make_train_step_binned` (an 8-chip step would otherwise
    pay the sort every iteration that the 1-chip path amortises away).
    """
    dec = statics["decoder"]
    scl = statics["scale_decoder"]
    tx_feat, tx_dec, tx_scale = statics["tx_feat"], statics["tx_dec"], statics["tx_scale"]

    bg = jnp.zeros((cfg.feature_dim,), jnp.float32)
    axis = mesh.axis_names[0]

    def local_loss(params, geom, batch, entropy_w, regionvar_w):
        features, dec_params, scl_params = params
        if binned:
            feat_map, _alpha = rasterize_binned(
                geom["means"], geom["quats"], geom["scales"], geom["opacities"],
                features, batch["viewmat"], batch["K"],
                batch["inst_gid"], batch["tile_starts"], batch["tile_counts"],
                width, height, background=bg, config=cfg.raster,
                order=batch["order"], red_slot=batch["red_slot"],
                red_rank=batch["red_rank"], red_block=batch["red_block"],
            )
        else:
            res = rasterize(
                geom["means"], geom["quats"], geom["scales"], geom["opacities"],
                features, batch["viewmat"], batch["K"], width, height,
                background=bg, config=cfg.raster,
            )
            feat_map = res.image
        # shared flat-pixel supervision tail (gad/train._supervision_losses:
        # 2-D operands leave XLA no 3-D layout freedom — bit-identical)
        l1_feature, ent, regvar, _ = _supervision_losses(
            cfg, dec, scl, dec_params, scl_params, feat_map, batch
        )
        return l1_feature + entropy_w * ent + regionvar_w * regvar

    def per_device(state: TrainState, geom, batch, entropy_w, regionvar_w):
        params = (state.features, state.decoder_params, state.scale_params)
        b_local = batch["viewmat"].shape[0]
        if b_local == 1:
            loss, grads = jax.value_and_grad(local_loss)(
                params, geom, {k: v[0] for k, v in batch.items()},
                entropy_w, regionvar_w,
            )
        else:
            # per-device camera batch > 1: sequential gradient accumulation
            # (lax.scan keeps memory at one camera's activations) — the
            # result is the exact mean over all mesh.size * b_local cameras
            def scan_body(carry, cam):
                acc_loss, acc_grads = carry
                loss_i, grads_i = jax.value_and_grad(local_loss)(
                    params, geom, cam, entropy_w, regionvar_w
                )
                return (
                    acc_loss + loss_i,
                    jax.tree.map(jnp.add, acc_grads, grads_i),
                ), None

            zeros = jax.tree.map(jnp.zeros_like, params)
            (sum_loss, sum_grads), _ = jax.lax.scan(
                scan_body, (jnp.zeros(()), zeros), batch
            )
            loss = sum_loss / b_local
            grads = jax.tree.map(lambda g: g / b_local, sum_grads)
        # mean over the camera batch rides ICI
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        g_feat, g_dec, g_scale = grads
        up_f, opt_feat = tx_feat.update(g_feat, state.opt_feat, state.features)
        up_d, opt_dec = tx_dec.update(g_dec, state.opt_dec, state.decoder_params)
        up_s, opt_scale = tx_scale.update(g_scale, state.opt_scale, state.scale_params)
        import optax

        new_state = TrainState(
            step=state.step + 1,
            features=optax.apply_updates(state.features, up_f),
            decoder_params=optax.apply_updates(state.decoder_params, up_d),
            scale_params=optax.apply_updates(state.scale_params, up_s),
            opt_feat=opt_feat,
            opt_dec=opt_dec,
            opt_scale=opt_scale,
        )
        return new_state, loss

    batch_spec = dict(
        viewmat=P(mesh.axis_names[0]),
        K=P(mesh.axis_names[0]),
        img_embed=P(mesh.axis_names[0]),
        seg_map=P(mesh.axis_names[0]),
    )
    if binned:
        batch_spec.update(
            inst_gid=P(mesh.axis_names[0]),
            tile_starts=P(mesh.axis_names[0]),
            tile_counts=P(mesh.axis_names[0]),
            order=P(mesh.axis_names[0]),
            red_slot=P(mesh.axis_names[0]),
            red_rank=P(mesh.axis_names[0]),
            red_block=P(mesh.axis_names[0]),
        )
    shard_fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), batch_spec, P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_fn)


def make_dp_render(mesh: Mesh, width: int, height: int, config):
    """Jitted camera-batch inference rendering over the mesh.

    render(geom, colors, viewmats, Ks, bg) -> (images (B, H, W, C),
    alphas (B, H, W)): B cameras (a multiple of mesh.size) sharded over
    the `dp` axis, geometry/colours replicated, each device scanning its
    local cameras through the unaligned fast rasterizer. The reference
    renders eval/novel-view sweeps strictly sequentially on one GPU
    (render.py:62-98); here a sweep scales linearly over ICI with zero
    inter-chip communication (embarrassingly camera-parallel).

    geom: dict with means/quats/scales/opacities (as frozen_geometry).
    Pass runtime arrays — never close over them (XLA constant-folding).
    """
    axis = mesh.axis_names[0]
    del axis  # camera-parallel: no collectives needed

    def per_device(geom, colors, viewmats, Ks, bg):
        def body(_, cam):
            vm, K = cam
            res = rasterize(
                geom["means"], geom["quats"], geom["scales"],
                geom["opacities"], colors, vm, K, width, height,
                background=bg, config=config,
            )
            return 0, (res.image, res.alpha)

        _, (imgs, alphas) = jax.lax.scan(body, 0, (viewmats, Ks))
        return imgs, alphas

    shard_fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(mesh.axis_names[0]), P(mesh.axis_names[0]), P()),
        out_specs=(P(mesh.axis_names[0]), P(mesh.axis_names[0])),
        check_vma=False,
    )
    return jax.jit(shard_fn)
