"""GAD distillation CLI — counterpart of the reference `train.py` driver.

Usage:
  python -m gags_tpu.cli.train_gad -s <scene_dir> -m <model_dir> \
      --ply <pretrained point_cloud.ply> [-r 2] [--iterations 30000]

The scene dir must contain a COLMAP reconstruction plus
`language_features/<img>_{f,s}.npy` from the GAS stage; geometry comes from
a pretrained RGB 3DGS checkpoint (PLY). Checkpoints at {15000, 30000} as
orbax trees plus reference-compatible PLY snapshots.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from gags_tpu.gad.checkpoints import (
    export_ply,
    latest_checkpoint_step,
    load_checkpoint,
    save_checkpoint,
)
from gags_tpu.gad.data import GadDataset, prefetch_to_device
from gags_tpu.gad.train import (
    GadConfig,
    TrainState,
    create_train_state,
    frozen_geometry,
    loss_weights,
    make_eval_step,
    make_train_step,
    make_train_step_binned,
)
from gags_tpu.scene.dataset import detect_and_load
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.utils.config import save_config
from gags_tpu.utils.logging import EmaProgress, MetricsWriter


@dataclasses.dataclass(frozen=True)
class RunConfig:
    source_path: str = ""
    model_path: str = ""
    ply_path: str = ""
    resolution: int = 2          # GAD.sh runs -r 2
    iterations: int = 30000
    save_iterations: str = "15000,30000"
    test_iterations: str = "7000,30000"  # held-out reporting (reference default)
    seed: int = 0
    eval_split: bool = False     # reference --eval: hold out every 8th camera
    resume: bool = False
    # reference-style warm start: a torch chkpnt<N>.pth (12/13-tuple). A
    # 13-tuple also restores decoder_chkpnt<N>/scale_decoder_chkpnt<N>.pth
    # when present beside it and resumes at iteration N (train.py:81-94)
    start_checkpoint: str = ""
    profile: bool = False        # capture a jax.profiler trace of steps 50-60
    # SIBR remote viewer (reference network_gui). The CLI defaults to the
    # reference's port 6009; programmatic runs (tests) default off.
    viewer_port: int = -1
    # camera-data-parallel training over N devices (parallel/sharding.py
    # make_dp_train_step, binned fast path): each iteration consumes N
    # cameras (exact mean-gradient semantics; per-camera binnings are
    # re-prepared at a uniform budget so batches stack). 1 = single chip.
    devices: int = 1
    # on-device A/B of equivalent train-step variants at startup
    # (gad/autotune.py); single-device runs only
    autotune_train: bool = False


def _make_viewer(geometry, rc: "RunConfig", total_iterations: int):
    """SIBR remote-viewer bridge serving RGB renders of the frozen geometry
    (reference train.py:109-123; GAD trains features only, so the RGB view
    is the pretrained scene). Returns None when disabled/unavailable."""
    if rc.viewer_port is None or rc.viewer_port <= 0:
        return None
    from gags_tpu.utils.viewer import TrainingViewer, ViewerServer

    try:
        server = ViewerServer(port=rc.viewer_port)
    except OSError as e:
        print(f"viewer: port {rc.viewer_port} unavailable ({e}); disabled")
        return None

    import functools

    from gags_tpu.core.camera import intrinsics_from_fov
    from gags_tpu.core.sh import sh_colors
    from gags_tpu.splat.rasterizer import auto_config, rasterize

    @functools.lru_cache(maxsize=4)
    def _render_at(w, h):
        cfg = auto_config(aligned=False)

        def f(means, quats, scales, opac, sh, viewmat, K, smod):
            campos = -viewmat[:3, :3].T @ viewmat[:3, 3]
            colors = sh_colors(3, sh, means, campos)
            res = rasterize(
                means, quats, scales * smod, opac, colors, viewmat, K, w, h,
                background=jnp.zeros((3,), jnp.float32), config=cfg,
            )
            return jnp.clip(res.image, 0.0, 1.0)

        return jax.jit(f)

    def render_rgb(req):
        K = jnp.asarray(
            intrinsics_from_fov(req.fovx, req.fovy, req.width, req.height),
            jnp.float32,
        )
        img = _render_at(req.width, req.height)(
            geometry.means, geometry.quats, geometry.scales, geometry.opacities,
            geometry.sh, jnp.asarray(req.viewmat), K, jnp.float32(req.scaling_modifier),
        )
        return np.asarray(img)

    print(f"viewer listening on port {rc.viewer_port}")
    return TrainingViewer(server, render_rgb, rc.source_path)


def run(rc: RunConfig, gad_cfg: GadConfig = None) -> TrainState:
    if gad_cfg is None:
        from gags_tpu.splat.rasterizer import auto_config

        gad_cfg = GadConfig(raster=auto_config())
    os.makedirs(rc.model_path, exist_ok=True)
    save_config(rc, rc.model_path)
    gad_cfg.save(rc.model_path)

    scene_info = detect_and_load(rc.source_path, eval_split=rc.eval_split)
    # model dir carries the camera set (reference scene/__init__.py:51-63)
    import json
    from gags_tpu.scene.dataset import camera_to_json

    with open(os.path.join(rc.model_path, "cameras.json"), "w") as f:
        json.dump(
            [camera_to_json(i, ci) for i, ci in enumerate(scene_info.train_cameras)], f
        )
    if not rc.start_checkpoint and not rc.ply_path:
        raise SystemExit("one of --ply / --start_checkpoint is required")
    torch_start_iter = 0
    if rc.start_checkpoint:
        from gags_tpu.gad.interop import load_reference_checkpoint

        geometry, torch_start_iter, _feats = load_reference_checkpoint(
            rc.start_checkpoint
        )
        print(f"torch checkpoint {rc.start_checkpoint}: "
              f"iteration {torch_start_iter}")
    else:
        geometry = GaussianScene.from_ply(rc.ply_path)
    print(f"{geometry.num_gaussians} gaussians; {len(scene_info.train_cameras)} train cams")

    dataset = GadDataset(scene_info.train_cameras, resolution=rc.resolution)
    print(f"render {dataset.width}x{dataset.height}, max {dataset.max_masks} masks")

    state, statics = create_train_state(geometry, jax.random.PRNGKey(rc.seed), gad_cfg)
    first_iter = 0
    if rc.start_checkpoint and torch_start_iter > 0:
        # 13-tuple resume: also restore the decoder heads saved beside it
        import dataclasses as _dc
        import re as _re

        from gags_tpu.gad.interop import (
            load_reference_decoder, load_reference_scale_decoder,
        )

        d = os.path.dirname(rc.start_checkpoint)
        m = _re.search(r"(\d+)", os.path.basename(rc.start_checkpoint))
        n = m.group(1) if m else str(torch_start_iter)
        dec_p = os.path.join(d, f"decoder_chkpnt{n}.pth")
        scl_p = os.path.join(d, f"scale_decoder_chkpnt{n}.pth")
        if os.path.exists(dec_p):
            state = _dc.replace(state, decoder_params=jax.tree.map(
                jnp.asarray, load_reference_decoder(dec_p)))
            print(f"restored {dec_p}")
        if os.path.exists(scl_p):
            state = _dc.replace(state, scale_params=jax.tree.map(
                jnp.asarray, load_reference_scale_decoder(scl_p)))
            print(f"restored {scl_p}")
        first_iter = torch_start_iter
    if rc.resume:
        step0 = latest_checkpoint_step(rc.model_path)
        if step0 is not None:
            state = load_checkpoint(rc.model_path, step0, state)
            first_iter = step0
            print(f"resumed from iteration {step0}")

    geom = jax.device_put(frozen_geometry(geometry))

    # Frozen geometry → per-camera binning is training-invariant: compute the
    # sorted instance lists once and stream them with each batch (the
    # reference re-sorts on the GPU every iteration).
    from gags_tpu.splat.rasterizer import prepare_binning

    import dataclasses as _dc
    import functools as _ft

    @_ft.lru_cache(maxsize=8)
    def _prep_fn(budget):
        rcfg = gad_cfg.raster if budget is None else _dc.replace(
            gad_cfg.raster, budget=budget
        )
        return jax.jit(
            lambda m, q, s2, vm, K, op: prepare_binning(
                m, q, s2, vm, K, dataset.width, dataset.height, rcfg,
                opacities=op,
            )
        )

    n_g = int(geom["means"].shape[0])
    base_budget = gad_cfg.raster.instance_budget(n_g)

    def _bin_camera(ex, budget):
        """Bin one camera; adaptive budget recovery: a zoomed-in camera
        whose instances exceed budget_factor*N gets its own doubled budget
        instead of killing the run (the reference's dynamic allocation
        can't overflow by construction; we grow per-camera and recompile
        once per distinct budget)."""
        for attempt in range(4):
            b = _prep_fn(budget)(geom["means"], geom["quats"], geom["scales"],
                                 jnp.asarray(ex.viewmat), jnp.asarray(ex.K),
                                 geom["opacities"])
            if int(b.overflow) == 0:
                return b, budget
            cur = budget if budget is not None else base_budget
            budget = 2 * cur
            print(f"  {ex.name}: overflow {int(b.overflow)} → budget {budget}")
        raise RuntimeError(
            f"instance budget overflow persists for {ex.name} "
            f"(last budget {budget}); raise RasterizeConfig.budget_factor"
        )

    def _cache_entry(b):
        return dict(
            inst_gid=np.asarray(b.inst_gid),
            tile_starts=np.asarray(b.tile_starts),
            tile_counts=np.asarray(b.tile_counts),
            order=np.asarray(b.order),
            red_slot=np.asarray(b.red.slot_to_pos),
            red_rank=np.asarray(b.red.slot_rank),
            red_block=np.asarray(b.red.chunk_block),
        )

    bin_cache, budgets, valids = [], [], []
    for ex in dataset.examples:
        b, budget = _bin_camera(ex, None)
        bin_cache.append(_cache_entry(b))
        budgets.append(budget if budget is not None else base_budget)
        valids.append(int(b.num_valid))
    # Auto-tighten: after the first pass the loader KNOWS every camera's
    # exact valid-instance count (binning is deterministic — geometry is
    # frozen), so the default budget_factor*N budget is pure slack. Every
    # M-length stream in the train step (backward chunks, u16 grad-table
    # build, reduction gather) scales with the budget; the r5 battery
    # measured 106.2 → 96.2 ms/step just going 4.0 → 2.5 on a scene using
    # 30% of the 4.0x budget. Re-binning costs one extra compile up front;
    # a 30k-iteration run pays that back within ~2k iterations.
    chunk = gad_cfg.raster.chunk
    tight = (max(valids) // chunk + 2) * chunk
    if tight < max(budgets):
        old = max(budgets)
        for i, ex in enumerate(dataset.examples):
            b, _ = _bin_camera(ex, tight)
            bin_cache[i] = _cache_entry(b)
        budgets = [tight] * len(budgets)
        print(f"auto-tight budget: {old} → {tight} "
              f"(max valid {max(valids)} over {len(valids)} cameras)")
    elif rc.devices > 1 and len(set(budgets)) > 1:
        # dp batches stack per-camera binnings — re-prepare at one uniform
        # (max) budget so every camera's arrays share a static shape
        maxb = max(budgets)
        for i, ex in enumerate(dataset.examples):
            if budgets[i] != maxb:
                b, _ = _bin_camera(ex, maxb)
                bin_cache[i] = _cache_entry(b)
    print(f"cached binning for {len(bin_cache)} cameras")

    if rc.devices > 1:
        from gags_tpu.parallel import make_dp_train_step, make_mesh

        if len(jax.devices()) < rc.devices:
            raise RuntimeError(
                f"--devices {rc.devices} but only {len(jax.devices())} "
                "devices visible"
            )
        mesh = make_mesh(rc.devices)
        dp_step = make_dp_train_step(
            mesh, statics, dataset.width, dataset.height, gad_cfg,
            binned=True,
        )

        def step_fn(state, geom_, batch, ew, rw):
            s, loss = dp_step(state, geom_, batch, ew, rw)
            return s, {"loss": loss}
    elif rc.autotune_train:
        # on-device A/B of the numerically-equivalent step variants
        # (streaming forward kernel, residual-free supervision VJP) —
        # a few compiles + drain-timed steps up front, the winner runs
        # the 30k-iteration loop
        from gags_tpu.gad.autotune import autotune_train_step

        b0 = dataset.batch(0)
        b0.update(bin_cache[0])
        gad_cfg, step_fn = autotune_train_step(
            statics, dataset.width, dataset.height, gad_cfg, state, geom, b0
        )
        gad_cfg.save(rc.model_path)  # model dir carries the tuned config
    else:
        step_fn = make_train_step_binned(
            statics, dataset.width, dataset.height, gad_cfg
        )

    rng = np.random.default_rng(rc.seed)
    save_at = {int(s) for s in rc.save_iterations.split(",") if s}
    save_at.add(rc.iterations)
    test_at = {int(s) for s in rc.test_iterations.split(",") if s}

    metrics_w = MetricsWriter(rc.model_path)
    progress = EmaProgress(rc.iterations)

    viewer = _make_viewer(geometry, rc, rc.iterations)

    # held-out reporting (reference training_report): test-camera losses +
    # scale-map image dumps at test iterations
    eval_fn = None
    test_ds = None
    if test_at and scene_info.test_cameras:
        try:
            test_ds = GadDataset(
                scene_info.test_cameras, resolution=rc.resolution,
                max_masks=dataset.max_masks,
            )
            eval_fn = make_eval_step(statics, test_ds.width, test_ds.height, gad_cfg)
        except Exception as e:
            print(f"held-out reporting disabled: {e}")

    def test_report(it):
        if eval_fn is None:
            return
        from gags_tpu.utils.colormaps import apply_float_colormap

        vals = []
        smap = None
        for ci in range(min(len(test_ds), 8)):
            mtr, smap = eval_fn(state, geom, test_ds.batch(ci))
            vals.append({k: float(v) for k, v in mtr.items()})
        agg = {f"test_{k}": float(np.mean([v[k] for v in vals])) for k in vals[0]}
        metrics_w.write(it, agg)
        print(f"\n[iter {it}] test: " + ", ".join(f"{k}={v:.4f}" for k, v in agg.items()))
        out = os.path.join(rc.model_path, "test_renders")
        os.makedirs(out, exist_ok=True)
        from PIL import Image

        sm = np.asarray(smap)
        Image.fromarray((np.clip(sm, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out, f"scale_map_{it}.png")
        )
        for gi, gname in enumerate("sml"):
            heat = apply_float_colormap(sm[..., gi])
            Image.fromarray((np.clip(heat, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(out, f"scale_map_{gname}_{it}.png")
            )

    def batch_stream():
        while True:
            order = [int(i) for i in dataset.epoch_order(rng)]
            if rc.devices > 1:
                # group one camera per device; wrap the epoch tail so the
                # leading batch axis is always exactly `devices`
                while len(order) % rc.devices:
                    order.append(order[len(order) % len(dataset)])
                for i0 in range(0, len(order), rc.devices):
                    bs = []
                    for i in order[i0 : i0 + rc.devices]:
                        b = dataset.batch(i)
                        b.update(bin_cache[i])
                        bs.append(b)
                    yield {
                        k: np.stack([np.asarray(b[k]) for b in bs])
                        for k in bs[0]
                    }
            else:
                for i in order:
                    b = dataset.batch(i)
                    b.update(bin_cache[i])
                    yield b

    stream = prefetch_to_device(batch_stream())
    t_iter = time.time()
    for it in range(first_iter + 1, rc.iterations + 1):
        if viewer is not None:
            viewer.poll(it, rc.iterations)
        if rc.profile and it == 50:
            jax.profiler.start_trace(os.path.join(rc.model_path, "profile"))
        if rc.profile and it == 60:
            jax.profiler.stop_trace()
        ew, rw = loss_weights(it, gad_cfg)
        batch = next(stream)
        state, m = step_fn(state, geom, batch, jnp.float32(ew), jnp.float32(rw))
        if it % 10 == 0:
            loss = float(m["loss"])  # sync point every 10 iters only
            if not np.isfinite(loss):
                # failure detection: save state for post-mortem instead of
                # silently optimising on NaNs for the rest of the schedule.
                # Saved OUTSIDE the chkpnt* namespace: --resume must find
                # the last GOOD periodic checkpoint, not the NaN-poisoned
                # state (latest_checkpoint_step scans model_path only)
                dump_dir = os.path.join(rc.model_path, "nan_dump")
                save_checkpoint(dump_dir, state, it)
                raise FloatingPointError(
                    f"non-finite loss at iteration {it} — state saved to "
                    f"nan_dump/chkpnt{it} for inspection; check learning "
                    "rates / supervision inputs"
                )
            progress.update(it, loss)
        if it % 500 == 0:
            dt = (time.time() - t_iter)
            t_iter = time.time()
            row = {
                out_k: float(m[k])
                for out_k, k in [
                    ("loss", "loss"), ("l1_feature", "l1_feature"),
                    ("entropy", "entropy"), ("region_var", "region_var"),
                    ("scale_s", "scale_mean_s"), ("scale_m", "scale_mean_m"),
                    ("scale_l", "scale_mean_l"), ("overflow", "overflow"),
                ]
                if k in m  # the dp step reports the mean loss only
            }
            row["sec_per_500"] = dt
            metrics_w.write(it, row)
        if it in test_at:
            test_report(it)
        if it in save_at:
            print(f"\n[iter {it}] saving checkpoint + PLY")
            save_checkpoint(rc.model_path, state, it)
            export_ply(rc.model_path, geometry, state, it)
    if viewer is not None:
        viewer.close()
    metrics_w.close()
    return state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--source_path", required=True)
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("--ply", dest="ply_path", default="")
    p.add_argument("--start_checkpoint", default="",
                   help="reference torch chkpnt<N>.pth to warm-start from")
    p.add_argument("-r", "--resolution", type=int, default=2)
    p.add_argument("--iterations", type=int, default=30000)
    p.add_argument("--save_iterations", default="15000,30000")
    p.add_argument("--test_iterations", default="7000,30000")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval", dest="eval_split", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--profile", action="store_true")
    p.add_argument("--viewer_port", type=int, default=6009)
    p.add_argument("--devices", type=int, default=1,
                   help="camera-data-parallel training over N devices "
                        "(each iteration consumes N cameras)")
    p.add_argument("--autotune_train", action="store_true",
                   help="on-device A/B of equivalent train-step variants "
                        "at startup; trains with the fastest")
    p.add_argument("--no_fused_supervision", action="store_true",
                   help="disable the residual-free supervision+L1 custom "
                        "VJP default (same math either way; fused cuts "
                        "HBM round trips — gad/supervision)")
    p.add_argument("--decoder_bf16", action="store_true",
                   help="mixed-precision decoders: bf16 matmuls, f32 "
                        "params/normalise. Measured 81 -> 70.5 ms/step "
                        "at 360p/300k/512-dim (r5 battery 2); the "
                        "supervision target is itself fp16 CLIP")
    args = vars(p.parse_args())
    no_fsup = args.pop("no_fused_supervision")
    dec_bf16 = args.pop("decoder_bf16")
    gad_cfg = None
    if no_fsup or dec_bf16:
        from gags_tpu.splat.rasterizer import auto_config

        gad_cfg = GadConfig(fused_supervision=not no_fsup,
                            decoder_bf16=dec_bf16, raster=auto_config())
    run(RunConfig(**args), gad_cfg)


if __name__ == "__main__":
    main()
