"""Static HBM envelope report from XLA's own memory analysis.

The axon tunnel device exposes no runtime memory_stats(), so the e2e
rehearsal printed 'n/a' for HBM peak. XLA's compile-time
memory_analysis() gives the exact planned HBM usage (arguments +
outputs + temps + peak) for a compiled program — that is the number the
SURVEY §7.3.6 1080p memory plan needs. Reports the two envelope-setting
programs: the 1080p/1M inference frame and the 360p/300k/512-d train
step. One TPU client at a time.
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp


def report(name, lowered):
    c = lowered.compile()
    ma = c.memory_analysis()
    if ma is None:
        print(f"{name}: memory_analysis unavailable", flush=True)
        return
    gib = 2**30
    print(
        f"{name}: args {ma.argument_size_in_bytes/gib:.2f} + out "
        f"{ma.output_size_in_bytes/gib:.2f} + temp "
        f"{ma.temp_size_in_bytes/gib:.2f} GiB "
        f"(gen code {ma.generated_code_size_in_bytes/2**20:.1f} MiB)",
        flush=True,
    )


def infer_1080p():
    from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
    from gags_tpu.utils.synthetic import make_scene, make_camera

    N, W, H = 1_000_000, 1920, 1080
    raw = make_scene(N, seed=0, extent=3.0)
    m, q, s, o = (
        jnp.asarray(raw[k]) for k in ("means", "quats", "scales", "opacities")
    )
    c = jnp.asarray(raw["features"])
    cam = make_camera(W, H)
    cfg = RasterizeConfig(
        aligned=False, budget_factor=2.7, fast_color_rows=True,
        blend_bf16=True, fused_keys=True,
    )
    bg = jnp.zeros((16,), jnp.float32)

    def frame(mm, qq, ss, oo, ff):
        return rasterize(
            mm, qq, ss, oo, ff, cam.viewmat, cam.K, W, H,
            background=bg, config=cfg,
        ).image

    report("1080p/1M inference frame", jax.jit(frame).lower(m, q, s, o, c))


def train_360p():
    from gags_tpu.gad.train import (
        GadConfig, create_train_state, frozen_geometry, make_train_step_binned,
    )
    from gags_tpu.scene.gaussian_data import GaussianScene
    from gags_tpu.splat.rasterizer import RasterizeConfig, prepare_binning
    from gags_tpu.utils.synthetic import make_scene, make_camera

    N, W, H, M = 300_000, 640, 360, 300
    raw = make_scene(N, seed=0, extent=3.0)
    scene = GaussianScene(
        means=jnp.asarray(raw["means"]), sh=jnp.asarray(raw["sh"]),
        opacities_raw=jnp.asarray(
            np.log(raw["opacities"] / (1 - raw["opacities"]))
        ),
        scales_raw=jnp.asarray(np.log(raw["scales"])),
        quats=jnp.asarray(raw["quats"]),
        semantic_features=jnp.zeros((N, 16)),
    )
    cfg = GadConfig(max_segments=1024, raster=RasterizeConfig())
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
    geom = frozen_geometry(scene)
    cam = make_camera(W, H)
    b = prepare_binning(
        geom["means"], geom["quats"], geom["scales"], cam.viewmat, cam.K,
        W, H, cfg.raster, opacities=geom["opacities"],
    )
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(M, 512)).astype(np.float16)
    seg = rng.integers(-1, M, size=(H, W, 4)).astype(np.int32)
    batch = dict(
        viewmat=cam.viewmat, K=cam.K, img_embed=jnp.asarray(emb),
        seg_map=jnp.asarray(seg), inst_gid=b.inst_gid,
        tile_starts=b.tile_starts, tile_counts=b.tile_counts, order=b.order,
        red_slot=b.red.slot_to_pos, red_rank=b.red.slot_rank,
        red_block=b.red.chunk_block,
    )
    step = make_train_step_binned(statics, W, H, cfg)
    report(
        "360p/300k train step",
        step.lower(state, geom, batch, jnp.float32(1e-3), jnp.float32(0.0)),
    )


if __name__ == "__main__":
    infer_1080p()
    train_360p()
