"""Time rasterizer components separately on the current backend."""
import sys, time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize, _prepare
from gags_tpu.splat import tiles
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.splat import pallas_kernel as pk
from gags_tpu.utils.synthetic import make_scene, make_camera


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.2f} ms", flush=True)
    return out


def main(n, w, h, tile_h=8):
    raw = make_scene(n, seed=0, extent=3.0)
    cam = make_camera(w, h)
    means, quats, scales, opac = (
        jnp.asarray(raw[k]) for k in ("means", "quats", "scales", "opacities")
    )
    feats = jnp.asarray(raw["features"])
    cfg = RasterizeConfig(tile_h=tile_h)

    proj_fn = jax.jit(
        lambda m, q, s: project_gaussians(m, q, s, cam.viewmat, cam.K, w, h)
    )
    proj = timeit("project", proj_fn, means, quats, scales)

    tiles_x = -(-w // cfg.tile_w)
    tiles_y = -(-h // cfg.tile_h)
    budget = cfg.instance_budget(n)

    bin_fn = jax.jit(
        lambda m2, r, d: tiles.bin_gaussians(
            m2, r, d, w, h, cfg.tile_w, cfg.tile_h, budget, cfg.chunk
        )
    )
    binned = timeit("bin", bin_fn, proj.means2d, proj.radii, proj.depths)
    print("num_valid:", int(binned.num_valid), "M:", binned.inst_gid.shape[0],
          "max tile count:", int(binned.tile_counts.max()), flush=True)

    from gags_tpu.splat.rasterizer import _geom_table

    from gags_tpu.splat.rasterizer import order_ext

    def gather(p, b, o, f):
        geom = _geom_table(p, o)
        cp = jnp.concatenate([f, jnp.zeros((1, f.shape[1]))], 0)
        table = jnp.concatenate([geom, cp], axis=1)[order_ext(b.order)]
        return table[b.inst_gid].T  # (8+C, M)

    inst = timeit("gather", jax.jit(gather), proj, binned, opac, feats)

    blend = jax.jit(
        lambda d, s, t: pk.tile_blend_forward(
            d, s, t, tiles_x=tiles_x, tiles_y=tiles_y,
            tile_h=cfg.tile_h, tile_w=cfg.tile_w, chunk=cfg.chunk,
        )
    )
    timeit("blend", blend, inst, binned.tile_starts, binned.tile_counts)

    full = jax.jit(
        lambda m, q, s, o, f: rasterize(
            m, q, s, o, f, cam.viewmat, cam.K, w, h, config=cfg
        ).image
    )
    timeit("full", full, means, quats, scales, opac, feats)


if __name__ == "__main__":
    parts = [int(x) for x in sys.argv[1].split(",")]
    main(*parts)
