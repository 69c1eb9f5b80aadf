import sys, time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
from gags_tpu.utils.synthetic import make_scene, make_camera


def probe(n, w, h, iters=10):
    raw = make_scene(n, seed=0, extent=3.0)
    cam = make_camera(w, h)
    args = [jnp.asarray(raw[k]) for k in ("means", "quats", "scales", "opacities")]
    feats = jnp.asarray(raw["features"])
    cfg = RasterizeConfig()
    f = jax.jit(
        lambda a0, a1, a2, a3, ff: rasterize(
            a0, a1, a2, a3, ff, cam.viewmat, cam.K, w, h, config=cfg
        ).image
    )
    t0 = time.time()
    lowered = f.lower(*args, feats)
    print(f"lower {n} {w}x{h}: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    comp = lowered.compile()
    print(f"compile: {time.time()-t0:.1f}s", flush=True)
    img = comp(*args, feats)
    img.block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        img = comp(*args, feats)
    img.block_until_ready()
    print(f"run: {(time.time()-t0)/iters*1000:.2f} ms", flush=True)


if __name__ == "__main__":
    for spec in sys.argv[1:]:
        n, w, h = (int(x) for x in spec.split(","))
        probe(n, w, h)
