"""Isolate the kernel_relayout Mosaic compile failure: compile the krel
config alone at the validation shape and print the FULL compiler error
(tpu_validate truncated it to 300 chars, which hid the rejected MLIR op).

Run only when no other TPU client is active (one client at a time)."""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
from gags_tpu.utils.synthetic import make_camera, make_scene

print(jax.devices(), flush=True)
raw = make_scene(2000, seed=1)
m, q, s, o = (
    jnp.asarray(raw[k]) for k in ("means", "quats", "scales", "opacities")
)
c = jnp.asarray(raw["features"])
cam = make_camera(128, 128)

for flags in (
    {"kernel_relayout": True},
    {"kernel_relayout": True, "fused_keys": True},
):
    cfg = RasterizeConfig(aligned=False, fast_color_rows=True, **flags)
    try:
        img = jax.jit(
            lambda *a, _c=cfg: rasterize(
                *a, cam.viewmat, cam.K, 128, 128, config=_c
            ).image
        )(m, q, s, o, c)
        img.block_until_ready()
        print(f"{flags}: COMPILE+RUN OK, sum={float(img.sum()):.4f}", flush=True)
    except Exception as exc:
        print(f"{flags}: FAIL\n{exc}", flush=True)
