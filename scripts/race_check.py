import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.splat.reference import rasterize_reference
from gags_tpu.utils.synthetic import make_scene, make_camera
import gags_tpu.splat.pallas_kernel as pk
print("SERIAL_DMA =", pk.SERIAL_DMA, flush=True)
raw = make_scene(2000, seed=1)
m, q, s, o = (jnp.asarray(raw[k]) for k in ("means","quats","scales","opacities"))
c = jnp.asarray(raw["features"])
cam = make_camera(128, 128)
cfg = RasterizeConfig()
img = jax.jit(lambda *a: rasterize(*a, cam.viewmat, cam.K, 128, 128, config=cfg).image)(m,q,s,o,c)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    p = project_gaussians(m,q,s,cam.viewmat,cam.K,128,128)
    ref,_ = rasterize_reference(p.means2d,p.conics,p.depths,p.radii,o,c,128,128)
err = np.abs(np.asarray(img)-np.asarray(ref))
print(f"max err: {err.max():.2e} mean {err.mean():.2e}", flush=True)
bad = np.argwhere(err.max(-1) > 1e-3)
if len(bad):
    print("bad rows", bad[:,0].min(), bad[:,0].max(), "cols", bad[:,1].min(), bad[:,1].max(), "count", len(bad), flush=True)
