import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.splat.reference import rasterize_reference
from gags_tpu.utils.synthetic import make_scene, make_camera

N, W, H = 300_000, 640, 360
raw = make_scene(N, seed=0, extent=3.0)
means, quats, scales, op = (jnp.asarray(raw[k]) for k in ("means","quats","scales","opacities"))
feats = jnp.asarray(raw["features"])
cam = make_camera(W, H)
cfg = RasterizeConfig()
f = jax.jit(lambda m,q,s,o,c: rasterize(m,q,s,o,c,cam.viewmat,cam.K,W,H,config=cfg).image)
img = f(means,quats,scales,op,feats); img.block_until_ready()
t0=time.perf_counter()
for _ in range(10): img = f(means,quats,scales,op,feats)
img.block_until_ready()
print(f"full fwd: {(time.perf_counter()-t0)/10*1000:.1f} ms", flush=True)
# parity vs CPU oracle on a small crop scene
N2 = 2000
raw2 = make_scene(N2, seed=1)
m2,q2,s2,o2 = (jnp.asarray(raw2[k]) for k in ("means","quats","scales","opacities"))
c2 = jnp.asarray(raw2["features"])
cam2 = make_camera(128, 128)
img2 = jax.jit(lambda m,q,s,o,c: rasterize(m,q,s,o,c,cam2.viewmat,cam2.K,128,128,config=cfg).image)(m2,q2,s2,o2,c2)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    p = project_gaussians(m2,q2,s2,cam2.viewmat,cam2.K,128,128)
    ref,_ = rasterize_reference(p.means2d,p.conics,p.depths,p.radii,o2,c2,128,128)
err = np.abs(np.asarray(img2)-np.asarray(ref))
print(f"max err vs oracle: {err.max():.2e} mean {err.mean():.2e}", flush=True)
