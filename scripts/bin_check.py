import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from gags_tpu.splat import tiles
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.splat import pallas_kernel as pk
from gags_tpu.utils.synthetic import make_scene, make_camera

raw = make_scene(2000, seed=1)
m, q, s, o = (jnp.asarray(raw[k]) for k in ("means","quats","scales","opacities"))
c = jnp.asarray(raw["features"])
cam = make_camera(128, 128)
cpu = jax.devices("cpu")[0]

def run_bin(dev):
    with jax.default_device(dev):
        p = project_gaussians(m,q,s,cam.viewmat,cam.K,128,128)
        b = tiles.bin_gaussians(p.means2d, p.radii, p.depths, 128,128,128,8, budget=8000, chunk=128)
        return jax.tree_util.tree_map(np.asarray, (p, b))

p_t, b_t = run_bin(jax.devices()[0])
p_c, b_c = run_bin(cpu)
for name, a, b in [("means2d", p_t.means2d, p_c.means2d), ("conics", p_t.conics, p_c.conics),
                   ("radii", p_t.radii, p_c.radii), ("depths", p_t.depths, p_c.depths)]:
    print(name, "max diff", np.abs(a.astype(np.float64)-b.astype(np.float64)).max(), flush=True)
for name, a, b in [("gid", b_t.inst_gid, b_c.inst_gid), ("starts", b_t.tile_starts, b_c.tile_starts),
                   ("counts", b_t.tile_counts, b_c.tile_counts)]:
    print(name, "mismatches", int((a!=b).sum()), "of", a.size, flush=True)

# kernel with CPU-computed binning, on TPU (inst_gid = depth ranks)
from gags_tpu.splat.rasterizer import _geom_table, _blend_fwd_impl, RasterizeConfig, order_ext
cfg = RasterizeConfig()
p = project_gaussians(m,q,s,cam.viewmat,cam.K,128,128)
geom = _geom_table(p, o)
perm = order_ext(jnp.asarray(b_c.order))
img_t = _blend_fwd_impl(c[jnp.asarray(b_c.order)], geom[perm], jnp.asarray(b_c.inst_gid),
                        jnp.asarray(b_c.tile_starts),
                        jnp.asarray(b_c.tile_counts), (1, 16), cfg)[0]
from gags_tpu.splat.reference import rasterize_reference
with jax.default_device(cpu):
    ref,_ = rasterize_reference(p_c.means2d, p_c.conics, p_c.depths, p_c.radii, o, c, 128, 128)
# reassemble image
from gags_tpu.splat.rasterizer import _tiles_to_image
img = _tiles_to_image(img_t, 1, 16, 8, 128, 128, 128)
err = np.abs(np.asarray(img) - np.asarray(ref))
print("kernel-with-CPU-bin max err:", err.max(), flush=True)
