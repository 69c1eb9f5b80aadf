"""HBM layout-padding probe: does XLA's (8, 128) tiling pad small minor
dims of HBM-resident arrays, amplifying streaming reads/writes?

Theory under test (NOTES.md open question, drives three staged features:
packed_out, image_chw, SoA geometry): a f32 array (N, k<128) is stored
with its minor dim padded to 128 lanes, so streaming it costs 128/k times
the logical bytes. If true at N=1M:
  (N, 3)  read  ≈ 512 MB instead of 12 MB   (~0.63 ms vs ~0.015 ms)
  (3, N)  read  ≈ 12 MB                      (lane dim = N, no pad)
and every (H, W, C<=17) image write is ~128/C amplified.

Each leg drains K=50 iterations of a jitted reduce/write whose math is
negligible; the time IS the stream. Interpreting results:
  t(N,k) / t(k,N) ≈ 128/k  → padding is real; channel-major layouts win
  ratio ≈ 1               → padding is not real for that shape; the
                            1.9 ms projection cost is fusion-split, not
                            layout, and SoA work should stop.
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from gags_tpu.utils.timing import device_time_drain

N = 1_000_000


def probe(name, fn, arg, k=50):
    dt = device_time_drain(fn, arg, k=k, warmup=3)
    gb = arg.size * arg.dtype.itemsize / 1e9
    print(f"{name:34s} {dt*1e3:8.4f} ms  ({gb/dt:6.1f} GB/s logical)",
          flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)

    # --- streaming READ of (N, k) vs (k, N), k = 3 (geometry shape) ----
    a_nk = jax.random.normal(key, (N, 3), jnp.float32)
    a_kn = jnp.asarray(a_nk.T)  # materialised transposed copy

    @jax.jit
    def read_nk(x):  # touches every element, returns a scalar
        return x[:, 0].sum() + x[:, 1].sum() + x[:, 2].sum()

    @jax.jit
    def read_kn(x):
        return x[0].sum() + x[1].sum() + x[2].sum()

    t1 = probe("read (N,3) f32", read_nk, a_nk)
    t2 = probe("read (3,N) f32", read_kn, a_kn)
    print(f"  -> (N,3)/(3,N) ratio = {t1/t2:.1f} (128/3 = 42.7 if padded)")

    # --- k = 16 (feature-image channel count) --------------------------
    b_nk = jax.random.normal(key, (N, 16), jnp.float32)
    b_kn = jnp.asarray(b_nk.T)

    @jax.jit
    def sum_last(x):
        return x.sum()

    t3 = probe("read (N,16) f32", sum_last, b_nk)
    t4 = probe("read (16,N) f32", sum_last, b_kn)
    print(f"  -> (N,16)/(16,N) ratio = {t3/t4:.1f} (128/16 = 8 if padded)")

    # --- WRITE amplification: produce (N, k) vs (k, N) outputs ---------
    src = jax.random.normal(key, (N,), jnp.float32)

    @jax.jit
    def write_nk(x):
        return jnp.stack([x, x + 1.0, x * 2.0], axis=-1)  # (N, 3)

    @jax.jit
    def write_kn(x):
        return jnp.stack([x, x + 1.0, x * 2.0], axis=0)  # (3, N)

    t5 = probe("write (N,3) f32", write_nk, src)
    t6 = probe("write (3,N) f32", write_kn, src)
    print(f"  -> write ratio = {t5/t6:.1f}")

    # --- image-shaped write: (H, W, 16) vs (16, H, W) -------------------
    h, w = 720, 1280
    img_src = jax.random.normal(key, (16, h, w), jnp.float32)

    @jax.jit
    def write_hwc(x):
        return jnp.transpose(x, (1, 2, 0)) * 2.0

    @jax.jit
    def write_chw(x):
        return x * 2.0

    t7 = probe("write (720,1280,16) f32", write_hwc, img_src)
    t8 = probe("write (16,720,1280) f32", write_chw, img_src)
    print(f"  -> HWC/CHW ratio = {t7/t8:.1f} (8 if padded; includes the "
          f"transpose cost on the HWC leg)")

    # --- u16 table row shapes (gather-table build stream) ---------------
    c_nk = jnp.zeros((N, 32), jnp.uint16)

    @jax.jit
    def touch_u16(x):
        return x.astype(jnp.int32).sum()

    probe("read (N,32) u16", touch_u16, c_nk)
    probe("read (32,N) u16", touch_u16, jnp.asarray(c_nk.T))


if __name__ == "__main__":
    main()
