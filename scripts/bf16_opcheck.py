"""Bisect the remote-compiler crash on the bf16 blend / rows kernels.

Both `blend_bf16=True` and `kernel_relayout=True` configs die with
`HTTP 500: tpu_compile_helper subprocess exit code 1` from the axon
remote-compile service — AFTER Mosaic verification passes, so the crash
is in the later compile pipeline and carries no client-visible message
beyond whatever the 500 body holds.  This script:

  1. compiles the failing full kernels directly and prints the COMPLETE
     exception text (bench.py truncates to 200 chars);
  2. compiles a ladder of minimal Pallas kernels, each adding one of the
     bf16 ops the blend path uses (exp2 / log1p / exp / bf16 tri-matmul /
     bf16 broadcast-add / dynamic lane windows on bf16), to pinpoint the
     crashing op if (1)'s message is unhelpful.

Run on the real TPU, one client at a time (after round3_measure.sh).
"""
import functools
import sys
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def try_compile(name, fn, *args):
    print(f"=== {name}", flush=True)
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"{name}: OK", flush=True)
        return True
    except Exception:
        print(f"{name}: FAIL", flush=True)
        traceback.print_exc()
        print("", flush=True)
        return False


def _kernel_factory(body):
    def kernel(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    def run(x):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32)
        )(x)

    return run


def main():
    print(jax.devices(), flush=True)
    x32 = jnp.ones((256, 128), jnp.float32)

    # --- ladder of single-op bf16 kernels -------------------------------
    def bf(body32):
        def body(x):
            b = body32(x.astype(jnp.bfloat16))
            return b.astype(jnp.float32)

        return _kernel_factory(body)

    ladder = [
        ("bf16_roundtrip", bf(lambda b: b)),
        ("bf16_exp2", bf(lambda b: jnp.exp2(-b))),
        ("bf16_exp", bf(lambda b: jnp.exp(-b))),
        ("bf16_log1p", bf(lambda b: jnp.log1p(-0.5 * b))),
        ("bf16_minimum_scalar", bf(lambda b: jnp.minimum(jnp.bfloat16(0.99), b))),
        ("bf16_where", bf(lambda b: jnp.where(b >= jnp.bfloat16(0.5), b, jnp.bfloat16(0)))),
        (
            "bf16_bcast_add",
            bf(lambda b: b[:, 0:1] + b),
        ),
        (
            "bf16_tri_dot_f32acc",
            bf(
                lambda b: jax.lax.dot_general(
                    b,
                    jnp.tril(jnp.ones((128, 128), jnp.bfloat16)),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
            ),
        ),
        (
            "bf16_dot_bf16_bf16_f32",
            bf(
                lambda b: jax.lax.dot_general(
                    b,
                    b,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
            ),
        ),
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else None

    # --- the real failing configs, full error text ----------------------
    if only in (None, "full", "full_bf16", "full_krel"):
        try:
            from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
            from gags_tpu.utils.synthetic import make_scene, make_camera

            raw = make_scene(20000, seed=1)
            means, quats, scales, opac = (
                jnp.asarray(raw[k])
                for k in ("means", "quats", "scales", "opacities")
            )
            feats = jnp.asarray(raw["features"])
            cam = make_camera(256, 256)

            flags = {
                "full_bf16": {"blend_bf16": True, "fast_color_rows": True},
                "full_krel": {"kernel_relayout": True},
            }
            for name, fl in flags.items():
                if only not in (None, "full", name):
                    continue
                cfg = RasterizeConfig(aligned=False, **fl)
                try_compile(
                    name,
                    functools.partial(
                        rasterize,
                        viewmat=cam.viewmat,
                        K=cam.K,
                        width=256,
                        height=256,
                        config=cfg,
                    ),
                    means,
                    quats,
                    scales,
                    opac,
                    feats,
                )
        except Exception:
            traceback.print_exc()

    for name, fn in ladder:
        if only is None or only == name:
            try_compile(name, fn, x32)


if __name__ == "__main__":
    main()
