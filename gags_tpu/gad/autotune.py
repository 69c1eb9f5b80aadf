"""On-device autotuning for the GAD train step.

Counterpart of `splat/autotune.py` for the training loop: which of the
numerically-equivalent step variants wins is a hardware question (the
streaming forward kernel and the residual-free supervision VJP each trade
pipeline structure for HBM traffic — see their docstrings), so the CLI can
measure them ON THE RUNNING DEVICE for a few steps and train with the
fastest. The reference has no analogue: its step is one fixed CUDA path.

Candidates (4 combinations):
  * `raster.fast_fwd_aligned` — training forward on the streaming fast
    kernel (forward within the f32 fuzz contract ~1e-4; colour grads
    bit-unchanged — backward recomputes from inputs).
  * `fused_supervision` — supervision blend + mask + L1 as one custom VJP
    (same math, residuals are the raw inputs).

Each candidate runs one step from the SAME starting state and must land
within `loss_rtol` of the base step's loss (a compile failure or contract
breach silently disqualifies it), then survivors are drain-timed.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gags_tpu.gad.train import GadConfig, make_train_step_binned
from gags_tpu.utils.timing import device_time_drain


def autotune_train_step(
    statics: Dict[str, Any],
    width: int,
    height: int,
    cfg: GadConfig,
    state,
    geom,
    batch,
    *,
    k: int = 8,
    loss_rtol: float = 1e-3,
    force: bool = False,
    verbose: bool = True,
) -> Tuple[GadConfig, Any]:
    """Return (winning GadConfig, its jitted binned step).

    `batch` is one full training batch including the cached binning
    arrays. On the CPU backend timing is meaningless — the base config is
    returned untimed unless `force` (tests)."""
    base_step = make_train_step_binned(statics, width, height, cfg)
    if jax.default_backend() == "cpu" and not force:
        return cfg, base_step

    ew = jnp.float32(cfg.entropy_w_early)
    rw = jnp.float32(0.0)
    batch = {k_: jnp.asarray(v) for k_, v in batch.items()}

    def one_loss(step):
        _, metrics = step(state, geom, batch, ew, rw)
        return float(metrics["loss"])

    base_loss = one_loss(base_step)

    def timed(step):
        return device_time_drain(
            lambda s: step(s, geom, batch, ew, rw)[1]["loss"], state,
            k=k, warmup=2,
        )

    best_cfg, best_step = cfg, base_step
    best_t = timed(base_step)
    if verbose:
        print(f"# train-autotune: base {best_t*1e3:.1f} ms "
              f"(loss {base_loss:.5f})", file=sys.stderr)

    variants = (
        {"fused_supervision": True},
        {"fast_fwd_aligned": True},
        {"fused_supervision": True, "fast_fwd_aligned": True},
    )
    for ov in variants:
        ov = dict(ov)
        raster = cfg.raster
        if ov.pop("fast_fwd_aligned", False):
            raster = dataclasses.replace(raster, fast_fwd_aligned=True)
        cand_cfg = dataclasses.replace(cfg, raster=raster, **ov)
        if cand_cfg == best_cfg:
            continue
        try:
            cand_step = make_train_step_binned(statics, width, height, cand_cfg)
            loss = one_loss(cand_step)
            rel = abs(loss - base_loss) / (abs(base_loss) + 1e-12)
            if not (np.isfinite(loss) and rel <= loss_rtol):
                if verbose:
                    print(f"# train-autotune: {cand_cfg_summary(cand_cfg)} "
                          f"loss drift {rel:.2e} — rejected", file=sys.stderr)
                continue
            t = timed(cand_step)
        except Exception as exc:  # lowering/compile failure etc.
            if verbose:
                print(f"# train-autotune: candidate failed: {exc!r:.200}",
                      file=sys.stderr)
            continue
        if verbose:
            print(f"# train-autotune: {cand_cfg_summary(cand_cfg)} "
                  f"{t*1e3:.1f} ms", file=sys.stderr)
        if t < best_t:
            best_cfg, best_step, best_t = cand_cfg, cand_step, t
    if verbose:
        print(f"# train-autotune: winner {cand_cfg_summary(best_cfg)} "
              f"{best_t*1e3:.1f} ms", file=sys.stderr)
    return best_cfg, best_step


def cand_cfg_summary(cfg: GadConfig) -> str:
    return (f"fsup={cfg.fused_supervision} "
            f"fastfwd={cfg.raster.fast_fwd_aligned}")
