"""Interop with reference (torch) checkpoints.

Loads the reference's `chkpnt<N>.pth` (the 12/13-tuple from
`gaussian_model.capture()`, train.py:232) into a GaussianScene (+ features
if present), so scenes pretrained with the original PyTorch/gsplat stack
drop straight into this framework. The 12-tuple (RGB-only) case starts
feature training at iteration 0, matching train.py:83-84.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from gags_tpu.scene.gaussian_data import GaussianScene


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_reference_checkpoint(path: str) -> Tuple[GaussianScene, int, Optional[np.ndarray]]:
    """Returns (scene, start_iteration, semantic_features or None)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    model_args, iteration = payload
    n_fields = len(model_args)
    if n_fields == 13:
        (active_sh, xyz, f_dc, f_rest, scaling, rotation, opacity,
         _max_radii, _grad_accum, _denom, _opt, _lr_scale, semantic) = model_args
        feats = _np(semantic).astype(np.float32)
    elif n_fields == 12:
        (active_sh, xyz, f_dc, f_rest, scaling, rotation, opacity,
         _max_radii, _grad_accum, _denom, _opt, _lr_scale) = model_args
        feats = None
        iteration = 0  # RGB-only checkpoint → feature training from scratch
    else:
        raise ValueError(f"unexpected checkpoint tuple length {n_fields}")

    f_dc = _np(f_dc)  # (N, 1, 3)
    f_rest = _np(f_rest)  # (N, K-1, 3)
    sh = np.concatenate([f_dc, f_rest], axis=1).astype(np.float32)
    k = sh.shape[1]
    max_deg = int(round(k**0.5)) - 1

    scene = GaussianScene(
        means=jnp.asarray(_np(xyz), jnp.float32),
        sh=jnp.asarray(sh),
        opacities_raw=jnp.asarray(_np(opacity).reshape(-1), jnp.float32),
        scales_raw=jnp.asarray(_np(scaling), jnp.float32),
        quats=jnp.asarray(_np(rotation), jnp.float32),
        semantic_features=jnp.asarray(feats) if feats is not None else None,
        max_sh_degree=max_deg,
    )
    return scene, int(iteration), feats


def _conv_to_dense(sd, idx: int):
    """torch `decoder.{idx}` 1x1-Conv2d -> flax Dense params."""
    w = _np(sd[f"decoder.{idx}.weight"])  # (C_out, C_in, 1, 1)
    return {
        "kernel": np.ascontiguousarray(w[:, :, 0, 0].T.astype(np.float32)),
        "bias": _np(sd[f"decoder.{idx}.bias"]).astype(np.float32),
    }


def load_reference_decoder(path: str):
    """Convert the reference's `decoder_chkpnt<N>.pth` into FeatureDecoder
    flax params.

    The file holds {"module_state_dict", "optimizer_state_dict"}
    (train.py:235-238); layer plan: 1x1 convs at decoder.{0,2,...,16}
    (networks.py:126-194) -> Dense d0..d8. Optimizer moments are not
    carried over (Adam restarts; the reference reloads them but a fresh
    Adam converges indistinguishably for these small heads).
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("module_state_dict", payload) if isinstance(payload, dict) else payload
    params = {f"d{i}": _conv_to_dense(sd, 2 * i) for i in range(9)}
    return {"params": params}


def load_reference_scale_decoder(path: str):
    """`scale_decoder_chkpnt<N>.pth` -> ScaleDecoder flax params
    (convs at decoder.{0,2,...,10}, networks.py:225-241 -> d0..d5)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("module_state_dict", payload) if isinstance(payload, dict) else payload
    params = {f"d{i}": _conv_to_dense(sd, 2 * i) for i in range(6)}
    return {"params": params}
