"""LPIPS perceptual metric in JAX (VGG16 backbone + linear heads).

Counterpart of the reference's vendored `lpipsPyTorch/` (Squeeze/Alex/VGG
backbones + linear probes, `modules/networks.py:12-96`). We implement the
VGG16 variant — the one `metrics.py:74` uses — as a flax module plus a
converter for torchvision VGG16 weights and the LPIPS linear-head weights.

No pretrained weights ship in this offline environment: construct with
`lpips_from_checkpoints(vgg_path, lin_path)` when the user supplies them;
`metrics` CLI degrades to PSNR/SSIM otherwise.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# torchvision VGG16 feature-layer channel plan; LPIPS taps after each ReLU
# preceding the 5 pooling stages
_VGG_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
_TAP_BEFORE_POOL = True
LPIPS_CHANNELS = [64, 128, 256, 512, 512]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = []
        conv_i = 0
        for spec in _VGG_PLAN:
            if spec == "M":
                taps.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(spec, (3, 3), padding=1, name=f"conv{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
        return taps


class LPIPS(nn.Module):
    """lpips(img1, img2): (H, W, 3) in [0,1] → scalar distance."""

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        def norm_input(x):
            x = 2.0 * x - 1.0
            return (x - _SHIFT) / _SCALE

        vgg = VGG16Features(name="vgg")
        fa = vgg(norm_input(a)[None])
        fb = vgg(norm_input(b)[None])
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            xa = xa / jnp.maximum(jnp.linalg.norm(xa, axis=-1, keepdims=True), 1e-10)
            xb = xb / jnp.maximum(jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-10)
            d = (xa - xb) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones, (d.shape[-1],))
            total = total + jnp.mean(jnp.sum(d * jnp.abs(w), axis=-1))
        return total


def convert_lpips_weights(vgg_state: Dict, lin_state: Dict) -> Dict:
    """torchvision vgg16 `features` state dict + lpips linear heads → params.

    vgg keys: features.{idx}.weight/bias for conv layers;
    lin keys: lin{i}.model.1.weight (1,C,1,1).
    """
    params: Dict = {"vgg": {}}
    conv_i = 0
    torch_idx = 0
    for spec in _VGG_PLAN:
        if spec == "M":
            torch_idx += 1  # pool layer
        else:
            wkey = f"features.{torch_idx}.weight"
            params["vgg"][f"conv{conv_i}"] = {
                "kernel": np.asarray(vgg_state[wkey], np.float32).transpose(2, 3, 1, 0),
                "bias": np.asarray(vgg_state[f"features.{torch_idx}.bias"], np.float32),
            }
            conv_i += 1
            torch_idx += 2  # conv + relu
    for i in range(5):
        w = np.asarray(lin_state[f"lin{i}.model.1.weight"], np.float32).reshape(-1)
        params[f"lin{i}"] = w
    return {"params": params}


def lpips_from_checkpoints(vgg_path: str, lin_path: str):
    import torch

    vgg_state = torch.load(vgg_path, map_location="cpu", weights_only=False)
    lin_state = torch.load(lin_path, map_location="cpu", weights_only=False)
    model = LPIPS()
    return model, convert_lpips_weights(vgg_state, lin_state)
