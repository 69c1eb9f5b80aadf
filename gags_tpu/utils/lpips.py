"""LPIPS perceptual metric in JAX (VGG16 / AlexNet / SqueezeNet backbones).

Counterpart of the reference's vendored `lpipsPyTorch/` (Squeeze/Alex/VGG
backbones + linear probes, `modules/networks.py:12-96`): flax towers with
the same tap points, the same z-score quirk (the [0,1] images are z-scored
with constants built for [-1,1] inputs — reproduced as-is,
`modules/networks.py:40-42` + `metrics.py:74`), the same additive-eps
activation normalisation (`modules/utils.py:6-8`), and converters for the
torchvision feature state dicts + LPIPS linear heads.

No pretrained weights ship in this offline environment: construct with
`lpips_from_checkpoints(feat_path, lin_path, net_type=...)` when the user
supplies them; the `metrics` CLI degrades to PSNR/SSIM otherwise.
"""

from __future__ import annotations

from typing import Dict, List

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# torchvision VGG16 feature-layer channel plan; LPIPS taps after each ReLU
# preceding the 5 pooling stages (reference target_layers [4,9,16,23,30])
_VGG_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
LPIPS_CHANNELS = {
    "vgg": [64, 128, 256, 512, 512],
    "alex": [64, 192, 384, 256, 256],
    "squeeze": [64, 128, 256, 384, 384, 512, 512],
}

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _max_pool(x, window: int, stride: int, ceil_mode: bool = False):
    """torch MaxPool2d(window, stride) incl ceil_mode (NHWC)."""
    h, w = x.shape[1], x.shape[2]
    if ceil_mode:
        pad_h = (-(h - window)) % stride
        pad_w = (-(w - window)) % stride
        if pad_h or pad_w:
            x = jnp.pad(
                x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                constant_values=-jnp.inf,
            )
    return nn.max_pool(x, (window, window), strides=(stride, stride))


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


class AlexNetFeatures(nn.Module):
    """torchvision alexnet().features with LPIPS taps after each ReLU
    (reference target_layers [2, 5, 8, 10, 12])."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = []
        x = nn.Conv(64, (11, 11), strides=4, padding=2, name="conv0")(x)
        taps.append(nn.relu(x))
        x = _max_pool(taps[-1], 3, 2)
        x = nn.Conv(192, (5, 5), padding=2, name="conv1")(x)
        taps.append(nn.relu(x))
        x = _max_pool(taps[-1], 3, 2)
        x = nn.Conv(384, (3, 3), padding=1, name="conv2")(x)
        taps.append(nn.relu(x))
        x = nn.Conv(256, (3, 3), padding=1, name="conv3")(taps[-1])
        taps.append(nn.relu(x))
        x = nn.Conv(256, (3, 3), padding=1, name="conv4")(taps[-1])
        taps.append(nn.relu(x))
        return taps


class Fire(nn.Module):
    """squeezenet Fire: 1x1 squeeze → relu → (1x1 ‖ 3x3) expand → relu."""

    squeeze: int
    expand: int

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), name="expand1x1")(s))
        e3 = nn.relu(nn.Conv(self.expand, (3, 3), padding=1, name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetFeatures(nn.Module):
    """torchvision squeezenet1_1().features with LPIPS taps
    (reference target_layers [2, 5, 8, 10, 11, 12, 13])."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = []
        x = nn.Conv(64, (3, 3), strides=2, padding=0, name="conv0")(x)
        taps.append(nn.relu(x))
        x = _max_pool(taps[-1], 3, 2, ceil_mode=True)
        x = Fire(16, 64, name="fire3")(x)
        taps.append(Fire(16, 64, name="fire4")(x))
        x = _max_pool(taps[-1], 3, 2, ceil_mode=True)
        x = Fire(32, 128, name="fire6")(x)
        taps.append(Fire(32, 128, name="fire7")(x))
        x = _max_pool(taps[-1], 3, 2, ceil_mode=True)
        taps.append(Fire(48, 192, name="fire9")(x))
        taps.append(Fire(48, 192, name="fire10")(taps[-1]))
        taps.append(Fire(64, 256, name="fire11")(taps[-1]))
        taps.append(Fire(64, 256, name="fire12")(taps[-1]))
        return taps


_TOWERS = {
    "vgg": VGG16Features,
    "alex": AlexNetFeatures,
    "squeeze": SqueezeNetFeatures,
}


class LPIPS(nn.Module):
    """lpips(img1, img2): (H, W, 3) in [0,1] → scalar distance.

    Reproduces the reference stack exactly, including its z-score quirk
    (no [-1,1] rescale before the z-score constants) and raw (non-abs)
    linear-head weights."""

    net_type: str = "vgg"

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        def norm_input(x):
            return (x - _SHIFT) / _SCALE

        tower = _TOWERS[self.net_type](name="features")
        fa = tower(norm_input(a)[None])
        fb = tower(norm_input(b)[None])
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            # normalize_activation (modules/utils.py): additive eps
            xa = xa / (jnp.sqrt(jnp.sum(xa**2, axis=-1, keepdims=True)) + 1e-10)
            xb = xb / (jnp.sqrt(jnp.sum(xb**2, axis=-1, keepdims=True)) + 1e-10)
            d = (xa - xb) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones, (d.shape[-1],))
            total = total + jnp.mean(jnp.sum(d * w, axis=-1))
        return total


def _conv_params(state: Dict, key: str) -> Dict:
    return {
        "kernel": np.asarray(state[f"{key}.weight"], np.float32).transpose(2, 3, 1, 0),
        "bias": np.asarray(state[f"{key}.bias"], np.float32),
    }


def convert_lpips_weights(
    feat_state: Dict, lin_state: Dict, net_type: str = "vgg"
) -> Dict:
    """torchvision `features` state dict + LPIPS linear heads → flax params.

    feat keys: features.{idx}.weight/bias (+ .squeeze/.expand1x1/.expand3x3
    for squeezenet Fire modules); lin keys: lin{i}.model.1.weight (1,C,1,1).
    """
    feats: Dict = {}
    if net_type == "vgg":
        conv_i = 0
        torch_idx = 0
        for spec in _VGG_PLAN:
            if spec == "M":
                torch_idx += 1  # pool layer
            else:
                feats[f"conv{conv_i}"] = _conv_params(feat_state, f"features.{torch_idx}")
                conv_i += 1
                torch_idx += 2  # conv + relu
    elif net_type == "alex":
        for conv_i, torch_idx in enumerate([0, 3, 6, 8, 10]):
            feats[f"conv{conv_i}"] = _conv_params(feat_state, f"features.{torch_idx}")
    elif net_type == "squeeze":
        feats["conv0"] = _conv_params(feat_state, "features.0")
        for fire_idx in [3, 4, 6, 7, 9, 10, 11, 12]:
            feats[f"fire{fire_idx}"] = {
                sub: _conv_params(feat_state, f"features.{fire_idx}.{sub}")
                for sub in ("squeeze", "expand1x1", "expand3x3")
            }
    else:
        raise ValueError(f"unknown net_type {net_type!r}")

    params: Dict = {"features": feats}
    for i in range(len(LPIPS_CHANNELS[net_type])):
        w = np.asarray(lin_state[f"lin{i}.model.1.weight"], np.float32).reshape(-1)
        params[f"lin{i}"] = w
    return {"params": params}


def lpips_from_checkpoints(feat_path: str, lin_path: str, net_type: str = "vgg"):
    import torch

    feat_state = torch.load(feat_path, map_location="cpu", weights_only=False)
    lin_state = torch.load(lin_path, map_location="cpu", weights_only=False)
    model = LPIPS(net_type=net_type)
    return model, convert_lpips_weights(feat_state, lin_state, net_type)
