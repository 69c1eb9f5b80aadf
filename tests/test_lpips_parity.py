"""LPIPS parity vs an independent torch implementation of the reference's
vendored lpipsPyTorch stack (`modules/{lpips,networks,utils}.py`).

torchvision is absent in this env, so the torch towers are built here from
the published torchvision `features` architectures with RANDOM weights and
state-dict keys matching torchvision's naming; our converters consume that
state dict exactly as they would the real checkpoints."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402

from gags_tpu.utils.lpips import LPIPS, convert_lpips_weights  # noqa: E402


def _torch_vgg_features():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_c, v, 3, padding=1), tnn.ReLU()]
            in_c = v
    return tnn.Sequential(*layers), [4, 9, 16, 23, 30]


def _torch_alex_features():
    layers = [
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
    ]
    return tnn.Sequential(*layers), [2, 5, 8, 10, 12]


class _Fire(tnn.Module):
    def __init__(self, in_c, s, e):
        super().__init__()
        self.squeeze = tnn.Conv2d(in_c, s, 1)
        self.squeeze_activation = tnn.ReLU()
        self.expand1x1 = tnn.Conv2d(s, e, 1)
        self.expand1x1_activation = tnn.ReLU()
        self.expand3x3 = tnn.Conv2d(s, e, 3, padding=1)
        self.expand3x3_activation = tnn.ReLU()

    def forward(self, x):
        x = self.squeeze_activation(self.squeeze(x))
        return torch.cat(
            [
                self.expand1x1_activation(self.expand1x1(x)),
                self.expand3x3_activation(self.expand3x3(x)),
            ],
            1,
        )


def _torch_squeeze_features():
    layers = [
        tnn.Conv2d(3, 64, 3, stride=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2, ceil_mode=True),
        _Fire(64, 16, 64), _Fire(128, 16, 64),
        tnn.MaxPool2d(3, 2, ceil_mode=True),
        _Fire(128, 32, 128), _Fire(256, 32, 128),
        tnn.MaxPool2d(3, 2, ceil_mode=True),
        _Fire(256, 48, 192), _Fire(384, 48, 192),
        _Fire(384, 64, 256), _Fire(512, 64, 256),
    ]
    return tnn.Sequential(*layers), [2, 5, 8, 10, 11, 12, 13]


_BUILDERS = {
    "vgg": _torch_vgg_features,
    "alex": _torch_alex_features,
    "squeeze": _torch_squeeze_features,
}

_MEAN = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
_STD = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]


def _torch_lpips(features, target_layers, lins, x, y):
    """Reference modules/lpips.py forward, verbatim semantics."""

    def tower(img):
        h = (img - _MEAN) / _STD
        out = []
        for i, layer in enumerate(features, 1):
            h = layer(h)
            if i in target_layers:
                norm = torch.sqrt(torch.sum(h**2, dim=1, keepdim=True))
                out.append(h / (norm + 1e-10))
            if len(out) == len(target_layers):
                break
        return out

    fx, fy = tower(x), tower(y)
    diff = [(a - b) ** 2 for a, b in zip(fx, fy)]
    res = [lin(d).mean((2, 3), True) for d, lin in zip(diff, lins)]
    return torch.sum(torch.cat(res, 0), 0, True)


@pytest.mark.parametrize("net_type", ["vgg", "alex", "squeeze"])
def test_lpips_matches_torch_reference(net_type):
    torch.manual_seed(0)
    features, target_layers = _BUILDERS[net_type]()
    size = 64 if net_type == "vgg" else 96  # alex/squeeze stride-4/2 stems
    x = torch.rand(1, 3, size, size)
    y = torch.rand(1, 3, size, size)

    # per-layer 1x1 linear heads with random positive-ish weights
    n_ch = []
    with torch.no_grad():
        h = (x - _MEAN) / _STD
        for i, layer in enumerate(features, 1):
            h = layer(h)
            if i in target_layers:
                n_ch.append(h.shape[1])
    lins = [tnn.Conv2d(c, 1, 1, bias=False) for c in n_ch]

    with torch.no_grad():
        expect = float(_torch_lpips(features, target_layers, lins, x, y))

    # torchvision-style state dict for the converter
    feat_state = {f"features.{k}": v for k, v in features.state_dict().items()}
    lin_state = {
        f"lin{i}.model.1.weight": lin.weight.detach() for i, lin in enumerate(lins)
    }
    params = convert_lpips_weights(feat_state, lin_state, net_type)

    model = LPIPS(net_type=net_type)
    a = np.asarray(x[0].permute(1, 2, 0))
    b = np.asarray(y[0].permute(1, 2, 0))
    got = float(jax.jit(model.apply)(params, a, b))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=1e-6)
