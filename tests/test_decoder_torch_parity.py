"""FeatureDecoder/ScaleDecoder vs equivalent torch 1x1-conv stacks.

Transplants our Dense weights into torch Conv2d(k=1) modules arranged with
the reference's skip topology (models/networks.py:158-218,237-241) and
checks outputs match — validating both the layer plan and the channel-last
Dense ≡ 1x1-conv equivalence.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from gags_tpu.models.decoders import FeatureDecoder, ScaleDecoder


def _conv_from_dense(params, name):
    w = torch.from_numpy(np.asarray(params[name]["kernel"]))  # (in, out)
    b = torch.from_numpy(np.asarray(params[name]["bias"]))
    conv_w = w.T[:, :, None, None].contiguous()  # (out, in, 1, 1)
    return conv_w, b


def _apply_conv(x, params, name):
    w, b = _conv_from_dense(params, name)
    return F.conv2d(x, w, b)


def test_feature_decoder_matches_torch_conv_stack():
    rng = np.random.default_rng(0)
    dec = FeatureDecoder(output_dim=40, hidden=32)
    x = rng.normal(size=(6, 5, 16)).astype(np.float32)
    variables = dec.init(jax.random.PRNGKey(1), jnp.asarray(x))
    got = np.asarray(dec.apply(variables, jnp.asarray(x)))

    p = variables["params"]
    t = torch.from_numpy(x).permute(2, 0, 1)[None]  # (1, C, H, W)
    x1 = F.relu(_apply_conv(t, p, "d0"))
    x2 = F.relu(_apply_conv(x1, p, "d1"))
    x2 = F.relu(_apply_conv(x2, p, "d2"))
    x3 = F.relu(_apply_conv(x1 + x2, p, "d3"))
    x4 = F.relu(_apply_conv(x3, p, "d4"))
    x4 = F.relu(_apply_conv(x4, p, "d5"))
    x5 = F.relu(_apply_conv(x3 + x4, p, "d6"))
    x5 = F.relu(_apply_conv(x5, p, "d7"))
    x5 = _apply_conv(x5, p, "d8")
    out = F.normalize(x5, dim=1)  # channel dim, like reference line 194
    expect = out[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_scale_decoder_matches_torch_conv_stack():
    rng = np.random.default_rng(2)
    scl = ScaleDecoder()
    x = rng.normal(size=(4, 7, 16)).astype(np.float32)
    variables = scl.init(jax.random.PRNGKey(3), jnp.asarray(x))
    got = np.asarray(scl.apply(variables, jnp.asarray(x)))

    p = variables["params"]
    t = torch.from_numpy(x).permute(2, 0, 1)[None]
    h = t
    for i in range(5):
        h = F.relu(_apply_conv(h, p, f"d{i}"))
    h = _apply_conv(h, p, "d5")
    out = torch.softmax(h, dim=1)  # softmax over channel (reference line 241)
    expect = out[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, expect, atol=2e-5)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_decoders_bf16_compute_close_to_f32():
    """decoder_bf16 runs the dense stacks in bf16 with f32 params; the
    unit-norm / softmax outputs must stay within bf16 tolerance of the
    f32 stack (same params: dtype only changes compute, not init)."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(5, 6, 16)).astype(np.float32))

    dec32 = FeatureDecoder(output_dim=40, hidden=32)
    dec16 = FeatureDecoder(output_dim=40, hidden=32, dtype=jnp.bfloat16)
    variables = dec32.init(jax.random.PRNGKey(5), x)
    f32 = np.asarray(dec32.apply(variables, x))
    bf16 = np.asarray(dec16.apply(variables, x))
    assert bf16.dtype == np.float32  # final normalise is f32
    np.testing.assert_allclose(bf16, f32, atol=3e-2)

    scl32 = ScaleDecoder()
    scl16 = ScaleDecoder(dtype=jnp.bfloat16)
    sv = scl32.init(jax.random.PRNGKey(6), x)
    s32 = np.asarray(scl32.apply(sv, x))
    s16 = np.asarray(scl16.apply(sv, x))
    np.testing.assert_allclose(s16, s32, atol=3e-2)
    np.testing.assert_allclose(s16.sum(-1), 1.0, atol=1e-5)
