"""Feature / granularity decoders.

Functional counterparts of the reference's `CNN_decoder` and
`CNN_scale_decoder` (`models/networks.py:109-248`). Every layer there is a
1x1 convolution, i.e. a per-pixel MLP — on TPU we express them channel-last
as `nn.Dense` over (..., C), which XLA lowers to (H*W, C) @ (C, C') MXU
matmuls; no conv machinery, no NCHW layouts.

Architectures (exact parity with the reference):
  FeatureDecoder (networks.py:126-194): 16→256, then 7x 256→256 with two
    additive skip connections, final 256→512, L2-normalised over channels.
  ScaleDecoder (networks.py:225-241): 16→64→128→64→32→16→3, ReLU between,
    softmax over the 3 granularities.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """kaiming_uniform(a=sqrt(5)) — torch's Conv/Linear default: U(+-1/sqrt(fan_in)).

    Matters beyond parity: zero-init biases (the flax default) make the whole
    decoder output exactly zero at step 0 (features start at zero), and
    ReLU'(0)=0 then blocks every gradient — training would never start.
    """
    fan_in = shape[0]
    bound = (1.0 / fan_in) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_conv_bias_init(fan_in):
    bound = (1.0 / fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _dense(feat_out, fan_in, name, dtype=None):
    return nn.Dense(
        feat_out,
        name=name,
        dtype=dtype,  # compute dtype; params stay f32 (param_dtype default)
        kernel_init=_torch_conv_kernel_init,
        bias_init=_torch_conv_bias_init(fan_in),
    )


class FeatureDecoder(nn.Module):
    """16-dim distilled features → 512-dim CLIP space, per pixel.

    ``dtype=jnp.bfloat16`` runs the dense stack in mixed precision: bf16
    matmuls + activations with f32 params, and the final L2-normalise in
    f32. The (HW, 256) intermediates are the train step's dominant HBM
    traffic (r4 battery-8 profile: 8-9 HBM-bound ~1 ms fusions), so bf16
    halves their bytes; the GT supervision targets are themselves fp16
    CLIP embeds (reference preprocess.py:33-35), so bf16 activations sit
    inside the supervision's own precision.
    """

    output_dim: int = 512
    hidden: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., C_in) channel-last. Returns (..., output_dim), unit-norm."""
        h = self.hidden
        c_in = x.shape[-1]
        dt = self.dtype
        x1 = nn.relu(_dense(h, c_in, "d0", dt)(x))
        x2 = nn.relu(_dense(h, h, "d1", dt)(x1))
        x2 = nn.relu(_dense(h, h, "d2", dt)(x2))
        x3 = nn.relu(_dense(h, h, "d3", dt)(x1 + x2))
        x4 = nn.relu(_dense(h, h, "d4", dt)(x3))
        x4 = nn.relu(_dense(h, h, "d5", dt)(x4))
        x5 = nn.relu(_dense(h, h, "d6", dt)(x3 + x4))
        x5 = nn.relu(_dense(h, h, "d7", dt)(x5))
        x5 = _dense(self.output_dim, h, "d8", dt)(x5)
        x5 = x5.astype(jnp.float32)
        # L2-normalise with a grad-safe rsqrt (x=0 gives 0, not NaN —
        # features start at zero so the unprotected sqrt VJP would poison
        # the very first step)
        sq = jnp.sum(x5 * x5, axis=-1, keepdims=True)
        return x5 * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))


class ScaleDecoder(nn.Module):
    """16-dim features → 3-way granularity (subpart/part/whole) softmax."""

    output_dim: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, h in enumerate((64, 128, 64, 32, 16)):
            x = nn.relu(_dense(h, x.shape[-1], f"d{i}", self.dtype)(x))
        x = _dense(self.output_dim, x.shape[-1], "d5", self.dtype)(x)
        return nn.softmax(x.astype(jnp.float32), axis=-1)
