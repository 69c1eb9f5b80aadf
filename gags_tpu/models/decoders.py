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

import flax.linen as nn
import jax.numpy as jnp


class FeatureDecoder(nn.Module):
    """16-dim distilled features → 512-dim CLIP space, per pixel."""

    output_dim: int = 512
    hidden: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., C_in) channel-last. Returns (..., output_dim), unit-norm."""
        h = self.hidden
        x1 = nn.relu(nn.Dense(h, name="d0")(x))
        x2 = nn.relu(nn.Dense(h, name="d1")(x1))
        x2 = nn.relu(nn.Dense(h, name="d2")(x2))
        x3 = nn.relu(nn.Dense(h, name="d3")(x1 + x2))
        x4 = nn.relu(nn.Dense(h, name="d4")(x3))
        x4 = nn.relu(nn.Dense(h, name="d5")(x4))
        x5 = nn.relu(nn.Dense(h, name="d6")(x3 + x4))
        x5 = nn.relu(nn.Dense(h, name="d7")(x5))
        x5 = nn.Dense(self.output_dim, name="d8")(x5)
        norm = jnp.linalg.norm(x5, axis=-1, keepdims=True)
        return x5 / jnp.maximum(norm, 1e-12)


class ScaleDecoder(nn.Module):
    """16-dim features → 3-way granularity (subpart/part/whole) softmax."""

    output_dim: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, h in enumerate((64, 128, 64, 32, 16)):
            x = nn.relu(nn.Dense(h, name=f"d{i}")(x))
        x = nn.Dense(self.output_dim, name="d5")(x)
        return nn.softmax(x, axis=-1)
