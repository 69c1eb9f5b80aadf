"""GAD loss library, vectorised with segment reductions.

Counterparts of the reference's `utils/loss_utils.py` — but the per-region
python loops there (`Scale_balance_loss` lines 47-54 and
`scale_region_regulation_loss` lines 117-133, each a host loop over segment
ids with device syncs) become `jax.ops.segment_sum` over a static segment
capacity, so the whole loss stack stays inside one jitted step.

Conventions: images channel-last (H, W, C); seg maps int32 (H, W) with -1
for "no mask" (the reference keeps float maps with -1.0).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# GAGS_L1_DOT=1: channel-mean reductions over wide (P, 512) maps as an
# exact f32 MXU matmul instead of a VPU reduce. Rationale (r5 battery-1
# FSUP train profile): XLA assigns {0,1} (pixel-minor) layouts to the
# multiply_reduce fusions consuming the (P, 512) GT gather terms, while
# the gathers/decoder emit {1,0} — three 1.41 ms {1,0}→{0,1} copies per
# step. A dot consumer keeps {1,0}. precision=HIGHEST keeps the operands
# exact f32 (no bf16 operand quantisation); only the reduction
# association changes (matmul tree vs row reduce) — last-ulp level.
_L1_DOT = os.environ.get("GAGS_L1_DOT", "0") == "1"


def channel_mean(v: jnp.ndarray) -> jnp.ndarray:
    """Mean over the trailing channel dim: (..., C) → (...).

    With GAGS_L1_DOT and a wide channel dim, runs as an (P, C) @ (C, 8)
    f32 HIGHEST-precision matmul (column 0) so the consumer accepts the
    producer's {1,0} row-major layout; tiny/odd channel counts keep the
    plain reduce (the MXU win only exists when C spans many lanes).
    """
    c = v.shape[-1]
    if not (_L1_DOT and c >= 128):
        return jnp.mean(v, axis=-1)
    lead = v.shape[:-1]
    ones = jnp.zeros((c, 8), v.dtype).at[:, 0].set(1.0 / c)
    out = jax.lax.dot_general(
        v.reshape(-1, c), ones, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[:, 0].reshape(lead)


def l1(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x - y))


def l1_map(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel L1 averaged over channels: (H, W, C) → (H, W).

    (reference `l1_loss_map` averages over the channel dim, loss_utils.py:23-24)
    """
    return channel_mean(jnp.abs(x - y))


def l2(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def cosine_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """1 - mean cosine similarity along channels."""
    num = jnp.sum(x * y, axis=-1)
    den = jnp.linalg.norm(x, axis=-1) * jnp.linalg.norm(y, axis=-1)
    return 1.0 - jnp.mean(num / jnp.maximum(den, 1e-8))


def scale_entropy_loss(scale_map: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Entropy regulariser pushing the 3-way softmax toward one-hot.

    scale_map: (H, W, 3). Matches `scale_regulation_loss` (loss_utils.py:59-66).
    """
    return jnp.mean(-scale_map * jnp.log(scale_map + eps))


def _float0_like(x):
    import numpy as np

    return np.zeros(x.shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dense_segsum(values, ids, num_segments):
    """Differentiable dense segment-sum: Pallas one-hot-matmul forward
    (XLA's scatter lowering costs ~2 ms per 230k-row segment_sum on v5e),
    GATHER backward (dvalues[p] = g[ids[p]])."""
    return _dense_segsum_impl(values, ids, num_segments)


def _dense_segsum_impl(values, ids, num_segments):
    from gags_tpu.splat import pallas_kernel as pk

    return pk.dense_segment_sum_fwd(
        values, ids, num_segments, interpret=jax.default_backend() == "cpu"
    )


def _dense_segsum_fwd(values, ids, num_segments):
    return _dense_segsum_impl(values, ids, num_segments), (ids,)


def _dense_segsum_bwd(num_segments, res, g):
    (ids,) = res
    from gags_tpu.splat.tiles import fast_gather_rows

    # OOB ids are dropped by the forward — their cotangent must be zero,
    # not the last segment's (clamping the gather index alone would leak it)
    in_range = ids < num_segments
    rows = fast_gather_rows(g, jnp.where(in_range, ids, 0))
    return jnp.where(in_range[:, None], rows, 0.0), _float0_like(ids)


_dense_segsum.defvjp(_dense_segsum_fwd, _dense_segsum_bwd)


def _segsum(values2d: jnp.ndarray, ids: jnp.ndarray, num_segments: int):
    """(P, C) rows summed per segment — dense Pallas kernel for the usual
    segment counts, XLA segment_sum beyond its VMEM comfort zone."""
    if num_segments <= 2048:
        return _dense_segsum(values2d, ids, num_segments)
    return jax.ops.segment_sum(values2d, ids, num_segments=num_segments)


def region_balanced_l1(
    loss_map: jnp.ndarray,  # (H, W) per-pixel loss
    seg: jnp.ndarray,  # (H, W) int32 mixed segment ids, -1 = invalid
    max_segments: int,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Mean over regions of the per-region mean loss.

    Matches `Scale_balance_loss(mix_seg=True)` (loss_utils.py:36-57): regions
    weigh equally regardless of pixel count, so small objects aren't drowned
    out by walls/floors.

    With `axis_name` (inside shard_map over image strips), the per-region
    sums/counts are psum-reduced over the mesh axis first, so the result is
    the exact full-image loss on every device.
    """
    ids = (seg + 1).reshape(-1)  # 0 = invalid bucket
    flat = loss_map.reshape(-1)
    packed = jnp.stack([jnp.ones_like(flat), flat], axis=1)  # (P, 2)
    out = _segsum(packed, ids, max_segments + 1)
    cnts, sums = out[1:, 0], out[1:, 1]
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
        cnts = jax.lax.psum(cnts, axis_name)
    present = cnts > 0
    means = jnp.where(present, sums / jnp.maximum(cnts, 1.0), 0.0)
    return jnp.sum(means) / jnp.maximum(jnp.sum(present), 1)


def region_variance_loss(
    feat: jnp.ndarray,  # (..., C) — (H, W, C) or pre-flattened (H*W, C)
    seg: jnp.ndarray,  # (H, W) int32, -1 = invalid
    max_segments: int,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Pixel-count-weighted per-region feature variance.

    Matches `scale_region_regulation_loss(mix_seg=True)` (loss_utils.py:
    103-136): for each region with >=2 pixels, the unbiased variance per
    channel, averaged over channels, times the pixel count; summed and
    normalised by H*W.

    With `axis_name`, moments are psum-reduced over image strips (exact
    full-image variance on every device); h is then the strip height, so
    the h*w normaliser is rescaled by the axis size.
    """
    c = feat.shape[-1]
    ids = (seg + 1).reshape(-1)
    flat = feat.reshape(-1, c)
    ns = max_segments + 1
    packed = jnp.concatenate(
        [jnp.ones((flat.shape[0], 1), feat.dtype), flat, flat * flat], axis=1
    )  # (P, 1+2C) — one kernel pass computes count + both moments
    out = _segsum(packed, ids, ns)
    cnt, s1, s2 = out[:, 0], out[:, 1 : 1 + c], out[:, 1 + c :]
    npix = flat.shape[0]
    if axis_name is not None:
        cnt = jax.lax.psum(cnt, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
        npix = npix * jax.lax.axis_size(axis_name)
    n = cnt[:, None]
    # unbiased: (sum(x^2) - n*mean^2) / (n - 1)
    var = (s2 - s1 * s1 / jnp.maximum(n, 1.0)) / jnp.maximum(n - 1.0, 1.0)
    var = jnp.maximum(var, 0.0)  # guard fp cancellation
    valid = (cnt >= 2).at[0].set(False)  # drop the invalid bucket
    contrib = jnp.where(valid, cnt * jnp.mean(var, axis=-1), 0.0)
    return jnp.sum(contrib) / npix


def tv_loss(feat: jnp.ndarray) -> jnp.ndarray:
    """Total variation on (H, W, C) (reference loss_utils.py:201-210)."""
    dx = feat[:, 1:, :] - feat[:, :-1, :]
    dy = feat[1:, :, :] - feat[:-1, :, :]
    return jnp.sum(dx * dx) + jnp.sum(dy * dy)
