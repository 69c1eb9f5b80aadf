"""Scene-level render entry point.

Mirrors the behavioural contract of the reference's render wrapper
(`gaussian_renderer/__init__.py:19-85`): choose colour source (SH RGB /
override / 16-dim semantic features), optional expected-depth channel
("RGB+ED"), background blending, and return the image plus visibility info.

`backend="pallas"` is the production TPU path; `backend="reference"` runs
the exact pure-JAX compositor (CPU-friendly, used by tests and tiny scenes).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gags_tpu.core.camera import Camera
from gags_tpu.core.sh import sh_colors
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.splat.rasterizer import RasterizeConfig, auto_config, rasterize
from gags_tpu.splat.reference import rasterize_reference


class RenderOutput(NamedTuple):
    render: jnp.ndarray  # (H, W, C) channel-last (C=3 RGB, 16 features, +1 if ED)
    alpha: jnp.ndarray  # (H, W)
    radii: jnp.ndarray  # (N,) int32; 0 = culled (visibility filter = radii > 0)
    means2d: jnp.ndarray  # (N, 2)


def render(
    camera: Camera,
    *,
    means: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    sh: Optional[jnp.ndarray] = None,  # (N, K, 3) SH coeffs (dc first)
    sh_degree: int = 3,
    semantic_features: Optional[jnp.ndarray] = None,  # (N, F)
    override_color: Optional[jnp.ndarray] = None,  # (N, 3)
    feature_mode: bool = False,
    render_mode: str = "RGB",  # "RGB" | "RGB+ED"
    bg_color: Optional[jnp.ndarray] = None,  # (3,) like the reference API
    scaling_modifier: float = 1.0,
    backend: str = "pallas",
    config: Optional[RasterizeConfig] = None,
) -> RenderOutput:
    """Render one camera view.

    feature_mode renders the F-dim semantic features as colour channels with
    the background's first component broadcast across all channels, exactly
    like the reference (`gaussian_renderer/__init__.py:44-47`).
    """
    if config is None:
        config = auto_config()
    if config.soa_geom:
        # lane-major geometry rides through to rasterize(); the SH and
        # expected-depth paths below consume AoS (N, 3) means, so SoA is
        # limited to feature/override colours without ED here
        assert (
            (feature_mode or override_color is not None)
            and render_mode == "RGB"
            and backend == "pallas"
        ), "soa_geom in render(): feature/override RGB mode only"
    if feature_mode:
        assert semantic_features is not None
        colors = semantic_features
        if bg_color is not None:
            bg = jnp.broadcast_to(bg_color[0], (colors.shape[-1],))
        else:
            bg = None
    elif override_color is not None:
        colors = override_color
        bg = bg_color
    else:
        assert sh is not None
        colors = sh_colors(sh_degree, sh, means, camera.campos)
        bg = bg_color

    scales = scales * scaling_modifier

    ed = render_mode == "RGB+ED"
    if ed:
        # expected depth rides along as an extra colour channel and is
        # normalised by alpha afterwards (gsplat "RGB+ED" semantics)
        depth_cam = (
            jnp.einsum(
                "nj,ij->ni", means, camera.viewmat[:3, :3],
                precision=jax.lax.Precision.HIGHEST,
            )
            + camera.viewmat[:3, 3]
        )[:, 2]
        colors = jnp.concatenate([colors, depth_cam[:, None]], axis=-1)
        if bg is not None:
            bg = jnp.concatenate([bg, jnp.zeros((1,), bg.dtype)])

    if backend == "pallas":
        res = rasterize(
            means,
            quats,
            scales,
            opacities,
            colors,
            camera.viewmat,
            camera.K,
            camera.width,
            camera.height,
            background=bg,
            config=config,
        )
        img, alpha, radii, means2d = res.image, res.alpha, res.radii, res.means2d
        if config.image_chw and not config.aligned:
            # this wrapper's contract is (H, W, C) (ED slicing, PCA vis,
            # GT losses all index channels last) — canonicalise; callers
            # that want the CHW deliverable use rasterize() directly.
            # (mirrors _image_epilogue: aligned configs never emit CHW)
            img = jnp.transpose(img, (1, 2, 0))
    elif backend == "reference":
        proj = project_gaussians(
            means, quats, scales, camera.viewmat, camera.K, camera.width, camera.height
        )
        img, alpha = rasterize_reference(
            proj.means2d,
            proj.conics,
            proj.depths,
            proj.radii,
            opacities * proj.compensations,
            colors,
            camera.width,
            camera.height,
            background=bg,
        )
        radii, means2d = proj.radii, proj.means2d
    else:
        raise ValueError(f"unknown backend {backend!r}")

    if ed:
        depth = img[..., -1:] / jnp.maximum(alpha[..., None], 1e-10)
        img = jnp.concatenate([img[..., :-1], depth], axis=-1)

    return RenderOutput(render=img, alpha=alpha, radii=radii, means2d=means2d)
