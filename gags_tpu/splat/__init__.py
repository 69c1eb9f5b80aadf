from gags_tpu.splat.projection import ProjectedGaussians, project_gaussians
from gags_tpu.splat.reference import rasterize_reference
from gags_tpu.splat.rasterizer import rasterize, RasterizeConfig
from gags_tpu.splat.render import render, RenderOutput

__all__ = [
    "ProjectedGaussians",
    "project_gaussians",
    "rasterize_reference",
    "rasterize",
    "RasterizeConfig",
    "render",
    "RenderOutput",
]
