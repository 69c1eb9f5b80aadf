from gags_tpu.core.transforms import (
    quat_to_rotmat,
    build_covariance_3d,
    build_scaling_rotation,
    strip_symmetric,
    inverse_sigmoid,
)
from gags_tpu.core.sh import eval_sh, rgb_to_sh, sh_to_rgb, SH_C0
from gags_tpu.core.camera import (
    Camera,
    world_to_view,
    projection_matrix,
    fov_to_focal,
    focal_to_fov,
    intrinsics_from_fov,
)

__all__ = [
    "quat_to_rotmat",
    "build_covariance_3d",
    "build_scaling_rotation",
    "strip_symmetric",
    "inverse_sigmoid",
    "eval_sh",
    "rgb_to_sh",
    "sh_to_rgb",
    "SH_C0",
    "Camera",
    "world_to_view",
    "projection_matrix",
    "fov_to_focal",
    "focal_to_fov",
    "intrinsics_from_fov",
]
