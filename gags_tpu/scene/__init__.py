from gags_tpu.scene.ply import read_ply, write_ply, read_gaussian_ply, write_gaussian_ply
from gags_tpu.scene.gaussian_data import GaussianScene

__all__ = [
    "read_ply",
    "write_ply",
    "read_gaussian_ply",
    "write_gaussian_ply",
    "GaussianScene",
]
