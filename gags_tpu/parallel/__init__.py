from gags_tpu.parallel.sharding import make_mesh, make_dp_render, make_dp_train_step
from gags_tpu.parallel.gshard import (
    GShardState,
    gshard_state,
    make_gshard_render,
    make_gshard_train_step,
    pad_seg_map,
    shard_gaussians,
)

__all__ = [
    "make_mesh",
    "make_dp_render",
    "make_dp_train_step",
    "GShardState",
    "gshard_state",
    "make_gshard_render",
    "make_gshard_train_step",
    "pad_seg_map",
    "shard_gaussians",
]
