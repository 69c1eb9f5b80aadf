from gags_tpu.gas import prompts, masks, depth_sampler

__all__ = ["prompts", "masks", "depth_sampler"]
