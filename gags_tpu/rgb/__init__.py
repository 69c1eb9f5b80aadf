from gags_tpu.rgb.train import RgbConfig, RgbState, create_rgb_state, make_rgb_step

__all__ = ["RgbConfig", "RgbState", "create_rgb_state", "make_rgb_step"]
