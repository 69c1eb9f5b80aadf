from gags_tpu.gad import losses
from gags_tpu.gad.supervision import blend_gt_feature_map, mixed_seg_map

__all__ = ["losses", "blend_gt_feature_map", "mixed_seg_map"]
