from gags_tpu.models.decoders import FeatureDecoder, ScaleDecoder

__all__ = ["FeatureDecoder", "ScaleDecoder"]
