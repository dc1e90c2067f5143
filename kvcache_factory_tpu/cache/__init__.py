from .encdec_cache import EncoderDecoderCache, build_encoder_decoder_cache
from .kv_cache import KVCache, append_layer, init_cache, valid_mask
from .ssm_cache import SSMCache, init_ssm_cache

__all__ = ["KVCache", "append_layer", "init_cache", "valid_mask",
           "SSMCache", "init_ssm_cache",
           "EncoderDecoderCache", "build_encoder_decoder_cache"]
