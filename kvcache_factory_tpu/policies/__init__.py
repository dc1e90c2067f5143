from .base import PackedKV, select_and_pack
from .methods import LayerContext, compress_layer, compress_prefill, pyramid_budget
from .scoring import (full_attention_scores, masked_pool, pool1d,
                      window_attention_probs, window_attention_scores)

__all__ = [
    "PackedKV", "select_and_pack", "LayerContext", "compress_layer",
    "compress_prefill", "pyramid_budget", "full_attention_scores",
    "masked_pool", "pool1d", "window_attention_probs", "window_attention_scores",
]
