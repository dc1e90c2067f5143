from .kv_cache import KVCache, append_layer, init_cache, valid_mask

__all__ = ["KVCache", "append_layer", "init_cache", "valid_mask"]
