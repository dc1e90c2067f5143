"""Generation-state checkpointing: save/restore a KV cache mid-stream.

The reference's only resume mechanism is skip-existing-results in the needle
runner (run_needle_in_haystack.py:352-372, SURVEY.md §5) — a crashed LongBench
run re-decodes everything.  Here the full generation state (any cache variant
pytree + current tokens + config fingerprint) round-trips through orbax, so a
long decode can resume exactly where it stopped (bit-identical continuation,
asserted in tests).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cache.kv_cache import EvictingKVCache, KVCache
from ..cache.offload_cache import OffloadedKVCache
from ..cache.quant_cache import (QuantizedKVCache, QuantKVCacheTPU,
                                 QuantKVCacheTPU4)
from ..cache.think_cache import ThinKCache

_CACHE_TYPES = {
    "KVCache": KVCache,
    "QuantizedKVCache": QuantizedKVCache,
    "QuantKVCacheTPU": QuantKVCacheTPU,
    "QuantKVCacheTPU4": QuantKVCacheTPU4,
    "EvictingKVCache": EvictingKVCache,
    "ThinKCache": ThinKCache,
    "OffloadedKVCache": OffloadedKVCache,
}


def save_generation_state(path: str, cache, cur_tokens: jnp.ndarray,
                          generated: np.ndarray,
                          metadata: Optional[Dict[str, Any]] = None) -> str:
    """Persist cache + decoding state with orbax; returns the path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    # Drop None fields (e.g. QuantizedKVCache's optional rk/rv residual
    # ring): orbax cannot round-trip them and the NamedTuple defaults
    # restore them as None on load.
    cache_dict = {k: v for k, v in cache._asdict().items() if v is not None}
    state = {
        "cache": cache_dict,
        "cur_tokens": cur_tokens,
        "generated": jnp.asarray(generated),
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)
    meta = {"cache_type": type(cache).__name__, "metadata": metadata or {}}
    with open(os.path.join(path, "kvcf_meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def load_generation_state(path: str) -> Tuple[Any, jnp.ndarray, np.ndarray,
                                              Dict[str, Any]]:
    """Returns (cache, cur_tokens, generated, metadata)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "kvcf_meta.json")) as f:
        meta = json.load(f)
    ckptr = ocp.PyTreeCheckpointer()
    state = ckptr.restore(path)
    cache_cls = _CACHE_TYPES[meta["cache_type"]]
    cache = cache_cls(**{k: jnp.asarray(v) for k, v in state["cache"].items()})
    return (cache, jnp.asarray(state["cur_tokens"]),
            np.asarray(state["generated"]), meta["metadata"])
