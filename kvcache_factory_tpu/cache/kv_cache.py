"""Fixed-capacity padded KV cache — the TPU-native cache substrate.

Replaces three reference components at once (SURVEY.md §2.2-2.3):

* HF ``DynamicCache`` (variable-length ``torch.cat`` growth) — hostile to XLA;
* ``DynamicCacheSplitHeadFlatten`` (pyramidkv_utils.py:28-102), the ragged
  per-head flat cache for AdaKV/HeadKV whose decode append reallocates and
  copies the whole cache through a CUDA kernel every token per layer
  (csrc/csrc/cuda_api.cu:11-53);
* the ``kv_seq_len`` bookkeeping the reference monkeypatches onto every
  attention layer (llama_model.py:161-172).

Design: one stacked buffer ``[L, B, H, C, D]`` plus per-head valid lengths
``[L, B, H]``.  Ragged per-head budgets are just unequal lengths over the same
padded buffer.  Decode append is a single masked scatter (one-hot on the
capacity axis) — no reallocation, no native kernel, fully fused by XLA into
the decode step.  ``positions`` tracks the *uncompressed* token count so RoPE
keeps advancing past the compressed length exactly like the reference's
``_seen_tokens`` force-sync (llama_model.py:172, 2208).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class KVCache(NamedTuple):
    k: jnp.ndarray          # [L, B, H, C, D]
    v: jnp.ndarray          # [L, B, H, C, D]
    lengths: jnp.ndarray    # [L, B, H] int32 — valid entries per head
    positions: jnp.ndarray  # [B] int32 — uncompressed tokens seen (RoPE clock)

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]


def init_cache(num_layers: int, batch: int, num_heads: int, capacity: int,
               head_dim: int, dtype=jnp.bfloat16) -> KVCache:
    return KVCache(
        k=jnp.zeros((num_layers, batch, num_heads, capacity, head_dim), dtype),
        v=jnp.zeros((num_layers, batch, num_heads, capacity, head_dim), dtype),
        lengths=jnp.zeros((num_layers, batch, num_heads), jnp.int32),
        positions=jnp.zeros((batch,), jnp.int32),
    )


def append_layer(
    k_cache: jnp.ndarray,   # [B, H, C, D] one layer's key buffer
    v_cache: jnp.ndarray,
    lengths: jnp.ndarray,   # [B, H]
    k_new: jnp.ndarray,     # [B, H, 1, D] one decode token
    v_new: jnp.ndarray,
):
    """Append one token per head at each head's current length.

    The one-hot-masked write compiles to a fused select on TPU — this is the
    whole replacement for the reference's realloc+copy CUDA append
    (cuda_api.cu:11-53): O(C) streamed instead of O(C) reallocated, and it
    handles ragged per-head lengths with no varlen metadata.
    """
    C = k_cache.shape[2]
    slot = lax.broadcasted_iota(jnp.int32, k_cache.shape[:3], 2)  # [B, H, C]
    onehot = (slot == lengths[:, :, None])[..., None]             # [B, H, C, 1]
    k_out = jnp.where(onehot, k_new, k_cache)
    v_out = jnp.where(onehot, v_new, v_cache)
    return k_out, v_out, jnp.minimum(lengths + 1, C)


def valid_mask(lengths: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """[..., H] lengths -> [..., H, C] boolean validity mask."""
    slot = lax.broadcasted_iota(jnp.int32, lengths.shape + (capacity,),
                                lengths.ndim)
    return slot < lengths[..., None]


class EvictingKVCache(NamedTuple):
    """KVCache + per-slot accumulated attention mass + insertion timestamps
    for decode-stage eviction (H2O-at-decode — the reference's unchecked TODO,
    README.md:31: "Support KV cache compression at decoding stage").

    Each decode step adds the step's attention probabilities to ``scores``;
    when a head's cache is full the new token overwrites the lowest-scored
    slot whose timestamp falls outside the protected recent window, so decode
    memory stays bounded at the cache capacity forever."""

    k: jnp.ndarray          # [L, B, H, C, D]
    v: jnp.ndarray          # [L, B, H, C, D]
    scores: jnp.ndarray     # [L, B, H, C] f32 accumulated attention
    stamps: jnp.ndarray     # [L, B, H, C] int32 insertion position
    lengths: jnp.ndarray    # [L, B, H]
    positions: jnp.ndarray  # [B]

    @property
    def capacity(self) -> int:
        return self.k.shape[3]


def init_eviction_stamps(lengths: jnp.ndarray, positions: jnp.ndarray,
                         capacity: int) -> jnp.ndarray:
    """Prefill stamps: slot i of a head with ``len`` entries gets
    ``position - (len - i)`` so the packed tail (the observation window) is
    treated as recent.  lengths [L,B,H], positions [B] -> [L,B,H,C]."""
    slot = lax.broadcasted_iota(jnp.int32, lengths.shape + (capacity,),
                                lengths.ndim)
    return positions[None, :, None, None] - (lengths[..., None] - slot)
