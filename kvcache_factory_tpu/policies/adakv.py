"""AdaKV adaptive cross-head budget allocation (on-device, static shapes).

Reference: pyramidkv/pyramidkv_utils.py:622-757 (AdaKVCluster.update_kv).
The reference flattens all heads' descending-sorted scores, takes a global
top-(H * base) and counts hits per head to derive per-head capacities, with a
floor ``round(count * (1 - floor_ratio) + floor_capacity)`` (:706-719) and an
optional normalization that weights each head's sorted scores by the mass
fraction of its top-``base`` entries (:709-711).

The reference then materializes a ragged flattened cache with varlen metadata
for flash_attn_varlen and a CUDA realloc-append kernel (csrc/cuda_api.cu).
Here the budgets feed :func:`..base.select_and_pack` instead: per-head lengths
over a fixed-capacity padded buffer, so decode append is one scatter and no
native realloc kernel is needed (SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .scoring import NEG_INF


def adakv_budgets(
    scores: jnp.ndarray,     # [H, S] fp32, NEG_INF at invalid positions
    base_capacity: int,      # static: max_capacity_prompt - window
    floor_ratio: float,
    normalize: bool,
    n_valid: jnp.ndarray,    # scalar int32: true_len - window
    max_budget: jnp.ndarray,  # scalar int32 upper bound (capacity - window)
) -> jnp.ndarray:
    """Per-head budgets [H] that sum (before flooring/clamping) to H * base."""
    H, S = scores.shape
    sorted_scores = lax.top_k(scores, S)[0]  # descending per head
    pos = lax.broadcasted_iota(jnp.int32, (H, S), 1)
    valid = pos < n_valid
    sorted_valid = jnp.where(valid, sorted_scores, 0.0)

    adaptive = sorted_valid
    if normalize:
        # ratio = mass of each head's top-`base` scores over its total mass
        top_mass = jnp.sum(jnp.where(pos < base_capacity, sorted_valid, 0.0), axis=-1, keepdims=True)
        total_mass = jnp.sum(sorted_valid, axis=-1, keepdims=True)
        ratio = top_mass / jnp.maximum(total_mass, 1e-30)
        adaptive = adaptive * ratio

    adaptive = jnp.where(valid, adaptive, NEG_INF)
    flat = adaptive.reshape(H * S)
    _, flat_idx = lax.top_k(flat, H * base_capacity)
    head_ids = flat_idx // S
    counts = jnp.zeros((H,), jnp.float32).at[head_ids].add(1.0)

    floor_capacity = int(base_capacity * floor_ratio)
    budgets = jnp.round(counts * (1.0 - floor_ratio) + floor_capacity).astype(jnp.int32)
    return jnp.clip(budgets, 0, jnp.minimum(max_budget, n_valid))
