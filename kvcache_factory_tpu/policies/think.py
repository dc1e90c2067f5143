"""ThinK query-driven key-channel pruning.

Reference: pyramidkv/pyramidkv_utils.py:13-26 (key_pruner_query_driven) and
:349-391 (SnapKVCluster.update_think): after SnapKV token selection, per-head
channel saliency ``mean(q[-32:]**2) * mean(k**2)`` is computed on the
*compressed* keys, and the lowest ``ratio`` fraction of head_dim channels is
dropped for all but the last ``recent_size`` tokens.

TPU-native representation: instead of materializing a narrower ``[*, d-k]``
tensor plus a boolean mask consumed by a special decode forward
(llama_model_think.py:175-181), pruned channels are *zeroed in place*.  The
decode dot product ``q . k`` over zeroed channels is bit-identical to the
reference's masked-query x pruned-key product, needs no special-cased
attention, and the memory saving is realized in the quantized / Pallas cache
path rather than by shape change.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .base import PackedKV

_QUERY_WINDOW = 32  # hard-coded q[..., -32:, :] in the reference (:17)


def think_saliency(
    k: jnp.ndarray,          # [H, C, D] packed keys
    lengths: jnp.ndarray,    # [H] valid rows
    q: jnp.ndarray,          # [H, S, D] full prefill queries
    true_len: jnp.ndarray,   # scalar int32
) -> jnp.ndarray:
    """Per-head channel saliency ``mean(q[-32:]**2) * mean(k**2)`` over valid
    rows (key_pruner_query_driven, pyramidkv_utils.py:17-21). [H, D] fp32."""
    H, C, D = k.shape
    S = q.shape[1]
    # Reference q[..., -32:, :] takes min(32, S) rows; padding rows past
    # true_len must not contaminate the mean (torch has no padding).
    w = min(_QUERY_WINDOW, S)
    start = jnp.clip(true_len - w, 0, S - w)
    q_win = lax.dynamic_slice_in_dim(q, start, w, axis=1)  # [H, w, D]
    q_rows = start + jnp.arange(w)
    q_valid = (q_rows < true_len).astype(jnp.float32)[None, :, None]
    qf = jnp.square(q_win.astype(jnp.float32)) * q_valid
    queries_norm = jnp.sum(qf, axis=1) / jnp.maximum(
        jnp.sum(q_valid, axis=1), 1.0)  # [H, D]

    row_ids = lax.broadcasted_iota(jnp.int32, (H, C), 1)
    row_valid = (row_ids < lengths[:, None]).astype(jnp.float32)  # [H, C]
    kf = jnp.square(k.astype(jnp.float32)) * row_valid[..., None]
    keys_norm = jnp.sum(kf, axis=1) / jnp.maximum(
        jnp.sum(row_valid, axis=1, keepdims=True), 1.0)  # [H, D]
    return queries_norm * keys_norm


def aggregate_queries_per_kv_head(q: jnp.ndarray, n_kv_heads: int) -> jnp.ndarray:
    """Mean-pool query heads onto their kv head for saliency when the cache
    is grouped ([..., Hq, S, D] -> [..., Hkv, S, D]); shared by the in-place
    and packed ThinK paths so the aggregation rule can't diverge."""
    *lead, Hq, S, D = q.shape
    groups = Hq // n_kv_heads
    return jnp.mean(q.reshape(*lead, n_kv_heads, groups, S, D), axis=-3)


def think_channel_keep_idx(
    k: jnp.ndarray,          # [H, C, D]
    lengths: jnp.ndarray,    # [H]
    q: jnp.ndarray,          # [H, S, D]
    true_len: jnp.ndarray,
    pruning_ratio: float,
) -> jnp.ndarray:
    """Kept-channel indices [H, D - int(D*ratio)] int32, ascending — the
    packed-storage complement of the reference's dropped-channel top-k
    (largest=False over saliency, pyramidkv_utils.py:22)."""
    H, C, D = k.shape
    dkeep = D - int(D * pruning_ratio)
    saliency = think_saliency(k, lengths, q, true_len)
    _, keep_idx = lax.top_k(saliency, dkeep)
    return jnp.sort(keep_idx, axis=-1).astype(jnp.int32)


def think_prune_channels(
    packed: PackedKV,
    q: jnp.ndarray,          # [H, S, D] full prefill queries
    true_len: jnp.ndarray,   # scalar int32
    pruning_ratio: float,
    recent_size: int,
) -> PackedKV:
    k, v, lengths = packed
    H, C, D = k.shape
    kdrop = int(D * pruning_ratio)
    if kdrop == 0:
        return packed

    saliency = think_saliency(k, lengths, q, true_len)  # [H, D]
    # Drop the kdrop smallest-saliency channels (reference topk largest=False).
    _, drop_idx = lax.top_k(-saliency, kdrop)
    keep = jnp.ones((H, D), bool).at[
        lax.broadcasted_iota(jnp.int32, (H, kdrop), 0), drop_idx].set(False)

    # Prune only non-recent rows: row < length - recent_size.
    row_ids = lax.broadcasted_iota(jnp.int32, (H, C), 1)
    prune_row = row_ids < (lengths[:, None] - recent_size)  # [H, C]
    mask = jnp.where(prune_row[..., None], keep[:, None, :], True)
    return PackedKV(jnp.where(mask, k, jnp.zeros((), k.dtype)), v, lengths)
