"""Unified static-shape KV selection core.

Every reference cluster ends with the same motif: top-k over per-token scores,
gather of the selected past KV, concat with the observation window
(pyramidkv_utils.py:334-347 and nine near-copies).  On TPU the variable-length
``torch.cat`` outputs are replaced by ONE static-shape primitive:

    select_and_pack(k, v, scores, budget, window, true_len, capacity)
        -> (k_out [H, C, D], v_out [H, C, D], lengths [H])

* ``capacity`` C is static (chosen at trace time from the config);
* ``budget`` is a dynamic per-head vector — this single degree of freedom
  expresses SnapKV (uniform), PyramidKV (per-layer), AdaKV/HeadKV (per-head),
  and L2Norm (window 0);
* the packed layout is ``[top-`budget` tokens in score order | window | pad]``
  with ``lengths = budget + window`` (or ``true_len`` on the reference's
  no-compress branch, pyramidkv_utils.py:314-315).  Key/value order within the
  packed buffer is score-descending exactly like the reference's
  ``topk().indices`` gather; attention is permutation-invariant over keys so
  only membership matters for logits parity.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class PackedKV(NamedTuple):
    k: jnp.ndarray        # [H, C, D]
    v: jnp.ndarray        # [H, C, D]
    lengths: jnp.ndarray  # [H] int32 — valid entries per head


def select_and_pack(
    k: jnp.ndarray,        # [H, S, D]
    v: jnp.ndarray,        # [H, S, D]
    scores: jnp.ndarray,   # [H, S] fp32, NEG_INF at unselectable positions
    budget: jnp.ndarray,   # [H] int32 — top-scored past tokens to keep
    window_size: int,
    true_len: jnp.ndarray,  # scalar int32
    capacity: int,
    no_compress: jnp.ndarray,  # scalar bool — reference q_len < cap branch
    return_indices: bool = False,
) -> PackedKV:
    """When ``return_indices``, returns ``(PackedKV, sel_idx [H, C])`` where
    ``sel_idx`` is the COMPRESSED-branch gather index layout (top-budget then
    window) — consumers like the LOOK-M pivot merge need the routing that was
    actually packed, and reconstructing it outside would silently diverge if
    this layout ever changes."""
    H, S, D = k.shape
    C = capacity
    assert C <= S, f"capacity {C} must not exceed source length {S}"
    w = window_size

    top_k = min(C, S)
    _, top_idx = lax.top_k(scores, top_k)  # [H, top_k], score-descending
    if top_k < C:  # only when S < C, excluded by assert; kept for safety
        top_idx = jnp.pad(top_idx, ((0, 0), (0, C - top_k)))

    pos = lax.broadcasted_iota(jnp.int32, (H, C), 1)
    budget = budget[:, None]  # [H, 1]
    win_start = true_len - w
    # Positions [0, budget): selected tokens; [budget, budget+w): the window.
    win_idx = win_start + (pos - budget)
    sel_idx = jnp.where(pos < budget, top_idx, jnp.clip(win_idx, 0, S - 1))
    # No-compress branch: identity layout, first true_len tokens.
    idx = jnp.where(no_compress, jnp.minimum(pos, S - 1), sel_idx)

    k_out = jnp.take_along_axis(k, idx[:, :, None], axis=1)
    v_out = jnp.take_along_axis(v, idx[:, :, None], axis=1)

    lengths = jnp.where(
        no_compress,
        jnp.full((H,), 1, jnp.int32) * true_len.astype(jnp.int32),
        (budget[:, 0] + w).astype(jnp.int32),
    )
    lengths = jnp.minimum(lengths, C)
    packed = PackedKV(k_out, v_out, lengths)
    if return_indices:
        return packed, sel_idx
    return packed


def grouped_scores_to_heads(
    scores_g: jnp.ndarray,  # [H_kv, G, S] per-query-head scores
    group_reduce: str,
) -> jnp.ndarray:
    """Collapse per-query-head scores to the score layout used for selection.

    ``"none"`` reproduces the reference exactly: compression runs after
    repeat_kv (llama_model.py:158-167), one selection per *query* head →
    returns [H_kv * G, S].  The other modes aggregate within each GQA group
    and return [H_kv, S], keeping the cache at num_key_value_heads (a TPU
    memory-saving extension; changes accuracy slightly).
    """
    Hkv, G, S = scores_g.shape
    if group_reduce == "none":
        return scores_g.reshape(Hkv * G, S)
    if group_reduce == "mean":
        return jnp.mean(scores_g, axis=1)
    if group_reduce == "max":
        return jnp.max(scores_g, axis=1)
    if group_reduce == "sum":
        return jnp.sum(scores_g, axis=1)
    raise ValueError(group_reduce)
