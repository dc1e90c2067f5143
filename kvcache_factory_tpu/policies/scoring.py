"""Shared scoring primitives for prefill-time KV compression.

This is the TPU-native equivalent of the observation-window scoring that every
reference cluster repeats inline (pyramidkv/pyramidkv_utils.py:317-333 SnapKV,
:544-561 H2O, :647-672 AdaKV, :781-806 HeadKV): softmax(QK^T/sqrt(d)) in fp32
with a causal mask on the trailing window-by-window block, column-reduced over
the observation window and 1-D pooled.

Differences from the reference dictated by TPU/XLA:

* All shapes are static.  The prompt may be right-padded to a bucket length
  ``S``; ``true_len`` carries the actual prompt length and every mask below is
  derived from it, so results are identical to an unpadded run.
* Pooling uses ``lax.reduce_window`` with the exact zero / -inf edge padding
  semantics of ``torch.nn.functional.{avg,max}_pool1d`` (count_include_pad
  defaults to True for avg_pool1d, matching zero-count padding).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.attention import NEG_INF  # canonical mask constant


def pool1d(scores: jnp.ndarray, kernel_size: int, pooling: str) -> jnp.ndarray:
    """1-D pooling over the last axis, stride 1, torch-style `same` padding.

    Matches ``F.avg_pool1d(x, k, padding=k//2, stride=1)`` /
    ``F.max_pool1d(...)`` as used at pyramidkv_utils.py:328-333.  torch pads
    avg-pool with zeros that *are* counted (count_include_pad=True) and
    max-pool with -inf; callers must therefore pre-fill invalid positions with
    0 (avg) or -inf (max) so padding inside the array behaves like torch's
    out-of-array padding.

    Note: for even ``kernel_size`` torch's output keeps length ``n`` with
    padding k//2 on both sides minus one trailing element; the reference only
    uses odd kernels (5 and 7), which this implementation matches exactly.
    """
    if kernel_size == 1:
        return scores
    pad = kernel_size // 2
    if pooling == "avgpool":
        summed = lax.reduce_window(
            scores, 0.0, lax.add, (1,) * (scores.ndim - 1) + (kernel_size,),
            (1,) * scores.ndim, [(0, 0)] * (scores.ndim - 1) + [(pad, pad)],
        )
        return summed / kernel_size
    elif pooling == "maxpool":
        return lax.reduce_window(
            scores, -jnp.inf, lax.max, (1,) * (scores.ndim - 1) + (kernel_size,),
            (1,) * scores.ndim, [(0, 0)] * (scores.ndim - 1) + [(pad, pad)],
        )
    raise ValueError(f"Pooling method not supported: {pooling}")


def window_attention_probs(
    k: jnp.ndarray,  # [H, S, D] post-RoPE keys
    q: jnp.ndarray,  # [H, S, D] queries (same layout)
    true_len: jnp.ndarray,  # scalar int32, actual prompt length (<= S)
    window_size: int,
) -> jnp.ndarray:
    """fp32 softmax attention of the last ``window_size`` queries over all keys.

    Reproduces pyramidkv_utils.py:317-326: a causal mask is applied only
    within the trailing window x window block, softmax runs in fp32 over the
    full row (window columns included in the denominator).  Padded columns
    (>= true_len) are masked out.  Returns ``[H, w, S]``.
    """
    H, S, D = q.shape
    w = window_size
    win_start = true_len - w  # dynamic scalar

    # Gather the window queries [H, w, D] at dynamic offset win_start.
    q_win = lax.dynamic_slice_in_dim(q, win_start, w, axis=1)

    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    logits = jnp.einsum(
        "hwd,hsd->hws", q_win.astype(jnp.float32), k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * scale  # [H, w, S]

    cols = lax.broadcasted_iota(jnp.int32, (w, S), 1)
    rows = lax.broadcasted_iota(jnp.int32, (w, S), 0)  # row i = query win_start+i
    # Causal mask inside the trailing window block (reference builds the w x w
    # triangular mask and adds it to the last w columns only, :318-324).
    in_window_col = cols >= win_start
    causal_bad = in_window_col & (cols - win_start > rows)
    padding_col = cols >= true_len
    logits = jnp.where((causal_bad | padding_col)[None], NEG_INF, logits)

    return jax.nn.softmax(logits, axis=-1)  # fp32, matches :326


def window_attention_scores(
    k: jnp.ndarray,
    q: jnp.ndarray,
    true_len: jnp.ndarray,
    window_size: int,
    *,
    reduce: str = "sum",  # "sum" (SnapKV/PyramidKV) | "mean" (AdaKV/HeadKV)
) -> jnp.ndarray:
    """Observation-window column scores, one scalar per past key position.

    Column sum/mean over window rows of :func:`window_attention_probs`
    (pyramidkv_utils.py:327 sum, :661 mean).  Returns ``[H, S]`` fp32 scores;
    positions ``>= true_len - window_size`` (the window itself and
    right-padding) are NEG_INF.
    """
    H, S, _ = q.shape
    probs = window_attention_probs(k, q, true_len, window_size)
    if reduce == "sum":
        scores = jnp.sum(probs, axis=1)  # [H, S]
    elif reduce == "mean":
        scores = jnp.mean(probs, axis=1)
    else:
        raise ValueError(reduce)

    col_ids = lax.broadcasted_iota(jnp.int32, (H, S), 1)
    return jnp.where(col_ids >= true_len - window_size, NEG_INF, scores)


def full_attention_scores(
    k: jnp.ndarray,  # [H, S, D]
    q: jnp.ndarray,  # [H, S, D]
    true_len: jnp.ndarray,
    window_size: int,
    *,
    row_block: int = 256,
) -> jnp.ndarray:
    """H2O heavy-hitter scores: column sums of softmax(QK^T) over ALL queries.

    Reproduces pyramidkv_utils.py:544-554 including its quirk: the only causal
    mask applied is the trailing window x window block — earlier query rows
    attend to *future* keys in the scoring pass.  Unlike the reference (which
    materializes the full [H, S, S] matrix — its O(n^2) memory hot spot), the
    query rows are processed in blocks of ``row_block`` and only the running
    per-column sums are kept, so peak memory is O(H * row_block * S).

    Returns ``[H, S]`` fp32 scores with window/pad columns at NEG_INF.
    """
    H, S, D = q.shape
    w = window_size
    win_start = true_len - w
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))

    rb = min(row_block, S)
    n_blocks = (S + rb - 1) // rb
    pad_S = n_blocks * rb
    if pad_S != S:
        q = jnp.pad(q, ((0, 0), (0, pad_S - S), (0, 0)))
    q_blocks = q.reshape(H, n_blocks, rb, D).transpose(1, 0, 2, 3)  # [nb, H, rb, D]

    kf = k.astype(jnp.float32)
    col_ids_1d = lax.broadcasted_iota(jnp.int32, (1, S), 1)  # [1, S]

    def body(carry, qb_and_idx):
        acc = carry
        qb, blk = qb_and_idx
        logits = jnp.einsum(
            "hrd,hsd->hrs", qb.astype(jnp.float32), kf,
            preferred_element_type=jnp.float32,
        ) * scale  # [H, rb, S]
        row_ids = blk * rb + lax.broadcasted_iota(jnp.int32, (rb, S), 0)
        cols = lax.broadcasted_iota(jnp.int32, (rb, S), 1)
        causal_bad = (row_ids >= win_start) & (cols >= win_start) & (cols > row_ids)
        padding_col = cols >= true_len
        logits = jnp.where((causal_bad | padding_col)[None], NEG_INF, logits)
        probs = jax.nn.softmax(logits, axis=-1)
        valid_row = (row_ids[:, :1] < true_len)  # padded query rows excluded
        acc = acc + jnp.sum(probs * valid_row[None], axis=1)
        return acc, None

    init = jnp.zeros((H, S), jnp.float32)
    # Under shard_map (pp_generate) q/k are varying over the mesh axis while
    # this zeros init is not; scan requires carry in/out types (incl. varying
    # manual axes) to match — stamp the init with q's vma.
    vma = getattr(jax.typeof(q), "vma", frozenset())
    if vma:
        init = lax.pcast(init, tuple(vma), to="varying")
    blk_idx = jnp.arange(n_blocks, dtype=jnp.int32)
    scores, _ = lax.scan(body, init, (q_blocks, blk_idx))

    return jnp.where(col_ids_1d >= win_start, NEG_INF, scores)


def masked_pool(scores: jnp.ndarray, valid_upto: jnp.ndarray,
                kernel_size: int, pooling: str) -> jnp.ndarray:
    """Pool scores whose valid region is ``[0, valid_upto)``.

    Emulates the reference pooling over an array that *ends* at
    ``n - window``: invalid positions are pre-filled with torch's edge padding
    value (0 for avg, -inf for max) so boundary windows match, then re-masked
    to NEG_INF after pooling so top-k never selects them.
    """
    S = scores.shape[-1]
    col_ids = lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1)
    invalid = col_ids >= valid_upto
    fill = 0.0 if pooling == "avgpool" else -jnp.inf
    pooled = pool1d(jnp.where(invalid, fill, scores), kernel_size, pooling)
    return jnp.where(invalid, NEG_INF, pooled)
