"""Prefill-time KV compression: one dispatcher over all reference methods.

This module replaces the reference's ten near-identical ``*Cluster.update_kv``
classes (pyramidkv/pyramidkv_utils.py:173-878) with pure functions sharing one
``score -> budget -> select_and_pack`` pipeline.  Everything is jit-safe with
static shapes; the per-example ``true_len`` drives all masking so right-padded
bucketed prefill produces results identical to exact-length runs.

Call layout: per batch element (vmap'd by the caller or by
:func:`compress_prefill`), heads-first tensors.

Reference semantics notes (each cited in the per-method branches):
 * compression operates after repeat_kv, i.e. per *query* head
   (llama_model.py:158-167) — reproduced by ``group_reduce="none"``;
 * the no-compress branch is a strict ``q_len < max_capacity_prompt``
   (pyramidkv_utils.py:314);
 * top-k selection order (score-descending) is preserved; attention is
   permutation-invariant over the packed axis, so logits match.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..config import CompressionConfig
from .adakv import adakv_budgets
from .base import PackedKV, select_and_pack
from .cam import cam_merge_values
from .lookm import lookm_pivot_merge
from .scoring import (NEG_INF, full_attention_scores, masked_pool,
                      window_attention_probs, window_attention_scores)
from .think import think_prune_channels


class LayerContext(NamedTuple):
    """Per-layer inputs that vary under ``lax.scan`` over layers."""

    layer_idx: jnp.ndarray  # scalar int32
    head_capacity: Optional[jnp.ndarray] = None  # [H] int32 (HeadKV)
    rng: Optional[jax.Array] = None  # PRNG key (CAM bernoulli / random scores)
    # Observation-window column sums emitted in-kernel by the Pallas flash
    # prefill ([H_q, S], NEG_INF-masked at >= true_len - window); when present
    # snapkv/pyramidkv/think (sum) and adakv/headkv (sum / window = mean)
    # skip their separate scoring matmul.
    window_scores: Optional[jnp.ndarray] = None


def _repeat_heads(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """GQA repeat_kv: [H_kv, S, D] -> [H_kv * G, S, D] (llama repeat_kv)."""
    if groups == 1:
        return x
    Hkv, S, D = x.shape
    return jnp.broadcast_to(x[:, None], (Hkv, groups, S, D)).reshape(Hkv * groups, S, D)


def _reduce_groups(scores: jnp.ndarray, groups: int, mode: str) -> jnp.ndarray:
    """[H_q, S] query-head scores -> selection scores ([H_q,S] or [H_kv,S])."""
    if mode == "none" or groups == 1:
        return scores
    Hq, S = scores.shape
    g = scores.reshape(Hq // groups, groups, S)
    if mode == "mean":
        return jnp.mean(g, axis=1)
    if mode == "max":
        return jnp.max(g, axis=1)
    if mode == "sum":
        return jnp.sum(g, axis=1)
    raise ValueError(mode)


def pyramid_budget(cfg: CompressionConfig, num_layers: int,
                   layer_idx: jnp.ndarray, true_len: jnp.ndarray) -> jnp.ndarray:
    """PyramidKV per-layer budget schedule (pyramidkv_utils.py:205-215).

    ``min_num=(cap-w)//beta``, ``max_num=2*(cap-w)-min_num``, clamped so
    ``max_num <= q_len - w``; layer budget ``max_num - layer_idx * steps``.
    The middle branch (``q_len < 2*(cap-w)``, :220) falls back to the uniform
    SnapKV budget ``cap - w`` (:238).
    """
    base = cfg.base_capacity
    w = cfg.window_size
    min_num = jnp.asarray(base // cfg.beta, jnp.int32)
    max_num = jnp.asarray(base * 2 - base // cfg.beta, jnp.int32)
    clamp = max_num >= true_len - w
    max_num_c = jnp.where(clamp, true_len - w, max_num)
    min_num_c = jnp.where(clamp, base * 2 - max_num_c, min_num)
    steps = (max_num_c - min_num_c) // max(num_layers - 1, 1)
    pyr = max_num_c - layer_idx * steps
    budget = jnp.where(true_len < 2 * base, base, pyr)
    return jnp.clip(budget, 0, jnp.maximum(true_len - w, 0))


def compress_layer(
    cfg: CompressionConfig,
    num_layers: int,
    capacity: int,
    k: jnp.ndarray,  # [H_kv, S, D] post-RoPE keys
    v: jnp.ndarray,  # [H_kv, S, D]
    q: jnp.ndarray,  # [H_q, S, D]
    true_len: jnp.ndarray,  # scalar int32
    ctx: LayerContext,
) -> PackedKV:
    """Compress one layer's prefill KV. Output heads: H_q for
    ``group_reduce='none'`` (reference parity), else H_kv."""
    Hkv, S, D = k.shape
    Hq = q.shape[0]
    groups = Hq // Hkv
    w = cfg.window_size
    C = capacity
    method = cfg.method

    if method in ("fullkv", "minference"):
        # Uncompressed cache stays at num_key_value_heads — no repeat_kv
        # blowup.  (minference = sparse PREFILL attention only; the cache is
        # retained in full, pyramidkv/minference.py:49-59.)
        lens = jnp.broadcast_to(jnp.minimum(true_len, C).astype(jnp.int32), (Hkv,))
        return PackedKV(k[:, :C], v[:, :C], lens)

    per_query_cache = cfg.group_reduce == "none"
    k_sel = _repeat_heads(k, groups) if per_query_cache else k
    v_sel = _repeat_heads(v, groups) if per_query_cache else v
    H_out = k_sel.shape[0]

    no_compress = true_len < cfg.max_capacity_prompt
    k_rep = _repeat_heads(k, groups)  # scoring always per query head

    scores = None

    if method in ("snapkv", "pyramidkv", "think"):
        if ctx.window_scores is not None:
            raw = ctx.window_scores
        else:
            raw = window_attention_scores(k_rep, q, true_len, w, reduce="sum")
        raw = _reduce_groups(raw, groups, cfg.group_reduce)
        scores = masked_pool(raw, true_len - w, cfg.kernel_size, cfg.pooling)
        if method == "pyramidkv":
            budget = jnp.broadcast_to(
                pyramid_budget(cfg, num_layers, ctx.layer_idx, true_len), (H_out,))
        else:
            budget = jnp.broadcast_to(jnp.asarray(cfg.base_capacity, jnp.int32), (H_out,))

    elif method in ("adakv", "headkv"):
        if ctx.window_scores is not None:
            raw = ctx.window_scores / w
        else:
            raw = window_attention_scores(k_rep, q, true_len, w, reduce="mean")
        raw = _reduce_groups(raw, groups, cfg.group_reduce)
        scores = masked_pool(raw, true_len - w, cfg.kernel_size, cfg.pooling)
        max_budget = jnp.asarray(C - w, jnp.int32)
        if method == "adakv":
            budget = adakv_budgets(scores, cfg.base_capacity, cfg.floor_ratio,
                                   cfg.normalize, true_len - w, max_budget)
        else:
            assert ctx.head_capacity is not None, "HeadKV requires per-head capacities"
            budget = jnp.clip(ctx.head_capacity.astype(jnp.int32), 0,
                              jnp.minimum(max_budget, true_len - w))

    elif method == "h2o":
        raw = full_attention_scores(k_rep, q, true_len, w)
        scores = _reduce_groups(raw, groups, cfg.group_reduce)
        budget = jnp.broadcast_to(jnp.asarray(cfg.base_capacity, jnp.int32), (H_out,))

    elif method == "cam":
        probs = window_attention_probs(k_rep, q, true_len, w)  # [H_q, w, S]
        col_sum = jnp.sum(probs, axis=1)
        col_mean = jnp.mean(probs, axis=1)
        assert ctx.rng is not None, "CAM requires an rng key for Bernoulli merging"
        v_rep = _repeat_heads(v, groups)

        def merged_values(_):
            vm = cam_merge_values(v_rep, col_mean, true_len,
                                  cfg.start_budget_ratio, w, ctx.rng)
            if per_query_cache:
                return vm
            # aggregate merged values back per kv head (group mean)
            return jnp.mean(vm.reshape(Hkv, groups, S, D), axis=1)

        # The reference's no-compress branch returns the UNTOUCHED KV
        # (pyramidkv_utils.py:450-455 early return before any merging) —
        # merging must not leak into short prompts.
        v_sel = lax.cond(no_compress, lambda _: v_sel, merged_values, None)
        reduced = _reduce_groups(col_sum, groups, cfg.group_reduce)
        col_ids = lax.broadcasted_iota(jnp.int32, reduced.shape, 1)
        scores = jnp.where(col_ids >= true_len - w, NEG_INF, reduced)
        budget = jnp.broadcast_to(jnp.asarray(cfg.base_capacity, jnp.int32), (H_out,))

    elif method == "streamingllm":
        # Keep the first (cap - w) positions (attention sinks) + the window
        # (pyramidkv_utils.py:607-620): score = -position selects them in order.
        col_ids = lax.broadcasted_iota(jnp.int32, (H_out, S), 1)
        scores = jnp.where(col_ids >= true_len - w, NEG_INF, -col_ids.astype(jnp.float32))
        budget = jnp.broadcast_to(jnp.asarray(cfg.base_capacity, jnp.int32), (H_out,))

    elif method == "l2norm":
        # Keep the max_capacity_prompt smallest-key-norm tokens, no window
        # carve-out (pyramidkv_utils.py:405-429); skip_layers left untouched.
        norms = jnp.sqrt(jnp.sum(jnp.square(k_sel.astype(jnp.float32)), axis=-1))
        col_ids = lax.broadcasted_iota(jnp.int32, (H_out, S), 1)
        scores = jnp.where(col_ids >= true_len, NEG_INF, -norms)
        budget = jnp.broadcast_to(jnp.asarray(cfg.max_capacity_prompt, jnp.int32), (H_out,))
        if cfg.skip_layers:
            in_skip = jnp.zeros((), bool)
            for sl in cfg.skip_layers:
                in_skip = in_skip | (ctx.layer_idx == sl)
            no_compress = no_compress | in_skip
        packed = _l2_select(k_sel, v_sel, scores, budget, true_len, C, no_compress)
        return packed

    elif method == "random":
        assert ctx.rng is not None, "random policy requires an rng key"
        col_ids = lax.broadcasted_iota(jnp.int32, (H_out, S), 1)
        u = jax.random.uniform(ctx.rng, (H_out, S))
        scores = jnp.where(col_ids >= true_len - w, NEG_INF, u)
        budget = jnp.broadcast_to(jnp.asarray(cfg.base_capacity, jnp.int32), (H_out,))

    else:
        raise ValueError(f"unknown method {method}")

    budget = jnp.minimum(budget, jnp.maximum(true_len - w, 0))
    packed, gidx = select_and_pack(k_sel, v_sel, scores, budget, w, true_len,
                                   C, no_compress, return_indices=True)

    if cfg.merge == "pivot" and method in ("snapkv", "pyramidkv", "h2o", "streamingllm"):
        # gidx is the exact compressed-branch gather layout select_and_pack
        # used — merge routing stays consistent with what was packed.
        packed = jax.lax.cond(
            no_compress, lambda p: p,
            lambda p: lookm_pivot_merge(p, gidx, k_sel, v_sel, true_len), packed)

    if method == "think" and not cfg.think_packed:
        # think_packed leaves the packed keys UNPRUNED here; the model builds
        # a channel-packed ThinKCache from them (cache/think_cache.py).
        q_for_prune = q
        if not per_query_cache:
            # aggregate query stats per kv head for the grouped cache
            from .think import aggregate_queries_per_kv_head
            q_for_prune = aggregate_queries_per_kv_head(q, Hkv)
        packed = jax.lax.cond(
            no_compress, lambda p: p,
            lambda p: think_prune_channels(p, q_for_prune, true_len,
                                           cfg.pruning_ratio, cfg.recent_size), packed)

    return packed


def _l2_select(k, v, scores, budget, true_len, C, no_compress) -> PackedKV:
    """L2Norm selection: top-`cap` by score with window_size 0."""
    return select_and_pack(k, v, scores, budget, 0, true_len, C, no_compress)


def compress_prefill(
    cfg: CompressionConfig,
    num_layers: int,
    capacity: int,
    k: jnp.ndarray,  # [B, H_kv, S, D]
    v: jnp.ndarray,
    q: jnp.ndarray,  # [B, H_q, S, D]
    true_len: jnp.ndarray,  # [B]
    ctx: LayerContext,
) -> PackedKV:
    """Batched wrapper: vmap of :func:`compress_layer` over the batch.

    ``ctx.rng`` is either one key (split into ``B`` per-example keys here —
    the single-program path) or an already-split ``[B]`` key batch (the
    pp_generate microbatch path passes the global-batch slice so example i
    draws the same randomness regardless of microbatch placement).
    """
    B = k.shape[0]
    if ctx.rng is None:
        rngs = jnp.zeros((B, 2), jnp.uint32)
    else:
        # Pre-split [B] key batches are detected by key STRUCTURE, never by
        # comparing the leading dim to B: a single legacy uint32 key has
        # shape (2,) and would read as a [B] batch at B == 2 (crashing the
        # vmapped compress_layer with scalar key halves).  Typed prng keys:
        # single = ndim 0, batch = ndim 1.  Legacy uint32: single = ndim 1
        # ((2,)), batch = ndim 2 ([B, 2]).
        if jnp.issubdtype(ctx.rng.dtype, jax.dtypes.prng_key):
            presplit = ctx.rng.ndim == 1
        else:
            presplit = ctx.rng.ndim == 2
        rngs = ctx.rng if presplit else jax.random.split(ctx.rng, B)

    ws = ctx.window_scores
    if ws is None:
        ws = jnp.zeros((B, 0), jnp.float32)  # placeholder for vmap

    def per_example(k1, v1, q1, tl, r, w1):
        c = LayerContext(ctx.layer_idx, ctx.head_capacity,
                         r if ctx.rng is not None else None,
                         w1 if ctx.window_scores is not None else None)
        return compress_layer(cfg, num_layers, capacity, k1, v1, q1, tl, c)

    return jax.vmap(per_example)(k, v, q, true_len.astype(jnp.int32), rngs, ws)
