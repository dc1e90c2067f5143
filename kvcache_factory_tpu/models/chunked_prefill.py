"""Chunked prefill: process a prompt in fixed-size chunks, compress at the end.

Serving motivation (no reference counterpart — the reference evaluates one
sequence at a time, run_longbench.py:339): continuous-batching admission
currently prefills a whole prompt in ONE dispatch, stalling every running
decode stream for the prompt's full prefill time (~1.3 s at 32k on a v5e).
Chunked prefill bounds that stall to one chunk (`chunk_size` tokens) so
admission interleaves with decode chunks (runtime/batching.py wiring).

Semantics are EXACT, not approximate: chunk attention is ordinary causal
attention of the chunk's queries over all keys written so far (prefix +
chunk), so the hidden states equal the one-shot prefill's up to fp
reassociation, and compression runs once at the end with the same policy
code (`compress_prefill`).  The one piece of state compression needs beyond
the uncompressed K/V is the trailing queries: every supported policy reads
``q`` only through its last ``max(window, 32)`` rows (SnapKV-family window
scoring slices ``q[true_len-w : true_len]``, scoring.py:84; ThinK saliency
slices ``q[-32:]``, think.py:42; CAM reuses the window probs), so each
layer keeps a ``[B, Hq, WK, D]`` rolling store and finalize scatters it
back into a zeros-elsewhere full-shape ``q`` — bitwise the rows the
policies read, zeros where they don't look.

H2O (round 5): the reference's H2O scoring is NOT causal — it applies a
causal mask only to the trailing window x window block, so every earlier
query row attends to FUTURE keys (pyramidkv_utils.py:544-554) and each
row's softmax denominator needs the FULL key buffer.  Streaming per-chunk
column sums would therefore compute a different (causal) score; exact
parity requires retaining every query row until finalize.  That is what
h2o chunked does: the query store becomes a FULL ``[L, B, Hq, S, D]``
buffer laid out at global row positions (written with the same masked row
writes as K/V), and finalize hands it to the unchanged one-shot H2O
scorer.  The cost is memory, not impossibility: + ``L · B · Hq · S · D``
elements — ~2.9 GB bf16 at 32k for the 1.1B flagship (Hq/Hkv = 4x the
per-buffer KV cost), on top of the ~1.4 GB of KV below.  Prefix caching
still composes: a snapshot's full-q store holds the prefix's query rows
bitwise at their global positions, so resume is exact.

Unsupported (a loud error, not silent drift): ``minference`` sparse
prefill — the chunk attention here is dense-causal; a sparse chunked pass
would compute a different function.

Memory note: unlike one-shot prefill (which compresses layer-by-layer
inside the scan and never holds two layers' uncompressed KV), chunked
prefill holds ALL layers' uncompressed KV until finalize —
``2 · L · B · Hkv · S · D`` elements (~1.4 GB bf16 at 32k for the 1.1B
flagship; h2o adds the full query store, above).  That is the price of
bounded admission stalls.  Under a (dp, tp) mesh the buffers shard over
tp kv-heads (and dp rows when they divide), dividing the per-device cost
by tp — at the reference's Llama-3-8B geometry (L=32, Hkv=8, D=128) a
32k-bucket row is ~4.3 GB unsharded but ~1.1 GB/device at tp=4.

Reference citations: prefill/compress semantics match models/llama.py
``prefill`` (itself matching llama_model.py:2136-2245); chunk attention is
``blocked_causal_attention`` math with a row offset.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import CompressionConfig, ModelConfig, QuantConfig, dtype_of
from ..ops.attention import blocked_causal_attention
from ..policies.methods import LayerContext, compress_prefill
from .llama import (PrefillResult, _merge_heads, _split_heads, apply_rope,
                    build_cache_from_packed, ffn_block, rms_norm,
                    rope_inv_freq, wdot)

def _check_supported(comp: CompressionConfig):
    if comp.sparse_prefill is not None:
        raise NotImplementedError(
            "chunked prefill computes dense causal attention per chunk; "
            "MInference sparse prefill patterns require the one-shot path.")


def chunk_step(
    params: dict,
    cfg: ModelConfig,
    toks_chunk: jnp.ndarray,  # [B, Sc] int32 (right-padded rows are inert)
    c0: jnp.ndarray,          # scalar | [B] int32: global offset per row
    true_len: jnp.ndarray,    # [B] int32 (GLOBAL prompt lengths)
    kbuf: jnp.ndarray,        # [L, B, Hkv, S, D] uncompressed keys so far
    vbuf: jnp.ndarray,
    qwin: jnp.ndarray,        # [L, B, Hq, WK, D] trailing-query store
    x_last: jnp.ndarray,      # [B, hidden] pre-final-norm last-token hidden
    mesh=None,                # (dp, tp) Mesh: shard the chunk attention
):
    """Run one chunk through all layers; returns updated
    (kbuf, vbuf, qwin, x_last).  ``c0`` is traced, so one compiled program
    serves every chunk of a bucket; a [B] vector gives every batch row its
    own prefill depth, so CONCURRENT admissions advance in ONE dispatch
    (round-4 verdict: the serial per-slot drain paid a full ~30 ms tunnel
    dispatch per pending admission per loop).  Rows with ``c0 >= true_len``
    are inert: their buffers, query store, and last-hidden are untouched
    (free pool rows carry true_len 0).

    ``mesh``: a (dp, tp) device mesh — batch rows shard over dp (when dp
    divides B; otherwise replicated), heads over tp.  The flash chunk
    kernel runs per-shard via its shard_map wrapper; the XLA fallback and
    every matmul partition under GSPMD against the tp-sharded weights."""
    B, Sc = toks_chunk.shape
    L = cfg.num_hidden_layers
    S = kbuf.shape[3]
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    WK = qwin.shape[3]
    dtype = dtype_of(cfg)

    c0 = jnp.broadcast_to(jnp.asarray(c0, jnp.int32), (B,))
    active = c0 < true_len  # [B]

    inv_freq = rope_inv_freq(cfg)
    t = (c0[:, None] + jnp.arange(Sc)[None, :]).astype(jnp.float32)  # [B, Sc]
    freqs = t[..., None] * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    cos, sin = jnp.cos(emb), jnp.sin(emb)  # [B, Sc, D]
    use_flash = (jax.default_backend() in ("tpu", "axon") and D % 128 == 0)

    if WK != S:
        # window-store gather indices: target slot j holds global position
        # true_len - WK + j; its row inside THIS chunk is that minus c0.
        # (The full-q store, WK == S, writes rows at their global
        # positions instead and never reads these.)
        src = (true_len[:, None] - WK + jnp.arange(WK)[None, :]
               - c0[:, None])  # [B, WK]
        src_valid = (src >= 0) & (src < Sc)
        src_c = jnp.clip(src, 0, Sc - 1)

    def write_rows(buf, new):  # [B, H, S, D], [B, H, Sc, D] at row offsets c0
        def one(b, n, c, act):
            w = lax.dynamic_update_slice(b, n, (0, c, 0))
            return jnp.where(act, w, b)
        return jax.vmap(one)(buf, new, c0, active)

    x = params["embed"][toks_chunk].astype(dtype)

    def layer_fn(carry, scanned):
        x, kbuf, vbuf, qwin = carry
        lp, li = scanned
        h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
        qkv = wdot(h, lp["qkv_proj"])
        if "qkv_bias" in lp:
            qkv = qkv + lp["qkv_bias"]
        q = _split_heads(qkv[..., :Hq * D], Hq, D)
        k = _split_heads(qkv[..., Hq * D:(Hq + Hkv) * D], Hkv, D)
        v = _split_heads(qkv[..., (Hq + Hkv) * D:], Hkv, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        kl = lax.dynamic_index_in_dim(kbuf, li, 0, keepdims=False)
        vl = lax.dynamic_index_in_dim(vbuf, li, 0, keepdims=False)
        kl = write_rows(kl, k.astype(dtype))
        vl = write_rows(vl, v.astype(dtype))
        kbuf = lax.dynamic_update_index_in_dim(kbuf, kl, li, 0)
        vbuf = lax.dynamic_update_index_in_dim(vbuf, vl, li, 0)

        if use_flash and mesh is not None:
            # multi-device chunk attention: the same chunk-mode kernel per
            # (dp, tp) shard via shard_map (GSPMD cannot partition
            # pallas_call); row offsets shard over dp with their rows
            from ..ops.kernels.flash_prefill import \
                flash_prefill_attention_batched_sharded
            attn, _ = flash_prefill_attention_batched_sharded(
                mesh, q, kl, vl, true_len, 0,
                sliding_window=cfg.sliding_window, row_offset=c0)
        elif use_flash:
            # chunk mode of the flash kernel: q rows carry global ids
            # row_offset[b] + r and blocks past each q block's causal
            # frontier are skipped — all chunks together cost exactly the
            # causal half, at kernel speed (window=0: no score emission; the
            # trailing-query store covers scoring at finalize)
            from ..ops.kernels import flash_prefill as _fp
            attn, _ = _fp.flash_prefill_attention_batched(
                q, kl, vl, true_len, 0, sliding_window=cfg.sliding_window,
                row_offset=c0)
        else:
            # the shared blocked helper with global row offsets (one
            # implementation of the masked-softmax math, per the repo's
            # kernel-divergence lesson); partitions under GSPMD when the
            # inputs/weights are mesh-sharded.  Cost note (round-4 advisor):
            # this path multiplies every chunk against the FULL bucket-sized
            # buffer (masked past the frontier), ~2x the one-shot FLOPs
            # summed over chunks — acceptable because it only serves
            # CPU/test runs; the flash chunk mode skips frontier blocks
            # via kv_hi and is what every TPU path uses.
            attn = blocked_causal_attention(q, kl, vl, true_len,
                                            cfg.sliding_window,
                                            row_offset=c0)
        h = wdot(_merge_heads(attn), lp["o_proj"])
        if "o_bias" in lp:
            h = h + lp["o_bias"]
        x = x + h
        h2 = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
        x = x + ffn_block(h2, lp, cfg)

        qw = lax.dynamic_index_in_dim(qwin, li, 0, keepdims=False)
        if WK == S:
            # full-q store (h2o): rows live at their global positions, so
            # the update is the same Sc-row masked write as K/V — no
            # whole-store rewrite per chunk
            qw = write_rows(qw, q.astype(qw.dtype))
        else:
            # roll the trailing-query store: slots whose source row is in
            # this chunk take it, others keep their previous value
            gathered = jnp.take_along_axis(
                q, src_c[:, None, :, None], axis=2)  # [B, Hq, WK, D]
            qw = jnp.where((src_valid & active[:, None])[:, None, :, None],
                           gathered.astype(qw.dtype), qw)
        qwin = lax.dynamic_update_index_in_dim(qwin, qw, li, 0)
        return (x, kbuf, vbuf, qwin), None

    (x, kbuf, vbuf, qwin), _ = lax.scan(
        layer_fn, (x, kbuf, vbuf, qwin),
        (params["layers"], jnp.arange(L, dtype=jnp.int32)))

    last_row = true_len - 1 - c0  # [B]
    xl = jnp.take_along_axis(x, jnp.clip(last_row, 0, Sc - 1)[:, None, None],
                             axis=1)[:, 0]
    in_chunk = (last_row >= 0) & (last_row < Sc) & active
    x_last = jnp.where(in_chunk[:, None], xl.astype(x_last.dtype), x_last)
    return kbuf, vbuf, qwin, x_last


def finalize(
    params: dict,
    cfg: ModelConfig,
    comp: CompressionConfig,
    kbuf: jnp.ndarray,        # [L, B, Hkv, S, D]
    vbuf: jnp.ndarray,
    qwin: jnp.ndarray,        # [L, B, Hq, WK, D]
    x_last: jnp.ndarray,      # [B, hidden]
    true_len: jnp.ndarray,    # [B]
    cache_capacity: int,
    *,
    rng: Optional[jax.Array] = None,
    head_capacity: Optional[jnp.ndarray] = None,
    quant: Optional[QuantConfig] = None,
) -> PrefillResult:
    """Compress every layer's accumulated KV and build the configured cache.

    The trailing-query store is scattered into a zeros-elsewhere full-shape
    q at rows [true_len - WK, true_len) — bitwise the rows the policies
    read (module docstring).  Prompts shorter than WK fill only the last
    ``true_len`` slots of the store (slot j holds global row
    true_len - WK + j, so slots j < WK - true_len have no source row); the
    roll below shifts the valid tail to row 0 so every stored row lands at
    its global position.  Compression CAN fire for such prompts (any config
    with max_capacity_prompt < WK), so the placement must be exact — a
    straight dynamic_update_slice at row 0 shifted every row by
    WK - true_len (round-4 advisor finding)."""
    L, B, Hkv, S, D = kbuf.shape
    Hq = cfg.num_attention_heads
    WK = qwin.shape[3]
    dtype = dtype_of(cfg)
    cache_heads = comp.cache_heads(Hq, Hkv)
    policy_capacity = comp.layer_capacity(L, S)
    assert cache_capacity >= policy_capacity
    think_packed = comp.method == "think" and comp.think_packed
    if think_packed:
        # same loud rejection as one-shot prefill: a quant cache built from
        # the packed KV would silently drop the channel pruning
        assert quant is None and not comp.decode_evict, \
            "think_packed composes with neither the quantized cache nor " \
            "decode_evict"

    if rng is None:
        rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, L)
    hc = (jnp.zeros((L, cache_heads), jnp.int32) if head_capacity is None
          else jnp.asarray(head_capacity, jnp.int32))

    start = jnp.where(true_len >= WK, true_len - WK, 0)  # [B]

    def place(qw, st, tl):  # [Hq, WK, D], scalar, scalar -> [Hq, S, D]
        # tl < WK: slots [WK - tl, WK) hold rows [0, tl); roll them to the
        # front so the update at row 0 places each row at its global id.
        # The wrapped (sourceless, zero) slots land at rows >= tl, which no
        # policy reads (window slices end at tl; h2o masks rows >= tl).
        qw = jnp.roll(qw, jnp.minimum(tl, WK) - WK, axis=1)
        return lax.dynamic_update_slice(
            jnp.zeros((Hq, S, D), qw.dtype), qw, (0, st, 0))

    def per_layer(_, inp):
        kl, vl, qw_l, li, hcl, key = inp
        if WK == S:
            # full-q store (h2o): rows already at global positions
            q_sub = qw_l
        else:
            q_sub = jax.vmap(place, in_axes=(0, 0, 0))(
                qw_l, start, true_len)  # [B, Hq, S, D]
        ctx = LayerContext(li, hcl if comp.method == "headkv" else None,
                           key if comp.method in ("cam", "random") else None,
                           None)
        packed = compress_prefill(comp, L, policy_capacity, kl, vl, q_sub,
                                  true_len, ctx)
        pad = cache_capacity - policy_capacity
        k_layer = jnp.pad(packed.k,
                          ((0, 0), (0, 0), (0, pad), (0, 0))).astype(dtype)
        v_layer = jnp.pad(packed.v,
                          ((0, 0), (0, 0), (0, pad), (0, 0))).astype(dtype)
        if think_packed:
            from ..policies.think import (aggregate_queries_per_kv_head,
                                          think_channel_keep_idx)
            q_for = (q_sub if cache_heads == Hq
                     else aggregate_queries_per_kv_head(q_sub, Hkv))
            channels = jax.vmap(think_channel_keep_idx,
                                in_axes=(0, 0, 0, 0, None))(
                packed.k, packed.lengths, q_for, true_len,
                comp.pruning_ratio)
            return None, (k_layer, v_layer, packed.lengths, channels)
        return None, (k_layer, v_layer, packed.lengths)

    layer_ids = jnp.arange(L, dtype=jnp.int32)
    channels_all = None
    if think_packed:
        _, (k_all, v_all, len_all, channels_all) = lax.scan(
            per_layer, None, (kbuf, vbuf, qwin, layer_ids, hc, keys))
    else:
        _, (k_all, v_all, len_all) = lax.scan(
            per_layer, None, (kbuf, vbuf, qwin, layer_ids, hc, keys))

    xf = rms_norm(x_last[:, None], params["final_norm"], cfg.rms_norm_eps)
    logits_last = wdot(xf[:, 0], params["lm_head"]).astype(jnp.float32)

    cache = build_cache_from_packed(cfg, comp, quant, k_all, v_all, len_all,
                                    channels_all, true_len, cache_capacity,
                                    policy_capacity)
    return PrefillResult(logits_last, cache, None)


def init_chunked_state(cfg: ModelConfig, comp: CompressionConfig,
                       batch: int, S: int):
    """Zeroed chunked-prefill carry (kbuf, vbuf, qwin, x_last).

    ``h2o`` sets WK = S: its reference scoring needs every query row
    (module docstring), so the store becomes a full q buffer laid out at
    global row positions — +L*B*Hq*S*D elements of memory, the honest cost
    of exact H2O parity under chunking."""
    L = cfg.num_hidden_layers
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    dtype = dtype_of(cfg)
    WK = S if comp.method == "h2o" else min(max(comp.window_size, 32), S)
    return (jnp.zeros((L, batch, Hkv, S, D), dtype),
            jnp.zeros((L, batch, Hkv, S, D), dtype),
            jnp.zeros((L, batch, Hq, WK, D), dtype),
            jnp.zeros((batch, cfg.hidden_size), dtype))


@functools.partial(jax.jit, static_argnames=("cfg", "comp", "cache_capacity",
                                             "chunk_size", "quant"))
def prefill_chunked(
    params: dict,
    cfg: ModelConfig,
    comp: CompressionConfig,
    tokens: jnp.ndarray,     # [B, S] int32, right-padded
    true_len: jnp.ndarray,   # [B]
    cache_capacity: int,
    chunk_size: int,
    rng: Optional[jax.Array] = None,
    head_capacity: Optional[jnp.ndarray] = None,
    quant: Optional[QuantConfig] = None,
) -> PrefillResult:
    """One-call chunked prefill (lax.scan over chunks) — the standalone API;
    the batching engine instead drives :func:`chunk_step` incrementally so
    decode chunks interleave between prompt chunks."""
    _check_supported(comp)
    B, S = tokens.shape
    assert S % chunk_size == 0, \
        f"bucket {S} must divide into {chunk_size}-token chunks"
    n_chunks = S // chunk_size
    state = init_chunked_state(cfg, comp, B, S)
    tl = true_len.astype(jnp.int32)

    def body(carry, c):
        kbuf, vbuf, qwin, x_last = carry
        toks_c = lax.dynamic_slice(tokens, (0, c * chunk_size),
                                   (B, chunk_size))
        carry = chunk_step(params, cfg, toks_c, c * chunk_size, tl,
                           kbuf, vbuf, qwin, x_last)
        return carry, None

    (kbuf, vbuf, qwin, x_last), _ = lax.scan(
        body, state, jnp.arange(n_chunks, dtype=jnp.int32))
    return finalize(params, cfg, comp, kbuf, vbuf, qwin, x_last, tl,
                    cache_capacity, rng=rng, head_capacity=head_capacity,
                    quant=quant)
