"""Llama / Mistral decoder in functional JAX — one parameterized forward.

Replaces the reference's 6700 lines of hand-copied HF forwards
(pyramidkv/llama_model.py, mistral_model.py: 18+ specialized functions per
model x backend x method, SURVEY.md §2.4) with a single forward whose
compression policy is a typed config argument.  Layers are stacked and
iterated with ``lax.scan`` so compile time is O(1) in depth and the whole
model jits/pjits as one program.

Mistral differs from Llama only by the optional sliding-window attention mask
(mistral_model.py:2511-2535); both families share RMSNorm + RoPE + GQA +
SwiGLU.  Weights layout: a dict of stacked arrays, see ``models/weights.py``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..cache.kv_cache import (EvictingKVCache, KVCache, init_cache,
                              init_eviction_stamps, valid_mask)
from ..cache.quant_cache import (QuantizedKVCache, QuantKVCacheTPU,
                                 QuantKVCacheTPU4, decode_values, encode,
                                 from_packed_prefill, from_packed_prefill_tpu,
                                 from_packed_prefill_tpu4)
from ..config import CompressionConfig, ModelConfig, QuantConfig, dtype_of
from ..ops.attention import NEG_INF, blocked_causal_attention
from ..policies.methods import LayerContext, compress_prefill


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def wdot(x: jnp.ndarray, w) -> jnp.ndarray:
    """``x @ w`` where ``w`` may be weight-only-quantized (W8A16).

    Quantized weights are ``{"q": int8 [..., in, out], "s": f32
    [..., 1, out]}`` (``models/weights.py::quantize_weights``).  The
    per-OUT-channel scale commutes with the contraction over the input
    axis — ``x @ (q * s_col) == (x @ q) * s_col`` — so dequantization is a
    cheap post-dot multiply and XLA streams the int8 bytes from HBM,
    fusing the convert into the dot read (measured on v5e:
    ``tools/bench_wquant_probe.py``, 1.84x on the decode FFN chain —
    decode is weight-bandwidth-bound, BASELINE.md attribution).  No
    reference counterpart: the reference quantizes only the KV cache
    (pyramidkv/quantcache.py); weight streaming is the larger term at
    every measured batch size."""
    if isinstance(w, dict):
        # the stored f32 scale is bf16-EXACT by construction
        # (quantize_weights rounds it to bf16 before computing q), so this
        # cast to the activation dtype is lossless on TPU — a non-exact
        # scale here would stack ~2^-9 per-channel error on every matmul,
        # invisible to the CPU-f32 test suite.  (tried: doing the multiply
        # in f32 instead — measured 392.1 vs 397.5 tok/s at the B=1
        # headline, a real 1.4% for error the exact scale removes free.)
        return (x @ w["q"].astype(x.dtype)) * jnp.squeeze(
            w["s"], -2).astype(x.dtype)
    return x @ w


def wshape(w) -> tuple:
    """Shape of a possibly weight-quantized matrix."""
    return w["q"].shape if isinstance(w, dict) else w.shape


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def rope_inv_freq(cfg: ModelConfig) -> jnp.ndarray:
    """Base inverse frequencies with optional HF rope_scaling applied
    ("linear" and "llama3" frequency-dependent scaling per HF
    modeling_rope_utils)."""
    d = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    rs = cfg.rope_scaling
    if rs is None:
        return inv_freq
    rope_type, factor, low_f, high_f, orig_max = rs
    if rope_type == "linear":
        return inv_freq / factor
    if rope_type == "llama3":
        low_wavelen = orig_max / low_f
        high_wavelen = orig_max / high_f
        wavelen = 2 * jnp.pi / inv_freq
        scaled = inv_freq / factor
        smooth = (orig_max / wavelen - low_f) / (high_f - low_f)
        smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
        out = jnp.where(wavelen > low_wavelen, scaled, inv_freq)
        is_medium = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
        return jnp.where(is_medium, smoothed, out)
    raise ValueError(f"unsupported rope_scaling type {rope_type!r}")


def rope_tables(cfg: ModelConfig, max_len: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables [max_len, head_dim] (HF half-rotation convention)."""
    inv_freq = rope_inv_freq(cfg)
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [max_len, d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, T, D]; cos/sin: [B, T, D] or [T, D]."""
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, None]  # [B, 1, T, D]
    sin = sin[:, None]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(x.dtype)


def _split_heads(x: jnp.ndarray, n_heads: int, head_dim: int) -> jnp.ndarray:
    B, T, _ = x.shape
    return x.reshape(B, T, n_heads, head_dim).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    B, H, T, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * D)


def grouped_attention(
    q: jnp.ndarray,       # [B, Hq, Tq, D]
    k: jnp.ndarray,       # [B, Hk, Tk, D]  (Hk divides Hq)
    v: jnp.ndarray,       # [B, Hk, Tk, D]
    mask: jnp.ndarray,    # broadcastable to [B, Hq, Tq, Tk] boolean (True=keep)
    return_probs: bool = False,
) -> jnp.ndarray:
    """GQA attention without materializing repeated K/V (repeat_kv stays
    virtual — contrast llama_model.py:158-159 which tiles K/V to Hq).

    ``return_probs`` additionally returns the fp32 softmax probabilities
    [B, Hk, G, Tq, Tk] (the decode-eviction path accumulates per-slot
    attention mass from them — one implementation of the math, per the
    repo's kernel-divergence lesson)."""
    B, Hq, Tq, D = q.shape
    Hk = k.shape[1]
    G = Hq // Hk
    qg = q.reshape(B, Hk, G, Tq, D)
    # bf16 MXU matmul with fp32 accumulation (8x the fp32 MXU rate); softmax
    # stays fp32 like the reference's fp32 softmax (pyramidkv_utils.py:326).
    logits = jnp.einsum("bhgqd,bhkd->bhgqk", qg, k,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.asarray(D, jnp.float32))
    maskg = mask.reshape(B, Hk, G, *mask.shape[2:]) if mask.shape[1] == Hq \
        else mask[:, :, None]
    logits = jnp.where(maskg, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, Hq, Tq, D).astype(q.dtype)
    if return_probs:
        return out, probs
    return out


def swiglu_fused(x: jnp.ndarray, gate_up_w: jnp.ndarray,
                 down_w: jnp.ndarray, gate_up_b=None,
                 down_b=None) -> jnp.ndarray:
    gu = wdot(x, gate_up_w)
    if gate_up_b is not None:  # mlp_bias=True checkpoints
        gu = gu + gate_up_b
    ffn = wshape(gate_up_w)[-1] // 2
    g = jax.nn.silu(gu[..., :ffn])
    out = wdot(g * gu[..., ffn:], down_w)
    return out if down_b is None else out + down_b


def moe_router(x: jnp.ndarray, router_w: jnp.ndarray, top_k: int):
    """Mixtral routing (HF modeling_mixtral.MixtralSparseMoeBlock): fp32
    softmax over expert logits, top-k, renormalize the kept weights.

    Returns (combine [B, T, E] fp32 — zeros off the top-k, topi [B, T, k],
    topv [B, T, k] fp32 renormalized)."""
    logits = x.astype(jnp.float32) @ router_w.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = lax.top_k(probs, top_k)
    topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    combine = jnp.sum(jax.nn.one_hot(topi, probs.shape[-1], dtype=topv.dtype)
                      * topv[..., None], axis=-2)
    return combine, topi, topv


def moe_ffn(x: jnp.ndarray, lp: dict, cfg: ModelConfig,
            force_dense: bool = False) -> jnp.ndarray:
    """Mixtral sparse-MoE FFN, TPU-first in both regimes.

    Prefill / large batch: dense all-expert compute with a weighted combine —
    no token-dropping dispatch tensors, static shapes, and under an ``ep``
    mesh axis each shard runs its local experts on all tokens with one
    all-reduce for the combine (per-device cost equals the dense model when
    ep == num_local_experts).

    Decode (T == 1, small B·k): gathers only the selected experts' weight
    matrices, so HBM streams k/E of the MoE weights per step — the decode
    step stays bandwidth-optimal.

    ``force_dense`` (set by decode_step under an ep mesh, VERDICT r3 #6):
    with ``gate_up_proj`` sharded over the expert axis, GSPMD partitions the
    dynamic weight gather as clamp-to-local-shard + mask + an ALL-REDUCE of
    the gathered [B, k, h, 2f] weight matrices — whole weight matrices on
    the wire every layer every step (HLO-verified,
    tests/test_sharding.py::test_moe_ep_decode_no_weight_collective).  The
    dense path under ep is the right shape: each shard streams only its
    E/ep LOCAL experts (optimal at ep == E) and the all-reduce carries the
    combined [B, h] OUTPUT, not weights."""
    E, top_k = cfg.num_local_experts, cfg.num_experts_per_tok
    gw, dw = lp["gate_up_proj"], lp["down_proj"]  # [E, h, 2f], [E, f, h]
    F = wshape(gw)[-1] // 2
    combine, topi, topv = moe_router(x, lp["router"], top_k)
    B, T, _ = x.shape

    def ein(subs, a, w, s_bcast):
        """einsum against a possibly-quantized expert weight; the per-out-
        channel scale (axis -2 squeezed, reshaped to ``s_bcast`` for the
        output layout) commutes to a post-einsum multiply — see wdot (the
        stored scale is bf16-exact, so the dtype cast is lossless)."""
        if isinstance(w, dict):
            out = jnp.einsum(subs, a, w["q"].astype(a.dtype))
            return out * jnp.squeeze(w["s"], -2).reshape(
                s_bcast).astype(a.dtype)
        return jnp.einsum(subs, a, w)

    if T == 1 and B * top_k <= E // 2 and not force_dense:
        # Selected experts via per-(b, k) lax.dynamic_index_in_dim, NOT a
        # vector gather: XLA lowers `w[topi]` for whole expert matrices
        # catastrophically on TPU — hardware probe (v5e, 12-layer E=8
        # chain): gather 7.84 ms/step (45 GB/s of selected bytes) vs
        # dynamic slices 0.80 ms (439 GB/s; one-hot-all-experts dots sit
        # between at 2.09 ms).  B*k <= E/2 bounds the Python unroll.
        def take1(w, i):
            if isinstance(w, dict):
                return {"q": lax.dynamic_index_in_dim(w["q"], i, 0, False),
                        "s": lax.dynamic_index_in_dim(w["s"], i, 0, False)}
            return lax.dynamic_index_in_dim(w, i, 0, False)

        def take(w, idx):  # idx [B, k] -> leaves stacked [B, k, ...]
            rows = [[take1(w, idx[b, k]) for k in range(top_k)]
                    for b in range(B)]
            stack = lambda xs: jnp.stack([jnp.stack(r) for r in xs])
            if isinstance(w, dict):
                return {"q": stack([[e["q"] for e in r] for r in rows]),
                        "s": stack([[e["s"] for e in r] for r in rows])}
            return stack(rows)

        gw_sel = take(gw, topi[:, 0])  # [B, k, h, 2f] selected experts
        dw_sel = take(dw, topi[:, 0])  # [B, k, f, h]
        xb = x[:, 0]
        gu = ein("bh,bkhf->bkf", xb, gw_sel, (B, top_k, 2 * F))
        g = jax.nn.silu(gu[..., :F]) * gu[..., F:]
        eo = ein("bkf,bkfh->bkh", g, dw_sel, (B, top_k, -1))
        return jnp.einsum("bkh,bk->bh", eo,
                          topv[:, 0].astype(x.dtype))[:, None]
    gu = ein("bth,ehf->betf", x, gw, (1, E, 1, 2 * F))
    g = jax.nn.silu(gu[..., :F]) * gu[..., F:]
    eo = ein("betf,efh->beth", g, dw, (1, E, 1, -1))
    return jnp.einsum("beth,bte->bth", eo, combine.astype(x.dtype))


def ffn_block(h2: jnp.ndarray, lp: dict, cfg: ModelConfig,
              moe_force_dense: bool = False) -> jnp.ndarray:
    if cfg.is_moe:
        return moe_ffn(h2, lp, cfg, force_dense=moe_force_dense)
    return swiglu_fused(h2, lp["gate_up_proj"], lp["down_proj"],
                        lp.get("gate_up_bias"), lp.get("down_bias"))


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------


class PrefillResult(NamedTuple):
    logits_last: jnp.ndarray           # [B, V] logits at each sequence's last token
    cache: KVCache
    all_logits: Optional[jnp.ndarray]  # [B, S, V] (only when requested)


def _causal_mask(S: int, true_len: jnp.ndarray, sliding_window: Optional[int]):
    """[B, 1, S, S] boolean prefill mask (causal + right-pad + window)."""
    rows = lax.broadcasted_iota(jnp.int32, (S, S), 0)
    cols = lax.broadcasted_iota(jnp.int32, (S, S), 1)
    m = cols <= rows
    if sliding_window is not None:
        m = m & (cols > rows - sliding_window)
    m = m[None] & (cols[None] < true_len[:, None, None])
    return m[:, None]


def prefill(
    params: dict,
    cfg: ModelConfig,
    comp: CompressionConfig,
    tokens: jnp.ndarray,     # [B, S] int32, right-padded
    true_len: jnp.ndarray,   # [B] int32
    cache_capacity: int,     # static: policy capacity + decode headroom
    *,
    rng: Optional[jax.Array] = None,
    head_capacity: Optional[jnp.ndarray] = None,  # [L, H] int32 (HeadKV)
    sparse_budgets: Optional[jnp.ndarray] = None,  # [L, Hq, 2] int32
    return_all_logits: bool = False,
    quant: Optional[QuantConfig] = None,
    attn_backend: str = "auto",  # "auto" | "pallas" | "xla"
    sp_mesh=None,                # jax.sharding.Mesh with an `sp` axis
    sp_axis: str = "sp",
    mesh=None,                   # (dp, tp) Mesh: shard_map the flash kernel
) -> PrefillResult:
    """Full prefill: attention over the uncompressed prompt (reference runs
    flash attention over full K/V, llama_model.py:2243-2245), compression hook
    between QKV computation and the cache write (SURVEY.md §1 key fact).

    Sequence parallelism (``sp_mesh``): tokens arrive sharded over the
    ``sp_axis`` of the mesh; attention runs as ring attention over that axis
    (parallel/ring_attention.py — K/V shards circulate via ppermute while
    every device folds its online-softmax partials), so prefill compute and
    activations for ONE prompt split across chips.  The compression hook
    operates on the logically-global K/Q/V (GSPMD inserts the gathers; the
    packed output is `capacity` rows, tiny next to the prompt).  The
    reference has no sequence scaling at all — it truncates the prompt
    middle (run_longbench.py:199-205; SURVEY.md §2.6)."""
    B, S = tokens.shape
    L = cfg.num_hidden_layers
    dtype = dtype_of(cfg)
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    x = params["embed"][tokens].astype(dtype)  # [B, S, hidden]
    cos, sin = rope_tables(cfg, S)

    cache_heads = comp.cache_heads(Hq, Hkv)
    policy_capacity = comp.layer_capacity(L, S)
    assert cache_capacity >= policy_capacity, (
        f"cache capacity {cache_capacity} < policy capacity {policy_capacity}")

    if rng is None:
        rng = jax.random.PRNGKey(0)
    if head_capacity is None:
        head_capacity = jnp.zeros((L, cache_heads), jnp.int32)

    # The Pallas flash path computes attention AND emits the observation-
    # window scores in one kernel (north-star; ops/kernels/flash_prefill.py);
    # score-reusing methods then skip their separate scoring matmul.
    # "xla" forces the blocked path: GSPMD cannot auto-partition pallas_call,
    # so multi-device meshes (engine-wired dp/tp/ep) run the XLA paths; the
    # Pallas kernels stay the single-chip default.
    # Round-4: the kernel handles sliding-window configs (Mistral/Qwen2) and
    # plain fullkv too — scores are simply not emitted when a policy cannot
    # reuse them (window=0 skips all score work in-kernel).
    flash_ok = (attn_backend != "xla" and sp_mesh is None
                and jax.default_backend() in ("tpu", "axon")
                and D % 128 == 0)
    use_flash = flash_ok and mesh is None
    # Multi-device PREFILL keeps the kernel too (round 4, closing the
    # "kernels at scale" gap): the flash kernel is head-local, so under a
    # (dp, tp) mesh each device runs it on its [B/dp, H/tp] tile via
    # shard_map (flash_prefill_attention_batched_sharded); MInference
    # per-head budgets shard over tp with their heads.  Falls back to the
    # GSPMD blocked-XLA path when the tiling doesn't divide or the mesh has
    # an ep axis.
    flash_mesh = None
    if (flash_ok and mesh is not None
            and "ep" not in getattr(mesh, "axis_names", ())):
        dp_w = mesh.shape.get("dp", 1)
        tp_w = mesh.shape.get("tp", 1)
        if B % dp_w == 0 and Hq % tp_w == 0 and Hkv % tp_w == 0:
            flash_mesh = mesh
            use_flash = True
    sp_ring = None
    if sp_mesh is not None:
        from ..parallel.ring_attention import make_ring_attention
        sp_ring = make_ring_attention(
            sp_mesh, sp_axis, sliding_window=cfg.sliding_window,
            head_axis="tp" if "tp" in sp_mesh.axis_names else None,
            batch_axis="dp" if "dp" in sp_mesh.axis_names else None)
    scores_reusable = comp.method in ("snapkv", "pyramidkv", "think",
                                      "adakv", "headkv")

    def layer_fn(x, scanned):
        lp, layer_idx, hc, sb, key = scanned
        h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
        qkv = wdot(h, lp["qkv_proj"])
        if "qkv_bias" in lp:  # Qwen2-family QKV bias
            qkv = qkv + lp["qkv_bias"]
        q = _split_heads(qkv[..., :Hq * D], Hq, D)
        k = _split_heads(qkv[..., Hq * D:(Hq + Hkv) * D], Hkv, D)
        v = _split_heads(qkv[..., (Hq + Hkv) * D:], Hkv, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        window_scores = None
        if sp_ring is not None:
            attn = sp_ring(q, k, v, true_len.astype(jnp.int32))
        elif use_flash:
            from ..ops.kernels.flash_prefill import \
                flash_prefill_attention_batched
            # Score emission only when a policy reuses it (window=0 skips all
            # in-kernel score work otherwise).  Under sliding_window the
            # kernel's softmax stats are window-normalized, which the SnapKV
            # score definition (dense causal softmax over the window rows,
            # pyramidkv_utils.py:317-327) cannot be derived from — those
            # configs score via the XLA matmul below (w x S work, <1% of
            # prefill FLOPs), keeping policy parity exact.
            emit = scores_reusable and cfg.sliding_window is None
            win = comp.window_size if emit else 0
            # ONE kernel call for the whole batch (round 4): grid
            # (B, Hq, n_qb), per-example true_len on the [B] scalar-prefetch
            # vector — replaces the per-example unrolled-call loop.
            if flash_mesh is not None:
                from ..ops.kernels.flash_prefill import \
                    flash_prefill_attention_batched_sharded
                attn, win_sc = flash_prefill_attention_batched_sharded(
                    flash_mesh, q, k, v, true_len.astype(jnp.int32), win,
                    sparse_pattern=comp.sparse_prefill,
                    sliding_window=cfg.sliding_window,
                    sparse_head_budgets=sb if sparse_budgets is not None
                    else None)
            else:
                attn, win_sc = flash_prefill_attention_batched(
                    q, k, v, true_len.astype(jnp.int32), win,
                    sparse_pattern=comp.sparse_prefill,
                    sliding_window=cfg.sliding_window,
                    # per-layer per-head MInference budgets ([Hq, 2], sliced
                    # off the [L, Hq, 2] scan input; minference.py:9-12)
                    sparse_head_budgets=sb if sparse_budgets is not None
                    else None)
            if emit:
                cols = lax.broadcasted_iota(jnp.int32, win_sc.shape, 2)
                window_scores = jnp.where(
                    cols >= (true_len[:, None, None] - comp.window_size),
                    NEG_INF, win_sc)
        else:
            # Blocked attention: O(q_block * S) memory, exact math — the
            # prompt attends over its FULL uncompressed K/V
            # (llama_model.py:2243-2245).
            attn = blocked_causal_attention(q, k, v, true_len,
                                            cfg.sliding_window)
        h = wdot(_merge_heads(attn), lp["o_proj"])
        if "o_bias" in lp:  # attention_bias=True checkpoints
            h = h + lp["o_bias"]
        x = x + h
        h2 = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
        x = x + ffn_block(h2, lp, cfg)

        # --- compression hook: what gets WRITTEN to the cache ---
        ctx = LayerContext(layer_idx, hc if comp.method == "headkv" else None,
                           key if comp.method in ("cam", "random") else None,
                           window_scores)
        packed = compress_prefill(comp, L, policy_capacity, k, v, q,
                                  true_len, ctx)
        pad = cache_capacity - policy_capacity
        k_layer = jnp.pad(packed.k, ((0, 0), (0, 0), (0, pad), (0, 0))).astype(dtype)
        v_layer = jnp.pad(packed.v, ((0, 0), (0, 0), (0, pad), (0, 0))).astype(dtype)
        if think_packed:
            from ..policies.think import (aggregate_queries_per_kv_head,
                                          think_channel_keep_idx)
            if cache_heads == Hq:
                q_for = q
            else:  # saliency aggregated per kv head (grouped cache)
                q_for = aggregate_queries_per_kv_head(q, Hkv)
            channels = jax.vmap(think_channel_keep_idx,
                                in_axes=(0, 0, 0, 0, None))(
                packed.k, packed.lengths, q_for, true_len,
                comp.pruning_ratio)  # [B, H, Dk]
            return x, (k_layer, v_layer, packed.lengths, channels)
        return x, (k_layer, v_layer, packed.lengths)

    think_packed = comp.method == "think" and comp.think_packed
    if think_packed:
        assert quant is None and not comp.decode_evict, \
            "think_packed composes with neither the quantized cache nor decode_evict"

    layer_ids = jnp.arange(L, dtype=jnp.int32)
    keys = jax.random.split(rng, L)
    sb_all = (jnp.zeros((L, Hq, 2), jnp.int32) if sparse_budgets is None
              else jnp.asarray(sparse_budgets, jnp.int32))
    channels_all = None
    if think_packed:
        x, (k_all, v_all, len_all, channels_all) = lax.scan(
            layer_fn, x,
            (params["layers"], layer_ids, head_capacity, sb_all, keys))
    else:
        x, (k_all, v_all, len_all) = lax.scan(
            layer_fn, x,
            (params["layers"], layer_ids, head_capacity, sb_all, keys))

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    lm_head = params["lm_head"]

    # Logits at each example's last valid token.
    last_idx = jnp.maximum(true_len - 1, 0)
    x_last = jnp.take_along_axis(x, last_idx[:, None, None], axis=1)[:, 0]
    logits_last = wdot(x_last, lm_head).astype(jnp.float32)

    all_logits = wdot(x, lm_head).astype(jnp.float32) if return_all_logits else None

    cache = build_cache_from_packed(cfg, comp, quant, k_all, v_all, len_all,
                                    channels_all, true_len, cache_capacity,
                                    policy_capacity)
    return PrefillResult(logits_last, cache, all_logits)


def build_cache_from_packed(cfg, comp, quant, k_all, v_all, len_all,
                            channels_all, true_len, cache_capacity,
                            policy_capacity):
    """Packed per-layer prefill KV -> the configured cache pytree (dense /
    quant XLA / quant TPU-layout / think-packed / evicting).  Shared by the
    one-shot prefill tail and chunked prefill's finalize."""
    D = cfg.head_dim
    think_packed = comp.method == "think" and comp.think_packed
    if quant is not None:
        # Same explicit rejection think_packed gets: silently building a
        # quantized cache would drop the configured decode-stage eviction.
        assert not comp.decode_evict, \
            "decode_evict composes with the dense cache only, not quant"
        if _quant_tpu_layout(quant, D, cache_capacity):
            make_tpu_cache = (from_packed_prefill_tpu4 if quant.nbits == 4
                              else from_packed_prefill_tpu)
            return make_tpu_cache(k_all, v_all, len_all,
                                  true_len.astype(jnp.int32))
        return from_packed_prefill(k_all, v_all, len_all,
                                   true_len.astype(jnp.int32), quant)
    if think_packed:
        from ..cache.think_cache import build_think_cache
        dense_cap = min(cache_capacity,
                        comp.recent_size + (cache_capacity - policy_capacity))
        return build_think_cache(k_all, v_all, channels_all, len_all,
                                 true_len.astype(jnp.int32),
                                 comp.recent_size, dense_cap)
    if comp.decode_evict:
        pos = true_len.astype(jnp.int32)
        return EvictingKVCache(
            k=k_all, v=v_all,
            scores=jnp.zeros(len_all.shape + (cache_capacity,), jnp.float32),
            stamps=init_eviction_stamps(len_all, pos, cache_capacity),
            lengths=len_all, positions=pos)
    return KVCache(k=k_all, v=v_all, lengths=len_all,
                   positions=true_len.astype(jnp.int32))


def _quant_tpu_layout(quant: QuantConfig, head_dim: int, capacity: int) -> bool:
    """The Pallas quant kernels stream per-token-scale caches; they need a
    TPU backend, lane-aligned head_dim, and 128-aligned (int8) / 256-aligned
    (int4 token-block nibbles) capacity.  (The former
    KVCF_ENABLE_PALLAS_QUANT gate is gone: the in-graph divergence was a
    missing 1/sqrt(D) scale, fixed in both kernels.)
    Set KVCF_DISABLE_PALLAS_QUANT=1 to force the XLA quant path."""
    import os
    if os.environ.get("KVCF_DISABLE_PALLAS_QUANT") == "1":
        return False
    if quant.residual_length > 0:
        return False  # the fp residual ring lives on the XLA quant path
    if jax.default_backend() not in ("tpu", "axon") or head_dim % 128 != 0:
        return False
    if quant.nbits == 8:
        return capacity % 128 == 0
    if quant.nbits == 4:
        return capacity % 256 == 0
    return False


def decode_step(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B] int32 current input token
    cache,  # KVCache | QuantizedKVCache | QuantKVCacheTPU | EvictingKVCache
    quant: Optional[QuantConfig] = None,
    attn_backend: str = "auto",  # "auto" | "pallas" | "xla"
    eviction_recent: int = 32,
    mesh=None,                   # (dp, tp) Mesh: shard_map the Pallas kernel
    pallas_interpret: bool = False,  # interpret-mode kernels (CPU mesh tests)
) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step: append to cache at per-head lengths, attend over the
    compressed cache (reference decode branch llama_model.py:2205-2208).

    With a QuantizedKVCache, the new token is quantized once at append and the
    cache is dequantized inside the attention computation (XLA fuses the
    convert+scale into the matmul read — HBM streams int8/int4, contrast
    quantcache.py:77-82 which materializes the full fp cache every step).
    """
    B = tokens.shape[0]
    L = cfg.num_hidden_layers
    dtype = dtype_of(cfg)
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    C = cache.capacity
    from ..cache.offload_cache import OffloadedKVCache
    from ..cache.think_cache import ThinKCache
    quantized = isinstance(cache, QuantizedKVCache)
    quantized_tpu = isinstance(cache, QuantKVCacheTPU)
    quantized_tpu4 = isinstance(cache, QuantKVCacheTPU4)
    evicting = isinstance(cache, EvictingKVCache)
    thinkc = isinstance(cache, ThinKCache)
    offloaded = isinstance(cache, OffloadedKVCache)
    assert (quantized or quantized_tpu or quantized_tpu4) == \
        (quant is not None), \
        "quant config must be passed iff the cache is quantized"
    if quantized_tpu or quantized_tpu4:
        cache_heads = cache.k_codes.shape[2]
    elif thinkc:
        cache_heads = cache.v.shape[2]
    elif offloaded:
        cache_heads = cache.hk.shape[2]
    else:
        cache_heads = (cache.qk if quantized else cache.k).shape[2]
    if attn_backend == "auto":
        # The round-1 "in-graph divergence" was a missing 1/sqrt(D) scale in
        # the kernels (fixed; see tools/ab_decode_check.py) — Pallas is the
        # default decode path on TPU backends.  The kernel keeps softmax
        # probabilities in fp32 (the XLA path round-trips them through bf16),
        # so outputs agree to one bf16 ulp with the kernel the more accurate.
        on_tpu = jax.default_backend() in ("tpu", "axon")
        attn_backend = "pallas" if (on_tpu and D % 128 == 0) else "xla"
    use_pallas = (attn_backend == "pallas" and not quantized
                  and not quantized_tpu and not quantized_tpu4 and not evicting
                  and not thinkc and not offloaded
                  and D % 128 == 0   # kernel needs lane-aligned head_dim
                  and C % 16 == 0 and C >= 32)  # tile-aligned capacity
    # Under an ep mesh the MoE decode weight-gather must switch to the
    # dense-local-experts form BEFORE the kernel-mesh gate below nulls the
    # mesh (see moe_ffn force_dense).
    ep_sharded = (cfg.is_moe and mesh is not None
                  and "ep" in getattr(mesh, "axis_names", ()))
    if mesh is not None and (use_pallas or quantized_tpu or quantized_tpu4):
        # shard_map needs the [B/dp] x [H/tp] tiling to divide evenly;
        # otherwise fall back to the GSPMD-partitioned XLA path.  The quant
        # TPU caches shard the same way (codes + wide scale planes + lens all
        # tile [B/dp] x [H/tp]; VERDICT round-3 #2 — previously the engine
        # dropped the mesh whenever quant was configured).
        dp_ways = mesh.shape.get("dp", 1)
        tp_ways = mesh.shape.get("tp", 1)
        if B % dp_ways or cache_heads % tp_ways or "ep" in mesh.axis_names:
            use_pallas = False
            mesh = None
    else:
        mesh = None

    x = params["embed"][tokens].astype(dtype)[:, None]  # [B, 1, hidden]
    # RoPE position = uncompressed token count (reference _seen_tokens sync).
    pos = cache.positions  # [B]
    inv_freq = rope_inv_freq(cfg)
    freqs = pos[:, None].astype(jnp.float32) * inv_freq[None]  # [B, d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)[:, None]  # [B, 1, d]
    cos, sin = jnp.cos(emb), jnp.sin(emb)

    def decode_mask(lens):
        """[B, H] post-append lengths -> [B, H, 1, C] attention mask.

        Applies cfg.sliding_window at decode (HF Mistral/Qwen2 mask keys
        older than the window when generating too, mistral prefill parity)
        — but only for rows where the cache index IS the absolute position
        (lens == tokens seen, i.e. fullkv or the no-compress branch).
        Compressed rows keep entries selected by importance; their source
        positions are not stored, and the budget already bounds them.
        """
        m = valid_mask(lens, C)  # [B, H, C]
        if cfg.sliding_window is not None:
            identity = lens == (pos + 1)[:, None]
            lo = jnp.where(identity,
                           jnp.maximum(lens - cfg.sliding_window, 0), 0)
            cidx = jnp.arange(C, dtype=jnp.int32)[None, None]
            m = m & (cidx >= lo[..., None])
        return m[:, :, None, :]

    def window_lower(lens_pre, pos_like):
        """Pre-append lengths [..., H] + matching positions -> per-head
        sliding-window lower bound for the Pallas kernels, mirroring
        decode_mask: only identity rows (cache index == absolute position,
        i.e. pre-append length == tokens seen) are window-masked; compressed
        rows keep their importance-selected entries."""
        if cfg.sliding_window is None:
            return None
        ident = lens_pre == pos_like
        return jnp.where(ident,
                         jnp.maximum(lens_pre + 1 - cfg.sliding_window, 0), 0)

    def qkv_rope(x, lp):
        h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
        qkv = wdot(h, lp["qkv_proj"])
        if "qkv_bias" in lp:  # Qwen2-family QKV bias
            qkv = qkv + lp["qkv_bias"]
        q = _split_heads(qkv[..., :Hq * D], Hq, D)
        k = _split_heads(qkv[..., Hq * D:(Hq + Hkv) * D], Hkv, D)
        v = _split_heads(qkv[..., (Hq + Hkv) * D:], Hkv, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if cache_heads == Hq and Hq != Hkv:
            G = Hq // Hkv
            k = jnp.repeat(k, G, axis=1)
            v = jnp.repeat(v, G, axis=1)
        return q, k, v

    def finish_layer(x, attn, lp):
        h = wdot(_merge_heads(attn), lp["o_proj"])
        if "o_bias" in lp:  # attention_bias=True checkpoints
            h = h + lp["o_bias"]
        x = x + h
        h2 = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
        return x + ffn_block(h2, lp, cfg, moe_force_dense=ep_sharded)

    if use_pallas and mesh is not None:
        # Multi-device decode (VERDICT round-2 #3): same zero-copy carry, but
        # batch/head stay separate axes and each layer's kernel runs under
        # shard_map — dp shards batch, tp shards cache heads, no collectives
        # in the attention (the o_proj/FFN reductions outside stay GSPMD's).
        from ..ops.kernels.decode_attn import \
            decode_attention_append_stacked_sharded
        Gq = Hq // cache_heads

        def layer_fn_tp(carry, scanned):
            x, k_all, v_all, lens_all = carry  # stacks [L, B, H, C, D]
            lp, li = scanned
            q, k, v = qkv_rope(x, lp)
            lens_l = lax.dynamic_index_in_dim(lens_all, li, 0,
                                              keepdims=False)  # [B, H]
            out, k_all, v_all, lens_l = \
                decode_attention_append_stacked_sharded(
                    mesh,
                    q.reshape(B, cache_heads, Gq, D).astype(dtype),
                    k_all, v_all, lens_l, li,
                    k.astype(dtype).reshape(B, cache_heads, D),
                    v.astype(dtype).reshape(B, cache_heads, D),
                    interpret=pallas_interpret,
                    lower=window_lower(lens_l, pos[:, None]))
            lens_all = lax.dynamic_update_index_in_dim(lens_all, lens_l,
                                                       li, 0)
            x = finish_layer(x, out.reshape(B, Hq, 1, D), lp)
            return (x, k_all, v_all, lens_all), None

        carry0 = (x, cache.k, cache.v, cache.lengths)
        (x, k_all, v_all, lens_all), _ = lax.scan(
            layer_fn_tp, carry0,
            (params["layers"], jnp.arange(L, dtype=jnp.int32)))
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        logits = wdot(x[:, 0], params["lm_head"]).astype(jnp.float32)  # [B, V]
        new_cache = KVCache(k=k_all, v=v_all, lengths=lens_all,
                            positions=cache.positions + 1)
        return logits, new_cache

    if use_pallas:
        # Zero-copy layer loop: the FULL stacked caches ride the scan carry
        # and each layer's kernel aliases them in place, indexed by a dynamic
        # layer id (scalar prefetch).  Scanning per-layer caches as xs/ys
        # instead makes XLA materialize 2x [H, C, D] copies per layer —
        # measured at ~3x the attention's own HBM traffic.
        from ..ops.kernels.decode_attn import decode_attention_append_stacked
        BH = B * cache_heads
        Gq = Hq // cache_heads

        def layer_fn_p(carry, scanned):
            x, k_all, v_all, lens_all = carry
            lp, li = scanned
            q, k, v = qkv_rope(x, lp)
            lens_l = lax.dynamic_index_in_dim(lens_all, li, 0, keepdims=False)
            pos_bh = jnp.broadcast_to(pos[:, None],
                                      (B, cache_heads)).reshape(BH)
            out, k_all, v_all, lens_l = decode_attention_append_stacked(
                q.reshape(BH, Gq, D).astype(dtype), k_all, v_all, lens_l, li,
                k.astype(dtype).reshape(BH, D),
                v.astype(dtype).reshape(BH, D), interpret=pallas_interpret,
                lower=window_lower(lens_l, pos_bh))
            lens_all = lax.dynamic_update_index_in_dim(lens_all, lens_l, li, 0)
            x = finish_layer(x, out.reshape(B, Hq, 1, D), lp)
            return (x, k_all, v_all, lens_all), None

        carry0 = (x, cache.k.reshape(L, BH, C, D),
                  cache.v.reshape(L, BH, C, D),
                  cache.lengths.reshape(L, BH))
        (x, k_all, v_all, lens_all), _ = lax.scan(
            layer_fn_p, carry0,
            (params["layers"], jnp.arange(L, dtype=jnp.int32)))
        # (tried scan unroll=2: 254 -> 180 tok/s — XLA re-materializes the
        # carried cache stacks per unrolled pair; keep unroll=1)
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        logits = wdot(x[:, 0], params["lm_head"]).astype(jnp.float32)  # [B, V]
        new_cache = KVCache(k=k_all.reshape(L, B, cache_heads, C, D),
                            v=v_all.reshape(L, B, cache_heads, C, D),
                            lengths=lens_all.reshape(L, B, cache_heads),
                            positions=cache.positions + 1)
        return logits, new_cache

    if quantized_tpu and mesh is not None:
        # Multi-device fused-dequant decode (VERDICT round-3 #2): dp shards
        # batch, tp shards cache heads; the sharded wrapper runs the
        # single-chip kernel per [B/dp, H/tp] tile.
        from ..ops.kernels.decode_attn_quant import \
            quant_decode_attention_append_stacked_sharded
        Gq = Hq // cache_heads

        def layer_fn_qtp(carry, scanned):
            x, kc_all, vc_all, sc_all, lens_all = carry
            lp, li = scanned
            q, k, v = qkv_rope(x, lp)
            lens_l = lax.dynamic_index_in_dim(lens_all, li, 0, keepdims=False)
            out, kc_all, vc_all, sc_all, lens_l = \
                quant_decode_attention_append_stacked_sharded(
                    mesh, q.reshape(B, cache_heads, Gq, D).astype(dtype),
                    kc_all, vc_all, sc_all, lens_l, li,
                    k.astype(dtype).reshape(B, cache_heads, D),
                    v.astype(dtype).reshape(B, cache_heads, D),
                    interpret=pallas_interpret,
                    lower=window_lower(lens_l, pos[:, None]))
            lens_all = lax.dynamic_update_index_in_dim(lens_all, lens_l, li, 0)
            x = finish_layer(x, out.reshape(B, Hq, 1, D), lp)
            return (x, kc_all, vc_all, sc_all, lens_all), None

        carry0 = (x, cache.k_codes, cache.v_codes, cache.scales,
                  cache.lengths)
        (x, kc_all, vc_all, sc_all, lens_all), _ = lax.scan(
            layer_fn_qtp, carry0,
            (params["layers"], jnp.arange(L, dtype=jnp.int32)))
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        logits = wdot(x[:, 0], params["lm_head"]).astype(jnp.float32)  # [B, V]
        new_cache = QuantKVCacheTPU(
            k_codes=kc_all, v_codes=vc_all, scales=sc_all, lengths=lens_all,
            positions=cache.positions + 1)
        return logits, new_cache

    if quantized_tpu:
        # Same zero-copy carry structure as the bf16 path, over int8 code
        # stacks + the wide scale plane.
        from ..ops.kernels.decode_attn_quant import \
            quant_decode_attention_append_stacked
        BH = B * cache_heads
        Gq = Hq // cache_heads

        def layer_fn_q(carry, scanned):
            x, kc_all, vc_all, sc_all, lens_all = carry
            lp, li = scanned
            q, k, v = qkv_rope(x, lp)
            lens_l = lax.dynamic_index_in_dim(lens_all, li, 0, keepdims=False)
            pos_bh = jnp.broadcast_to(pos[:, None],
                                      (B, cache_heads)).reshape(BH)
            out, kc_all, vc_all, sc_all, lens_l = \
                quant_decode_attention_append_stacked(
                    q.reshape(BH, Gq, D).astype(dtype), kc_all, vc_all,
                    sc_all, lens_l, li,
                    k.astype(dtype).reshape(BH, D),
                    v.astype(dtype).reshape(BH, D),
                    interpret=pallas_interpret,
                    lower=window_lower(lens_l, pos_bh))
            lens_all = lax.dynamic_update_index_in_dim(lens_all, lens_l, li, 0)
            x = finish_layer(x, out.reshape(B, Hq, 1, D), lp)
            return (x, kc_all, vc_all, sc_all, lens_all), None

        carry0 = (x, cache.k_codes.reshape(L, BH, C, D),
                  cache.v_codes.reshape(L, BH, C, D),
                  cache.scales.reshape(L, BH, 4, C),
                  cache.lengths.reshape(L, BH))
        (x, kc_all, vc_all, sc_all, lens_all), _ = lax.scan(
            layer_fn_q, carry0,
            (params["layers"], jnp.arange(L, dtype=jnp.int32)))
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        logits = wdot(x[:, 0], params["lm_head"]).astype(jnp.float32)  # [B, V]
        new_cache = QuantKVCacheTPU(
            k_codes=kc_all.reshape(L, B, cache_heads, C, D),
            v_codes=vc_all.reshape(L, B, cache_heads, C, D),
            scales=sc_all.reshape(L, B, cache_heads, 4, C),
            lengths=lens_all.reshape(L, B, cache_heads),
            positions=cache.positions + 1)
        return logits, new_cache

    if quantized_tpu4 and mesh is not None:
        # int4 under (dp, tp): nibble planes tile like the int8 codes.
        from ..ops.kernels.decode_attn_quant import \
            quant4_decode_attention_append_stacked_sharded
        Gq = Hq // cache_heads

        def layer_fn_q4tp(carry, scanned):
            x, kc_all, vc_all, sc_all, lens_all = carry
            lp, li = scanned
            q, k, v = qkv_rope(x, lp)
            lens_l = lax.dynamic_index_in_dim(lens_all, li, 0, keepdims=False)
            out, kc_all, vc_all, sc_all, lens_l = \
                quant4_decode_attention_append_stacked_sharded(
                    mesh, q.reshape(B, cache_heads, Gq, D).astype(dtype),
                    kc_all, vc_all, sc_all, lens_l, li,
                    k.astype(dtype).reshape(B, cache_heads, D),
                    v.astype(dtype).reshape(B, cache_heads, D),
                    interpret=pallas_interpret,
                    lower=window_lower(lens_l, pos[:, None]))
            lens_all = lax.dynamic_update_index_in_dim(lens_all, lens_l, li, 0)
            x = finish_layer(x, out.reshape(B, Hq, 1, D), lp)
            return (x, kc_all, vc_all, sc_all, lens_all), None

        carry0 = (x, cache.k_codes, cache.v_codes, cache.scales,
                  cache.lengths)
        (x, kc_all, vc_all, sc_all, lens_all), _ = lax.scan(
            layer_fn_q4tp, carry0,
            (params["layers"], jnp.arange(L, dtype=jnp.int32)))
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        logits = wdot(x[:, 0], params["lm_head"]).astype(jnp.float32)  # [B, V]
        new_cache = QuantKVCacheTPU4(
            k_codes=kc_all, v_codes=vc_all, scales=sc_all, lengths=lens_all,
            positions=cache.positions + 1)
        return logits, new_cache

    if quantized_tpu4:
        # int4 token-block nibble cache: same zero-copy carry structure, with
        # code planes of C//2 byte rows (two tokens per byte).
        from ..ops.kernels.decode_attn_quant import \
            quant4_decode_attention_append_stacked
        BH = B * cache_heads
        Gq = Hq // cache_heads
        C2 = C // 2

        def layer_fn_q4(carry, scanned):
            x, kc_all, vc_all, sc_all, lens_all = carry
            lp, li = scanned
            q, k, v = qkv_rope(x, lp)
            lens_l = lax.dynamic_index_in_dim(lens_all, li, 0, keepdims=False)
            pos_bh = jnp.broadcast_to(pos[:, None],
                                      (B, cache_heads)).reshape(BH)
            out, kc_all, vc_all, sc_all, lens_l = \
                quant4_decode_attention_append_stacked(
                    q.reshape(BH, Gq, D).astype(dtype), kc_all, vc_all,
                    sc_all, lens_l, li,
                    k.astype(dtype).reshape(BH, D),
                    v.astype(dtype).reshape(BH, D),
                    interpret=pallas_interpret,
                    lower=window_lower(lens_l, pos_bh))
            lens_all = lax.dynamic_update_index_in_dim(lens_all, lens_l, li, 0)
            x = finish_layer(x, out.reshape(B, Hq, 1, D), lp)
            return (x, kc_all, vc_all, sc_all, lens_all), None

        carry0 = (x, cache.k_codes.reshape(L, BH, C2, D),
                  cache.v_codes.reshape(L, BH, C2, D),
                  cache.scales.reshape(L, BH, 4, C),
                  cache.lengths.reshape(L, BH))
        (x, kc_all, vc_all, sc_all, lens_all), _ = lax.scan(
            layer_fn_q4, carry0,
            (params["layers"], jnp.arange(L, dtype=jnp.int32)))
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        logits = wdot(x[:, 0], params["lm_head"]).astype(jnp.float32)  # [B, V]
        new_cache = QuantKVCacheTPU4(
            k_codes=kc_all.reshape(L, B, cache_heads, C2, D),
            v_codes=vc_all.reshape(L, B, cache_heads, C2, D),
            scales=sc_all.reshape(L, B, cache_heads, 4, C),
            lengths=lens_all.reshape(L, B, cache_heads),
            positions=cache.positions + 1)
        return logits, new_cache

    # ------------------------------------------------------------------
    # XLA paths (plain fallback, quantized XLA, evicting): same zero-copy
    # carry structure — full stacks ride the scan carry, single-token
    # appends are scatters (``.at[li, b, h, idx].set``, in place on the
    # donated carry; mode="drop" keeps the full-cache drop semantics of the
    # masked-write append), and attention reads the layer's dynamic slice.
    # Scanning per-layer caches as xs/ys instead costs 2x [B, H, C, D]
    # copies per layer.
    # ------------------------------------------------------------------
    bi = jnp.arange(B)[:, None]            # [B, 1]
    hi = jnp.arange(cache_heads)[None, :]  # [1, H]

    def slice_l(stack, li):
        return lax.dynamic_index_in_dim(stack, li, 0, keepdims=False)

    def layer_fn(carry, scanned):
        x, stacks = carry
        lp, li = scanned
        q, k, v = qkv_rope(x, lp)

        if quantized:
            n_out = 4 if quant.outlier_extract else 0
            (qk_a, qv_a, ks_a, kz_a, vs_a, vz_a, lens_all) = stacks[:7]
            outs, ring = stacks[7:7 + n_out], stacks[7 + n_out:]
            lens = slice_l(lens_all, li)
            nk, nks, nkz, nko, nkoi = encode(k.astype(dtype), quant)
            nv, nvs, nvz, nvo, nvoi = encode(v.astype(dtype), quant)

            def scat(stack, new):
                return stack.at[li, bi, hi, lens].set(new[:, :, 0],
                                                      mode="drop")

            qk_a, qv_a = scat(qk_a, nk), scat(qv_a, nv)
            ks_a, kz_a = scat(ks_a, nks), scat(kz_a, nkz)
            vs_a, vz_a = scat(vs_a, nvs), scat(vz_a, nvz)
            if n_out:
                ko_a, koi_a, vo_a, voi_a = outs
                ko_a, koi_a = scat(ko_a, nko), scat(koi_a, nkoi)
                vo_a, voi_a = scat(vo_a, nvo), scat(voi_a, nvoi)
                outs = (ko_a, koi_a, vo_a, voi_a)
            if ring:
                # fp residual ring (quantcache.py:59-96 semantics): the new
                # token also lands in the ring at slot ``row % R``; reads of
                # the last R rows take the exact fp values below.  At a FULL
                # cache the code scatter above drops the token (mode="drop"
                # at index lens == C) — the ring write must drop too: slot
                # C % R == (C-R) % R still backs row C-R inside the recent
                # read window, and an unguarded write would replace that
                # row's exact-fp copy with the dropped token's K/V.
                rk_a, rv_a = ring
                R = rk_a.shape[3]
                rslot = jnp.where(lens < C, lens % R, R)  # R = out of range
                rk_a = rk_a.at[li, bi, hi, rslot].set(
                    k.astype(dtype)[:, :, 0], mode="drop")
                rv_a = rv_a.at[li, bi, hi, rslot].set(
                    v.astype(dtype)[:, :, 0], mode="drop")
                ring = (rk_a, rv_a)
            lens = jnp.minimum(lens + 1, C)
            k_read = decode_values(
                slice_l(qk_a, li), slice_l(ks_a, li), slice_l(kz_a, li),
                quant, dtype,
                oval=slice_l(outs[0], li) if n_out else None,
                oidx=slice_l(outs[1], li) if n_out else None)
            v_read = decode_values(
                slice_l(qv_a, li), slice_l(vs_a, li), slice_l(vz_a, li),
                quant, dtype,
                oval=slice_l(outs[2], li) if n_out else None,
                oidx=slice_l(outs[3], li) if n_out else None)
            if ring:
                rk_l, rv_l = slice_l(ring[0], li), slice_l(ring[1], li)
                cidx = jnp.arange(C, dtype=jnp.int32)
                recent = ((cidx[None, None] >= lens[..., None] - R)
                          & (cidx[None, None] < lens[..., None]))[..., None]
                k_read = jnp.where(recent, jnp.take(rk_l, cidx % R, axis=2),
                                   k_read)
                v_read = jnp.where(recent, jnp.take(rv_l, cidx % R, axis=2),
                                   v_read)
            mask = decode_mask(lens)  # [B, H, 1, C]
            attn = grouped_attention(q, k_read, v_read, mask)
            lens_all = lax.dynamic_update_index_in_dim(lens_all, lens, li, 0)
            stacks = ((qk_a, qv_a, ks_a, kz_a, vs_a, vz_a, lens_all)
                      + outs + ring)
        elif offloaded:
            # Host-offloaded decode (HF OffloadedCache equivalent,
            # cache_utils_think.py:507): the immutable prefill KV for layer
            # ``li`` is fetched host->device inside the step; decode appends
            # land in the small device ring so the host copy never changes.
            dk_a, dv_a, lens_all = stacks
            R = dk_a.shape[3]
            lens = slice_l(lens_all, li)              # [B, H] total rows
            plen = slice_l(plen_const, li)            # [B, H] host rows
            dk_a = dk_a.at[li, bi, hi, lens - plen].set(
                k.astype(dtype)[:, :, 0], mode="drop")
            dv_a = dv_a.at[li, bi, hi, lens - plen].set(
                v.astype(dtype)[:, :, 0], mode="drop")
            lens = jnp.minimum(lens + 1, plen + R)
            khl = jax.device_put(slice_l(hk_const, li), dev_shard)  # H2D
            vhl = jax.device_put(slice_l(hv_const, li), dev_shard)
            k_full = jnp.concatenate([khl, slice_l(dk_a, li)], axis=2)
            v_full = jnp.concatenate([vhl, slice_l(dv_a, li)], axis=2)
            Ch = khl.shape[2]
            cidx = jnp.arange(Ch + R, dtype=jnp.int32)[None, None]
            mask = jnp.where(cidx < Ch, cidx < plen[..., None],
                             cidx - Ch < (lens - plen)[..., None])
            attn = grouped_attention(q, k_full, v_full, mask[:, :, None, :])
            lens_all = lax.dynamic_update_index_in_dim(lens_all, lens, li, 0)
            stacks = (dk_a, dv_a, lens_all)
        elif thinkc:
            # ThinK packed decode (llama_model_think.py:175-181): pruned
            # logits ``q[channels] . kp`` cover prefill rows; rows at or past
            # ``boundary`` (recent prefill + every decoded token) are
            # overwritten with exact dense logits ``q . kd``.  Values are
            # never pruned, so the PV product is the standard one.
            kp_a, ch_a, kd_a, v_a, bnd_a, lens_all = stacks
            Cr = kd_a.shape[3]
            lens = slice_l(lens_all, li)   # [B, H]
            bnd = slice_l(bnd_a, li)       # [B, H]
            kd_a = kd_a.at[li, bi, hi, lens - bnd].set(
                k.astype(dtype)[:, :, 0], mode="drop")
            v_a = v_a.at[li, bi, hi, lens].set(
                v.astype(dtype)[:, :, 0], mode="drop")
            # effective capacity: the dense buffer can hold Cr rows past the
            # boundary — appends beyond that are dropped, like lens==C.
            lens = jnp.minimum(jnp.minimum(lens + 1, bnd + Cr), C)
            kp_l = slice_l(kp_a, li)   # [B, H, C, Dk]
            ch_l = slice_l(ch_a, li)   # [B, H, Dk]
            kd_l = slice_l(kd_a, li)   # [B, H, Cr, D]
            v_l = slice_l(v_a, li)     # [B, H, C, D]
            Hk = v_l.shape[1]
            Gq = Hq // Hk
            qg = q.reshape(B, Hk, Gq, D)
            qp = jnp.take_along_axis(qg, ch_l[:, :, None, :], axis=3)
            logit_p = jnp.einsum("bhgd,bhkd->bhgk", qp, kp_l,
                                 preferred_element_type=jnp.float32)
            logit_d = jnp.einsum("bhgd,bhkd->bhgk", qg, kd_l,
                                 preferred_element_type=jnp.float32)
            cidx = jnp.arange(C, dtype=jnp.int32)[None, None]      # [1,1,C]
            in_dense = (cidx >= bnd[..., None]) & (cidx < bnd[..., None] + Cr)
            # dense_full[b,h,g,c] = logit_d[b,h,g,c-bnd] for in-window c —
            # via a one-hot MXU contraction, NOT take_along_axis: XLA
            # lowers the dynamic gather along C catastrophically on TPU
            # (measured 7.5 ms of the 13.1 ms/step pre-fix total at
            # C=2432, ~3.7 us/row — the same pathology as the MoE expert
            # gather, BASELINE.md), while the [C, Cr] one-hot dot is
            # <1 MFLOP.  Out-of-window rows of ``oh`` are all-zero; the
            # ``where`` masks them anyway.
            oh = (cidx[..., None] - bnd[..., None, None]
                  == jnp.arange(Cr, dtype=jnp.int32)).astype(logit_d.dtype)
            dense_full = jnp.einsum("bhck,bhgk->bhgc", oh, logit_d)
            logit = jnp.where(in_dense[:, :, None, :], dense_full, logit_p)
            logit = logit / jnp.sqrt(jnp.asarray(D, jnp.float32))
            valid = cidx < lens[..., None]
            logit = jnp.where(valid[:, :, None, :], logit, NEG_INF)
            probs = jax.nn.softmax(logit, axis=-1)
            out = jnp.einsum("bhgk,bhkd->bhgd", probs.astype(v_l.dtype), v_l,
                             preferred_element_type=jnp.float32)
            attn = out.reshape(B, Hq, 1, D).astype(q.dtype)
            lens_all = lax.dynamic_update_index_in_dim(lens_all, lens, li, 0)
            stacks = (kp_a, ch_a, kd_a, v_a, bnd_a, lens_all)
        elif evicting:
            # Decode-stage compression (reference TODO README.md:31): attend,
            # accumulate per-slot attention mass, evict-append when full.
            k_a, v_a, sc_a, st_a, lens_all = stacks
            lens = slice_l(lens_all, li)
            sc = slice_l(sc_a, li)      # [B, H, C] f32 (tiny)
            st = slice_l(st_a, li)
            protected = st >= (pos[:, None, None] - eviction_recent)
            cand = jnp.where(protected, jnp.inf, sc)
            evict_slot = jnp.argmin(cand, axis=-1).astype(jnp.int32)
            target = jnp.where(lens < C, lens, evict_slot)  # always in range
            k_a = k_a.at[li, bi, hi, target].set(k.astype(dtype)[:, :, 0])
            v_a = v_a.at[li, bi, hi, target].set(v.astype(dtype)[:, :, 0])
            st_a = st_a.at[li, bi, hi, target].set(
                jnp.broadcast_to(pos[:, None], target.shape))
            sc = jnp.where(lax.broadcasted_iota(jnp.int32, sc.shape, 2)
                           == target[..., None], 0.0, sc)
            lens = jnp.minimum(lens + 1, C)

            k_cache = slice_l(k_a, li)
            v_cache = slice_l(v_a, li)
            attn, probs = grouped_attention(q, k_cache, v_cache,
                                            decode_mask(lens),
                                            return_probs=True)
            sc = sc + jnp.sum(probs[:, :, :, 0, :], axis=2)  # [B,Hk,C] mass
            sc_a = lax.dynamic_update_index_in_dim(sc_a, sc, li, 0)
            lens_all = lax.dynamic_update_index_in_dim(lens_all, lens, li, 0)
            stacks = (k_a, v_a, sc_a, st_a, lens_all)
        else:
            k_a, v_a, lens_all = stacks
            lens = slice_l(lens_all, li)
            k_a = k_a.at[li, bi, hi, lens].set(
                k.astype(dtype)[:, :, 0], mode="drop")
            v_a = v_a.at[li, bi, hi, lens].set(
                v.astype(dtype)[:, :, 0], mode="drop")
            lens = jnp.minimum(lens + 1, C)
            mask = decode_mask(lens)  # [B, H, 1, C]
            attn = grouped_attention(q, slice_l(k_a, li), slice_l(v_a, li),
                                     mask)
            lens_all = lax.dynamic_update_index_in_dim(lens_all, lens, li, 0)
            stacks = (k_a, v_a, lens_all)
        return (finish_layer(x, attn, lp), stacks), None

    if offloaded:
        # scan constants: the immutable host-resident KV + fixed prefill
        # lengths, and a concrete device sharding for the in-jit H2D fetch
        # (single-device feature: host offload composes with dp/tp by
        # sharding the host arrays the same way, not yet wired).
        from jax.sharding import SingleDeviceSharding
        hk_const, hv_const, plen_const = cache.hk, cache.hv, cache.prefill_len
        # Fetch onto the device the decode ring actually lives on.  Under a
        # jit trace the ring is a Tracer with no concrete device — fall back
        # to the default device (offload is a single-device feature for now;
        # jit users on a non-default device should device_put inputs first).
        try:
            ring_dev = cache.dk.devices().pop()
        except Exception:
            ring_dev = jax.devices()[0]
        dev_shard = SingleDeviceSharding(ring_dev, memory_kind="device")
        stacks0 = (cache.dk, cache.dv, cache.lengths)
    elif thinkc:
        stacks0 = (cache.kp, cache.channels, cache.kd, cache.v,
                   cache.boundary, cache.lengths)
    elif evicting:
        stacks0 = (cache.k, cache.v, cache.scores, cache.stamps,
                   cache.lengths)
    elif quantized:
        assert (cache.k_oval is not None) == quant.outlier_extract, \
            "cache outlier planes must match QuantConfig.outlier_extract"
        stacks0 = (cache.qk, cache.qv, cache.k_scale, cache.k_zero,
                   cache.v_scale, cache.v_zero, cache.lengths)
        if quant.outlier_extract:
            stacks0 = stacks0 + (cache.k_oval, cache.k_oidx,
                                 cache.v_oval, cache.v_oidx)
        if cache.rk is not None:
            stacks0 = stacks0 + (cache.rk, cache.rv)
    else:
        stacks0 = (cache.k, cache.v, cache.lengths)
    (x, stacks), _ = lax.scan(layer_fn, (x, stacks0),
                              (params["layers"],
                               jnp.arange(L, dtype=jnp.int32)))

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    logits = wdot(x[:, 0], params["lm_head"]).astype(jnp.float32)  # [B, V]

    if offloaded:
        dk_all, dv_all, len_all = stacks
        new_cache = OffloadedKVCache(hk=cache.hk, hv=cache.hv,
                                     dk=dk_all, dv=dv_all,
                                     prefill_len=cache.prefill_len,
                                     lengths=len_all,
                                     positions=cache.positions + 1)
    elif thinkc:
        kp_all, ch_all, kd_all, v_all, bnd_all, len_all = stacks
        new_cache = ThinKCache(kp=kp_all, channels=ch_all, kd=kd_all,
                               v=v_all, boundary=bnd_all, lengths=len_all,
                               positions=cache.positions + 1)
    elif evicting:
        k_all, v_all, sc_all, st_all, len_all = stacks
        new_cache = EvictingKVCache(k_all, v_all, sc_all, st_all, len_all,
                                    cache.positions + 1)
    elif quantized:
        n_out = 4 if quant.outlier_extract else 0
        (qk, qv, ks, kz, vs, vz, len_all) = stacks[:7]
        outs, ring = stacks[7:7 + n_out], stacks[7 + n_out:]
        ring = ring if ring else (None, None)
        new_cache = QuantizedKVCache(qk, qv, ks, kz, vs, vz, len_all,
                                     cache.positions + 1, *ring, *(
                                         outs if n_out else (None,) * 4))
    else:
        k_all, v_all, len_all = stacks
        new_cache = KVCache(k=k_all, v=v_all, lengths=len_all,
                            positions=cache.positions + 1)
    return logits, new_cache
