"""Localize the Pallas decode in-graph divergence (CLAUDE.md open issue).

Runs the FULL decode graph (same geometry as tools/ab_decode_check.py) but
with an instrumented layer body that computes BOTH the Pallas kernel and the
XLA reference on identical per-layer inputs, emitting per-(step, layer) max
abs diffs for the attention output and the updated K/V caches.

Modes:
  follow=xla    : trajectory continues with XLA results (Pallas is a probe)
  follow=pallas : trajectory continues with Pallas results (XLA is the probe)

Usage: python tools/dbg_pallas_ingraph.py [follow] [steps]
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import functools
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from kvcache_factory_tpu.config import CompressionConfig, ModelConfig
from kvcache_factory_tpu.models import llama
from kvcache_factory_tpu.models.llama import (
    _split_heads, _merge_heads, rms_norm, apply_rope, rope_inv_freq,
    grouped_attention, swiglu_fused, dtype_of)
from kvcache_factory_tpu.cache.kv_cache import append_layer, valid_mask
from kvcache_factory_tpu.models.weights import init_params
from kvcache_factory_tpu.ops.kernels.decode_attn import decode_attention_append

FOLLOW = sys.argv[1] if len(sys.argv) > 1 else "pallas"
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

cfg = ModelConfig(model_type="llama", vocab_size=32000, hidden_size=2048,
    intermediate_size=5632, num_hidden_layers=22, num_attention_heads=16,
    num_key_value_heads=4, head_dim=128, max_position_embeddings=8192)
params = init_params(cfg, jax.random.PRNGKey(0))
comp = CompressionConfig(method="snapkv", max_capacity_prompt=512,
                         window_size=8, kernel_size=7, pooling="maxpool")
S = 1024; CC = 512 + 40
toks = jnp.asarray(np.random.default_rng(0).integers(0, 32000, (1, S)), jnp.int32)
tl = jnp.full((1,), S, jnp.int32)
pre = jax.jit(lambda p, t, l: llama.prefill(p, cfg, comp, t, l,
                                            cache_capacity=CC))(params, toks, tl)
tok0 = jnp.argmax(pre.logits_last, -1).astype(jnp.int32)


def dual_decode_step(params, tokens, cache_t, positions):
    """cache_t = (k [L,B,H,C,D], v, lengths [L,B,H]); returns logits, new
    cache, and per-layer diffs (out, k, v, len)."""
    B = tokens.shape[0]
    dtype = dtype_of(cfg)
    Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    C = cache_t[0].shape[3]
    cache_heads = cache_t[0].shape[2]

    x = params["embed"][tokens].astype(dtype)[:, None]
    pos = positions
    inv_freq = rope_inv_freq(cfg)
    freqs = pos[:, None].astype(jnp.float32) * inv_freq[None]
    emb = jnp.concatenate([freqs, freqs], axis=-1)[:, None]
    cos, sin = jnp.cos(emb), jnp.sin(emb)

    def layer_fn(x, scanned):
        lp, layer_cache = scanned
        h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
        qkv = h @ lp["qkv_proj"]
        q = _split_heads(qkv[..., :Hq * D], Hq, D)
        k = _split_heads(qkv[..., Hq * D:(Hq + Hkv) * D], Hkv, D)
        v = _split_heads(qkv[..., (Hq + Hkv) * D:], Hkv, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if cache_heads == Hq and Hq != Hkv:
            G = Hq // Hkv
            k = jnp.repeat(k, G, axis=1)
            v = jnp.repeat(v, G, axis=1)

        k_cache, v_cache, lens = layer_cache
        Gq = Hq // cache_heads

        # --- XLA reference path ---
        kx, vx, lx = append_layer(k_cache, v_cache, lens,
                                  k.astype(dtype), v.astype(dtype))
        mask = valid_mask(lx, C)[:, :, None, :]
        out_x = grouped_attention(q, kx, vx, mask)  # [B, Hq, 1, D]

        # --- Pallas path on the SAME inputs ---
        out_p, kp, vp, lp_ = decode_attention_append(
            q.reshape(B * cache_heads, Gq, D).astype(dtype),
            k_cache.reshape(B * cache_heads, C, D),
            v_cache.reshape(B * cache_heads, C, D),
            lens.reshape(B * cache_heads),
            k.astype(dtype).reshape(B * cache_heads, D),
            v.astype(dtype).reshape(B * cache_heads, D))
        out_p = out_p.reshape(B, Hq, 1, D)
        kp = kp.reshape(B, cache_heads, C, D)
        vp = vp.reshape(B, cache_heads, C, D)
        lp_ = lp_.reshape(B, cache_heads)

        d_out = jnp.max(jnp.abs(out_p.astype(jnp.float32)
                                - out_x.astype(jnp.float32)))
        d_k = jnp.max(jnp.abs(kp.astype(jnp.float32) - kx.astype(jnp.float32)))
        d_v = jnp.max(jnp.abs(vp.astype(jnp.float32) - vx.astype(jnp.float32)))
        d_l = jnp.max(jnp.abs(lp_ - lx))

        if FOLLOW == "pallas":
            attn, layer_cache = out_p, (kp, vp, lp_)
        else:
            attn, layer_cache = out_x, (kx, vx, lx)

        h = _merge_heads(attn) @ lp["o_proj"]
        x = x + h
        h2 = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
        x = x + swiglu_fused(h2, lp["gate_up_proj"], lp["down_proj"])
        return x, (layer_cache, jnp.stack([d_out, d_k, d_v,
                                           d_l.astype(jnp.float32)]))

    x, (out_caches, diffs) = lax.scan(
        layer_fn, x, (params["layers"], cache_t))
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    logits = (x[:, 0] @ params["lm_head"]).astype(jnp.float32)
    return logits, out_caches, diffs


@jax.jit
def run(params, tok, cache_t, positions):
    def body(c, _):
        t, cache_t, pos = c
        lg, cache_t, diffs = dual_decode_step(params, t, cache_t, pos)
        return (jnp.argmax(lg, -1).astype(jnp.int32), cache_t, pos + 1), \
            (diffs, jnp.argmax(lg, -1))
    (t, _, _), (diffs, toks) = lax.scan(
        body, (tok, cache_t, positions), None, length=STEPS)
    return diffs, toks


cache_t = (pre.cache.k, pre.cache.v, pre.cache.lengths)
diffs, toks = run(params, tok0, cache_t, pre.cache.positions)
diffs = np.asarray(diffs)  # [steps, L, 4]
toks = np.asarray(toks)
print(f"follow={FOLLOW} steps={STEPS}  tokens: {toks[:, 0].tolist()}")
names = ["out", "k", "v", "len"]
for s in range(diffs.shape[0]):
    worst = diffs[s].max(axis=0)
    line = " ".join(f"{n}={w:.3e}" for n, w in zip(names, worst))
    argmax_l = diffs[s, :, 0].argmax()
    print(f"step {s:2d}: {line}  (worst out @ layer {argmax_l}, "
          f"d_out per layer min {diffs[s, :, 0].min():.1e})")
bad = diffs[:, :, 0] > 1e-2
if bad.any():
    ss, ll = np.nonzero(bad)
    print(f"DIVERGENT: first at step {ss[0]} layer {ll[0]}; "
          f"{bad.sum()} (step,layer) cells over 1e-2")
else:
    print("NO in-graph divergence in dual mode (buffer-lifetime suspect).")
