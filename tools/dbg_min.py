"""Minimal in-graph repro hunt for the Pallas decode `out` divergence.

Strips the full decode graph down piece by piece. Each MODE builds a smaller
graph; the first mode that still diverges is the minimal repro.

  full1     : dual_decode_step, ONE step, no outer scan (all 22 layers)
  nolayerscan: same math, python loop over layers instead of lax.scan
  onelayer  : a single layer's math (embed->qkv->rope->kernel->out diff)
  kernelonly: kernel vs XLA attention on random operands (control; passed before)

Usage: python tools/dbg_min.py MODE
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
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

MODE = sys.argv[1] if len(sys.argv) > 1 else "full1"

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
B = 1
dtype = dtype_of(cfg)
Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
C = CC
cache_heads = pre.cache.k.shape[2]
Gq = Hq // cache_heads
print("cache_heads", cache_heads, "Gq", Gq, "C", C, "dtype", dtype)


def both_paths(q, k, v, k_cache, v_cache, lens):
    kx, vx, lx = append_layer(k_cache, v_cache, lens,
                              k.astype(dtype), v.astype(dtype))
    mask = valid_mask(lx, C)[:, :, None, :]
    out_x = grouped_attention(q, kx, vx, mask)
    out_p, kp, vp, lp_ = decode_attention_append(
        q.reshape(B * cache_heads, Gq, D).astype(dtype),
        k_cache.reshape(B * cache_heads, C, D),
        v_cache.reshape(B * cache_heads, C, D),
        lens.reshape(B * cache_heads),
        k.astype(dtype).reshape(B * cache_heads, D),
        v.astype(dtype).reshape(B * cache_heads, D))
    out_p = out_p.reshape(B, Hq, 1, D)
    return out_x, out_p


def layer_math(x, lp, cos, sin, layer_cache):
    h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
    qkv = h @ lp["qkv_proj"]
    q = _split_heads(qkv[..., :Hq * D], Hq, D)
    k = _split_heads(qkv[..., Hq * D:(Hq + Hkv) * D], Hkv, D)
    v = _split_heads(qkv[..., (Hq + Hkv) * D:], Hkv, D)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if cache_heads == Hq and Hq != Hkv:
        k = jnp.repeat(k, Hq // Hkv, axis=1)
        v = jnp.repeat(v, Hq // Hkv, axis=1)
    k_cache, v_cache, lens = layer_cache
    out_x, out_p = both_paths(q, k, v, k_cache, v_cache, lens)
    return out_x, out_p


def rope_tables(pos):
    inv_freq = rope_inv_freq(cfg)
    freqs = pos[:, None].astype(jnp.float32) * inv_freq[None]
    emb = jnp.concatenate([freqs, freqs], axis=-1)[:, None]
    return jnp.cos(emb), jnp.sin(emb)


if MODE == "full1":
    @jax.jit
    def run(params, tok, cache_t, positions):
        x = params["embed"][tok].astype(dtype)[:, None]
        cos, sin = rope_tables(positions)

        def layer_fn(x, scanned):
            lp, layer_cache = scanned
            out_x, out_p = layer_math(x, lp, cos, sin, layer_cache)
            d = jnp.max(jnp.abs(out_p.astype(jnp.float32)
                                - out_x.astype(jnp.float32)))
            h = _merge_heads(out_p) @ lp["o_proj"]
            x = x + h
            h2 = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
            x = x + swiglu_fused(h2, lp["gate_up_proj"], lp["down_proj"])
            return x, d
        x, ds = lax.scan(layer_fn, x,
                         (params["layers"],
                          (cache_t[0], cache_t[1], cache_t[2])))
        return ds
    ds = np.asarray(run(params, tok0,
                        (pre.cache.k, pre.cache.v, pre.cache.lengths),
                        pre.cache.positions))
    print("per-layer d_out:", np.array2string(ds, precision=2))
    print("DIVERGED" if ds.max() > 1e-2 else "OK")

elif MODE == "nolayerscan":
    @jax.jit
    def run(params, tok, k_all, v_all, len_all, positions):
        x = params["embed"][tok].astype(dtype)[:, None]
        cos, sin = rope_tables(positions)
        ds = []
        for i in range(cfg.num_hidden_layers):
            lp = jax.tree.map(lambda a: a[i], params["layers"])
            layer_cache = (k_all[i], v_all[i], len_all[i])
            out_x, out_p = layer_math(x, lp, cos, sin, layer_cache)
            ds.append(jnp.max(jnp.abs(out_p.astype(jnp.float32)
                                      - out_x.astype(jnp.float32))))
            h = _merge_heads(out_p) @ lp["o_proj"]
            x = x + h
            h2 = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
            x = x + swiglu_fused(h2, lp["gate_up_proj"], lp["down_proj"])
        return jnp.stack(ds)
    ds = np.asarray(run(params, tok0, pre.cache.k, pre.cache.v,
                        pre.cache.lengths, pre.cache.positions))
    print("per-layer d_out:", np.array2string(ds, precision=2))
    print("DIVERGED" if ds.max() > 1e-2 else "OK")

elif MODE == "onelayer":
    @jax.jit
    def run(params, tok, k0, v0, l0, positions):
        x = params["embed"][tok].astype(dtype)[:, None]
        cos, sin = rope_tables(positions)
        lp = jax.tree.map(lambda a: a[0], params["layers"])
        out_x, out_p = layer_math(x, lp, cos, sin, (k0, v0, l0))
        return out_x, out_p
    out_x, out_p = run(params, tok0, pre.cache.k[0], pre.cache.v[0],
                       pre.cache.lengths[0], pre.cache.positions)
    out_x, out_p = np.asarray(out_x, np.float32), np.asarray(out_p, np.float32)
    d = np.abs(out_p - out_x).max()
    print("d_out", d)
    print("out_x[0,0,0,:6]", out_x[0, 0, 0, :6])
    print("out_p[0,0,0,:6]", out_p[0, 0, 0, :6])
    print("DIVERGED" if d > 1e-2 else "OK")

elif MODE == "kernelonly":
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, Hq, 1, D)), dtype)
    k = jnp.asarray(rng.normal(size=(B, Hq, 1, D)), dtype)
    v = jnp.asarray(rng.normal(size=(B, Hq, 1, D)), dtype)
    @jax.jit
    def run(q, k, v, k0, v0, l0):
        return both_paths(q, k, v, k0, v0, l0)
    out_x, out_p = run(q, k, v, pre.cache.k[0], pre.cache.v[0],
                       pre.cache.lengths[0])
    d = np.abs(np.asarray(out_p, np.float32)
               - np.asarray(out_x, np.float32)).max()
    print("d_out", d)
    print("DIVERGED" if d > 1e-2 else "OK")

elif MODE == "kernelsolo":
    # Kernel ALONE in the jit (no XLA path sharing the cache buffer), real
    # prefill cache, numpy fp32 ground truth on host.
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, Hq, 1, D)), dtype)
    k = jnp.asarray(rng.normal(size=(B, Hq, 1, D)), dtype)
    v = jnp.asarray(rng.normal(size=(B, Hq, 1, D)), dtype)

    @jax.jit
    def runp(q, k, v, k0, v0, l0):
        out_p, kp, vp, lp_ = decode_attention_append(
            q.reshape(B * cache_heads, Gq, D).astype(dtype),
            k0.reshape(B * cache_heads, C, D),
            v0.reshape(B * cache_heads, C, D),
            l0.reshape(B * cache_heads),
            k.astype(dtype).reshape(B * cache_heads, D),
            v.astype(dtype).reshape(B * cache_heads, D))
        return out_p.reshape(B, Hq, 1, D)

    k0, v0, l0 = pre.cache.k[0], pre.cache.v[0], pre.cache.lengths[0]
    out_p = np.asarray(runp(q, k, v, k0, v0, l0), np.float32)

    # numpy ground truth
    qn = np.asarray(q, np.float32)[0, :, 0]      # [H, D]
    kn = np.asarray(k, np.float32)[0, :, 0]
    vn = np.asarray(v, np.float32)[0, :, 0]
    kc = np.asarray(k0, np.float32)[0]           # [H, C, D]
    vc = np.asarray(v0, np.float32)[0]
    ln = np.asarray(l0)[0]                       # [H]
    exp = np.zeros((Hq, D), np.float32)
    for h in range(Hq):
        L = int(ln[h])
        kk = np.concatenate([kc[h, :L], kn[h:h+1]], 0)
        vv = np.concatenate([vc[h, :L], vn[h:h+1]], 0)
        s = (qn[h] @ kk.T) / np.sqrt(D)
        s = s - s.max()
        p = np.exp(s); p /= p.sum()
        exp[h] = p @ vv
    exp_ns = np.zeros((Hq, D), np.float32)
    for h in range(Hq):
        L = int(ln[h])
        kk = np.concatenate([kc[h, :L], kn[h:h+1]], 0)
        vv = np.concatenate([vc[h, :L], vn[h:h+1]], 0)
        s = qn[h] @ kk.T  # NO 1/sqrt(D)
        s = s - s.max()
        p = np.exp(s); p /= p.sum()
        exp_ns[h] = p @ vv
    print("lens:", ln.tolist())
    d = np.abs(out_p[0, :, 0] - exp).max()
    print("kernel-solo vs numpy d_out:", d)
    print("exp[0,:6]", exp[0, :6])
    print("got[0,:6]", out_p[0, 0, 0, :6])
    d_ns = np.abs(out_p[0, :, 0] - exp_ns).max()
    print("kernel-solo vs UNSCALED numpy d_out:", d_ns)
    print("DIVERGED" if d > 5e-2 else "OK")
