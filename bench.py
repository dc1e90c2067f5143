"""Headline benchmark: single-chip decode throughput with a compressed cache.

Protocol: TinyLlama-1.1B-shaped Llama (bf16, random weights — the reference
publishes no throughput numbers at all, BASELINE.md), prompt 4096 tokens,
SnapKV compression to a 2048-token budget (the reference's headline budget,
README.md:88), then timed greedy decode.  ``vs_baseline`` is the fraction of
the chip's HBM-bandwidth speed-of-light for this model+cache footprint (decode
is bandwidth-bound: every step must stream all weights + the compressed cache).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from kvcache_factory_tpu.config import CompressionConfig, ModelConfig
from kvcache_factory_tpu.models import llama
from kvcache_factory_tpu.models.weights import init_params

V5E_HBM_GBPS = 819.0  # v5e HBM bandwidth (public spec: 819 GB/s)


def flagship():
    # ~1.1B params, head_dim 128 (lane-aligned for the Pallas decode kernel,
    # matching Llama-2/3 head geometry).
    return ModelConfig(
        model_type="llama", vocab_size=32000, hidden_size=2048,
        intermediate_size=5632, num_hidden_layers=22, num_attention_heads=16,
        num_key_value_heads=4, head_dim=128, max_position_embeddings=8192,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt_len", type=int, default=4096)
    ap.add_argument("--capacity", type=int, default=2048)
    ap.add_argument("--decode_steps", type=int, default=256,
                help="large enough to amortize the ~25ms dispatch overhead")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--method", type=str, default="snapkv")
    ap.add_argument("--nbits", type=int, default=0,
                    help="0 = fp cache; 4/8 = quantized KV cache")
    ap.add_argument("--group_reduce", type=str, default="none",
                    help="'mean' = GQA-grouped cache (4x smaller for this "
                         "geometry); 'none' = reference-parity per-query-head")
    ap.add_argument("--decode_evict", action="store_true",
                    help="decode-stage eviction (EvictingKVCache): the "
                         "beyond-reference decode-compression feature; runs "
                         "the XLA decode path (no kernel for this cache) — "
                         "this flag prices that tradeoff (VERDICT r4 #6)")
    ap.add_argument("--wq8", action="store_true",
                    help="weight-only int8 quantization (W8A16): halves the "
                         "weight stream, the dominant decode term at every "
                         "measured batch size (models/weights.py::"
                         "quantize_weights)")
    ap.add_argument("--tp1_shard", action="store_true",
                    help="run decode through the shard_map'd kernel wrappers "
                         "over a 1-device (dp, tp) mesh — measures the "
                         "shard_map overhead vs the plain kernels")
    args = ap.parse_args()

    cfg = flagship()
    comp_kw = {}
    if args.decode_evict:
        comp_kw = dict(decode_evict=True, eviction_recent=16)
    comp = CompressionConfig(method=args.method, max_capacity_prompt=args.capacity,
                             window_size=8, kernel_size=7, pooling="maxpool",
                             group_reduce=args.group_reduce, **comp_kw)
    quant = None
    if args.nbits:
        from kvcache_factory_tpu.config import QuantConfig
        quant = QuantConfig(nbits=args.nbits)
    S, B, steps = args.prompt_len, args.batch, args.decode_steps
    L = cfg.num_hidden_layers
    cache_capacity = comp.layer_capacity(L, S) + steps + 1
    # Round capacity so the Pallas decode kernels engage (bf16 kernel needs
    # C % 16 == 0; the int8 kernel's scale planes need C % 128 == 0; the int4
    # token-block nibble planes need C % 256 == 0).
    align = 256 if args.nbits == 4 else 128
    cache_capacity = -(-cache_capacity // align) * align

    params = init_params(cfg, jax.random.PRNGKey(0))
    if args.wq8:
        from kvcache_factory_tpu.models.weights import quantize_weights
        params = quantize_weights(params)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    true_len = jnp.full((B,), S, jnp.int32)

    prefill = jax.jit(lambda p, t, tl: llama.prefill(
        p, cfg, comp, t, tl, cache_capacity=cache_capacity, quant=quant))

    t0 = time.perf_counter()
    pre = prefill(params, tokens, true_len)
    jax.block_until_ready(jax.tree.leaves(pre.cache))
    prefill_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    pre = prefill(params, tokens, true_len)
    jax.block_until_ready(jax.tree.leaves(pre.cache))
    prefill_s = time.perf_counter() - t0

    first_tok = jnp.argmax(pre.logits_last, axis=-1).astype(jnp.int32)

    mesh = None
    if args.tp1_shard:
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                    ("dp", "tp"))

    def decode_n(params, tok, cache, n):
        def body(carry, _):
            tok, cache = carry
            logits, cache = llama.decode_step(
                params, cfg, tok, cache, quant=quant, mesh=mesh,
                eviction_recent=comp.eviction_recent)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (tok, cache), tok
        (tok, cache), toks = jax.lax.scan(body, (tok, cache), None, length=n)
        return toks, cache

    decode = jax.jit(decode_n, static_argnames=("n",))
    # warmup/compile with the SAME step count (a different n recompiles)
    toks, _ = decode(params, first_tok, pre.cache, n=steps)
    _ = int(np.asarray(toks)[0, 0])
    t0 = time.perf_counter()
    toks, _ = decode(params, first_tok, pre.cache, n=steps)
    _ = int(np.asarray(toks)[0, 0])  # host readback: force full execution
    decode_s = time.perf_counter() - t0
    toks_per_s = steps * B / decode_s

    # Speed-of-light: bytes streamed per decode step / HBM bandwidth.
    param_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    kbuf = (getattr(pre.cache, "qk", None) if quant else pre.cache.k)
    if kbuf is None:
        kbuf = pre.cache.k_codes
    cache_heads = int(kbuf.shape[2])
    kv_elem_bytes = (0.5 if args.nbits == 4 else 1) if quant else 2
    scale_bytes = (2 * 2 * cfg.head_dim // 64) if quant else 0  # scales+zeros bf16 per group
    cache_bytes = int(2 * L * B * cache_heads * cache_capacity
                      * (cfg.head_dim * kv_elem_bytes + scale_bytes))
    sol_step_s = (param_bytes + cache_bytes) / (V5E_HBM_GBPS * 1e9)
    sol_toks_per_s = B / sol_step_s

    result = {
        "metric": "decode_tokens_per_sec_chip",
        "value": round(toks_per_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(toks_per_s / sol_toks_per_s, 4),
    }
    extra = {
        "prefill_s": round(prefill_s, 3),
        "prefill_compile_s": round(prefill_compile_s, 1),
        "decode_step_ms": round(1e3 * decode_s / steps, 3),
        "sol_toks_per_s": round(sol_toks_per_s, 1),
        "param_gb": round(param_bytes / 1e9, 2),
        "cache_gb": round(cache_bytes / 1e9, 2),
        "config": {"prompt": S, "capacity": args.capacity, "batch": B,
                   "method": args.method, "nbits": args.nbits,
                   "wq8": args.wq8,
                   "group_reduce": args.group_reduce,
                   "model": "tinyllama-1.1b-shape"},
    }
    import sys
    print(json.dumps(extra), file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
