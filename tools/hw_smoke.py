"""Real-TPU smoke matrix: compile + run one prefill and a few decode steps
through EVERY cache path x head-grouping mode on the actual chip.

Interpret-mode tests catch math errors but not Mosaic layout/compile
failures, which have proven context- and shape-dependent (the grouped-head
quant kernel compiled at G=1 and in some G=4 graphs but not others).  This
harness is the hardware counterpart of the CPU test matrix: tiny model, all
decode cache variants, both group_reduce modes, finiteness-checked.

Run on a TPU host: python tools/hw_smoke.py  (~2 min, one compile per cell)
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp, numpy as np

from kvcache_factory_tpu.config import (CompressionConfig, ModelConfig,
                                        QuantConfig)
from kvcache_factory_tpu.models import llama
from kvcache_factory_tpu.models.weights import init_params

cfg = ModelConfig(model_type="llama", vocab_size=512, hidden_size=512,
                  intermediate_size=1024, num_hidden_layers=2,
                  num_attention_heads=4, num_key_value_heads=1, head_dim=128,
                  max_position_embeddings=4096)
params = init_params(cfg, jax.random.PRNGKey(0))
S, B, CAP = 512, 2, 384
tokens = jnp.asarray(
    np.random.default_rng(0).integers(0, cfg.vocab_size, (B, S)), jnp.int32)
true_len = jnp.asarray([S, S - 17], jnp.int32)

CELLS = [
    # (label, comp kwargs, quant)
    ("bf16",        {}, None),
    ("int8",        {}, QuantConfig(nbits=8)),
    ("int4",        {}, QuantConfig(nbits=4)),
    ("int8+resid",  {}, QuantConfig(nbits=8, residual_length=16)),  # XLA path
    ("evict",       {"decode_evict": True, "eviction_recent": 16}, None),
    ("think_packed", {"method": "think", "think_packed": True,
                      "pruning_ratio": 0.4, "recent_size": 32}, None),
    # sliding-window models take the XLA decode path (window masking)
    ("sliding_win",  {"method": "fullkv"}, None),
]

failures = []
for group in ("none", "mean"):
    for label, extra, quant in CELLS:
        if label == "think_packed" and group == "mean":
            continue  # think saliency is per-query-head by construction
        kw = dict(method="snapkv", max_capacity_prompt=CAP, window_size=8,
                  kernel_size=7, pooling="maxpool", group_reduce=group)
        kw.update(extra)
        comp = CompressionConfig(**kw)
        import dataclasses
        mcfg = (dataclasses.replace(cfg, sliding_window=128)
                if label == "sliding_win" else cfg)
        try:
            # 512 = 256-aligned so the Pallas int8/int4 kernel layouts
            # engage (_quant_tpu_layout); unaligned capacities take the XLA
            # quant path, which the int8+resid cell already covers.
            pre = llama.prefill(params, mcfg, comp, tokens, true_len,
                                cache_capacity=512, quant=quant)
            tok = jnp.argmax(pre.logits_last, axis=-1).astype(jnp.int32)
            cache = pre.cache
            step = jax.jit(lambda t, c: llama.decode_step(
                params, mcfg, t, c, quant=quant,
                eviction_recent=comp.eviction_recent))
            for _ in range(3):
                logits, cache = step(tok, cache)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            lg = np.asarray(logits)
            assert np.isfinite(lg).all(), "non-finite logits"
            print(f"{label:13s} group={group:4s} cache="
                  f"{type(cache).__name__:18s} OK")
        except Exception as e:
            failures.append((label, group))
            print(f"{label:13s} group={group:4s} FAIL: {str(e)[:100]}")

if failures:
    print("FAILURES:", failures)
    sys.exit(1)
print("hw smoke matrix OK")
