"""Real-TPU A/B: quantized decode with the Pallas fused-dequant kernel vs the
XLA quant path on the same int8 cache semantics.

The two paths quantize identically (per-token affine over head_dim when
QuantKVCacheTPU is selected) but differ in kernel vs XLA execution, so
teacher-forced logits must agree to bf16/int8 tolerance.

Run on a TPU host: python tools/ab_quant_check.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import functools, jax, jax.numpy as jnp, numpy as np
from kvcache_factory_tpu.config import CompressionConfig, ModelConfig, QuantConfig
from kvcache_factory_tpu.models import llama
from kvcache_factory_tpu.models.weights import init_params

cfg = ModelConfig(model_type="llama", vocab_size=32000, hidden_size=2048,
    intermediate_size=5632, num_hidden_layers=22, num_attention_heads=16,
    num_key_value_heads=4, head_dim=128, max_position_embeddings=8192)
params = init_params(cfg, jax.random.PRNGKey(0))
GROUP = sys.argv[2] if len(sys.argv) > 2 else "none"  # "mean" = GQA-grouped
comp = CompressionConfig(method="snapkv", max_capacity_prompt=512,
                         window_size=8, kernel_size=7, pooling="maxpool",
                         group_reduce=GROUP)
NBITS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
# q_group_size == head_dim so the XLA path's group-wise quantization matches
# the TPU layout's per-token granularity; outlier_extract off because the
# per-token kernel layouts don't carry outlier slots — the A/B isolates
# kernel-vs-XLA execution of IDENTICAL quantization semantics.
quant = QuantConfig(nbits=NBITS, q_group_size=128, outlier_extract=False)
S = 1024; CC = 640 if NBITS == 8 else 768  # aligned so the TPU layout engages
toks = jnp.asarray(np.random.default_rng(0).integers(0, 32000, (1, S)), jnp.int32)
tl = jnp.full((1,), S, jnp.int32)

def run(enable_pallas: bool, seq=None):
    """seq=None: free-run greedily, return (kind, logits, tokens).
    seq given: teacher-force that token sequence."""
    os.environ["KVCF_DISABLE_PALLAS_QUANT"] = "0" if enable_pallas else "1"
    pre = jax.jit(lambda p, t, l: llama.prefill(
        p, cfg, comp, t, l, cache_capacity=CC, quant=quant))(params, toks, tl)
    kind = type(pre.cache).__name__
    tok = jnp.argmax(pre.logits_last, -1).astype(jnp.int32)

    @jax.jit
    def free(params, tok, cache):
        def body(c, _):
            t, cache = c
            lg, cache = llama.decode_step(params, cfg, t, cache, quant=quant)
            return (jnp.argmax(lg, -1).astype(jnp.int32), cache), lg
        (t, _), lgs = jax.lax.scan(body, (tok, cache), None, length=24)
        return lgs

    @jax.jit
    def forced(params, seq, cache):
        def body(cache, t):
            lg, cache = llama.decode_step(params, cfg, t, cache, quant=quant)
            return cache, lg
        _, lgs = jax.lax.scan(body, cache, seq)
        return lgs

    if seq is None:
        lgs = np.asarray(free(params, tok, pre.cache))
        seq_out = np.concatenate([np.asarray(tok)[None],
                                  lgs[:-1].argmax(-1).astype(np.int32)], 0)
        return kind, lgs, jnp.asarray(seq_out)
    return kind, np.asarray(forced(params, seq, pre.cache)), seq

kind_x, lg_x, seq = run(False)
kind_p, lg_p, _ = run(True, seq)
print(f"pallas cache: {kind_p}; xla cache: {kind_x}")
want = "QuantKVCacheTPU" if NBITS == 8 else "QuantKVCacheTPU4"
assert kind_p == want, f"TPU quant layout not engaged: {kind_p}"

err = np.abs(lg_p - lg_x).max() / np.abs(lg_x).max()
agree = (lg_p.argmax(-1) == lg_x.argmax(-1)).mean()
print(f"teacher-forced rel logit err {err:.2e}; "
      f"argmax agreement {agree*100:.0f}%")
# The two paths quantize with the same per-token grouping (q_group_size ==
# head_dim) but store scales in different dtypes and fold dequant
# differently, so int8-level tolerance applies.
tol = 8e-2 if NBITS == 8 else 2e-1  # int4: 16 levels, larger spread
assert err < tol, f"quant pallas vs xla rel err too large: {err:.3e}"
agree_tol = 0.9 if NBITS == 8 else 0.8
assert agree >= agree_tol, f"quant paths disagree on too many tokens: {agree}"
print(f"TPU quant A/B OK (nbits={NBITS})")
