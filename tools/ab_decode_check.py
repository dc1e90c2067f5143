"""Real-TPU A/B check: decode_step with attn_backend="pallas" vs "xla".

History: round 1 shipped the Pallas decode kernels without the 1/sqrt(D)
softmax scale; every isolated "parity" check compared against equally
unscaled references, so the bug only surfaced inside the full decode graph
(where the XLA path scales in grouped_attention).  Fixed; this tool is the
regression gate.

Criterion: teacher-forced — both backends decode the SAME greedy token
sequence (from the XLA path), so per-step logits are comparable.  bf16
accumulation differs legitimately between the two paths (the kernel keeps
softmax probs in fp32; XLA casts them to bf16), so we assert a logit
tolerance, not trajectory equality.

Run on a TPU host: python tools/ab_decode_check.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import functools, jax, jax.numpy as jnp, numpy as np
from kvcache_factory_tpu.config import CompressionConfig, ModelConfig
from kvcache_factory_tpu.models import llama
from kvcache_factory_tpu.models.weights import init_params

cfg = ModelConfig(model_type="llama", vocab_size=32000, hidden_size=2048,
    intermediate_size=5632, num_hidden_layers=22, num_attention_heads=16,
    num_key_value_heads=4, head_dim=128, max_position_embeddings=8192)
params = init_params(cfg, jax.random.PRNGKey(0))
comp = CompressionConfig(method="snapkv", max_capacity_prompt=512,
                         window_size=8, kernel_size=7, pooling="maxpool")
S = 1024; CC = 512 + 48  # 16-aligned so the Pallas decode path engages
toks = jnp.asarray(np.random.default_rng(0).integers(0, 32000, (1, S)), jnp.int32)
tl = jnp.full((1,), S, jnp.int32)
pre = jax.jit(lambda p,t,l: llama.prefill(p,cfg,comp,t,l,cache_capacity=CC))(params, toks, tl)
tok = jnp.argmax(pre.logits_last, -1).astype(jnp.int32)
N = 24

@functools.partial(jax.jit, static_argnames=("backend",))
def free_run(params, tok, cache, backend):
    def body(c, _):
        t, cache = c
        lg, cache = llama.decode_step(params, cfg, t, cache,
                                      attn_backend=backend)
        return (jnp.argmax(lg, -1).astype(jnp.int32), cache), lg
    (t, _), lgs = jax.lax.scan(body, (tok, cache), None, length=N)
    return lgs

@functools.partial(jax.jit, static_argnames=("backend",))
def forced_run(params, seq, cache, backend):
    def body(cache, t):
        lg, cache = llama.decode_step(params, cfg, t, cache,
                                      attn_backend=backend)
        return cache, lg
    _, lgs = jax.lax.scan(body, cache, seq)
    return lgs

lg_x = np.asarray(free_run(params, tok, pre.cache, "xla"))  # [N, B, V]
seq = jnp.concatenate(
    [tok[None], jnp.argmax(jnp.asarray(lg_x[:-1]), -1).astype(jnp.int32)], 0)
lg_p = np.asarray(forced_run(params, seq, pre.cache, "pallas"))
lg_x2 = np.asarray(forced_run(params, seq, pre.cache, "xla"))
assert np.allclose(lg_x2, lg_x, atol=1e-5), "teacher forcing is broken"

err = np.abs(lg_p - lg_x).max() / np.abs(lg_x).max()
agree = (lg_p.argmax(-1) == lg_x.argmax(-1)).mean()
# top-1 margin in XLA logits vs the observed perturbation: flips are only
# acceptable where the margin is within the numeric noise.
margin = np.sort(lg_x, axis=-1)
margin = margin[..., -1] - margin[..., -2]
flips = lg_p.argmax(-1) != lg_x.argmax(-1)
bad_flips = flips & (margin > 4 * np.abs(lg_p - lg_x).max(-1))
print(f"teacher-forced rel logit err {err:.2e}; argmax agreement "
      f"{agree*100:.0f}%; confident flips {bad_flips.sum()}")
assert err < 2.5e-2, f"pallas decode rel logit err too large: {err:.3e}"
assert not bad_flips.any(), "pallas flipped a confidently-separated token"
print("TPU A/B OK (bf16-tolerance criterion)")
