"""Real-TPU A/B check: decode_step with attn_backend="pallas" vs "xla".

Documents the open round-1 issue: the Pallas decode kernel passes every
isolated parity test (interpret mode, standalone on hardware, under lax.scan,
with in-graph operands incl. RoPE) but diverges when embedded in the full
decode_step graph on the axon v5e stack.  Until root-caused, decode_step's
"auto" backend selects XLA (correct, 137.7 tok/s vs the kernel's 146).

Run on a TPU host: python tools/ab_decode_check.py
Expected (while the bug lives): the assertion fires for the explicit pallas
backend. When it stops firing, flip decode_step's "auto" back to pallas.
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
S = 1024; CC = 512 + 40
toks = jnp.asarray(np.random.default_rng(0).integers(0, 32000, (1, S)), jnp.int32)
tl = jnp.full((1,), S, jnp.int32)
pre = jax.jit(lambda p,t,l: llama.prefill(p,cfg,comp,t,l,cache_capacity=CC))(params, toks, tl)
tok = jnp.argmax(pre.logits_last, -1).astype(jnp.int32)

@functools.partial(jax.jit, static_argnames=("backend",))
def dec(params, tok, cache, backend):
    def body(c, _):
        t, cache = c
        lg, cache = llama.decode_step(params, cfg, t, cache,
                                      attn_backend=backend)
        return (jnp.argmax(lg, -1).astype(jnp.int32), cache), lg
    (t, _), lgs = jax.lax.scan(body, (tok, cache), None, length=24)
    return lgs

lg_pallas = np.asarray(dec(params, tok, pre.cache, "pallas"))
lg_xla = np.asarray(dec(params, tok, pre.cache, "xla"))
tok_p = lg_pallas.argmax(-1)[:, 0]
tok_x = lg_xla.argmax(-1)[:, 0]
print("pallas tokens:", tok_p[:12].tolist())
print("xla tokens:   ", tok_x[:12].tolist())
same = (tok_p == tok_x).mean()
err = np.abs(lg_pallas - lg_xla).max() / np.abs(lg_xla).max()
print(f"token agreement {same*100:.0f}%  rel logit err {err:.2e}")
assert same == 1.0, "pallas decode diverged from XLA on real TPU"
print("TPU A/B OK")
