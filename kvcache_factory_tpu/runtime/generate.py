"""Jitted greedy generation: prefill + while-loop decode.

Behavioral contract from the reference protocol (run_longbench.py:266-275):
greedy (num_beams=1, do_sample=False), ``min_length = context+1`` (at least
one new token before EOS can stop generation), stop on any of
``eos_token_ids`` or after ``max_new_tokens``.

TPU design: the entire decode loop is one ``lax.while_loop`` inside a single
jit — no per-token Python dispatch (the reference pays HF ``generate``'s
Python loop + per-layer monkeypatched forward every token).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..cache.kv_cache import KVCache
from ..config import CompressionConfig, GenerationConfig, ModelConfig, QuantConfig
from ..models import llama


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray      # [B, max_new_tokens] generated ids (pad after EOS)
    num_tokens: jnp.ndarray  # [B] count of valid generated tokens
    cache: KVCache


def greedy_sample(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_token(logits: jnp.ndarray, gen_cfg: GenerationConfig,
                 key: Optional[jax.Array]) -> jnp.ndarray:
    """Greedy (reference protocol) or temperature/top-k/top-p sampling."""
    if not gen_cfg.do_sample:
        return greedy_sample(logits)
    logits = logits / max(gen_cfg.temperature, 1e-6)
    if gen_cfg.top_k:
        kth = lax.top_k(logits, gen_cfg.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if gen_cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative mass >= top_p (keep first exceeding)
        cutoff_idx = jnp.sum(cum < gen_cfg.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("model_cfg", "comp_cfg", "gen_cfg", "cache_capacity",
                     "return_all_logits", "quant_cfg", "attn_backend",
                     "sp_mesh", "decode_mesh"),
)
def generate(
    params: dict,
    model_cfg: ModelConfig,
    comp_cfg: CompressionConfig,
    gen_cfg: GenerationConfig,
    tokens: jnp.ndarray,      # [B, S] right-padded prompt
    true_len: jnp.ndarray,    # [B]
    cache_capacity: int,
    rng: Optional[jax.Array] = None,
    head_capacity: Optional[jnp.ndarray] = None,
    sparse_budgets: Optional[jnp.ndarray] = None,  # [L, Hq, 2] (MInference)
    return_all_logits: bool = False,
    quant_cfg: Optional[QuantConfig] = None,
    attn_backend: str = "auto",
    sp_mesh=None,  # hashable jax.sharding.Mesh with an "sp" axis (static)
    decode_mesh=None,  # (dp, tp) Mesh: run decode under shard_map'd Pallas
) -> GenerateResult:
    B, S = tokens.shape
    max_new = gen_cfg.max_new_tokens

    pre = llama.prefill(params, model_cfg, comp_cfg, tokens, true_len,
                        cache_capacity, rng=rng, head_capacity=head_capacity,
                        sparse_budgets=sparse_budgets,
                        return_all_logits=return_all_logits, quant=quant_cfg,
                        # under a mesh the engine passes attn_backend="xla"
                        # (GSPMD cannot partition pallas_call) — but prefill
                        # now owns a shard_map'd flash path, so hand it the
                        # mesh and let it re-resolve, exactly like decode
                        attn_backend=("auto" if decode_mesh is not None
                                      else attn_backend),
                        sp_mesh=sp_mesh, mesh=decode_mesh)
    sample_rng = rng if rng is not None else jax.random.PRNGKey(0)
    sample_rng, k0 = jax.random.split(jax.random.fold_in(sample_rng, 7))
    first_tok = sample_token(pre.logits_last, gen_cfg, k0)  # [B]

    eos = jnp.asarray(list(gen_cfg.eos_token_ids) or [-1], jnp.int32)

    def is_eos(tok):
        return jnp.any(tok[:, None] == eos[None, :], axis=-1)

    vocab = pre.logits_last.shape[-1]
    eos_mask = (jnp.zeros((vocab,), bool).at[eos].set(True, mode="drop")
                if gen_cfg.eos_token_ids else jnp.zeros((vocab,), bool))

    def suppress_eos(logits, allow_eos):
        """HF min_length semantics: before min_new_tokens the EOS logit is
        masked so the runner-up token is emitted — EOS must never appear
        inside the output (the previous behavior recorded an interior EOS
        and conditioned later tokens on it)."""
        return jnp.where(jnp.logical_not(allow_eos) & eos_mask[None, :],
                         -jnp.inf, logits)

    if gen_cfg.min_new_tokens > 1:
        first_tok = sample_token(
            suppress_eos(pre.logits_last, jnp.asarray(False)), gen_cfg, k0)

    out_buf = jnp.zeros((B, max_new), jnp.int32)
    out_buf = out_buf.at[:, 0].set(first_tok)
    # min_new_tokens=1 per reference min_length=ctx+1: the first token is
    # always emitted; a first-token EOS still counts but stops the loop.
    done0 = is_eos(first_tok) & (gen_cfg.min_new_tokens <= 1)

    class _State(NamedTuple):
        step: jnp.ndarray       # next output slot to write
        cur: jnp.ndarray        # [B] last emitted token (decoder input)
        done: jnp.ndarray       # [B] bool
        num: jnp.ndarray        # [B] valid generated tokens
        out: jnp.ndarray        # [B, max_new]
        rng: jax.Array
        cache: KVCache

    def cond(s: _State):
        return (s.step < max_new) & jnp.logical_not(jnp.all(s.done))

    def body(s: _State):
        logits, cache = llama.decode_step(
            params, model_cfg, s.cur, s.cache, quant=quant_cfg,
            # prefill must stay "xla" under a mesh (GSPMD cannot partition
            # pallas_call) but decode gets the shard_map'd kernel: resolve
            # the backend fresh so "auto" -> pallas-on-TPU applies.
            attn_backend="auto" if decode_mesh is not None else attn_backend,
            mesh=decode_mesh,
            eviction_recent=comp_cfg.eviction_recent)
        rng_next, kstep = jax.random.split(s.rng)
        nxt = sample_token(
            suppress_eos(logits, s.step + 1 >= gen_cfg.min_new_tokens),
            gen_cfg, kstep)
        out = s.out.at[:, s.step].set(jnp.where(s.done, 0, nxt))
        num = s.num + jnp.where(s.done, 0, 1)
        newly_done = is_eos(nxt)
        cur = jnp.where(s.done, s.cur, nxt)
        return _State(s.step + 1, cur, s.done | newly_done, num, out,
                      rng_next, cache)

    init = _State(jnp.asarray(1), first_tok, done0,
                  jnp.ones((B,), jnp.int32), out_buf, sample_rng, pre.cache)
    final = lax.while_loop(cond, body, init)
    return GenerateResult(final.out, final.num, final.cache)
