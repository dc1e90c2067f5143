"""Generation-state checkpoint/resume: interrupted decode must continue
bit-identically to an uninterrupted run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.config import (CompressionConfig, GenerationConfig,
                                        ModelConfig)
from kvcache_factory_tpu.models import llama
from kvcache_factory_tpu.models.weights import init_params
from kvcache_factory_tpu.runtime.checkpoint import (load_generation_state,
                                                    save_generation_state)


def test_checkpoint_resume_bit_identical(tmp_path):
    cfg = ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=256,
        dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    S, total = 64, 10
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))

    pre = llama.prefill(params, cfg, comp, jnp.asarray(toks, jnp.int32),
                        jnp.asarray([S], jnp.int32), cache_capacity=32 + total)
    cur = jnp.argmax(pre.logits_last, -1).astype(jnp.int32)
    cache = pre.cache

    # Uninterrupted run.
    ref_tokens = [int(cur[0])]
    c, t = cache, cur
    for _ in range(total - 1):
        lg, c = llama.decode_step(params, cfg, t, c)
        t = jnp.argmax(lg, -1).astype(jnp.int32)
        ref_tokens.append(int(t[0]))

    # Interrupted: 4 steps, checkpoint, restore, continue.
    got = [int(cur[0])]
    c, t = cache, cur
    for _ in range(4):
        lg, c = llama.decode_step(params, cfg, t, c)
        t = jnp.argmax(lg, -1).astype(jnp.int32)
        got.append(int(t[0]))
    path = save_generation_state(str(tmp_path / "ckpt"), c, t,
                                 np.asarray(got), {"note": "mid-stream"})
    c2, t2, gen2, meta = load_generation_state(path)
    assert meta["note"] == "mid-stream"
    assert gen2.tolist() == got
    np.testing.assert_array_equal(np.asarray(c2.k), np.asarray(c.k))
    for _ in range(total - 1 - 4):
        lg, c2 = llama.decode_step(params, cfg, t2, c2)
        t2 = jnp.argmax(lg, -1).astype(jnp.int32)
        got.append(int(t2[0]))

    assert got == ref_tokens


def test_checkpoint_quantized_cache_roundtrip(tmp_path):
    """QuantizedKVCache with rk=rv=None (residual_length=0, the default)
    must survive a save/load round trip — None fields are dropped on save
    and restored from the NamedTuple defaults."""
    from kvcache_factory_tpu.config import QuantConfig

    cfg = ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=256,
        dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(6), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8)
    quant = QuantConfig(nbits=8, q_group_size=16)  # group <= tiny head_dim
    toks = np.random.default_rng(1).integers(0, 128, size=(1, 64))
    pre = llama.prefill(params, cfg, comp, jnp.asarray(toks, jnp.int32),
                        jnp.asarray([64], jnp.int32), cache_capacity=48,
                        quant=quant)
    cur = jnp.argmax(pre.logits_last, -1).astype(jnp.int32)
    assert pre.cache.rk is None  # the regression precondition

    path = save_generation_state(str(tmp_path / "qckpt"), pre.cache, cur,
                                 np.asarray([[int(cur[0])]]))
    cache2, cur2, gen2, _ = load_generation_state(path)
    assert type(cache2).__name__ == "QuantizedKVCache"
    assert cache2.rk is None and cache2.rv is None
    np.testing.assert_array_equal(np.asarray(cache2.qk),
                                  np.asarray(pre.cache.qk))
    # Resumed decode must match continuing from the original cache.
    lg_a, _ = llama.decode_step(params, cfg, cur, pre.cache, quant=quant)
    lg_b, _ = llama.decode_step(params, cfg, cur2, cache2, quant=quant)
    np.testing.assert_array_equal(np.asarray(lg_a), np.asarray(lg_b))
