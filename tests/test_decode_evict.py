"""Decode-stage eviction (beyond-reference: the README.md:31 unchecked TODO)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.config import (CompressionConfig, GenerationConfig,
                                        ModelConfig)
from kvcache_factory_tpu.models.weights import init_params
from kvcache_factory_tpu.runtime import generate


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=512,
        dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(11), dtype=jnp.float32)
    return cfg, params


def test_eviction_bounds_cache(tiny):
    cfg, params = tiny
    S, cap, new = 96, 32, 40  # decode would overflow a non-evicting cache
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=cap,
                             window_size=8, kernel_size=7, pooling="maxpool",
                             decode_evict=True, eviction_recent=8)
    res = generate(params, cfg, comp, GenerationConfig(max_new_tokens=new),
                   jnp.asarray(toks, jnp.int32), jnp.asarray([S], jnp.int32),
                   cache_capacity=cap + 4)  # tiny headroom, must evict
    assert int(res.num_tokens[0]) == new
    lens = np.asarray(res.cache.lengths)
    assert lens.max() <= cap + 4  # bounded forever
    assert int(res.cache.positions[0]) == S + new - 1  # positions keep advancing
    # scores accumulated and stamps advanced
    assert np.asarray(res.cache.scores).max() > 0
    assert np.asarray(res.cache.stamps).max() >= S


def test_eviction_matches_plain_before_full(tiny):
    """Until the cache fills, evicting decode must equal plain decode."""
    cfg, params = tiny
    S, cap = 96, 32
    new = 8  # cap+16 headroom > new appends -> never evicts
    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    base = CompressionConfig(method="snapkv", max_capacity_prompt=cap,
                             window_size=8, kernel_size=7, pooling="maxpool")
    evict = CompressionConfig(method="snapkv", max_capacity_prompt=cap,
                              window_size=8, kernel_size=7, pooling="maxpool",
                              decode_evict=True, eviction_recent=8)
    r1 = generate(params, cfg, base, GenerationConfig(max_new_tokens=new),
                  jnp.asarray(toks, jnp.int32), jnp.asarray([S], jnp.int32),
                  cache_capacity=cap + 16)
    r2 = generate(params, cfg, evict, GenerationConfig(max_new_tokens=new),
                  jnp.asarray(toks, jnp.int32), jnp.asarray([S], jnp.int32),
                  cache_capacity=cap + 16)
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))
