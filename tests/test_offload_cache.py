"""Host-offloaded KV cache: decode parity vs the device-resident cache.

The HF OffloadedCache (vendored at cache_utils_think.py:507) keeps each
layer's KV on CPU with per-layer prefetch; the TPU-native equivalent keeps
the immutable compressed prefill KV in pinned_host memory and streams one
layer per step into the jitted graph, with decode appends in a small
device-resident ring.  The math must match the plain KVCache path exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.cache.offload_cache import (OffloadedKVCache,
                                                     offload_kv_cache)
from kvcache_factory_tpu.config import CompressionConfig
from kvcache_factory_tpu.models import llama as jl

from test_model_parity import tiny_hf_llama

CAP, W, NEW = 32, 8, 6


@pytest.fixture(scope="module")
def setup():
    return tiny_hf_llama(31)


def prefill_cache(cfg, params, toks, tl):
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=CAP,
                             window_size=W, kernel_size=7, pooling="maxpool")
    return jl.prefill(params, cfg, comp, toks, tl,
                      cache_capacity=CAP + NEW)


def test_offloaded_decode_matches_device_cache(setup):
    _, cfg, params = setup
    S = 80
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, size=(2, S)),
        jnp.int32)
    tl = jnp.asarray([S, S - 11], jnp.int32)
    res = prefill_cache(cfg, params, toks, tl)
    plain = res.cache
    off = offload_kv_cache(plain, decode_headroom=NEW)
    assert isinstance(off, OffloadedKVCache)
    assert off.hk.sharding.memory_kind == "pinned_host"
    assert off.device_capacity == NEW

    orig_k = np.asarray(plain.k)  # snapshot before any decode append
    cur = jnp.argmax(res.logits_last, axis=-1).astype(jnp.int32)
    step = jax.jit(lambda t, c: jl.decode_step(params, cfg, t, c))
    for _ in range(NEW - 1):
        lg_p, plain = step(cur, plain)
        lg_o, off = step(cur, off)
        np.testing.assert_allclose(np.asarray(lg_p), np.asarray(lg_o),
                                   rtol=1e-5, atol=1e-5)
        cur = jnp.argmax(lg_p, axis=-1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(off.lengths),
                                  np.asarray(plain.lengths))
    # host copy untouched; appends landed only in the device ring
    np.testing.assert_array_equal(np.asarray(off.hk), orig_k)
    assert np.any(np.asarray(off.dk) != 0)


def test_offloaded_ring_capacity_clamps(setup):
    _, cfg, params = setup
    S = 64
    toks = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, size=(1, S)),
        jnp.int32)
    tl = jnp.asarray([S], jnp.int32)
    res = prefill_cache(cfg, params, toks, tl)
    off = offload_kv_cache(res.cache, decode_headroom=2)
    cur = jnp.argmax(res.logits_last, axis=-1).astype(jnp.int32)
    for _ in range(4):  # two more steps than the ring holds
        lg, off = jl.decode_step(params, cfg, cur, off)
        assert np.all(np.isfinite(np.asarray(lg)))
        cur = jnp.argmax(lg, axis=-1).astype(jnp.int32)
    assert np.all(np.asarray(off.lengths - off.prefill_len) <= 2)
