"""ThinK packed-storage cache: parity vs the in-place-zeroed think path.

The reference stores channel-pruned keys as a narrower tensor + channel mask
and splits decode QK into pruned-past and dense-recent products
(llama_model_think.py:175-181).  Our default think mode zeroes dropped
channels in place (identical decode math, no memory saving); `think_packed`
reproduces the reference's REAL memory saving.  Because a dot over kept
channels equals the dot over all channels with dropped ones zeroed, the two
modes must agree exactly on compressed prompts.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kvcache_factory_tpu.cache.think_cache import ThinKCache
from kvcache_factory_tpu.config import CompressionConfig, GenerationConfig
from kvcache_factory_tpu.models import llama as jl
from kvcache_factory_tpu.runtime import generate

from test_model_parity import tiny_hf_llama

RATIO, RECENT, WINDOW, CAP = 0.4, 8, 8, 32


def think_cfg(packed: bool) -> CompressionConfig:
    return CompressionConfig(method="think", max_capacity_prompt=CAP,
                             window_size=WINDOW, kernel_size=7,
                             pooling="maxpool", pruning_ratio=RATIO,
                             recent_size=RECENT, think_packed=packed)


@pytest.fixture(scope="module")
def setup():
    return tiny_hf_llama(21)


def test_think_packed_layout_and_memory(setup):
    _, cfg, params = setup
    S, new = 96, 6
    toks = np.random.default_rng(0).integers(0, cfg.vocab_size, size=(1, S))
    capacity = CAP + new
    res = jl.prefill(params, cfg, think_cfg(True), jnp.asarray(toks, jnp.int32),
                     jnp.asarray([S], jnp.int32), cache_capacity=capacity)
    cache = res.cache
    assert isinstance(cache, ThinKCache)
    D = cfg.head_dim
    dkeep = D - int(D * RATIO)
    assert cache.kept_dim == dkeep
    assert cache.kp.shape[-2:] == (capacity, dkeep)
    # dense buffer: recent rows + decode headroom, NOT the full capacity
    assert cache.dense_capacity == RECENT + (capacity - CAP)
    # channel ids ascending, unique, within range
    ch = np.asarray(cache.channels)
    assert ch.min() >= 0 and ch.max() < D
    assert np.all(np.diff(ch, axis=-1) > 0)
    # boundary honors the recent carve-out
    np.testing.assert_array_equal(np.asarray(cache.boundary),
                                  np.maximum(np.asarray(cache.lengths) - RECENT, 0))


def test_think_packed_generation_matches_inplace(setup):
    _, cfg, params = setup
    S, new = 96, 10
    toks = np.random.default_rng(1).integers(0, cfg.vocab_size, size=(1, S))
    gen_cfg = GenerationConfig(max_new_tokens=new, eos_token_ids=())
    outs = {}
    for packed in (False, True):
        outs[packed] = generate(params, cfg, think_cfg(packed), gen_cfg,
                                jnp.asarray(toks, jnp.int32),
                                jnp.asarray([S], jnp.int32),
                                cache_capacity=CAP + new)
    np.testing.assert_array_equal(np.asarray(outs[False].tokens),
                                  np.asarray(outs[True].tokens))


def test_think_packed_decode_logits_match_inplace(setup):
    _, cfg, params = setup
    S = 80
    toks = np.random.default_rng(2).integers(0, cfg.vocab_size, size=(2, S))
    tl = jnp.asarray([S, S - 13], jnp.int32)
    caches, logits0 = {}, {}
    for packed in (False, True):
        res = jl.prefill(params, cfg, think_cfg(packed),
                         jnp.asarray(toks, jnp.int32), tl,
                         cache_capacity=CAP + 4)
        caches[packed], logits0[packed] = res.cache, res.logits_last
    np.testing.assert_allclose(np.asarray(logits0[False]),
                               np.asarray(logits0[True]), rtol=1e-5, atol=1e-5)
    cur = jnp.argmax(logits0[False], axis=-1).astype(jnp.int32)
    for _ in range(3):
        lg_plain, caches[False] = jl.decode_step(params, cfg, cur, caches[False])
        lg_pack, caches[True] = jl.decode_step(params, cfg, cur, caches[True])
        np.testing.assert_allclose(np.asarray(lg_plain), np.asarray(lg_pack),
                                   rtol=1e-5, atol=1e-5)
        cur = jnp.argmax(lg_plain, axis=-1).astype(jnp.int32)
    # dense rows advanced by the three appends
    np.testing.assert_array_equal(
        np.asarray(caches[True].lengths),
        np.asarray(caches[False].lengths))


def test_think_packed_padding_invariant(setup):
    _, cfg, params = setup
    S, S_pad = 72, 96
    toks = np.random.default_rng(3).integers(0, cfg.vocab_size, size=(1, S))
    toks_padded = np.pad(toks, ((0, 0), (0, S_pad - S)))
    exact = jl.prefill(params, cfg, think_cfg(True),
                       jnp.asarray(toks, jnp.int32), jnp.asarray([S], jnp.int32),
                       cache_capacity=CAP + 4)
    padded = jl.prefill(params, cfg, think_cfg(True),
                        jnp.asarray(toks_padded, jnp.int32),
                        jnp.asarray([S], jnp.int32), cache_capacity=CAP + 4)
    np.testing.assert_allclose(np.asarray(exact.logits_last),
                               np.asarray(padded.logits_last),
                               rtol=1e-5, atol=1e-5)


def test_think_packed_short_prompt_divergence_documented(setup):
    """Pinned behavior (config.py think_packed docstring): in-place think
    honors the no-compress carve-out for prompts under the budget (keys stay
    fully dense), while packed mode always prunes rows older than
    recent_size — the modes legitimately diverge there.  This test pins that
    the divergence is the documented one, not an accident: the packed cache
    still prunes, the in-place cache stays dense."""
    _, cfg, params = setup
    S = CAP - 8  # under budget -> no-compress branch in-place
    toks = np.random.default_rng(4).integers(0, cfg.vocab_size, size=(1, S))
    results = {}
    for packed in (False, True):
        results[packed] = jl.prefill(params, cfg, think_cfg(packed),
                                     jnp.asarray(toks, jnp.int32),
                                     jnp.asarray([S], jnp.int32),
                                     cache_capacity=CAP + 4)
    plain_k = np.asarray(results[False].cache.k)
    # in-place mode: no channel is zeroed anywhere (no-compress carve-out)
    assert not np.any(np.all(plain_k[..., :S, :] == 0, axis=-2))
    cache = results[True].cache
    assert isinstance(cache, ThinKCache)
    # packed mode prunes unconditionally: rows < boundary read Dk channels
    assert cache.kept_dim < cfg.head_dim
    assert np.all(np.asarray(cache.boundary) == max(S - RECENT, 0))
