"""SSM (Mamba) and encoder-decoder cache equivalents vs reference semantics.

Oracles are numpy emulations of the torch code in
/root/reference/pyramidkv/cache_utils_think.py (MambaCache :1596-1690,
EncoderDecoderCache :1269-1434) — the repo's kernel-divergence lesson:
parity against an INDEPENDENT spec, never a sibling implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.cache.encdec_cache import (
    batch_select, build_encoder_decoder_cache, mark_cross_written,
    select_cross)
from kvcache_factory_tpu.cache.kv_cache import KVCache, init_cache
from kvcache_factory_tpu.cache.ssm_cache import (SSMCache, advance,
                                                 conv_window, init_ssm_cache,
                                                 update_conv, update_ssm)


def _ref_update_conv(conv_state, new_col, position, K):
    """Literal numpy port of MambaCache.update_conv_state (:1674-1683):
    clamp, roll left, indexed write — including the wrap quirk where the
    oldest slot's value circles to the end during the first K steps."""
    pos = min(max(position, 0), K - 1)
    rolled = np.roll(conv_state, -1, axis=-1)
    rolled[:, :, pos] = new_col
    return rolled


def test_ssm_conv_update_matches_reference_spec():
    L, B, I, K, S = 3, 2, 8, 4, 16
    cache = init_ssm_cache(L, B, I, K, S, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ref = np.zeros((L, B, I, K), np.float32)

    upd = jax.jit(update_conv)
    for t in range(7):  # crosses the t >= K regime
        for li in range(L):
            x = rng.normal(size=(B, I)).astype(np.float32)
            cache = upd(cache, li, jnp.asarray(x))
            ref[li] = _ref_update_conv(ref[li], x, t, K)
        cache = advance(cache)
        np.testing.assert_allclose(np.asarray(cache.conv_states), ref,
                                   rtol=1e-6, atol=1e-6)

    # the window handed to the conv is the layer slice, newest last
    np.testing.assert_allclose(np.asarray(conv_window(cache, 1)), ref[1])


def test_ssm_ssm_update_and_layout_rule():
    L, B, I, K, S = 2, 3, 4, 4, 8
    cache = init_ssm_cache(L, B, I, K, S, dtype=jnp.float32)
    new = jnp.asarray(np.random.default_rng(1).normal(size=(B, I, S)),
                      jnp.float32)
    cache = jax.jit(update_ssm)(cache, 1, new)
    np.testing.assert_allclose(np.asarray(cache.ssm_states[1]),
                               np.asarray(new))
    assert np.asarray(cache.ssm_states[0]).sum() == 0.0  # other layer intact

    # layout rule (runtime/batching.py module docstring): positions is [B],
    # every other leaf [L, B, ...] — so the batching engine's generic slot
    # machinery (_alloc_pool / _insert_row) serves this cache unmodified
    from kvcache_factory_tpu.runtime.batching import _alloc_pool, _insert_row
    pool = _alloc_pool(cache, 4)
    assert pool.conv_states.shape == (L, 4, I, K)
    assert pool.positions.shape == (4,)
    row = cache._replace(
        conv_states=cache.conv_states[:, :1], ssm_states=cache.ssm_states[:, :1],
        positions=cache.positions[:1] + 7)
    pool = _insert_row(pool, row, jnp.int32(2))
    np.testing.assert_allclose(np.asarray(pool.conv_states[:, 2]),
                               np.asarray(row.conv_states[:, 0]))
    assert int(pool.positions[2]) == 7


def test_encdec_cross_written_once_and_select():
    """Cross KV computed once, reused thereafter (reference :1393-1398)."""
    L, B, H, C, D = 2, 1, 2, 8, 4
    self_c = init_cache(L, B, H, C, D, dtype=jnp.float32)
    cross_c = init_cache(L, B, H, C, D, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    enc_k = jnp.asarray(rng.normal(size=(B, H, C, D)), jnp.float32)
    enc_v = jnp.asarray(rng.normal(size=(B, H, C, D)), jnp.float32)

    cache = build_encoder_decoder_cache(self_c, cross_c)
    assert not bool(cache.cross_written.any())

    # first step: nothing written -> fresh projections selected
    k0, v0 = select_cross(cache, 0, enc_k, enc_v)
    np.testing.assert_allclose(np.asarray(k0), np.asarray(enc_k))

    # store them (layer 0), mark written
    cache = cache._replace(cross_cache=cache.cross_cache._replace(
        k=cache.cross_cache.k.at[0].set(enc_k),
        v=cache.cross_cache.v.at[0].set(enc_v),
        lengths=cache.cross_cache.lengths.at[0].set(C)))
    cache = mark_cross_written(cache, 0)
    assert bool(cache.cross_written[0]) and not bool(cache.cross_written[1])

    # later steps: DIFFERENT fresh values must be ignored for layer 0...
    other = jnp.asarray(rng.normal(size=(B, H, C, D)), jnp.float32)
    k1, _ = select_cross(cache, 0, other, other)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(enc_k))
    # ...but layer 1 (unwritten) still takes the fresh ones
    k2, _ = select_cross(cache, 1, other, other)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(other))

    # rebuild from a warm cross cache: is_updated derives from lengths > 0
    rebuilt = build_encoder_decoder_cache(self_c, cache.cross_cache)
    assert bool(rebuilt.cross_written[0]) and not bool(rebuilt.cross_written[1])


def test_encdec_batch_select_reorders_both_caches():
    """Beam reorder (reference reorder_cache :1359-1365): gather over the
    batch axis of every leaf of both member caches."""
    L, B, H, C, D = 2, 3, 2, 4, 4
    rng = np.random.default_rng(5)
    mk = lambda: KVCache(
        k=jnp.asarray(rng.normal(size=(L, B, H, C, D)), jnp.float32),
        v=jnp.asarray(rng.normal(size=(L, B, H, C, D)), jnp.float32),
        lengths=jnp.asarray(rng.integers(0, C, (L, B, H)), jnp.int32),
        positions=jnp.asarray(rng.integers(0, 9, (B,)), jnp.int32))
    cache = build_encoder_decoder_cache(mk(), mk())
    idx = jnp.asarray([2, 2, 0], jnp.int32)
    got = jax.jit(batch_select)(cache, idx)
    for side in ("self_cache", "cross_cache"):
        src, dst = getattr(cache, side), getattr(got, side)
        np.testing.assert_allclose(np.asarray(dst.k),
                                   np.asarray(src.k)[:, [2, 2, 0]])
        np.testing.assert_array_equal(np.asarray(dst.positions),
                                      np.asarray(src.positions)[[2, 2, 0]])
