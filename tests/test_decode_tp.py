"""Multi-device Pallas decode via shard_map (VERDICT round-2 #3).

The single-chip decode kernel is head-local, so under a (dp, tp) mesh each
device can run it on its [B/dp, H/tp] slice.  Parity criteria:
 * vs the XLA decode path (the INDEPENDENT oracle per CLAUDE.md conventions)
   to fp32 tolerance;
 * vs the unsharded interpret-mode kernel bit-exactly (same math, different
   partitioning — tests only the shard_map plumbing).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.config import CompressionConfig, ModelConfig
from kvcache_factory_tpu.models import llama
from kvcache_factory_tpu.models.weights import init_params


@pytest.fixture(scope="module")
def setup():
    # head_dim 128: the decode kernel requires lane-aligned D
    cfg = ModelConfig(model_type="llama", vocab_size=256, hidden_size=512,
                      intermediate_size=768, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=128, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    S, B = 64, 2
    toks = jnp.asarray(np.random.default_rng(5).integers(0, 256, (B, S)),
                       jnp.int32)
    tl = jnp.asarray([S, S - 9], jnp.int32)
    pre = llama.prefill(params, cfg, comp, toks, tl, cache_capacity=48)
    return cfg, params, pre


def _decode_n(cfg, params, cache, n, **kw):
    tok = jnp.asarray([7, 11], jnp.int32)
    outs = []
    for _ in range(n):
        logits, cache = llama.decode_step(params, cfg, tok, cache, **kw)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        outs.append(np.asarray(logits))
    return np.stack(outs), cache


@pytest.mark.parametrize("dp,tp", [(2, 4), (1, 4), (2, 1)])
def test_sharded_pallas_decode_parity(setup, dp, tp):
    from kvcache_factory_tpu.parallel.mesh import make_mesh
    from kvcache_factory_tpu.config import ShardingConfig

    cfg, params, pre = setup
    mesh = make_mesh(ShardingConfig(dp=dp, tp=tp))

    ref, ref_cache = _decode_n(cfg, params, pre.cache, 3, attn_backend="xla")
    single, s_cache = _decode_n(cfg, params, pre.cache, 3,
                                attn_backend="pallas", pallas_interpret=True)
    sharded, sh_cache = _decode_n(cfg, params, pre.cache, 3,
                                  attn_backend="pallas", mesh=mesh,
                                  pallas_interpret=True)

    # independent oracle: XLA fp32 decode
    np.testing.assert_allclose(sharded, ref, rtol=2e-4, atol=2e-4)
    # vs the unsharded kernel path: surrounding XLA (projections, FFN,
    # lm_head) compiles differently under shard_map, so fp32-noise tolerance
    # — the kernel-level bit-exactness is asserted separately below
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sh_cache.k),
                               np.asarray(s_cache.k), rtol=1e-3, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sh_cache.lengths),
                                  np.asarray(s_cache.lengths))


@pytest.mark.parametrize("dp,tp", [(2, 4), (1, 4)])
def test_sharded_kernel_call_bit_exact(dp, tp):
    """The shard_map wrapper alone (no surrounding XLA graph) must reproduce
    the single-chip kernel BIT-exactly: partitioning is pure data movement."""
    from kvcache_factory_tpu.ops.kernels.decode_attn import (
        decode_attention_append_stacked,
        decode_attention_append_stacked_sharded)
    from kvcache_factory_tpu.parallel.mesh import make_mesh
    from kvcache_factory_tpu.config import ShardingConfig

    L, B, H, G, C, D = 2, 2, 4, 2, 48, 128
    rng = np.random.default_rng(31)
    q = jnp.asarray(rng.normal(size=(B, H, G, D)), jnp.float32)
    k_all = jnp.asarray(rng.normal(size=(L, B, H, C, D)), jnp.float32)
    v_all = jnp.asarray(rng.normal(size=(L, B, H, C, D)), jnp.float32)
    lens = jnp.asarray(rng.integers(5, 40, size=(B, H)), jnp.int32)
    kn = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32)
    li = jnp.int32(1)

    mesh = make_mesh(ShardingConfig(dp=dp, tp=tp))
    out_s, k_s, v_s, len_s = decode_attention_append_stacked_sharded(
        mesh, q, k_all, v_all, lens, li, kn, vn, interpret=True)

    BH = B * H
    out_u, k_u, v_u, len_u = decode_attention_append_stacked(
        q.reshape(BH, G, D), k_all.reshape(L, BH, C, D),
        v_all.reshape(L, BH, C, D), lens.reshape(BH), li,
        kn.reshape(BH, D), vn.reshape(BH, D), interpret=True)

    np.testing.assert_array_equal(np.asarray(out_s).reshape(BH, G, D),
                                  np.asarray(out_u))
    np.testing.assert_array_equal(np.asarray(k_s).reshape(L, BH, C, D),
                                  np.asarray(k_u))
    np.testing.assert_array_equal(np.asarray(v_s).reshape(L, BH, C, D),
                                  np.asarray(v_u))
    np.testing.assert_array_equal(np.asarray(len_s).reshape(BH),
                                  np.asarray(len_u))


def test_sharded_decode_falls_back_on_indivisible_tiling(setup):
    """cache_heads % tp != 0 (or B % dp != 0) must silently use the XLA path,
    not crash — same tokens either way."""
    from kvcache_factory_tpu.parallel.mesh import make_mesh
    from kvcache_factory_tpu.config import ShardingConfig

    cfg, params, pre = setup
    mesh = make_mesh(ShardingConfig(dp=1, tp=8))  # 4 heads % 8 != 0
    ref, _ = _decode_n(cfg, params, pre.cache, 2, attn_backend="xla")
    got, _ = _decode_n(cfg, params, pre.cache, 2, attn_backend="pallas",
                       mesh=mesh, pallas_interpret=True)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
