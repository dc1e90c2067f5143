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


# ---------------------------------------------------------------------------
# Quantized decode under (dp, tp) — VERDICT round-3 #2
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dp,tp", [(2, 2), (1, 4)])
def test_sharded_quant_kernel_call_bit_exact(dp, tp):
    """int8 shard_map wrapper vs the single-chip quant kernel: partitioning
    is pure data movement, results must be BIT-exact."""
    from kvcache_factory_tpu.ops.kernels.decode_attn_quant import (
        quant_decode_attention_append_stacked,
        quant_decode_attention_append_stacked_sharded)
    from kvcache_factory_tpu.parallel.mesh import make_mesh
    from kvcache_factory_tpu.config import ShardingConfig

    L, B, H, G, C, D = 2, 2, 4, 2, 256, 128
    rng = np.random.default_rng(41)
    q = jnp.asarray(rng.normal(size=(B, H, G, D)), jnp.float32)
    kc = jnp.asarray(rng.integers(-128, 128, size=(L, B, H, C, D)), jnp.int8)
    vc = jnp.asarray(rng.integers(-128, 128, size=(L, B, H, C, D)), jnp.int8)
    sc = jnp.asarray(rng.uniform(0.01, 0.1, size=(L, B, H, 4, C)),
                     jnp.bfloat16)
    lens = jnp.asarray(rng.integers(5, C - 8, size=(B, H)), jnp.int32)
    kn = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32)
    li = jnp.int32(1)

    mesh = make_mesh(ShardingConfig(dp=dp, tp=tp))
    out_s, kc_s, vc_s, sc_s, len_s = \
        quant_decode_attention_append_stacked_sharded(
            mesh, q, kc, vc, sc, lens, li, kn, vn, interpret=True)

    BH = B * H
    out_u, kc_u, vc_u, sc_u, len_u = quant_decode_attention_append_stacked(
        q.reshape(BH, G, D), kc.reshape(L, BH, C, D),
        vc.reshape(L, BH, C, D), sc.reshape(L, BH, 4, C),
        lens.reshape(BH), li, kn.reshape(BH, D), vn.reshape(BH, D),
        interpret=True)

    np.testing.assert_array_equal(np.asarray(out_s).reshape(BH, G, D),
                                  np.asarray(out_u))
    np.testing.assert_array_equal(np.asarray(kc_s).reshape(L, BH, C, D),
                                  np.asarray(kc_u))
    np.testing.assert_array_equal(
        np.asarray(sc_s, np.float32).reshape(L, BH, 4, C),
        np.asarray(sc_u, np.float32))
    np.testing.assert_array_equal(np.asarray(len_s).reshape(BH),
                                  np.asarray(len_u))


@pytest.mark.parametrize("dp,tp", [(2, 2), (1, 4)])
def test_sharded_quant4_kernel_call_bit_exact(dp, tp):
    """int4 variant: nibble planes tile over (dp, tp) bit-exactly."""
    from kvcache_factory_tpu.ops.kernels.decode_attn_quant import (
        quant4_decode_attention_append_stacked,
        quant4_decode_attention_append_stacked_sharded)
    from kvcache_factory_tpu.parallel.mesh import make_mesh
    from kvcache_factory_tpu.config import ShardingConfig

    L, B, H, G, C, D = 2, 2, 4, 2, 256, 128
    C2 = C // 2
    rng = np.random.default_rng(43)
    q = jnp.asarray(rng.normal(size=(B, H, G, D)), jnp.float32)
    kc = jnp.asarray(rng.integers(-128, 128, size=(L, B, H, C2, D)), jnp.int8)
    vc = jnp.asarray(rng.integers(-128, 128, size=(L, B, H, C2, D)), jnp.int8)
    sc = jnp.asarray(rng.uniform(0.05, 0.5, size=(L, B, H, 4, C)),
                     jnp.bfloat16)
    lens = jnp.asarray(rng.integers(5, C - 8, size=(B, H)), jnp.int32)
    kn = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32)
    li = jnp.int32(0)

    mesh = make_mesh(ShardingConfig(dp=dp, tp=tp))
    out_s, kc_s, vc_s, sc_s, len_s = \
        quant4_decode_attention_append_stacked_sharded(
            mesh, q, kc, vc, sc, lens, li, kn, vn, interpret=True)

    BH = B * H
    out_u, kc_u, vc_u, sc_u, len_u = quant4_decode_attention_append_stacked(
        q.reshape(BH, G, D), kc.reshape(L, BH, C2, D),
        vc.reshape(L, BH, C2, D), sc.reshape(L, BH, 4, C),
        lens.reshape(BH), li, kn.reshape(BH, D), vn.reshape(BH, D),
        interpret=True)

    np.testing.assert_array_equal(np.asarray(out_s).reshape(BH, G, D),
                                  np.asarray(out_u))
    np.testing.assert_array_equal(np.asarray(kc_s).reshape(L, BH, C2, D),
                                  np.asarray(kc_u))
    np.testing.assert_array_equal(np.asarray(len_s).reshape(BH),
                                  np.asarray(len_u))


@pytest.mark.parametrize("nbits", [8, 4])
def test_quant_decode_step_sharded_matches_unsharded(nbits):
    """decode_step with a QuantKVCacheTPU(4) cache + a (dp, tp) mesh: the
    sharded kernel path must match the unsharded kernel path (same kernel,
    shard_map plumbing) AND stay close to an fp32 XLA decode on the
    dequantized cache (independent oracle, quantization-error tolerance)."""
    from kvcache_factory_tpu.cache.quant_cache import (
        from_packed_prefill_tpu, from_packed_prefill_tpu4)
    from kvcache_factory_tpu.parallel.mesh import make_mesh
    from kvcache_factory_tpu.config import ShardingConfig
    from kvcache_factory_tpu.cache.kv_cache import KVCache

    cfg = ModelConfig(model_type="llama", vocab_size=256, hidden_size=512,
                      intermediate_size=768, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=128, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    L, B, H, C, D = 2, 2, 2, 256, 128
    rng = np.random.default_rng(17)
    k = jnp.asarray(rng.normal(size=(L, B, H, C, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(L, B, H, C, D)), jnp.float32)
    lens0 = jnp.asarray(rng.integers(30, 60, size=(L, B, H)), jnp.int32)
    pos0 = jnp.asarray([64, 55], jnp.int32)
    make = from_packed_prefill_tpu if nbits == 8 else from_packed_prefill_tpu4
    qcache = make(k, v, lens0, pos0)
    from kvcache_factory_tpu.config import QuantConfig
    qcfg = QuantConfig(nbits=nbits)

    tok = jnp.asarray([7, 11], jnp.int32)
    mesh = make_mesh(ShardingConfig(dp=2, tp=2))

    # Teacher-forced token stream: greedy feedback would amplify fp noise
    # from the differently-compiled surrounding XLA (shard_map vs plain)
    # into token flips at near-ties; the kernel itself is bit-exact vs its
    # unsharded twin (asserted above at kernel level).
    forced = [tok, jnp.asarray([3, 5], jnp.int32)]

    def run(mesh_arg):
        cache, outs = qcache, []
        for t in forced:
            logits, cache = llama.decode_step(
                params, cfg, t, cache, quant=qcfg, mesh=mesh_arg,
                pallas_interpret=True)
            outs.append(np.asarray(logits))
        return np.stack(outs), cache

    got, got_cache = run(mesh)
    want, want_cache = run(None)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_cache.lengths),
                                  np.asarray(want_cache.lengths))

    # independent fp oracle: XLA decode over the dequantized dense cache
    fp_cache = KVCache(k=k, v=v, lengths=lens0, positions=pos0)
    cache, fp_outs = fp_cache, []
    for t in forced:
        logits, cache = llama.decode_step(params, cfg, t, cache,
                                          attn_backend="xla")
        fp_outs.append(np.asarray(logits))
    # Coarse sanity bound only ("attends to the right data, not garbage"):
    # per-token int8/int4 scales on N(0,1) random caches drift logits
    # ~0.07 / ~1.0 over two layers here — quantization error, not kernel
    # error.  Tight correctness lives above (bit-exact vs the unsharded
    # kernel) and in test_kernels.py (kernel vs dequant oracle).
    tol = 0.2 if nbits == 8 else 1.5
    assert np.abs(np.stack(fp_outs) - got).max() < tol


def test_sharded_decode_under_composed_sp_mesh(setup):
    """The decode kernel wrappers tile (dp, tp) and leave an sp axis
    unmentioned (replicated) — the composed (dp, sp, tp) prefill mesh can be
    the decode mesh too (engine wires it; decode is not sequence-sharded)."""
    from jax.sharding import Mesh
    from jax.experimental import mesh_utils

    cfg, params, pre = setup
    arr = mesh_utils.create_device_mesh((1, 2, 2),
                                        devices=jax.devices()[:4])
    mesh = Mesh(arr, ("dp", "sp", "tp"))
    ref, _ = _decode_n(cfg, params, pre.cache, 3, attn_backend="xla")
    got, _ = _decode_n(cfg, params, pre.cache, 3, attn_backend="pallas",
                       mesh=mesh, pallas_interpret=True)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
