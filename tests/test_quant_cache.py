"""Quantized KV cache tests: codec roundtrip, int4 packing, end-to-end
generation accuracy vs the fp cache."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.cache import quant_cache as QC
from kvcache_factory_tpu.config import (CompressionConfig, GenerationConfig,
                                        ModelConfig, QuantConfig)
from kvcache_factory_tpu.runtime import generate

from test_model_parity import tiny_hf_llama, FULL


def test_int4_pack_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(3, 5, 8)).astype(np.int32)
    packed = QC.pack_int4(jnp.asarray(codes))
    assert packed.shape == (3, 5, 4)
    out = QC.unpack_int4(packed)
    np.testing.assert_array_equal(np.asarray(out), codes)


@pytest.mark.parametrize("nbits,tol", [(8, 0.005), (4, 0.08)])
def test_quant_roundtrip_error(nbits, tol):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 16, 64)).astype(np.float32)
    cfg = QuantConfig(nbits=nbits, q_group_size=32)
    stored, scale, zero, oval, oidx = QC.encode(jnp.asarray(x), cfg)
    if nbits == 8:
        assert stored.dtype == jnp.int8 and stored.shape == x.shape
    else:
        assert stored.shape == x.shape[:-1] + (32,)
    out = QC.decode_values(stored, scale, zero, cfg, jnp.float32,
                           oval=oval, oidx=oidx)
    err = np.abs(np.asarray(out) - x).max()
    spread = x.max() - x.min()
    assert err < tol * spread, f"max quant err {err} vs spread {spread}"


@pytest.mark.parametrize("nbits", [8, 4])
def test_generate_quantized_matches_fp_closely(nbits):
    """INT8/INT4 cache generation should track the fp cache for a short
    horizon on a tiny model (config 4 analogue: quant accuracy vs FP16)."""
    model, cfg, params = tiny_hf_llama(21)
    S, new = 48, 8
    rng = np.random.default_rng(2)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    gen_cfg = GenerationConfig(max_new_tokens=new, eos_token_ids=())
    qcfg = QuantConfig(nbits=nbits, q_group_size=8)

    fp = generate(params, cfg, FULL, gen_cfg, jnp.asarray(toks, jnp.int32),
                  jnp.asarray([S], jnp.int32), cache_capacity=S + new)
    q = generate(params, cfg, FULL, gen_cfg, jnp.asarray(toks, jnp.int32),
                 jnp.asarray([S], jnp.int32), cache_capacity=S + new,
                 quant_cfg=qcfg)
    fp_toks = np.asarray(fp.tokens)[0]
    q_toks = np.asarray(q.tokens)[0]
    # Require agreement on a prefix: int8 should match (near-)everywhere on a
    # tiny random model; int4 at least the first tokens.
    min_match = new if nbits == 8 else 2
    assert np.array_equal(fp_toks[:min_match], q_toks[:min_match]), \
        (nbits, fp_toks.tolist(), q_toks.tolist())


def test_quantized_with_compression():
    """SnapKV compression + int8 cache compose."""
    model, cfg, params = tiny_hf_llama(22)
    S, new, cap = 96, 6, 32
    rng = np.random.default_rng(3)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=cap,
                             window_size=8, kernel_size=7, pooling="maxpool")
    gen_cfg = GenerationConfig(max_new_tokens=new, eos_token_ids=())
    qcfg = QuantConfig(nbits=8, q_group_size=8)
    res = generate(params, cfg, comp, gen_cfg, jnp.asarray(toks, jnp.int32),
                   jnp.asarray([S], jnp.int32), cache_capacity=cap + new,
                   quant_cfg=qcfg)
    assert int(res.num_tokens[0]) == new
    assert res.cache.qk.dtype == jnp.int8
    lens = np.asarray(res.cache.lengths)
    assert np.all(lens == cap + new - 1)


@pytest.mark.parametrize("nbits", [1, 2, 3, 4, 8])
def test_pack_roundtrip_all_bits(nbits):
    """Generic bit packing (reference HQQ accepts nbits 1-8, quantcache.py:26)."""
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 2 ** nbits, size=(3, 5, 16)).astype(np.int32)
    packed = QC.pack_codes(jnp.asarray(codes), nbits)
    assert packed.dtype == jnp.int8
    assert packed.shape == (3, 5, 16 // QC.values_per_byte(nbits))
    out = QC.unpack_codes(packed, nbits)
    np.testing.assert_array_equal(np.asarray(out), codes)


@pytest.mark.parametrize("nbits,tol", [(3, 0.15), (2, 0.35), (1, 0.8)])
def test_low_bit_roundtrip_error(nbits, tol):
    """Affine per-group error bound: <= group_spread / (2 * (2^n - 1)), so
    well under tol * global_spread for each bit-width."""
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 4, 16, 64)).astype(np.float32)
    cfg = QuantConfig(nbits=nbits, q_group_size=32)
    stored, scale, zero, oval, oidx = QC.encode(jnp.asarray(x), cfg)
    out = QC.decode_values(stored, scale, zero, cfg, jnp.float32,
                           oval=oval, oidx=oidx)
    err = np.abs(np.asarray(out) - x).max()
    spread = x.max() - x.min()
    assert err < tol * spread, (err, spread)


def test_low_bit_generation_runs():
    """2-bit cache generation completes with the right shapes (accuracy at
    2 bits is a research knob, not asserted on a random tiny model)."""
    model, cfg, params = tiny_hf_llama(23)
    S, new = 32, 4
    rng = np.random.default_rng(6)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    gen_cfg = GenerationConfig(max_new_tokens=new, eos_token_ids=())
    qcfg = QuantConfig(nbits=2, q_group_size=8)
    res = generate(params, cfg, FULL, gen_cfg, jnp.asarray(toks, jnp.int32),
                   jnp.asarray([S], jnp.int32), cache_capacity=S + new,
                   quant_cfg=qcfg)
    assert int(res.num_tokens[0]) == new
    assert res.cache.qk.shape[-1] == cfg.head_dim // 4  # 4 values per byte


def test_residual_ring_rows_mapping():
    from kvcache_factory_tpu.cache.quant_cache import residual_ring_rows
    rows = np.asarray(residual_ring_rows(jnp.asarray([10]), 4, 12))[0]
    # ring slot j holds the unique row r in [6, 10) with r % 4 == j
    np.testing.assert_array_equal(rows, [8, 9, 6, 7])
    rows = np.asarray(residual_ring_rows(jnp.asarray([5]), 8, 6))[0]
    np.testing.assert_array_equal(rows[:5], [0, 1, 2, 3, 4])


def test_residual_ring_covers_all_rows_matches_fp():
    """With residual_length >= every row, all reads come from the fp ring —
    generation must be bit-identical to the fp cache (the strongest check of
    the ring slot arithmetic; reference semantics quantcache.py:59-96)."""
    model, cfg, params = tiny_hf_llama(24)
    S, new = 40, 8
    rng = np.random.default_rng(7)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    gen_cfg = GenerationConfig(max_new_tokens=new, eos_token_ids=())
    qcfg = QuantConfig(nbits=2, q_group_size=8, residual_length=S + new)

    fp = generate(params, cfg, FULL, gen_cfg, jnp.asarray(toks, jnp.int32),
                  jnp.asarray([S], jnp.int32), cache_capacity=S + new)
    q = generate(params, cfg, FULL, gen_cfg, jnp.asarray(toks, jnp.int32),
                 jnp.asarray([S], jnp.int32), cache_capacity=S + new,
                 quant_cfg=qcfg)
    np.testing.assert_array_equal(np.asarray(fp.tokens), np.asarray(q.tokens))


def test_residual_ring_partial_improves_int4():
    """A partial fp ring must not hurt: int4+ring tracks fp at least as far
    as plain int4 on the same inputs."""
    model, cfg, params = tiny_hf_llama(25)
    S, new = 48, 8
    rng = np.random.default_rng(8)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    gen_cfg = GenerationConfig(max_new_tokens=new, eos_token_ids=())

    fp = generate(params, cfg, FULL, gen_cfg, jnp.asarray(toks, jnp.int32),
                  jnp.asarray([S], jnp.int32), cache_capacity=S + new)
    plain = generate(params, cfg, FULL, gen_cfg, jnp.asarray(toks, jnp.int32),
                     jnp.asarray([S], jnp.int32), cache_capacity=S + new,
                     quant_cfg=QuantConfig(nbits=4, q_group_size=8))
    ring = generate(params, cfg, FULL, gen_cfg, jnp.asarray(toks, jnp.int32),
                    jnp.asarray([S], jnp.int32), cache_capacity=S + new,
                    quant_cfg=QuantConfig(nbits=4, q_group_size=8,
                                          residual_length=16))

    def match_len(a, b):
        a, b = np.asarray(a)[0], np.asarray(b)[0]
        neq = np.nonzero(a != b)[0]
        return int(neq[0]) if neq.size else len(a)

    assert match_len(ring.tokens, fp.tokens) >= match_len(plain.tokens,
                                                          fp.tokens)
