"""Quant-scheme accuracy A/B vs the reference's HQQ+outlier design
(VERDICT round-1 #10).

The torch oracle (tests/torch_spec.py: hqq_outlier_roundtrip) reproduces
quantcache.py:29-58: strip |x| > 6 outliers into an exact sparse table,
HQQ-quantize the rest (min/max affine + proximal zero refinement).  This
repo's shipped scheme is per-group-range + a DENSE top-1-per-group outlier
slot (cache/quant_cache.py: extract/scatter_group_outliers).  The full table
lives in BASELINE.md; tools/quant_accuracy_ab.py regenerates it.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from tools.quant_accuracy_ab import (GROUP, heavy_tailed, oracle_roundtrip,
                                     ours_outlier_roundtrip, ours_roundtrip)

from kvcache_factory_tpu.cache import quant_cache as QC


@pytest.fixture(scope="module")
def x():
    return heavy_tailed(np.random.default_rng(7), (64, 512))


def rel_mse(a, x):
    return float(np.mean((a - x) ** 2) / np.mean(x * x))


def test_outlier_roundtrip_identity():
    """extract -> scatter restores the outlier entries exactly and leaves the
    rest untouched."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 128)).astype(np.float32)
    stripped, oval, oidx = QC.extract_group_outliers(jnp.asarray(x), 32)
    restored = QC.scatter_group_outliers(stripped, oval, oidx, 32)
    np.testing.assert_allclose(np.asarray(restored), x, rtol=0, atol=1e-7)
    # the stripped tensor has zeros exactly at the per-group max-|x| slots
    sg = np.asarray(stripped).reshape(4, 4, 32)
    xg = x.reshape(4, 4, 32)
    assert (np.take_along_axis(sg, np.abs(xg).argmax(-1)[..., None], -1)
            == 0).all()


@pytest.mark.parametrize("nbits", [1, 2, 3, 4, 8])
def test_outlier_slot_beats_plain_range(x, nbits):
    """The dense outlier slot must not regress the plain per-group-range
    design on heavy-tailed data at any bit-width (it halves-to-quarters the
    error at 2-4 bits)."""
    plain = rel_mse(ours_roundtrip(x, nbits, GROUP), x)
    slotted = rel_mse(ours_outlier_roundtrip(x, nbits, GROUP), x)
    assert slotted <= plain * 1.02, (nbits, slotted, plain)


@pytest.mark.parametrize("nbits,factor", [(1, 1.3), (2, 1.3), (3, 1.3),
                                          (4, 1.3), (8, 3.0)])
def test_within_noise_of_hqq_oracle(x, nbits, factor):
    """Shipped scheme tracks the reference's HQQ+outlier quantizer on
    heavy-tailed inputs (within 1.3x rel-MSE at 1-4 bits; 8-bit errors are
    ~5e-5 of signal either way, where HQQ's proximal refinement shows)."""
    ours = rel_mse(ours_outlier_roundtrip(x, nbits, GROUP), x)
    oracle = rel_mse(oracle_roundtrip(x, nbits, GROUP), x)
    assert ours <= oracle * factor, (nbits, ours, oracle)


def test_quantized_decode_path_uses_outlier_planes():
    """End-to-end: a generate() with the int4 cache must carry the outlier
    planes through decode appends (shape + improvement sanity)."""
    import jax
    from kvcache_factory_tpu.cache.quant_cache import from_packed_prefill
    from kvcache_factory_tpu.config import QuantConfig
    rng = np.random.default_rng(3)
    L, B, H, C, D = 2, 1, 2, 32, 32
    k = rng.standard_normal((L, B, H, C, D)).astype(np.float32)
    k[0, 0, 0, 3, 5] = 40.0  # planted outlier
    v = rng.standard_normal((L, B, H, C, D)).astype(np.float32)
    lengths = np.full((L, B, H), C, np.int32)
    cfg = QuantConfig(nbits=4, q_group_size=16)
    cache = from_packed_prefill(jnp.asarray(k), jnp.asarray(v),
                                jnp.asarray(lengths), jnp.zeros((B,), jnp.int32),
                                cfg)
    assert cache.k_oval is not None and cache.k_oval.shape == (L, B, H, C, 2)
    got = QC.decode_values(cache.qk, cache.k_scale, cache.k_zero, cfg,
                           jnp.float32, oval=cache.k_oval, oidx=cache.k_oidx)
    # the planted outlier survives the roundtrip exactly (bf16 storage)
    assert abs(float(got[0, 0, 0, 3, 5]) - 40.0) < 0.25
    # and the rest of its group is NOT degraded to outlier-range steps
    grp = np.asarray(got[0, 0, 0, 3, :16])
    ref = k[0, 0, 0, 3, :16].copy()
    ref[5] = 0
    grp2 = grp.copy()
    grp2[5] = 0
    assert np.abs(grp2 - ref).max() < 0.5  # 4-bit step of a ~N(0,1) group
