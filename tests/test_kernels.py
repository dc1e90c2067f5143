"""Interpret-mode parity tests for the Pallas decode kernels.

Regression guard for the round-1 bug where both kernels computed
softmax(Q K^T) WITHOUT the 1/sqrt(D) scale: every ad-hoc "parity" check
compared against an equally unscaled reference, so the bug only surfaced
in the full decode graph.  These tests pin the kernels to the *scaled*
attention semantics of models/llama.py::grouped_attention
(reference fp32-softmax semantics, pyramidkv_utils.py:326).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.cache.quant_cache import (
    quantize_per_token)
from kvcache_factory_tpu.ops.kernels.decode_attn import decode_attention_append
from kvcache_factory_tpu.ops.kernels.decode_attn_quant import (
    quant_decode_attention_append_stacked)

D = 128  # kernels require lane-aligned head_dim


def ref_decode_attention(q, k_cache, v_cache, lens, k_new, v_new):
    """numpy fp32 scaled attention over the first lens[h] entries + the new
    token (the semantics decode_step's XLA path implements)."""
    H, G, _ = q.shape
    C = k_cache.shape[1]
    out = np.zeros((H, G, D), np.float32)
    for h in range(H):
        L = min(int(lens[h]), C - 1)  # kernel clamps full caches
        kk = np.concatenate([k_cache[h, :L], k_new[h:h + 1]], 0)
        vv = np.concatenate([v_cache[h, :L], v_new[h:h + 1]], 0)
        s = (q[h] @ kk.T) / np.sqrt(D)
        s = s - s.max(-1, keepdims=True)
        p = np.exp(s)
        p = p / p.sum(-1, keepdims=True)
        out[h] = p @ vv
    return out


@pytest.mark.parametrize("C,G,lens_kind", [
    (512, 1, "full"),       # aligned capacity
    (552, 1, "ragged"),     # pad path (C not a block multiple)
    (552, 4, "ragged"),     # grouped queries
    (512, 2, "tiny"),       # nearly-empty heads
])
def test_decode_kernel_matches_scaled_reference(C, G, lens_kind):
    H = 4
    rng = np.random.default_rng(42)
    q = rng.normal(size=(H, G, D)).astype(np.float32)
    k_cache = rng.normal(size=(H, C, D)).astype(np.float32)
    v_cache = rng.normal(size=(H, C, D)).astype(np.float32)
    k_new = rng.normal(size=(H, D)).astype(np.float32)
    v_new = rng.normal(size=(H, D)).astype(np.float32)
    lens = {
        "full": np.full((H,), C - 8, np.int32),
        "ragged": np.asarray([0, 1, C // 2, C - 1], np.int32),
        "tiny": np.asarray([0, 1, 2, 3], np.int32),
    }[lens_kind]

    out, k_out, v_out, lens_out = decode_attention_append(
        jnp.asarray(q), jnp.asarray(k_cache), jnp.asarray(v_cache),
        jnp.asarray(lens), jnp.asarray(k_new), jnp.asarray(v_new),
        interpret=True)

    exp = ref_decode_attention(q, k_cache, v_cache, lens, k_new, v_new)
    np.testing.assert_allclose(np.asarray(out, np.float32), exp,
                               atol=1e-4, rtol=1e-4)

    # cache update: entry lens[h] (clamped) holds the new token, everything
    # else is untouched, lengths advance (saturating at C).
    k_out = np.asarray(k_out)
    v_out = np.asarray(v_out)
    for h in range(H):
        L = min(int(lens[h]), C - 1)
        np.testing.assert_array_equal(k_out[h, L], k_new[h])
        np.testing.assert_array_equal(v_out[h, L], v_new[h])
        mask = np.ones(C, bool)
        mask[L] = False
        np.testing.assert_array_equal(k_out[h, mask], k_cache[h, mask])
        np.testing.assert_array_equal(v_out[h, mask], v_cache[h, mask])
    np.testing.assert_array_equal(np.asarray(lens_out),
                                  np.minimum(lens + 1, C))


def test_decode_kernel_is_scaled_not_unscaled():
    """The exact regression: an unscaled reference must NOT match."""
    H, G, C = 2, 1, 256
    rng = np.random.default_rng(0)
    q = rng.normal(size=(H, G, D)).astype(np.float32)
    k_cache = rng.normal(size=(H, C, D)).astype(np.float32)
    v_cache = rng.normal(size=(H, C, D)).astype(np.float32)
    k_new = rng.normal(size=(H, D)).astype(np.float32)
    v_new = rng.normal(size=(H, D)).astype(np.float32)
    lens = np.full((H,), C // 2, np.int32)
    out, *_ = decode_attention_append(
        jnp.asarray(q), jnp.asarray(k_cache), jnp.asarray(v_cache),
        jnp.asarray(lens), jnp.asarray(k_new), jnp.asarray(v_new),
        interpret=True)
    unscaled = ref_decode_attention(q * np.sqrt(D), k_cache, v_cache, lens,
                                    k_new, v_new)
    assert np.abs(np.asarray(out, np.float32) - unscaled).max() > 0.1


@pytest.mark.parametrize("G", [1, 2])
def test_quant_decode_kernel_matches_scaled_reference(G):
    H, C = 4, 256
    rng = np.random.default_rng(7)
    q = rng.normal(size=(H, G, D)).astype(np.float32)
    k_fp = rng.normal(size=(H, C, D)).astype(np.float32)
    v_fp = rng.normal(size=(H, C, D)).astype(np.float32)
    k_new = rng.normal(size=(H, D)).astype(np.float32)
    v_new = rng.normal(size=(H, D)).astype(np.float32)
    lens = np.asarray([0, 5, C // 2, C - 2], np.int32)

    kc, ks, kz = quantize_per_token(jnp.asarray(k_fp))
    vc, vs, vz = quantize_per_token(jnp.asarray(v_fp))
    scales = jnp.stack([p.astype(jnp.bfloat16) for p in (ks, kz, vs, vz)],
                       axis=-2)  # [H, 4, C] wide token-on-lanes layout

    out, kc_o, vc_o, sc_o, lens_o = quant_decode_attention_append_stacked(
        jnp.asarray(q, jnp.float32), kc[None], vc[None], scales[None],
        jnp.asarray(lens), jnp.zeros((1,), jnp.int32),
        jnp.asarray(k_new), jnp.asarray(v_new), interpret=True)
    out = np.asarray(out, np.float32)

    # reference: dequantize with the SAME (bf16-stored) scales the kernel
    # streams, then scaled fp32 attention; new token attends exactly.
    def deq(codes, sc, srow, zrow):
        s = np.asarray(sc, np.float32)[:, srow, :, None]  # [H, C, 1]
        z = np.asarray(sc, np.float32)[:, zrow, :, None]
        return (np.asarray(codes, np.float32) + 128.0) * s + z

    k_deq = deq(kc, scales, 0, 1)
    v_deq = deq(vc, scales, 2, 3)
    exp = ref_decode_attention(q, k_deq, v_deq, lens, k_new, v_new)
    np.testing.assert_allclose(out, exp, atol=5e-2, rtol=5e-2)

    # appended token roundtrips through int8 with per-token error bounds
    for h in range(H):
        L = int(lens[h])
        got = deq(kc_o[0], sc_o[0], 0, 1)[h, L]
        span = k_new[h].max() - k_new[h].min()
        # quantization step + bf16 rounding of the stored scale/zero
        np.testing.assert_allclose(got, k_new[h],
                                   atol=span / 255.0 + span * 2.0 ** -8)
    np.testing.assert_array_equal(np.asarray(lens_o),
                                  np.minimum(lens + 1, C))


@pytest.mark.parametrize("G,C", [(1, 512), (2, 512), (1, 256)])
def test_quant4_decode_kernel_matches_scaled_reference(G, C):
    """int4 kernel (token-block nibble packing) vs fp32 oracle dequantized
    with the same bf16-stored scales; appended nibble roundtrips."""
    from kvcache_factory_tpu.cache.quant_cache import (
        from_packed_prefill_tpu4, quantize_per_token4, unpack_tokens_int4)
    from kvcache_factory_tpu.ops.kernels.decode_attn_quant import (
        quant4_decode_attention_append_stacked)

    H = 4
    rng = np.random.default_rng(11)
    q = rng.normal(size=(H, G, D)).astype(np.float32)
    k_fp = rng.normal(size=(H, C, D)).astype(np.float32)
    v_fp = rng.normal(size=(H, C, D)).astype(np.float32)
    k_new = rng.normal(size=(H, D)).astype(np.float32)
    v_new = rng.normal(size=(H, D)).astype(np.float32)
    # exercise both nibble halves: lo (L < C/2) and hi (L >= C/2) appends
    lens = np.asarray([0, 5, C // 2 + 3, C - 2], np.int32)

    cache = from_packed_prefill_tpu4(
        jnp.asarray(k_fp)[None, None], jnp.asarray(v_fp)[None, None],
        jnp.asarray(lens)[None, None], jnp.zeros((1,), jnp.int32))
    kc, vc, scales = cache.k_codes[0, 0], cache.v_codes[0, 0], cache.scales[0, 0]

    out, kc_o, vc_o, sc_o, lens_o = quant4_decode_attention_append_stacked(
        jnp.asarray(q, jnp.float32), kc[None], vc[None], scales[None],
        jnp.asarray(lens), jnp.zeros((1,), jnp.int32),
        jnp.asarray(k_new), jnp.asarray(v_new), interpret=True)
    out = np.asarray(out, np.float32)

    def deq(codes_packed, sc, srow, zrow):
        codes = np.asarray(unpack_tokens_int4(codes_packed), np.float32)
        s = np.asarray(sc, np.float32)[:, srow, :, None]  # [H, C, 1]
        z = np.asarray(sc, np.float32)[:, zrow, :, None]
        return codes * s + z

    k_deq = deq(kc, scales, 0, 1)
    v_deq = deq(vc, scales, 2, 3)
    exp = ref_decode_attention(q, k_deq, v_deq, lens, k_new, v_new)
    np.testing.assert_allclose(out, exp, atol=5e-2, rtol=5e-2)

    # appended token roundtrips through int4 with per-token error bounds;
    # neighbors' nibbles in the shared byte rows are untouched
    kc_unp = np.asarray(unpack_tokens_int4(kc))
    kc_o_unp = np.asarray(unpack_tokens_int4(kc_o[0]))
    for h in range(H):
        L = int(lens[h])
        got = deq(kc_o[0], sc_o[0], 0, 1)[h, L]
        span = k_new[h].max() - k_new[h].min()
        np.testing.assert_allclose(got, k_new[h],
                                   atol=span / 15.0 + span * 2.0 ** -8)
        untouched = np.delete(np.arange(C), L)
        np.testing.assert_array_equal(kc_o_unp[h, untouched],
                                      kc_unp[h, untouched])
    np.testing.assert_array_equal(np.asarray(lens_o),
                                  np.minimum(lens + 1, C))


def test_quant4_pack_roundtrip():
    from kvcache_factory_tpu.cache.quant_cache import (
        pack_tokens_int4, quantize_per_token4, unpack_tokens_int4)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 256, D)).astype(np.float32))
    codes, scale, zero = quantize_per_token4(x)
    rt = unpack_tokens_int4(pack_tokens_int4(codes))
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(codes))
    deq = np.asarray(rt, np.float32) * np.asarray(scale)[..., None] \
        + np.asarray(zero)[..., None]
    span = (np.asarray(x).max(-1) - np.asarray(x).min(-1))[..., None]
    assert np.abs(deq - np.asarray(x)).max() <= (span / 15.0 * 0.5 + 1e-3).max()
