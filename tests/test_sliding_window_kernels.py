"""Sliding-window masking in the Pallas kernels (VERDICT round-3 #1).

Mistral is half the reference's model matrix (mistral_model.py:273-288
sliding-window cache slicing) and its 31.5k-token protocol is the
reference's longest-context regime (run_longbench.py:75-81) — before this
round both Pallas kernels excluded ``sliding_window`` configs and Mistral
silently ran all-XLA.  Parity criteria per repo convention: the kernels are
compared against INDEPENDENT oracles (numpy fp32 spec / the XLA decode and
prefill paths), never a sibling kernel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.config import CompressionConfig, ModelConfig
from kvcache_factory_tpu.models import llama
from kvcache_factory_tpu.models.weights import init_params
from kvcache_factory_tpu.ops.kernels.decode_attn import decode_attention_append

D = 128


def ref_decode_attention_windowed(q, k_cache, v_cache, lens, lower,
                                  k_new, v_new):
    """numpy fp32 scaled attention over entries [lower[h], lens[h]) plus the
    new token — the decode_mask semantics for sliding-window identity rows."""
    H, G, _ = q.shape
    C = k_cache.shape[1]
    out = np.zeros((H, G, D), np.float32)
    for h in range(H):
        L = min(int(lens[h]), C - 1)
        lo = int(lower[h])
        kk = np.concatenate([k_cache[h, lo:L], k_new[h:h + 1]], 0)
        vv = np.concatenate([v_cache[h, lo:L], v_new[h:h + 1]], 0)
        s = (q[h] @ kk.T) / np.sqrt(D)
        s = s - s.max(-1, keepdims=True)
        p = np.exp(s)
        p = p / p.sum(-1, keepdims=True)
        out[h] = p @ vv
    return out


@pytest.mark.parametrize("C,G,window", [
    (512, 1, 64),    # window well inside the cache
    (512, 4, 480),   # grouped queries, window nearly the whole cache
    (552, 2, 16),    # pad path + tiny window
])
def test_decode_kernel_window_lower_matches_numpy(C, G, window):
    H = 4
    rng = np.random.default_rng(7)
    q = rng.normal(size=(H, G, D)).astype(np.float32)
    k_cache = rng.normal(size=(H, C, D)).astype(np.float32)
    v_cache = rng.normal(size=(H, C, D)).astype(np.float32)
    k_new = rng.normal(size=(H, D)).astype(np.float32)
    v_new = rng.normal(size=(H, D)).astype(np.float32)
    lens = np.asarray([C - 8, C // 2, window + 3, 5], np.int32)
    lower = np.maximum(lens + 1 - window, 0).astype(np.int32)

    out, *_ = decode_attention_append(
        jnp.asarray(q), jnp.asarray(k_cache), jnp.asarray(v_cache),
        jnp.asarray(lens), jnp.asarray(k_new), jnp.asarray(v_new),
        interpret=True, lower=jnp.asarray(lower))

    exp = ref_decode_attention_windowed(q, k_cache, v_cache, lens, lower,
                                        k_new, v_new)
    np.testing.assert_allclose(np.asarray(out, np.float32), exp,
                               rtol=2e-5, atol=2e-5)


def test_decode_kernel_zero_lower_is_dense():
    """lower=None and lower=zeros must both reproduce the dense kernel."""
    H, G, C = 2, 2, 512
    rng = np.random.default_rng(11)
    q = rng.normal(size=(H, G, D)).astype(np.float32)
    k_cache = rng.normal(size=(H, C, D)).astype(np.float32)
    v_cache = rng.normal(size=(H, C, D)).astype(np.float32)
    k_new = rng.normal(size=(H, D)).astype(np.float32)
    v_new = rng.normal(size=(H, D)).astype(np.float32)
    lens = np.asarray([C // 2, 37], np.int32)
    args = (jnp.asarray(q), jnp.asarray(k_cache), jnp.asarray(v_cache),
            jnp.asarray(lens), jnp.asarray(k_new), jnp.asarray(v_new))
    dense, *_ = decode_attention_append(*args, interpret=True)
    zeros, *_ = decode_attention_append(*args, interpret=True,
                                        lower=jnp.zeros((H,), jnp.int32))
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(zeros))


@pytest.fixture(scope="module")
def mistral_setup():
    """Tiny Mistral geometry: sliding_window smaller than the prompt so the
    window mask is live during decode."""
    cfg = ModelConfig(model_type="mistral", vocab_size=256, hidden_size=512,
                      intermediate_size=768, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=128, max_position_embeddings=512,
                      dtype="float32", sliding_window=24)
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    S, B = 64, 2
    toks = jnp.asarray(np.random.default_rng(5).integers(0, 256, (B, S)),
                       jnp.int32)
    tl = jnp.asarray([S, S - 9], jnp.int32)
    return cfg, params, toks, tl


def _decode_n(cfg, params, cache, n, **kw):
    tok = jnp.asarray([7, 11], jnp.int32)
    outs = []
    for _ in range(n):
        logits, cache = llama.decode_step(params, cfg, tok, cache, **kw)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        outs.append(np.asarray(logits))
    return np.stack(outs), cache


def test_mistral_decode_pallas_matches_xla(mistral_setup):
    """fullkv (identity rows: cache index == absolute position) — the window
    mask is LIVE: decode must ignore keys older than sliding_window."""
    cfg, params, toks, tl = mistral_setup
    comp = CompressionConfig(method="fullkv", max_capacity_prompt=512)
    pre = llama.prefill(params, cfg, comp, toks, tl, cache_capacity=80,
                        attn_backend="xla")
    ref, ref_cache = _decode_n(cfg, params, pre.cache, 4, attn_backend="xla")
    got, got_cache = _decode_n(cfg, params, pre.cache, 4,
                               attn_backend="pallas", pallas_interpret=True)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(ref_cache.lengths),
                                  np.asarray(got_cache.lengths))
    # the mask actually bit: a dense (no-window) XLA decode must differ
    import dataclasses
    cfg_dense = dataclasses.replace(cfg, sliding_window=None)
    dense, _ = _decode_n(cfg_dense, params, pre.cache, 4, attn_backend="xla")
    assert np.abs(dense - ref).max() > 1e-3


def test_mistral_decode_pallas_matches_xla_compressed(mistral_setup):
    """snapkv rows are NOT identity rows — compressed caches keep their
    importance-selected entries un-window-masked on both paths."""
    cfg, params, toks, tl = mistral_setup
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    pre = llama.prefill(params, cfg, comp, toks, tl, cache_capacity=48,
                        attn_backend="xla")
    ref, _ = _decode_n(cfg, params, pre.cache, 3, attn_backend="xla")
    got, _ = _decode_n(cfg, params, pre.cache, 3,
                       attn_backend="pallas", pallas_interpret=True)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_mistral_decode_sharded_pallas_matches_xla(mistral_setup):
    """The window lower bound rides the shard_map wrapper unchanged."""
    from kvcache_factory_tpu.config import ShardingConfig
    from kvcache_factory_tpu.parallel.mesh import make_mesh

    cfg, params, toks, tl = mistral_setup
    comp = CompressionConfig(method="fullkv", max_capacity_prompt=512)
    pre = llama.prefill(params, cfg, comp, toks, tl, cache_capacity=80,
                        attn_backend="xla")
    mesh = make_mesh(ShardingConfig(dp=2, tp=2))
    ref, _ = _decode_n(cfg, params, pre.cache, 3, attn_backend="xla")
    got, _ = _decode_n(cfg, params, pre.cache, 3, attn_backend="pallas",
                       mesh=mesh, pallas_interpret=True)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Flash prefill sliding window
# ---------------------------------------------------------------------------

def ref_windowed_attention(q, k, v, true_len, window):
    """fp32 sliding-window causal attention (independent oracle)."""
    H, S, _ = q.shape
    s = np.einsum("hqd,hkd->hqk", q, k) / np.sqrt(D)
    rows = np.arange(S)[:, None]
    cols = np.arange(S)[None, :]
    bad = (cols > rows) | (cols >= true_len) | (cols <= rows - window)
    s = np.where(bad[None], -1e30, s)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("hqk,hkd->hqd", p, v)


@pytest.mark.parametrize("S,tl,G,window", [
    (256, 256, 1, 64),    # window spans several kv blocks at KB=64
    (384, 300, 2, 100),   # padded tail + GQA + non-block-aligned window
    (256, 256, 1, 17),    # window smaller than one kv block
    (256, 200, 2, 1000),  # window larger than the sequence == dense
])
def test_flash_prefill_sliding_window_matches_oracle(S, tl, G, window):
    from kvcache_factory_tpu.ops.kernels.flash_prefill import (
        flash_prefill_attention)
    Hq = 4
    Hkv = Hq // G
    rng = np.random.default_rng(13)
    q = rng.normal(size=(Hq, S, D)).astype(np.float32)
    k = rng.normal(size=(Hkv, S, D)).astype(np.float32)
    v = rng.normal(size=(Hkv, S, D)).astype(np.float32)

    out, _ = flash_prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(tl, jnp.int32), window=0, q_block=64, kv_block=64,
        interpret=True, sliding_window=window)

    kg = np.repeat(k, G, axis=0)
    vg = np.repeat(v, G, axis=0)
    exp = ref_windowed_attention(q, kg, vg, tl, window)
    rows_valid = np.arange(S) < tl
    np.testing.assert_allclose(np.asarray(out)[:, rows_valid],
                               exp[:, rows_valid], rtol=2e-5, atol=2e-5)


def test_prefill_mistral_flash_vs_xla_full_model():
    """Whole-model prefill parity: the Pallas path (forced via
    attn_backend='pallas' + interpret) against the blocked XLA path, Mistral
    geometry with a live sliding window and snapkv compression (scores
    computed by the XLA matmul on both paths — exact policy parity)."""
    cfg = ModelConfig(model_type="mistral", vocab_size=256, hidden_size=512,
                      intermediate_size=768, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=128, max_position_embeddings=512,
                      dtype="float32", sliding_window=24)
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    S, B = 64, 2
    toks = jnp.asarray(np.random.default_rng(8).integers(0, 256, (B, S)),
                       jnp.int32)
    tl = jnp.asarray([S, S - 11], jnp.int32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    import kvcache_factory_tpu.models.llama as L
    import unittest.mock as mock
    ref = llama.prefill(params, cfg, comp, toks, tl, cache_capacity=48,
                        attn_backend="xla")
    # interpret-mode kernels on CPU: patch the backend gate
    from kvcache_factory_tpu.ops.kernels import flash_prefill as fp
    orig = fp.flash_prefill_attention_batched
    import functools
    with mock.patch.object(jax, "default_backend", return_value="tpu"), \
         mock.patch.object(fp, "flash_prefill_attention_batched",
                           functools.partial(orig, interpret=True)):
        got = llama.prefill(params, cfg, comp, toks, tl, cache_capacity=48,
                            attn_backend="pallas")
    np.testing.assert_allclose(np.asarray(got.logits_last),
                               np.asarray(ref.logits_last),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got.cache.lengths),
                                  np.asarray(ref.cache.lengths))
    np.testing.assert_allclose(np.asarray(got.cache.k),
                               np.asarray(ref.cache.k), rtol=2e-4, atol=2e-4)


def test_prefill_fullkv_flash_vs_xla():
    """VERDICT round-3 #9: plain fullkv now runs the flash kernel (scores
    unused, window=0) — parity vs the blocked XLA path."""
    cfg = ModelConfig(model_type="llama", vocab_size=256, hidden_size=512,
                      intermediate_size=768, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=128, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    S, B = 64, 2
    toks = jnp.asarray(np.random.default_rng(9).integers(0, 256, (B, S)),
                       jnp.int32)
    tl = jnp.asarray([S, S - 5], jnp.int32)
    comp = CompressionConfig(method="fullkv", max_capacity_prompt=512)
    import unittest.mock as mock
    from kvcache_factory_tpu.ops.kernels import flash_prefill as fp
    import functools
    ref = llama.prefill(params, cfg, comp, toks, tl, cache_capacity=80,
                        attn_backend="xla")
    orig = fp.flash_prefill_attention_batched
    with mock.patch.object(jax, "default_backend", return_value="tpu"), \
         mock.patch.object(fp, "flash_prefill_attention_batched",
                           functools.partial(orig, interpret=True)):
        got = llama.prefill(params, cfg, comp, toks, tl, cache_capacity=80,
                            attn_backend="pallas")
    np.testing.assert_allclose(np.asarray(got.logits_last),
                               np.asarray(ref.logits_last),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Quant decode kernels: sliding-window lower bound (round-4 review finding —
# the quant paths previously applied no window masking, unlike every other
# decode path)
# ---------------------------------------------------------------------------

def test_quant8_kernel_window_lower_matches_oracle():
    from kvcache_factory_tpu.ops.kernels.decode_attn_quant import (
        quant_decode_attention_append_stacked)
    H, G, C = 4, 2, 256
    rng = np.random.default_rng(61)
    q = rng.normal(size=(H, G, D)).astype(np.float32)
    codes_k = rng.integers(-128, 128, size=(1, H, C, D)).astype(np.int8)
    codes_v = rng.integers(-128, 128, size=(1, H, C, D)).astype(np.int8)
    scales = rng.uniform(0.01, 0.05, size=(1, H, 4, C)).astype(np.float32)
    k_new = rng.normal(size=(H, D)).astype(np.float32)
    v_new = rng.normal(size=(H, D)).astype(np.float32)
    lens = np.asarray([C - 8, 100, 40, 7], np.int32)
    window = 24
    lower = np.maximum(lens + 1 - window, 0).astype(np.int32)

    out, *_ = quant_decode_attention_append_stacked(
        jnp.asarray(q), jnp.asarray(codes_k)[...], jnp.asarray(codes_v),
        jnp.asarray(scales, jnp.bfloat16), jnp.asarray(lens),
        jnp.zeros((1,), jnp.int32), jnp.asarray(k_new), jnp.asarray(v_new),
        interpret=True, lower=jnp.asarray(lower))

    # oracle: dequantize (bf16 scales, matching the kernel's storage), then
    # windowed fp attention over [lower, lens) + the new token
    sc = np.asarray(jnp.asarray(scales, jnp.bfloat16), np.float32)
    exp = np.zeros((H, G, D), np.float32)
    for h in range(H):
        L = min(int(lens[h]), C - 1)
        lo = int(lower[h])
        kdh = (codes_k[0, h].astype(np.float32) + 128.0) \
            * sc[0, h, 0][:, None] + sc[0, h, 1][:, None]
        vdh = (codes_v[0, h].astype(np.float32) + 128.0) \
            * sc[0, h, 2][:, None] + sc[0, h, 3][:, None]
        kk = np.concatenate([kdh[lo:L], k_new[h:h + 1]], 0)
        vv = np.concatenate([vdh[lo:L], v_new[h:h + 1]], 0)
        s = (q[h] @ kk.T) / np.sqrt(D)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        exp[h] = p @ vv
    np.testing.assert_allclose(np.asarray(out, np.float32), exp,
                               rtol=2e-2, atol=2e-2)
    # the window actually bites: dense (lower=0) must differ
    dense, *_ = quant_decode_attention_append_stacked(
        jnp.asarray(q), jnp.asarray(codes_k), jnp.asarray(codes_v),
        jnp.asarray(scales, jnp.bfloat16), jnp.asarray(lens),
        jnp.zeros((1,), jnp.int32), jnp.asarray(k_new), jnp.asarray(v_new),
        interpret=True)
    assert np.abs(np.asarray(dense) - np.asarray(out)).max() > 1e-3


def test_quant4_kernel_window_lower_matches_dense_equiv():
    """int4: lower covering nothing == dense; lower excluding the low-nibble
    block entirely must change the result (both nibble planes masked)."""
    from kvcache_factory_tpu.ops.kernels.decode_attn_quant import (
        quant4_decode_attention_append_stacked)
    H, G, C = 2, 2, 256
    C2 = C // 2
    rng = np.random.default_rng(67)
    q = jnp.asarray(rng.normal(size=(H, G, D)), jnp.float32)
    kc = jnp.asarray(rng.integers(-128, 128, size=(1, H, C2, D)), jnp.int8)
    vc = jnp.asarray(rng.integers(-128, 128, size=(1, H, C2, D)), jnp.int8)
    sc = jnp.asarray(rng.uniform(0.05, 0.2, size=(1, H, 4, C)), jnp.bfloat16)
    kn = jnp.asarray(rng.normal(size=(H, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(H, D)), jnp.float32)
    lens = jnp.asarray([C - 8, 200], jnp.int32)
    args = (q, kc, vc, sc, lens, jnp.zeros((1,), jnp.int32), kn, vn)

    dense, *_ = quant4_decode_attention_append_stacked(
        *args, interpret=True)
    zeros, *_ = quant4_decode_attention_append_stacked(
        *args, interpret=True, lower=jnp.zeros((H,), jnp.int32))
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(zeros))

    # lower past C2 masks the whole low-nibble token block AND part of the
    # high block — both planes' masks must respond
    lower = jnp.asarray([C2 + 16, 150], jnp.int32)
    win, *_ = quant4_decode_attention_append_stacked(
        *args, interpret=True, lower=lower)
    assert np.abs(np.asarray(win) - np.asarray(dense)).max() > 1e-3

    # INDEPENDENT numpy dequant oracle (repo convention: never only a
    # sibling/dense comparison — a wrong window offset on one nibble plane
    # would pass both checks above)
    kc_np, vc_np = np.asarray(kc), np.asarray(vc)
    sc_np = np.asarray(sc, np.float32)
    q_np, kn_np, vn_np = np.asarray(q), np.asarray(kn), np.asarray(vn)
    lens_np, lower_np = np.asarray(lens), np.asarray(lower)
    for h in range(H):
        L = min(int(lens_np[h]), C - 1)
        lo = int(lower_np[h])
        raw = kc_np[0, h].astype(np.int32) + 128           # [C2, D] bytes
        k_tok = np.concatenate([raw & 0xF, raw >> 4], 0)   # [C, D] nibbles
        rawv = vc_np[0, h].astype(np.int32) + 128
        v_tok = np.concatenate([rawv & 0xF, rawv >> 4], 0)
        kd = k_tok * sc_np[0, h, 0][:, None] + sc_np[0, h, 1][:, None]
        vd = v_tok * sc_np[0, h, 2][:, None] + sc_np[0, h, 3][:, None]
        idx = [j for j in range(L) if j >= lo]
        kk = np.concatenate([kd[idx], kn_np[h:h + 1]], 0)
        vv = np.concatenate([vd[idx], vn_np[h:h + 1]], 0)
        s = (q_np[h] @ kk.T) / np.sqrt(D)
        pbs = np.exp(s - s.max(-1, keepdims=True))
        pbs /= pbs.sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(win, np.float32)[h], pbs @ vv,
                                   rtol=3e-2, atol=3e-2)


def test_mistral_quant_decode_window_bites(mistral_setup):
    """decode_step with a QuantKVCacheTPU cache under a sliding-window
    config: identity rows must be window-masked (previously silently
    unmasked).  Teacher-forced; windowed != dense, and sharded == unsharded
    bit-wise."""
    import dataclasses
    from kvcache_factory_tpu.cache.quant_cache import from_packed_prefill_tpu
    from kvcache_factory_tpu.config import QuantConfig, ShardingConfig
    from kvcache_factory_tpu.parallel.mesh import make_mesh

    cfg, params, toks, tl = mistral_setup  # sliding_window=24
    L, B, H, C, Dh = 2, 2, 2, 128, 128
    rng = np.random.default_rng(71)
    k = jnp.asarray(rng.normal(size=(L, B, H, C, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(L, B, H, C, Dh)), jnp.float32)
    # identity rows: lens == pos (cache index == absolute position)
    lens0 = jnp.full((L, B, H), 64, jnp.int32)
    pos0 = jnp.full((B,), 64, jnp.int32)
    qcache = from_packed_prefill_tpu(k, v, lens0, pos0)
    qcfg = QuantConfig(nbits=8)
    tok = jnp.asarray([3, 5], jnp.int32)

    lg_w, _ = llama.decode_step(params, cfg, tok, qcache, quant=qcfg,
                                pallas_interpret=True)
    cfg_dense = dataclasses.replace(cfg, sliding_window=None)
    lg_d, _ = llama.decode_step(params, cfg_dense, tok, qcache, quant=qcfg,
                                pallas_interpret=True)
    assert np.abs(np.asarray(lg_w) - np.asarray(lg_d)).max() > 1e-3

    mesh = make_mesh(ShardingConfig(dp=2, tp=1))
    lg_s, _ = llama.decode_step(params, cfg, tok, qcache, quant=qcfg,
                                mesh=mesh, pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(lg_s), np.asarray(lg_w),
                               rtol=1e-5, atol=1e-5)
