"""Interpret-mode parity tests for the Pallas flash prefill kernel — dense,
a-shape sparse, and the MInference-style vertical-slash dynamic pattern.

Oracle: independent fp32 attention math (scoring.window_attention_scores /
plain softmax attention), never a sibling kernel (see CLAUDE.md conventions).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.ops.kernels.flash_prefill import (
    flash_prefill_attention, vertical_slash_block_mask)
from kvcache_factory_tpu.policies.scoring import (NEG_INF,
                                                  window_attention_scores)

D = 128


def ref_causal_attention(q, k, v, true_len):
    """fp32 causal attention with right-padding masked (independent oracle)."""
    H, S, _ = q.shape
    s = np.einsum("hqd,hkd->hqk", q, k) / np.sqrt(D)
    rows = np.arange(S)[:, None]
    cols = np.arange(S)[None, :]
    bad = (cols > rows) | (cols >= true_len)
    s = np.where(bad[None], -1e30, s)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("hqk,hkd->hqd", p, v)


@pytest.mark.parametrize("S,tl,G", [(256, 256, 1), (384, 300, 2)])
def test_flash_prefill_dense_matches_oracle(S, tl, G):
    Hq = 4
    Hkv = Hq // G
    rng = np.random.default_rng(0)
    q = rng.normal(size=(Hq, S, D)).astype(np.float32)
    k = rng.normal(size=(Hkv, S, D)).astype(np.float32)
    v = rng.normal(size=(Hkv, S, D)).astype(np.float32)
    W = 16

    out, scores = flash_prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(tl, jnp.int32), window=W, q_block=128, kv_block=128,
        interpret=True)

    kg = np.repeat(k, G, axis=0)
    vg = np.repeat(v, G, axis=0)
    exp = ref_causal_attention(q, kg, vg, tl)
    rows_valid = np.arange(S) < tl
    np.testing.assert_allclose(np.asarray(out)[:, rows_valid],
                               exp[:, rows_valid], rtol=2e-5, atol=2e-5)

    exp_scores = window_attention_scores(
        jnp.asarray(kg), jnp.asarray(q), jnp.asarray(tl, jnp.int32), W)
    got = np.asarray(scores)
    expn = np.asarray(exp_scores)
    sel = expn > NEG_INF / 2  # comparable region (kernel leaves window cols raw)
    np.testing.assert_allclose(got[sel], expn[sel], rtol=1e-4, atol=1e-4)


def test_vertical_slash_full_topk_matches_dense():
    """v_topk = S selects every column block -> identical to dense flash."""
    Hq, S, tl = 2, 256, 256
    rng = np.random.default_rng(1)
    q = rng.normal(size=(Hq, S, D)).astype(np.float32)
    k = rng.normal(size=(Hq, S, D)).astype(np.float32)
    v = rng.normal(size=(Hq, S, D)).astype(np.float32)

    out_vs, _ = flash_prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(tl, jnp.int32), window=16, q_block=128, kv_block=128,
        interpret=True, sparse_pattern=("vertical_slash", S, 8, 64))
    exp = ref_causal_attention(q, k, v, tl)
    np.testing.assert_allclose(np.asarray(out_vs), exp, rtol=2e-5, atol=2e-5)


def test_vertical_slash_mask_structure():
    """Small top-k: the mask is genuinely sparse yet keeps sinks + diagonal,
    and marks blocks holding estimated-heavy columns."""
    Hq, S, tl = 2, 512, 512
    QB = KB = 128
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(Hq, S, D)), jnp.float32)
    # plant a heavy key column at position 200 (block 1) for head 0
    k_np = rng.normal(size=(Hq, S, D)).astype(np.float32)
    k_np[0, 200] = 0.0
    k_np[0, 200, :8] = 50.0
    q_np = np.array(q)
    q_np[0, :, :8] = np.abs(q_np[0, :, :8])  # align with the heavy key
    mask = vertical_slash_block_mask(
        jnp.asarray(q_np), jnp.asarray(k_np), jnp.asarray(tl, jnp.int32),
        QB, KB, v_topk=4, s_topk=4, last_q=64)
    m = np.asarray(mask)  # [Hq, 4, 4]
    assert m.shape == (Hq, S // QB, S // KB)
    # sinks + diagonal always present
    assert np.all(m[:, :, 0] == 1)
    assert np.all(np.diagonal(m, axis1=1, axis2=2) == 1)
    # heavy column's block selected for head 0 at every q block
    assert np.all(m[0, :, 200 // KB] == 1)
    # causally-irrelevant upper triangle may be set; sparsity shows below it
    assert m.sum() < m.size  # not the trivial all-ones mask


def test_vertical_slash_approximates_dense_attention():
    """With moderate top-k the sparse output stays close to dense for rows
    whose mass the pattern captures (recent rows near the diagonal)."""
    Hq, S, tl = 2, 512, 512
    rng = np.random.default_rng(3)
    q = rng.normal(size=(Hq, S, D)).astype(np.float32)
    k = rng.normal(size=(Hq, S, D)).astype(np.float32)
    v = rng.normal(size=(Hq, S, D)).astype(np.float32)
    out_vs, _ = flash_prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(tl, jnp.int32), window=16, q_block=128, kv_block=128,
        interpret=True, sparse_pattern=("vertical_slash", 256, 64, 64))
    exp = ref_causal_attention(q, k, v, tl)
    # first q block is fully covered by sinks+diag -> exact
    np.testing.assert_allclose(np.asarray(out_vs)[:, :128], exp[:, :128],
                               rtol=2e-5, atol=2e-5)
    # overall relative error bounded (approximation, not garbage)
    rel = np.abs(np.asarray(out_vs) - exp).mean() / np.abs(exp).mean()
    assert rel < 0.25, rel


def test_ashape_first_blocks_exact():
    """a-shape keeps sinks + local band: early rows (covered blocks) exact."""
    Hq, S, tl = 2, 512, 512
    rng = np.random.default_rng(4)
    q = rng.normal(size=(Hq, S, D)).astype(np.float32)
    k = rng.normal(size=(Hq, S, D)).astype(np.float32)
    v = rng.normal(size=(Hq, S, D)).astype(np.float32)
    out_sp, _ = flash_prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(tl, jnp.int32), window=16, q_block=128, kv_block=128,
        interpret=True, sparse_pattern=("ashape", 1, 1, 2))
    exp = ref_causal_attention(q, k, v, tl)
    np.testing.assert_allclose(np.asarray(out_sp)[:, :256], exp[:, :256],
                               rtol=2e-5, atol=2e-5)


def test_minference_method_generates():
    """method='minference' = sparse prefill + full KV retained; on CPU the
    flash kernel is bypassed but the method must flow through config,
    policies, and generation (reference monkeypatch.py:51)."""
    from kvcache_factory_tpu.config import (CompressionConfig,
                                            GenerationConfig, ModelConfig)
    from kvcache_factory_tpu.models.weights import init_params
    from kvcache_factory_tpu.runtime import generate

    cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=16, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    comp = CompressionConfig(method="minference",
                             sparse_prefill=("vertical_slash", 64, 16, 16))
    full = CompressionConfig(method="fullkv")
    S, new = 48, 6
    rng = np.random.default_rng(7)
    toks = rng.integers(0, 128, size=(1, S))
    gen_cfg = GenerationConfig(max_new_tokens=new)
    res = generate(params, cfg, comp, gen_cfg, jnp.asarray(toks, jnp.int32),
                   jnp.asarray([S], jnp.int32), cache_capacity=S + new)
    ref = generate(params, cfg, full, gen_cfg, jnp.asarray(toks, jnp.int32),
                   jnp.asarray([S], jnp.int32), cache_capacity=S + new)
    # full KV retained -> on the XLA (CPU) path minference == fullkv exactly
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(ref.tokens))
    assert np.all(np.asarray(res.cache.lengths) == S + new - 1)


def test_flash_prefill_bf16_inputs_match_fp32_oracle():
    """The TPU path runs the MXU dots on bf16 inputs and rounds the fp32
    softmax probabilities to bf16 for the PV product (standard flash
    practice).  Exercise that exact dtype path in interpret mode against the
    fp32 oracle: errors must stay at the bf16-input noise floor."""
    Hq, Hkv, S, tl, W = 4, 2, 256, 220, 16
    rng = np.random.default_rng(5)
    q = rng.normal(size=(Hq, S, D)).astype(np.float32)
    k = rng.normal(size=(Hkv, S, D)).astype(np.float32)
    v = rng.normal(size=(Hkv, S, D)).astype(np.float32)
    qb = jnp.asarray(q, jnp.bfloat16)
    kb = jnp.asarray(k, jnp.bfloat16)
    vb = jnp.asarray(v, jnp.bfloat16)

    out, scores = flash_prefill_attention(
        qb, kb, vb, jnp.asarray(tl, jnp.int32), window=W,
        q_block=128, kv_block=128, interpret=True)
    assert out.dtype == jnp.bfloat16

    # oracle on the same bf16-rounded values, fp32 math throughout
    kg = np.repeat(np.asarray(kb, np.float32), Hq // Hkv, axis=0)
    vg = np.repeat(np.asarray(vb, np.float32), Hq // Hkv, axis=0)
    exp = ref_causal_attention(np.asarray(qb, np.float32), kg, vg, tl)
    rows_valid = np.arange(S) < tl
    err = np.abs(np.asarray(out, np.float32)[:, rows_valid]
                 - exp[:, rows_valid])
    # |out| <= max|v| ~ 4; one bf16 ulp at that scale is ~0.03
    assert err.max() < 0.05, err.max()

    # scores come out fp32 and are NOT rounded through bf16 (no PV product)
    exp_scores = np.asarray(window_attention_scores(
        jnp.asarray(kg), jnp.asarray(np.asarray(qb, np.float32)),
        jnp.asarray(tl, jnp.int32), W))
    got = np.asarray(scores)
    m = np.isfinite(exp_scores) & (np.arange(S)[None] < tl - W)
    rel = np.abs(exp_scores[m] - got[m]) / (np.abs(exp_scores[m]) + 1e-6)
    assert rel.max() < 5e-3, rel.max()


@pytest.mark.parametrize("S,tl", [(1152, 1100), (1024, 1024)])
def test_flash_prefill_deep_slot_wraparound(S, tl):
    """kv_hi up to 9 with 128-blocks: exercises the triple-buffer slot
    recycling (blk % 3 wraps three times) and the s_buf ping-pong across many
    iterations — the small parametrized cases stop at kv_hi == 3 where every
    slot is used at most once."""
    Hq, G = 2, 2
    rng = np.random.default_rng(7)
    q = rng.normal(size=(Hq, S, D)).astype(np.float32)
    k = rng.normal(size=(Hq // G, S, D)).astype(np.float32)
    v = rng.normal(size=(Hq // G, S, D)).astype(np.float32)

    out, _ = flash_prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(tl, jnp.int32), window=16, q_block=128, kv_block=128,
        interpret=True)

    kg = np.repeat(k, G, axis=0)
    vg = np.repeat(v, G, axis=0)
    exp = ref_causal_attention(q, kg, vg, tl)
    rows_valid = np.arange(S) < tl
    np.testing.assert_allclose(np.asarray(out)[:, rows_valid],
                               exp[:, rows_valid], rtol=2e-5, atol=2e-5)


def test_flash_prefill_adaptive_block_default():
    """q_block=None picks the adaptive size; parity must hold through it."""
    Hq, S, tl = 2, 320, 300  # S < 1024: adaptive clamps QB = KB = S
    rng = np.random.default_rng(8)
    q = rng.normal(size=(Hq, S, D)).astype(np.float32)
    k = rng.normal(size=(Hq, S, D)).astype(np.float32)
    v = rng.normal(size=(Hq, S, D)).astype(np.float32)

    out, _ = flash_prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(tl, jnp.int32), window=16, interpret=True)

    exp = ref_causal_attention(q, k, v, tl)
    rows_valid = np.arange(S) < tl
    np.testing.assert_allclose(np.asarray(out)[:, rows_valid],
                               exp[:, rows_valid], rtol=2e-5, atol=2e-5)
