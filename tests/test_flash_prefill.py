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


def test_sparse_head_budgets_rank_mask_parity():
    """Per-head (v, s) budgets must restrict the kept columns/diagonals
    exactly like shrinking the static top-k sizes: with a uniform budget
    (v, s) under static tops (V, S'), the block mask equals the mask built
    with static tops (v, s) and no budgets (top_k is sorted descending, so
    rank < v selects exactly the top-v columns).  VERDICT round-2 #4."""
    Hq, S, tl = 2, 512, 512
    QB = KB = 128
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(Hq, S, D)), jnp.float32)
    tlj = jnp.asarray(tl, jnp.int32)

    for v_b, s_b in [(4, 2), (16, 8), (1, 1)]:
        budgets = jnp.full((Hq, 2), 0, jnp.int32)
        budgets = budgets.at[:, 0].set(v_b).at[:, 1].set(s_b)
        got = vertical_slash_block_mask(q, k, tlj, QB, KB,
                                        v_topk=64, s_topk=32, last_q=64,
                                        head_budgets=budgets)
        exp = vertical_slash_block_mask(q, k, tlj, QB, KB,
                                        v_topk=v_b, s_topk=s_b, last_q=64)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))


def test_sparse_head_budgets_per_head_mixed():
    """Each head honors ITS budget row: a mixed-budget call must reproduce,
    head by head, the uniform-budget call at that head's budget."""
    Hq, S, tl = 3, 512, 512
    QB = KB = 128
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.normal(size=(Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(Hq, S, D)), jnp.float32)
    tlj = jnp.asarray(tl, jnp.int32)
    per_head = [(2, 1), (16, 8), (64, 32)]

    mixed = vertical_slash_block_mask(
        q, k, tlj, QB, KB, v_topk=64, s_topk=32, last_q=64,
        head_budgets=jnp.asarray(per_head, jnp.int32))
    for h, (v_b, s_b) in enumerate(per_head):
        uni = vertical_slash_block_mask(
            q, k, tlj, QB, KB, v_topk=64, s_topk=32, last_q=64,
            head_budgets=jnp.tile(jnp.asarray([[v_b, s_b]], jnp.int32), (Hq, 1)))
        np.testing.assert_array_equal(np.asarray(mixed)[h],
                                      np.asarray(uni)[h])
    # the tightest-budget head is sparser than the loosest one
    m = np.asarray(mixed)
    assert m[0].sum() <= m[2].sum()


def test_sparse_head_budgets_through_prefill_interpret():
    """sparse_budgets threads end-to-end through llama.prefill into the
    kernel: a tiny-budget config must produce a different (sparser-pattern)
    output than the full-budget one, while the full-budget one matches the
    budget-free call exactly."""
    from kvcache_factory_tpu.config import CompressionConfig, ModelConfig
    from kvcache_factory_tpu.models import llama
    from kvcache_factory_tpu.models.weights import init_params
    from unittest import mock

    cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=256,
                      intermediate_size=512, num_hidden_layers=2,
                      num_attention_heads=2, num_key_value_heads=2,
                      head_dim=128, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    comp = CompressionConfig(method="minference",
                             sparse_prefill=("vertical_slash", 64, 16, 16))
    S = 256
    toks = jnp.asarray(np.random.default_rng(13).integers(0, 128, (1, S)),
                       jnp.int32)
    tl = jnp.asarray([S], jnp.int32)

    import kvcache_factory_tpu.ops.kernels.flash_prefill as fp
    orig = fp.flash_prefill_attention_batched

    def interp(*a, **kw):
        kw["interpret"] = True
        # small blocks so S=256 spans 4x4 blocks and a (1,1) budget actually
        # drops blocks (with one block everything is the always-kept diagonal)
        kw["q_block"] = kw["kv_block"] = 64
        return orig(*a, **kw)

    L, Hq = cfg.num_hidden_layers, cfg.num_attention_heads
    full = np.full((L, Hq, 2), (64, 16), np.int32)
    tiny = np.full((L, Hq, 2), (1, 1), np.int32)
    with mock.patch.object(fp, "flash_prefill_attention_batched", interp), \
            mock.patch.object(jax, "default_backend", lambda: "tpu"):
        base = llama.prefill(params, cfg, comp, toks, tl, cache_capacity=S)
        got_full = llama.prefill(params, cfg, comp, toks, tl,
                                 cache_capacity=S,
                                 sparse_budgets=jnp.asarray(full))
        got_tiny = llama.prefill(params, cfg, comp, toks, tl,
                                 cache_capacity=S,
                                 sparse_budgets=jnp.asarray(tiny))
    np.testing.assert_allclose(np.asarray(got_full.logits_last),
                               np.asarray(base.logits_last),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(got_tiny.logits_last),
                           np.asarray(base.logits_last), atol=1e-4)


def test_minference_config_loader(tmp_path):
    """MInference best-pattern schema -> [L, Hq, 2] with clipping and
    fallbacks (policies/minference.py; reference minference.py:9-12)."""
    import json as _json
    from kvcache_factory_tpu.policies.minference import load_sparse_budgets

    cfg = [
        {"0": ["vertical_and_slash", 1000, 6096, 1],
         "1": ["vertical_and_slash", 30, 7, 1],
         "2": ["stream_llm", 4, 64, 1]},        # non-vs pattern -> full
        {"1": ["vertical_and_slash", 5, 5, 1]},  # head 0 missing -> full
    ]
    p = tmp_path / "pat.json"
    p.write_text(_json.dumps(cfg))
    out = load_sparse_budgets(str(p), num_layers=3, num_heads=3,
                              v_cap=64, s_cap=32)
    assert out.shape == (3, 3, 2)
    np.testing.assert_array_equal(out[0, 0], [64, 32])   # clipped to caps
    np.testing.assert_array_equal(out[0, 1], [30, 7])
    np.testing.assert_array_equal(out[0, 2], [64, 32])   # stream_llm -> full
    np.testing.assert_array_equal(out[1, 0], [64, 32])   # missing head
    np.testing.assert_array_equal(out[1, 1], [5, 5])
    np.testing.assert_array_equal(out[2], [[64, 32]] * 3)  # missing layer

    with pytest.raises(ValueError):
        bad = tmp_path / "bad.json"
        bad.write_text('{"not": "a list"}')
        load_sparse_budgets(str(bad), 1, 1, 8, 8)


def test_flash_prefill_batched_matches_per_example_calls():
    """VERDICT round-3 #4: one pallas_call for B>1 (grid (B, Hq, n_qb),
    true_len as a [B] scalar-prefetch vector) must reproduce the per-example
    calls exactly — including ragged per-example lengths and per-example
    window-score masking."""
    from kvcache_factory_tpu.ops.kernels.flash_prefill import (
        flash_prefill_attention_batched)
    B, Hq, G, S, W = 3, 4, 2, 256, 16
    Hkv = Hq // G
    rng = np.random.default_rng(23)
    q = rng.normal(size=(B, Hq, S, D)).astype(np.float32)
    k = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
    v = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
    tls = np.asarray([S, 200, 97], np.int32)

    out_b, sc_b = flash_prefill_attention_batched(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(tls),
        window=W, q_block=64, kv_block=64, interpret=True)

    for b in range(B):
        out_1, sc_1 = flash_prefill_attention(
            jnp.asarray(q[b]), jnp.asarray(k[b]), jnp.asarray(v[b]),
            jnp.asarray(tls[b]), window=W, q_block=64, kv_block=64,
            interpret=True)
        tl = int(tls[b])
        np.testing.assert_array_equal(np.asarray(out_b)[b, :, :tl],
                                      np.asarray(out_1)[:, :tl])
        np.testing.assert_array_equal(np.asarray(sc_b)[b, :, :tl - W],
                                      np.asarray(sc_1)[:, :tl - W])
        # and vs the independent oracle
        kg = np.repeat(k[b], G, axis=0)
        vg = np.repeat(v[b], G, axis=0)
        exp = ref_causal_attention(q[b], kg, vg, tl)
        np.testing.assert_allclose(np.asarray(out_b)[b, :, :tl],
                                   exp[:, :tl], rtol=2e-5, atol=2e-5)


def test_flash_prefill_batched_vertical_slash():
    """Batched vertical-slash: the per-example block masks ride the scalar
    prefetch as [B, Hq, n_qb, n_kvb]."""
    from kvcache_factory_tpu.ops.kernels.flash_prefill import (
        flash_prefill_attention_batched)
    B, Hq, S = 2, 2, 256
    rng = np.random.default_rng(29)
    q = rng.normal(size=(B, Hq, S, D)).astype(np.float32)
    k = rng.normal(size=(B, Hq, S, D)).astype(np.float32)
    v = rng.normal(size=(B, Hq, S, D)).astype(np.float32)
    tls = np.asarray([S, 180], np.int32)
    pat = ("vertical_slash", 64, 16, 16)

    out_b, _ = flash_prefill_attention_batched(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(tls),
        window=0, q_block=64, kv_block=64, interpret=True,
        sparse_pattern=pat)
    for b in range(B):
        out_1, _ = flash_prefill_attention(
            jnp.asarray(q[b]), jnp.asarray(k[b]), jnp.asarray(v[b]),
            jnp.asarray(tls[b]), window=0, q_block=64, kv_block=64,
            interpret=True, sparse_pattern=pat)
        tl = int(tls[b])
        np.testing.assert_array_equal(np.asarray(out_b)[b, :, :tl],
                                      np.asarray(out_1)[:, :tl])


def test_flash_prefill_sharded_matches_unsharded():
    """The (dp, tp) shard_map prefill wrapper is pure data movement: outputs
    and window scores must be BIT-identical to the unsharded batched call."""
    from kvcache_factory_tpu.ops.kernels.flash_prefill import (
        flash_prefill_attention_batched,
        flash_prefill_attention_batched_sharded)
    from kvcache_factory_tpu.parallel.mesh import make_mesh
    from kvcache_factory_tpu.config import ShardingConfig

    B, Hq, G, S, W = 2, 4, 2, 256, 16
    Hkv = Hq // G
    rng = np.random.default_rng(37)
    q = jnp.asarray(rng.normal(size=(B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    tls = jnp.asarray([S, 180], jnp.int32)

    mesh = make_mesh(ShardingConfig(dp=2, tp=2))
    out_s, sc_s = flash_prefill_attention_batched_sharded(
        mesh, q, k, v, tls, W, q_block=64, kv_block=64, interpret=True)
    out_u, sc_u = flash_prefill_attention_batched(
        q, k, v, tls, W, q_block=64, kv_block=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_u))
    np.testing.assert_array_equal(np.asarray(sc_s), np.asarray(sc_u))


def test_prefill_under_mesh_uses_sharded_kernel_and_matches_xla():
    """llama.prefill with a (dp, tp) mesh routes through the shard_map'd
    flash kernel (round 4) and matches the GSPMD blocked-XLA path."""
    from unittest import mock
    import functools
    from kvcache_factory_tpu.config import (CompressionConfig, ModelConfig,
                                            ShardingConfig)
    from kvcache_factory_tpu.models import llama
    from kvcache_factory_tpu.models.weights import init_params
    from kvcache_factory_tpu.parallel.mesh import make_mesh, shard_params
    import kvcache_factory_tpu.ops.kernels.flash_prefill as fp

    cfg = ModelConfig(model_type="llama", vocab_size=256, hidden_size=512,
                      intermediate_size=768, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=128, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(9), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    B, S = 2, 64
    toks = jnp.asarray(np.random.default_rng(11).integers(0, 256, (B, S)),
                       jnp.int32)
    tl = jnp.asarray([S, S - 7], jnp.int32)

    mesh = make_mesh(ShardingConfig(dp=2, tp=2))
    sp = shard_params(params, mesh, cfg)
    ref = llama.prefill(params, cfg, comp, toks, tl, cache_capacity=48,
                        attn_backend="xla")

    calls = []
    orig = fp.flash_prefill_attention_batched

    def interp(*a, **kw):
        calls.append(1)
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(jax, "default_backend", return_value="tpu"), \
            mock.patch.object(fp, "flash_prefill_attention_batched", interp):
        with mesh:
            got = llama.prefill(sp, cfg, comp, toks, tl, cache_capacity=48,
                                attn_backend="auto", mesh=mesh)
    assert calls, "sharded flash path was not taken"
    np.testing.assert_allclose(np.asarray(got.logits_last),
                               np.asarray(ref.logits_last),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got.cache.lengths),
                                  np.asarray(ref.cache.lengths))
    np.testing.assert_allclose(np.asarray(got.cache.k),
                               np.asarray(ref.cache.k), rtol=2e-4, atol=2e-4)


def test_flash_prefill_sharded_with_head_budgets_bit_exact():
    """MInference per-head budgets shard over tp with their heads: the
    sharded vertical-slash call must be bit-identical to the unsharded one
    (each shard estimates its own heads' masks from its own q/k slice)."""
    from kvcache_factory_tpu.ops.kernels.flash_prefill import (
        flash_prefill_attention_batched,
        flash_prefill_attention_batched_sharded)
    from kvcache_factory_tpu.parallel.mesh import make_mesh
    from kvcache_factory_tpu.config import ShardingConfig

    B, Hq, S = 2, 4, 256
    rng = np.random.default_rng(41)
    q = jnp.asarray(rng.normal(size=(B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hq, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hq, S, D)), jnp.float32)
    tls = jnp.asarray([S, 190], jnp.int32)
    pat = ("vertical_slash", 64, 16, 16)
    budgets = jnp.asarray([[4, 2], [64, 16], [1, 1], [8, 8]], jnp.int32)

    mesh = make_mesh(ShardingConfig(dp=2, tp=2))
    out_s, _ = flash_prefill_attention_batched_sharded(
        mesh, q, k, v, tls, 0, sparse_head_budgets=budgets,
        sparse_pattern=pat, q_block=64, kv_block=64, interpret=True)
    out_u, _ = flash_prefill_attention_batched(
        q, k, v, tls, 0, sparse_head_budgets=budgets,
        sparse_pattern=pat, q_block=64, kv_block=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_u))


def test_flash_chunk_mode_matches_full_call_slices():
    """row_offset chunk mode: running the kernel chunk-by-chunk over the
    same K/V buffer reproduces the one-call full-sequence output exactly
    (per-chunk rows == the corresponding slice)."""
    from kvcache_factory_tpu.ops.kernels.flash_prefill import (
        flash_prefill_attention_batched)
    B, Hq, G, S, Sc = 2, 4, 2, 256, 64
    Hkv = Hq // G
    rng = np.random.default_rng(47)
    q = jnp.asarray(rng.normal(size=(B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    tls = jnp.asarray([S, 190], jnp.int32)

    full, _ = flash_prefill_attention_batched(
        q, k, v, tls, 0, q_block=64, kv_block=64, interpret=True)
    for c0 in range(0, S, Sc):
        got, _ = flash_prefill_attention_batched(
            q[:, :, c0:c0 + Sc], k, v, tls, 0, q_block=64, kv_block=64,
            interpret=True, row_offset=jnp.int32(c0))
        # rows past true_len are garbage in both; compare valid region
        for b, t in enumerate(np.asarray(tls)):
            lo, hi = c0, min(c0 + Sc, int(t))
            if hi <= lo:
                continue
            np.testing.assert_array_equal(
                np.asarray(got)[b, :, :hi - lo],
                np.asarray(full)[b, :, lo:hi])


def test_flash_chunk_mode_per_row_offsets():
    """row_offset as a [B] vector: each batch row runs at its OWN prefill
    depth in one call (concurrent chunked admissions), matching per-example
    scalar-offset calls exactly."""
    from kvcache_factory_tpu.ops.kernels.flash_prefill import (
        flash_prefill_attention_batched)
    B, Hq, G, S, Sc = 3, 4, 2, 256, 64
    Hkv = Hq // G
    rng = np.random.default_rng(59)
    q = jnp.asarray(rng.normal(size=(B, Hq, Sc, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    tls = jnp.asarray([S, 190, 100], jnp.int32)
    offs = jnp.asarray([128, 64, 0], jnp.int32)

    got, _ = flash_prefill_attention_batched(
        q, k, v, tls, 0, q_block=64, kv_block=64, interpret=True,
        row_offset=offs)
    for b in range(B):
        ref, _ = flash_prefill_attention_batched(
            q[b:b + 1], k[b:b + 1], v[b:b + 1], tls[b:b + 1], 0,
            q_block=64, kv_block=64, interpret=True,
            row_offset=offs[b])
        t, c0 = int(tls[b]), int(offs[b])
        hi = max(min(c0 + Sc, t) - c0, 0)
        np.testing.assert_array_equal(np.asarray(got)[b, :, :hi],
                                      np.asarray(ref)[0, :, :hi])


def test_flash_chunk_mode_sharded_per_row_offsets():
    """The shard_map wrapper forwards per-row chunk offsets sharded over dp
    with their rows: bit-identical to the unsharded chunk-mode call."""
    from kvcache_factory_tpu.ops.kernels.flash_prefill import (
        flash_prefill_attention_batched,
        flash_prefill_attention_batched_sharded)
    from kvcache_factory_tpu.parallel.mesh import make_mesh
    from kvcache_factory_tpu.config import ShardingConfig

    B, Hq, G, S, Sc = 2, 4, 2, 256, 64
    Hkv = Hq // G
    rng = np.random.default_rng(61)
    q = jnp.asarray(rng.normal(size=(B, Hq, Sc, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    tls = jnp.asarray([S, 150], jnp.int32)
    offs = jnp.asarray([64, 128], jnp.int32)

    mesh = make_mesh(ShardingConfig(dp=2, tp=2))
    out_s, _ = flash_prefill_attention_batched_sharded(
        mesh, q, k, v, tls, 0, row_offset=offs, q_block=64, kv_block=64,
        interpret=True)
    out_u, _ = flash_prefill_attention_batched(
        q, k, v, tls, 0, row_offset=offs, q_block=64, kv_block=64,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_u))


def test_flash_chunk_mode_sliding_window():
    from kvcache_factory_tpu.ops.kernels.flash_prefill import (
        flash_prefill_attention_batched)
    B, Hq, S, Sc, W = 1, 2, 256, 64, 48
    rng = np.random.default_rng(53)
    q = jnp.asarray(rng.normal(size=(B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hq, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hq, S, D)), jnp.float32)
    tls = jnp.asarray([S], jnp.int32)
    full, _ = flash_prefill_attention_batched(
        q, k, v, tls, 0, q_block=64, kv_block=64, interpret=True,
        sliding_window=W)
    got, _ = flash_prefill_attention_batched(
        q[:, :, 64:128], k, v, tls, 0, q_block=64, kv_block=64,
        interpret=True, sliding_window=W, row_offset=jnp.int32(64))
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(full)[:, :, 64:128])
