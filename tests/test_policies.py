"""Unit tests: JAX compression policies vs the torch spec oracle.

Strategy (SURVEY.md §4): each policy's scoring is compared numerically against
an independent torch implementation of the reference math on small unpadded
tensors; selection is compared as an index *set* (packed order is
score-descending in both, and attention is permutation-invariant); padded
(bucketed) runs must match unpadded runs exactly.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.config import CompressionConfig
from kvcache_factory_tpu.policies import (LayerContext, compress_layer,
                                          masked_pool, window_attention_scores,
                                          full_attention_scores)
from kvcache_factory_tpu.policies.adakv import adakv_budgets
from kvcache_factory_tpu.policies.scoring import NEG_INF

import torch_spec


H, S, D = 4, 96, 32
W = 8


def make_qkv(seed=0, h=H, s=S, d=D):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(h, s, d)).astype(np.float32)
    k = rng.normal(size=(h, s, d)).astype(np.float32)
    v = rng.normal(size=(h, s, d)).astype(np.float32)
    return q, k, v


def pad_seq(x, S_pad):
    return np.pad(x, ((0, 0), (0, S_pad - x.shape[1]), (0, 0)))


# ---------------------------------------------------------------------------
# Scoring parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_window_scores_match_torch(reduce):
    q, k, _ = make_qkv()
    ours = window_attention_scores(jnp.asarray(k), jnp.asarray(q),
                                   jnp.int32(S), W, reduce=reduce)
    ref = torch_spec.window_scores(torch.tensor(q), torch.tensor(k), W, reduce)
    np.testing.assert_allclose(np.asarray(ours)[:, :S - W], ref.numpy(),
                               rtol=2e-5, atol=2e-6)
    assert np.all(np.asarray(ours)[:, S - W:] == NEG_INF)


def test_window_scores_padding_invariant():
    q, k, _ = make_qkv()
    S_pad = 128
    exact = window_attention_scores(jnp.asarray(k), jnp.asarray(q), jnp.int32(S), W)
    padded = window_attention_scores(jnp.asarray(pad_seq(k, S_pad)),
                                     jnp.asarray(pad_seq(q, S_pad)),
                                     jnp.int32(S), W)
    np.testing.assert_allclose(np.asarray(exact)[:, :S - W],
                               np.asarray(padded)[:, :S - W], rtol=1e-6)
    assert np.all(np.asarray(padded)[:, S - W:] == NEG_INF)


def test_h2o_scores_match_torch():
    q, k, _ = make_qkv()
    ours = full_attention_scores(jnp.asarray(k), jnp.asarray(q), jnp.int32(S), W,
                                 row_block=32)
    ref = torch_spec.h2o_scores(torch.tensor(q), torch.tensor(k), W)
    np.testing.assert_allclose(np.asarray(ours)[:, :S - W], ref.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_h2o_scores_padding_invariant():
    q, k, _ = make_qkv()
    S_pad = 160
    exact = full_attention_scores(jnp.asarray(k), jnp.asarray(q), jnp.int32(S), W)
    padded = full_attention_scores(jnp.asarray(pad_seq(k, S_pad)),
                                   jnp.asarray(pad_seq(q, S_pad)), jnp.int32(S), W)
    np.testing.assert_allclose(np.asarray(exact)[:, :S - W],
                               np.asarray(padded)[:, :S - W], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("pooling", ["avgpool", "maxpool"])
@pytest.mark.parametrize("kernel", [5, 7])
def test_pooling_matches_torch(pooling, kernel):
    rng = np.random.default_rng(1)
    n = S - W
    scores = rng.normal(size=(H, n)).astype(np.float32)
    # Embed in a longer padded array; valid region [0, n).
    S_pad = 128
    padded = np.full((H, S_pad), -1e30, np.float32)
    padded[:, :n] = scores
    ours = masked_pool(jnp.asarray(padded), jnp.int32(n), kernel, pooling)
    ref = torch_spec.pool(torch.tensor(scores), kernel, pooling)
    np.testing.assert_allclose(np.asarray(ours)[:, :n], ref.numpy(), rtol=1e-5, atol=1e-6)
    assert np.all(np.asarray(ours)[:, n:] == NEG_INF)


# ---------------------------------------------------------------------------
# Selection parity (index sets)
# ---------------------------------------------------------------------------

def run_policy(cfg, q, k, v, true_len, layer_idx=0, head_capacity=None, rng=None,
               num_layers=8, capacity=None):
    capacity = capacity or cfg.layer_capacity(num_layers, q.shape[1])
    ctx = LayerContext(jnp.int32(layer_idx),
                       None if head_capacity is None else jnp.asarray(head_capacity),
                       rng)
    return compress_layer(cfg, num_layers, capacity,
                          jnp.asarray(k), jnp.asarray(v), jnp.asarray(q),
                          jnp.int32(true_len), ctx)


def selected_positions(packed, k_full):
    """Recover source positions of packed keys by exact row matching."""
    out = []
    kp = np.asarray(packed.k)
    lens = np.asarray(packed.lengths)
    for h in range(kp.shape[0]):
        rows = []
        for i in range(lens[h]):
            match = np.where(np.all(np.isclose(k_full[h], kp[h, i], atol=0), axis=-1))[0]
            assert len(match) >= 1, "packed key not found in source"
            rows.append(int(match[0]))
        out.append(rows)
    return out


def test_snapkv_selection_matches_torch():
    q, k, v = make_qkv(2)
    cap = 32
    cfg = CompressionConfig(method="snapkv", max_capacity_prompt=cap,
                            window_size=W, kernel_size=7, pooling="maxpool")
    packed = run_policy(cfg, q, k, v, S)
    assert packed.k.shape == (H, cap, D)
    assert np.all(np.asarray(packed.lengths) == cap)

    # Expected selection: torch.topk over OUR pooled scores (scoring parity vs
    # torch is asserted separately above; this isolates selection/packing from
    # fp tie noise at the top-k cutoff, where maxpool produces runs of equal
    # scores and a 1-ulp difference can swap the boundary pick).
    scores = masked_pool(
        window_attention_scores(jnp.asarray(k), jnp.asarray(q), jnp.int32(S), W),
        jnp.int32(S - W), 7, "maxpool")
    ref_idx = torch.tensor(np.asarray(scores)).topk(cap - W, dim=-1).indices
    ours = selected_positions(packed, k)
    sc = np.asarray(scores)
    for h in range(H):
        ref_set = set(ref_idx[h].tolist()) | set(range(S - W, S))
        got = set(ours[h])
        # torch.topk and lax.top_k break exact ties differently (maxpool makes
        # runs of equal scores); any disagreement must be between equal scores.
        for a, b in zip(sorted(got - ref_set), sorted(ref_set - got)):
            assert sc[h, a] == sc[h, b], f"head {h}: non-tie selection mismatch"


def test_snapkv_no_compress_branch():
    q, k, v = make_qkv(3)
    cfg = CompressionConfig(method="snapkv", max_capacity_prompt=256, window_size=W)
    packed = run_policy(cfg, q, k, v, S)  # S=96 < 256 -> keep everything
    assert np.all(np.asarray(packed.lengths) == S)
    np.testing.assert_allclose(np.asarray(packed.k)[:, :S], k, atol=0)


def test_snapkv_padding_invariant():
    q, k, v = make_qkv(4)
    cap = 32
    cfg = CompressionConfig(method="snapkv", max_capacity_prompt=cap,
                            window_size=W, kernel_size=7, pooling="maxpool")
    exact = run_policy(cfg, q, k, v, S, capacity=cap)
    S_pad = 128
    padded = run_policy(cfg, pad_seq(q, S_pad), pad_seq(k, S_pad), pad_seq(v, S_pad),
                        S, capacity=cap)
    np.testing.assert_allclose(np.asarray(exact.k), np.asarray(padded.k), atol=1e-6)
    np.testing.assert_allclose(np.asarray(exact.v), np.asarray(padded.v), atol=1e-6)
    assert np.array_equal(np.asarray(exact.lengths), np.asarray(padded.lengths))


def test_streamingllm_keeps_sinks_and_recent():
    q, k, v = make_qkv(5)
    cap = 24
    cfg = CompressionConfig(method="streamingllm", max_capacity_prompt=cap,
                            window_size=20)  # runner: window = cap - 4
    packed = run_policy(cfg, q, k, v, S)
    ours = selected_positions(packed, k)
    expect = list(range(cap - 20)) + list(range(S - 20, S))
    for h in range(H):
        assert ours[h] == expect


def test_l2norm_keeps_smallest_norms():
    q, k, v = make_qkv(6)
    cap = 40
    cfg = CompressionConfig(method="l2norm", max_capacity_prompt=cap, window_size=0,
                            skip_layers=(0, 1))
    packed = run_policy(cfg, q, k, v, S, layer_idx=5)
    norms = np.linalg.norm(k, axis=-1)
    for h in range(H):
        ref = set(np.argsort(norms[h])[:cap].tolist())
        ours = set(selected_positions(packed, k)[h])
        assert ours == ref
    # skip layer: untouched
    packed0 = run_policy(cfg, q, k, v, S, layer_idx=0)
    assert np.all(np.asarray(packed0.lengths) == S)


def test_h2o_selection_matches_torch():
    q, k, v = make_qkv(7)
    cap = 32
    cfg = CompressionConfig(method="h2o", max_capacity_prompt=cap, window_size=W)
    packed = run_policy(cfg, q, k, v, S)
    scores = full_attention_scores(jnp.asarray(k), jnp.asarray(q), jnp.int32(S), W)
    ref_idx = torch.tensor(np.asarray(scores)).topk(cap - W, dim=-1).indices
    ours = selected_positions(packed, k)
    for h in range(H):
        assert set(ours[h]) == set(ref_idx[h].tolist()) | set(range(S - W, S))


def test_pyramidkv_budget_schedule():
    from kvcache_factory_tpu.policies import pyramid_budget
    cfg = CompressionConfig(method="pyramidkv", max_capacity_prompt=64, window_size=W,
                            beta=20)
    L = 8
    for q_len in (200, 1000, 96):
        for layer in range(L):
            ref = torch_spec.pyramid_layer_budget(64, W, q_len, 20, L, layer)
            ours = int(pyramid_budget(cfg, L, jnp.int32(layer), jnp.int32(q_len)))
            if ref is None:
                continue  # no-compress branch, budget unused
            assert ours == ref, (q_len, layer, ours, ref)


def test_pyramidkv_lengths_per_layer():
    q, k, v = make_qkv(8, s=256)
    cap = 48
    L = 4
    cfg = CompressionConfig(method="pyramidkv", max_capacity_prompt=cap, window_size=W)
    capacity = cfg.layer_capacity(L, 256)
    for layer in range(L):
        packed = run_policy(cfg, q, k, v, 256, layer_idx=layer, num_layers=L,
                            capacity=capacity)
        ref_budget = torch_spec.pyramid_layer_budget(cap, W, 256, 20, L, layer)
        assert np.all(np.asarray(packed.lengths) == ref_budget + W)


def test_adakv_budgets_match_torch():
    rng = np.random.default_rng(9)
    n = S - W
    base = 24
    scores = np.abs(rng.normal(size=(H, n))).astype(np.float32)
    sorted_desc = -np.sort(-scores, axis=-1)
    ref = torch_spec.adakv_head_budgets(torch.tensor(sorted_desc), base, 0.2, True)
    padded = np.full((H, 128), NEG_INF, np.float32)
    padded[:, :n] = scores
    ours = adakv_budgets(jnp.asarray(padded), base, 0.2, True,
                         jnp.int32(n), jnp.int32(1000))
    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())


def test_adakv_end_to_end_lengths():
    q, k, v = make_qkv(10)
    cap = 32
    cfg = CompressionConfig(method="adakv", max_capacity_prompt=cap, window_size=W,
                            kernel_size=7, pooling="maxpool", floor_ratio=0.2,
                            normalize=True)
    packed = run_policy(cfg, q, k, v, S)
    lens = np.asarray(packed.lengths)
    base = cap - W
    # Budgets are floored at ~floor_ratio*base and sum to ~H*base.
    assert np.all(lens >= int(base * 0.2) + W - 1)
    total = lens.sum() - H * W
    assert abs(int(total) - H * base) <= H  # rounding slack


def test_headkv_respects_capacities():
    q, k, v = make_qkv(11)
    cap = 32
    cfg = CompressionConfig(method="headkv", max_capacity_prompt=cap, window_size=W)
    head_cap = np.array([4, 10, 20, 40], np.int32)
    packed = run_policy(cfg, q, k, v, S, head_capacity=head_cap,
                        capacity=cfg.layer_capacity(8, S))
    lens = np.asarray(packed.lengths)
    C = cfg.layer_capacity(8, S)
    expect = np.minimum(head_cap, C - W) + W
    np.testing.assert_array_equal(lens, expect)


def test_think_zeroes_lowest_saliency_channels():
    q, k, v = make_qkv(12)
    cap = 48
    recent = 8
    cfg = CompressionConfig(method="think", max_capacity_prompt=cap, window_size=W,
                            kernel_size=7, pooling="maxpool",
                            pruning_ratio=0.4, recent_size=recent)
    packed = run_policy(cfg, q, k, v, S)
    kp = np.asarray(packed.k)
    # Reconstruct the compressed cache without pruning to compute the spec mask.
    cfg_plain = CompressionConfig(method="snapkv", max_capacity_prompt=cap,
                                  window_size=W, kernel_size=7, pooling="maxpool")
    plain = run_policy(cfg_plain, q, k, v, S)
    keep = torch_spec.think_channel_mask(torch.tensor(q),
                                         torch.tensor(np.asarray(plain.k)), 0.4)
    keep = keep.numpy()
    for h in range(H):
        L = int(np.asarray(packed.lengths)[h])
        nonrecent = kp[h, :L - recent]
        assert np.all(nonrecent[:, ~keep[h]] == 0), "dropped channels must be zero"
        np.testing.assert_allclose(nonrecent[:, keep[h]],
                                   np.asarray(plain.k)[h, :L - recent][:, keep[h]],
                                   atol=1e-6)
        # recent rows dense
        np.testing.assert_allclose(kp[h, L - recent:L],
                                   np.asarray(plain.k)[h, L - recent:L], atol=1e-6)


def test_cam_runs_and_selects_by_column_sum():
    q, k, v = make_qkv(13)
    cap = 32
    cfg = CompressionConfig(method="cam", max_capacity_prompt=cap, window_size=W)
    packed = run_policy(cfg, q, k, v, S, rng=jax.random.PRNGKey(0))
    assert packed.k.shape[1] == cap
    assert np.all(np.asarray(packed.lengths) == cap)
    # Selection must match window column sums (keys are NOT merged by CAM).
    scores = window_attention_scores(jnp.asarray(k), jnp.asarray(q), jnp.int32(S), W)
    ref_idx = torch.tensor(np.asarray(scores)).topk(cap - W, dim=-1).indices
    ours = selected_positions(packed, k)
    for h in range(H):
        assert set(ours[h]) == set(ref_idx[h].tolist()) | set(range(S - W, S))


def test_random_policy_and_fullkv():
    q, k, v = make_qkv(14)
    cfg = CompressionConfig(method="random", max_capacity_prompt=32, window_size=W)
    packed = run_policy(cfg, q, k, v, S, rng=jax.random.PRNGKey(1))
    assert np.all(np.asarray(packed.lengths) == 32)

    cfg = CompressionConfig(method="fullkv")
    packed = run_policy(cfg, q, k, v, S, capacity=S)
    assert np.all(np.asarray(packed.lengths) == S)
    np.testing.assert_allclose(np.asarray(packed.k), k, atol=0)


def test_lookm_merge_changes_retained_kv():
    q, k, v = make_qkv(15)
    cap = 32
    cfg = CompressionConfig(method="snapkv", max_capacity_prompt=cap, window_size=W,
                            kernel_size=7, pooling="maxpool", merge="pivot")
    merged = run_policy(cfg, q, k, v, S)
    cfg_plain = CompressionConfig(method="snapkv", max_capacity_prompt=cap,
                                  window_size=W, kernel_size=7, pooling="maxpool")
    plain = run_policy(cfg_plain, q, k, v, S)
    # Same selection lengths, but values have absorbed evicted mass.
    assert np.array_equal(np.asarray(merged.lengths), np.asarray(plain.lengths))
    assert not np.allclose(np.asarray(merged.v), np.asarray(plain.v))


def test_gqa_group_reduce_shapes():
    rng = np.random.default_rng(16)
    Hkv, G = 2, 2
    q = rng.normal(size=(Hkv * G, S, D)).astype(np.float32)
    k = rng.normal(size=(Hkv, S, D)).astype(np.float32)
    v = rng.normal(size=(Hkv, S, D)).astype(np.float32)
    cap = 32
    # reference parity: per-query-head cache
    cfg = CompressionConfig(method="snapkv", max_capacity_prompt=cap, window_size=W)
    packed = run_policy(cfg, q, k, v, S)
    assert packed.k.shape == (Hkv * G, cap, D)
    # TPU extension: grouped cache stays at H_kv
    cfg = CompressionConfig(method="snapkv", max_capacity_prompt=cap, window_size=W,
                            group_reduce="mean")
    packed = run_policy(cfg, q, k, v, S)
    assert packed.k.shape == (Hkv, cap, D)


def test_batched_compress_prefill():
    from kvcache_factory_tpu.policies import compress_prefill
    rng = np.random.default_rng(17)
    B = 2
    q = rng.normal(size=(B, H, S, D)).astype(np.float32)
    k = rng.normal(size=(B, H, S, D)).astype(np.float32)
    v = rng.normal(size=(B, H, S, D)).astype(np.float32)
    cap = 32
    cfg = CompressionConfig(method="snapkv", max_capacity_prompt=cap, window_size=W)
    ctx = LayerContext(jnp.int32(0), None, None)
    true_len = jnp.asarray([S, 64], jnp.int32)
    packed = compress_prefill(cfg, 8, cap, jnp.asarray(k), jnp.asarray(v),
                              jnp.asarray(q), true_len, ctx)
    assert packed.k.shape == (B, H, cap, D)
    assert np.all(np.asarray(packed.lengths)[0] == cap)
    assert np.all(np.asarray(packed.lengths)[1] == cap)  # 64 >= cap -> compressed


def test_cam_no_compress_keeps_exact_values():
    """Short prompts must return UNTOUCHED values: the reference's
    no-compress branch early-returns before any Bernoulli merging
    (pyramidkv_utils.py:450-455)."""
    q, k, v = make_qkv(21)
    tl = 24  # < max_capacity_prompt -> no_compress
    cfg = CompressionConfig(method="cam", max_capacity_prompt=32, window_size=W)
    packed = run_policy(cfg, q, k, v, tl, rng=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(packed.k)[:, :tl], k[:, :tl])
    np.testing.assert_array_equal(np.asarray(packed.v)[:, :tl], v[:, :tl])
    assert np.all(np.asarray(packed.lengths) == tl)


def test_cam_group_reduce_mean_shapes():
    """CAM with a GQA-grouped cache: per-kv-head scores/values (this
    configuration used to crash on a [Hq,S] vs [Hkv,S] broadcast)."""
    groups = 2
    hkv = H // groups
    q, _, _ = make_qkv(22)                    # [H, S, D] query heads
    _, k, v = make_qkv(23, h=hkv)             # [Hkv, S, D]
    cfg = CompressionConfig(method="cam", max_capacity_prompt=32,
                            window_size=W, group_reduce="mean")
    packed = run_policy(cfg, q, k, v, S, rng=jax.random.PRNGKey(4))
    assert packed.k.shape[0] == hkv
    assert np.all(np.asarray(packed.lengths) == 32)
    assert np.isfinite(np.asarray(packed.v)).all()


def test_single_key_batch2_not_mistaken_for_presplit():
    """Advisor round 3 (high): a single legacy PRNGKey has shape (2,) —
    at B == 2 the old shape[0] == B check treated it as a pre-split key
    batch, handing scalar key halves to the vmapped compress_layer and
    crashing cam/random generation at trace time.  A single unsplit key
    must be split; a genuine [B]-key batch must pass through unchanged."""
    from kvcache_factory_tpu.policies import compress_prefill
    rng = np.random.default_rng(31)
    B = 2
    q = rng.normal(size=(B, H, S, D)).astype(np.float32)
    k = rng.normal(size=(B, H, S, D)).astype(np.float32)
    v = rng.normal(size=(B, H, S, D)).astype(np.float32)
    true_len = jnp.asarray([S, S], jnp.int32)
    for method in ("cam", "random"):
        cfg = CompressionConfig(method=method, max_capacity_prompt=32,
                                window_size=W)
        # single legacy key (shape (2,)) — the regression case
        ctx = LayerContext(jnp.int32(0), None, jax.random.PRNGKey(7))
        packed = compress_prefill(cfg, 8, 32, jnp.asarray(k), jnp.asarray(v),
                                  jnp.asarray(q), true_len, ctx)
        assert packed.k.shape == (B, H, 32, D)
        # single TYPED key (ndim 0) must also split
        ctx_t = LayerContext(jnp.int32(0), None, jax.random.key(7))
        packed_t = compress_prefill(cfg, 8, 32, jnp.asarray(k),
                                    jnp.asarray(v), jnp.asarray(q),
                                    true_len, ctx_t)
        assert packed_t.k.shape == (B, H, 32, D)
        # pre-split [B, 2] legacy batch passes through: same keys -> same output
        keys = jax.random.split(jax.random.PRNGKey(7), B)
        ctx_b = LayerContext(jnp.int32(0), None, keys)
        packed_b = compress_prefill(cfg, 8, 32, jnp.asarray(k),
                                    jnp.asarray(v), jnp.asarray(q),
                                    true_len, ctx_b)
        np.testing.assert_array_equal(np.asarray(packed.k),
                                      np.asarray(packed_b.k))
