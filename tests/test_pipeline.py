"""Pipeline parallelism: GPipe forward matches the single-program forward.

Runs on the virtual 8-device CPU mesh (conftest).  The reference has no
pipeline story beyond accelerate layer placement (SURVEY.md §2.6); parity
here is against our own full-attention prefill logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvcache_factory_tpu.config import CompressionConfig, ModelConfig
from kvcache_factory_tpu.models import llama
from kvcache_factory_tpu.models.weights import init_params
from kvcache_factory_tpu.parallel.pipeline import (make_pp_mesh,
                                                   pipeline_forward,
                                                   shard_params_pp)


def _cfg():
    return ModelConfig(
        model_type="llama", vocab_size=512, hidden_size=64,
        intermediate_size=128, num_hidden_layers=8, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=512,
        dtype="float32")


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (2, 1), (8, 2)])
def test_pipeline_forward_matches_single_program(n_stages, n_micro):
    cfg = _cfg()
    B, S = max(4, n_micro), 48
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    true_len = jnp.asarray(rng.integers(S // 2, S + 1, (B,)), jnp.int32)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)

    comp = CompressionConfig(method="fullkv", max_capacity_prompt=S,
                             window_size=8)
    want = llama.prefill(params, cfg, comp, tokens, true_len,
                         cache_capacity=S + 4).logits_last

    mesh = make_pp_mesh(n_stages)
    sharded = shard_params_pp(params, mesh)
    got = jax.jit(
        lambda p, t, tl: pipeline_forward(p, cfg, t, tl, mesh,
                                          n_microbatches=n_micro)
    )(sharded, tokens, true_len)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_pipeline_forward_moe_matches_single_program():
    """MoE (Mixtral) under pp (round-5 review: pipeline_forward called the
    dense swiglu path directly, crashing at trace time for MoE configs
    that pp_generate in the same file already handled via ffn_block)."""
    cfg = ModelConfig(
        model_type="mixtral", vocab_size=512, hidden_size=64,
        intermediate_size=96, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=512,
        num_local_experts=4, num_experts_per_tok=2, dtype="float32")
    B, S = 4, 48
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    true_len = jnp.asarray(rng.integers(S // 2, S + 1, (B,)), jnp.int32)
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)

    comp = CompressionConfig(method="fullkv", max_capacity_prompt=S,
                             window_size=8)
    want = llama.prefill(params, cfg, comp, tokens, true_len,
                         cache_capacity=S + 4).logits_last

    mesh = make_pp_mesh(4)
    sharded = shard_params_pp(params, mesh)
    got = jax.jit(
        lambda p, t, tl: pipeline_forward(p, cfg, t, tl, mesh,
                                          n_microbatches=2)
    )(sharded, tokens, true_len)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
