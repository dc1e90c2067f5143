"""Visualization + profiling utilities."""

import numpy as np

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.config import ModelConfig
from kvcache_factory_tpu.models.weights import init_params
from kvcache_factory_tpu.utils import (PhaseTimer, infer_attention,
                                       plot_attention_heatmap,
                                       plot_budget_allocation)


def test_infer_attention_rows_sum_to_one(tmp_path):
    cfg = ModelConfig(model_type="llama", vocab_size=64, hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=8, dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = np.arange(12) % 64
    maps = infer_attention(params, cfg, toks)
    assert len(maps) == 2
    assert maps[0].shape == (4, 12, 12)
    # scaled by 1e4; rows sum to 1e4; causal zeros above diagonal
    np.testing.assert_allclose(maps[0].sum(-1), 1e4, rtol=1e-3)
    assert np.all(maps[0][:, 0, 1:] == 0)
    p = plot_attention_heatmap(maps[0], save_path=str(tmp_path / "a.png"))
    assert (tmp_path / "a.png").exists()
    plot_budget_allocation(np.random.default_rng(0).integers(1, 50, (2, 4)),
                           save_path=str(tmp_path / "b.png"))
    assert (tmp_path / "b.png").exists()


def test_phase_timer():
    t = PhaseTimer()
    x = jnp.ones((8, 8))
    with t.phase("prefill", outputs=x, num_tokens=100):
        y = x * 2
    with t.phase("decode", outputs=None, num_tokens=10):
        pass
    s = t.summary()
    assert s["prefill"]["count"] == 1
    assert s["prefill"]["tokens_per_s"] > 0
    assert "decode" in s
    assert isinstance(t.dump(), str)
