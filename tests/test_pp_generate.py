"""pp_generate: full generation under pipeline parallelism matches the
single-program generate() token stream.

Runs on the virtual 8-device CPU mesh (conftest).  The reference's only
multi-GPU decode is accelerate layer placement with every GPU but one idle
(run_longbench.py:390); pp_generate is the GPipe-scheduled TPU counterpart —
parity here is against our own single-device compressed generation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvcache_factory_tpu.config import (CompressionConfig, GenerationConfig,
                                        ModelConfig)
from kvcache_factory_tpu.models.weights import init_params
from kvcache_factory_tpu.parallel.pipeline import (make_pp_mesh, pp_generate,
                                                   shard_params_pp)
from kvcache_factory_tpu.runtime.generate import generate


def _cfg():
    return ModelConfig(
        model_type="llama", vocab_size=512, hidden_size=64,
        intermediate_size=128, num_hidden_layers=8, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=512,
        dtype="float32")


@pytest.mark.parametrize("n_stages,n_micro,method", [
    (2, 4, "snapkv"),
    (4, 4, "pyramidkv"),      # per-layer budgets from the GLOBAL layer index
    (8, 8, "streamingllm"),
    (2, 2, "fullkv"),
    (4, 4, "h2o"),            # blocked-scan scoring needs the vma-stamped init
    (2, 4, "cam"),            # per-example keys sliced from the global split
])
def test_pp_generate_matches_single_program(n_stages, n_micro, method):
    cfg = _cfg()
    B, S, N = 8, 48, 6
    rng = np.random.default_rng(11)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    true_len = jnp.asarray(rng.integers(S // 2, S + 1, (B,)), jnp.int32)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)

    cap = S if method == "fullkv" else 24
    comp = CompressionConfig(method=method, max_capacity_prompt=cap,
                             window_size=8, kernel_size=7, pooling="maxpool")
    L = cfg.num_hidden_layers
    cache_capacity = comp.layer_capacity(L, S) + N + 1

    want = generate(params, cfg, comp, GenerationConfig(max_new_tokens=N),
                    tokens, true_len, cache_capacity).tokens

    mesh = make_pp_mesh(n_stages)
    sharded = shard_params_pp(params, mesh)
    got = jax.jit(lambda p, t, tl: pp_generate(
        p, cfg, comp, t, tl, mesh, n_microbatches=n_micro,
        max_new_tokens=N, cache_capacity=cache_capacity))(
            sharded, tokens, true_len)

    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pp_generate_single_token():
    """N == 1 exercises the prefill-only early return."""
    cfg = _cfg()
    B, S = 4, 32
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    true_len = jnp.full((B,), S, jnp.int32)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=16,
                             window_size=4, kernel_size=7, pooling="maxpool")
    cache_capacity = comp.layer_capacity(cfg.num_hidden_layers, S) + 2

    want = generate(params, cfg, comp, GenerationConfig(max_new_tokens=1),
                    tokens, true_len, cache_capacity).tokens

    mesh = make_pp_mesh(4)
    sharded = shard_params_pp(params, mesh)
    got = jax.jit(lambda p, t, tl: pp_generate(
        p, cfg, comp, t, tl, mesh, n_microbatches=4, max_new_tokens=1,
        cache_capacity=cache_capacity))(sharded, tokens, true_len)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
