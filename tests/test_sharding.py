"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The decisive property: dp x tp sharded generation must produce the SAME
tokens as single-device generation (XLA GSPMD only changes layout, not math
up to reduction order)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from kvcache_factory_tpu.config import (CompressionConfig, GenerationConfig,
                                        ModelConfig, ShardingConfig)
from kvcache_factory_tpu.models.weights import init_params
from kvcache_factory_tpu.parallel.mesh import (data_sharding, make_mesh,
                                               param_specs, shard_params)
from kvcache_factory_tpu.runtime import generate


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        model_type="llama", vocab_size=256, hidden_size=128,
        intermediate_size=256, num_hidden_layers=2, num_attention_heads=8,
        num_key_value_heads=4, head_dim=16, max_position_embeddings=512,
        dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=48,
                             window_size=8, kernel_size=7, pooling="maxpool")
    return cfg, params, comp


@pytest.mark.parametrize("dp,tp", [(2, 4), (4, 2), (8, 1), (1, 4)])
def test_sharded_generate_matches_single_device(setup, dp, tp):
    cfg, params, comp = setup
    gen_cfg = GenerationConfig(max_new_tokens=6)
    B, S = max(dp, 2), 96
    rng = np.random.default_rng(dp * 10 + tp)
    toks = rng.integers(0, cfg.vocab_size, size=(B, S))
    true_len = np.full((B,), S, np.int32)
    cap = 48 + 7

    single = generate(params, cfg, comp, gen_cfg, jnp.asarray(toks, jnp.int32),
                      jnp.asarray(true_len), cache_capacity=cap)
    single_toks = np.asarray(single.tokens)

    mesh = make_mesh(ShardingConfig(dp=dp, tp=tp))
    sharded_params = shard_params(params, mesh, cfg)
    toks_s = jax.device_put(jnp.asarray(toks, jnp.int32), data_sharding(mesh))
    tl_s = jax.device_put(jnp.asarray(true_len), NamedSharding(mesh, P("dp")))
    with mesh:
        res = generate(sharded_params, cfg, comp, gen_cfg, toks_s, tl_s,
                       cache_capacity=cap)
        sharded_toks = np.asarray(res.tokens)

    np.testing.assert_array_equal(single_toks, sharded_toks)


def test_param_specs_cover_all_leaves(setup):
    cfg, params, _ = setup
    specs = param_specs(cfg)
    p_paths = {jax.tree_util.keystr(kp)
               for kp, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    # every param leaf must have a reachable spec (shard_params walks by path)
    mesh = make_mesh(ShardingConfig(dp=2, tp=4))
    sharded = shard_params(params, mesh, cfg)
    s_paths = {jax.tree_util.keystr(kp)
               for kp, _ in jax.tree_util.tree_flatten_with_path(sharded)[0]}
    assert p_paths == s_paths
    # tp-sharded leaves actually split over the mesh
    qkv = sharded["layers"]["qkv_proj"]
    assert qkv.sharding.spec == specs["layers"]["qkv_proj"]


# ---------------------------------------------------------------------------
# Expert parallelism (MoE)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def moe_setup():
    cfg = ModelConfig(
        model_type="mixtral", vocab_size=256, hidden_size=128,
        intermediate_size=192, num_hidden_layers=2, num_attention_heads=8,
        num_key_value_heads=4, head_dim=16, max_position_embeddings=512,
        num_local_experts=4, num_experts_per_tok=2, dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=48,
                             window_size=8)
    return cfg, params, comp


@pytest.mark.parametrize("dp,ep,tp", [(1, 4, 2), (2, 4, 1), (1, 2, 4), (2, 2, 2)])
def test_ep_sharded_generate_matches_single_device(moe_setup, dp, ep, tp):
    """Expert-parallel generation (experts sharded over ep, Megatron tp
    inside each expert) must reproduce single-device tokens."""
    cfg, params, comp = moe_setup
    gen_cfg = GenerationConfig(max_new_tokens=5)
    B, S = max(dp, 2), 96
    rng = np.random.default_rng(ep * 10 + tp)
    toks = rng.integers(0, cfg.vocab_size, size=(B, S))
    true_len = np.full((B,), S, np.int32)
    cap = 48 + 6

    single = generate(params, cfg, comp, gen_cfg, jnp.asarray(toks, jnp.int32),
                      jnp.asarray(true_len), cache_capacity=cap)
    single_toks = np.asarray(single.tokens)

    mesh = make_mesh(ShardingConfig(dp=dp, tp=tp, ep=ep))
    assert "ep" in mesh.axis_names
    sharded_params = shard_params(params, mesh, cfg)
    # expert-stacked FFN weights are actually split over ep
    gu = sharded_params["layers"]["gate_up_proj"]
    assert gu.sharding.spec[1] == "ep"
    toks_s = jax.device_put(jnp.asarray(toks, jnp.int32),
                            NamedSharding(mesh, P("dp", None)))
    tl_s = jax.device_put(jnp.asarray(true_len), NamedSharding(mesh, P("dp")))
    with mesh:
        res = generate(sharded_params, cfg, comp, gen_cfg, toks_s, tl_s,
                       cache_capacity=cap)
        sharded_toks = np.asarray(res.tokens)

    np.testing.assert_array_equal(single_toks, sharded_toks)


def test_dcn_dp_single_process_fallback(setup):
    """dcn_dp > 1 on a single-process (virtual CPU) runtime falls back to a
    flat mesh of the same shape; the axis layout is unchanged, so shardings
    compile identically (multi-host placement only changes which physical
    device owns each coordinate)."""
    mesh = make_mesh(ShardingConfig(dp=4, tp=2, dcn_dp=2))
    assert mesh.shape == {"dp": 4, "tp": 2}


def test_dcn_dp_must_divide_dp():
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ShardingConfig(dp=4, tp=2, dcn_dp=3)


def test_70b_tp8_lowers_and_compiles_abstract():
    """BASELINE config 5: Llama-2-70B geometry tensor-sharded. Weights can't
    be materialized here (140 GB bf16), but abstract lowering + GSPMD
    compilation over the virtual 8-way mesh validates every sharding
    constraint end-to-end (prefill + compression + while-loop decode).
    Per-shard argument footprint ~16.5 GB => tp=16 on v5e (16 GB HBM) or
    tp=8 on v5p."""
    import functools
    cfg = ModelConfig(
        model_type="llama", vocab_size=32000, hidden_size=8192,
        intermediate_size=28672, num_hidden_layers=80,
        num_attention_heads=64, num_key_value_heads=8, head_dim=128,
        max_position_embeddings=8192)
    mesh = make_mesh(ShardingConfig(dp=1, tp=8))
    specs = param_specs(cfg)
    abs_params = jax.eval_shape(functools.partial(init_params, cfg),
                                jax.random.PRNGKey(0))

    def attach(path, s):
        node = specs
        for p in path:
            node = node[p.key]
        return jax.ShapeDtypeStruct(s.shape, s.dtype,
                                    sharding=NamedSharding(mesh, node))

    abs_params = jax.tree_util.tree_map_with_path(attach, abs_params)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=2048,
                             window_size=8)
    gen_cfg = GenerationConfig(max_new_tokens=16)
    toks = jax.ShapeDtypeStruct((1, 4096), jnp.int32,
                                sharding=NamedSharding(mesh, P(None, None)))
    tl = jax.ShapeDtypeStruct((1,), jnp.int32,
                              sharding=NamedSharding(mesh, P(None)))
    with mesh:
        compiled = generate.lower(abs_params, cfg, comp, gen_cfg, toks, tl,
                                  cache_capacity=2176).compile()
    per_shard_gb = compiled.memory_analysis().argument_size_in_bytes / 2**30
    assert 14 < per_shard_gb < 20  # ~140 GB bf16 weights / 8 shards


def test_moe_ep_decode_no_weight_collective(moe_setup):
    """VERDICT round-3 #6: under an ep mesh the decode MoE path must not put
    WEIGHT matrices on the wire.  The old decode weight-gather
    (gw[topi[:, 0]] with gw sharded over experts) lowered to clamp-to-shard
    + mask + an all-reduce of the gathered [B, k, h, 2f] weights every layer
    every step; decode_step now forces the dense-local-experts form (each
    shard streams only its local experts; the all-reduce carries the [B, h]
    combined OUTPUT).  Asserted on the compiled HLO: every collective's
    result is small (activation-sized), and token parity with the gather
    path holds."""
    from kvcache_factory_tpu.cache.kv_cache import KVCache
    from kvcache_factory_tpu.models import llama as _llama

    cfg, params, comp = moe_setup
    mesh = make_mesh(ShardingConfig(dp=1, tp=1, ep=4))
    sharded_params = shard_params(params, mesh, cfg)
    L, B = cfg.num_hidden_layers, 2
    H, C, D = cfg.num_attention_heads, 64, cfg.head_dim
    cache = KVCache(k=jnp.zeros((L, B, H, C, D), jnp.float32),
                    v=jnp.zeros((L, B, H, C, D), jnp.float32),
                    lengths=jnp.full((L, B, H), 32, jnp.int32),
                    positions=jnp.full((B,), 40, jnp.int32))
    tok = jnp.asarray([3, 5], jnp.int32)

    with mesh:
        compiled = jax.jit(lambda p, t, c: _llama.decode_step(
            p, cfg, t, c, attn_backend="xla", mesh=mesh)).lower(
                sharded_params, tok, cache).compile()
    txt = compiled.as_text()

    import re
    # weight-scale = one expert's gate_up rows (h * 2F elements); any
    # collective at or above this is weights on the wire.
    weight_elems = cfg.hidden_size * cfg.intermediate_size * 2
    bad = []
    for line in txt.splitlines():
        m = re.match(r"\s*%?\S+\s*=\s*\(?(\w+)\[([\d,]*)\]", line)
        if not m or not any(op in line for op in
                            ("all-reduce", "all-gather", "all-to-all",
                             "collective-permute")):
            continue
        dims = [int(d) for d in m.group(2).split(",") if d]
        n = int(np.prod(dims)) if dims else 1
        if n >= weight_elems:
            bad.append(line.strip()[:160])
    assert not bad, "weight-sized collective(s) in ep decode HLO:\n" + \
        "\n".join(bad)

    # token parity: dense-local-experts decode == unsharded gather decode
    lg_ref, _ = _llama.decode_step(params, cfg, tok, cache,
                                   attn_backend="xla")
    with mesh:
        lg_ep, _ = _llama.decode_step(sharded_params, cfg, tok, cache,
                                      attn_backend="xla", mesh=mesh)
    np.testing.assert_allclose(np.asarray(lg_ep), np.asarray(lg_ref),
                               rtol=2e-5, atol=2e-5)
