"""Weight-only int8 quantization (W8A16) — models/weights.py::quantize_weights
+ models/llama.py::wdot.

Decode is weight-bandwidth-bound at every measured batch size
(BASELINE.md attribution); halving the weight stream measured 1.56x on the
headline B=1 decode and 1.24-1.54x on the serving rows (v5e, round 5).
No reference counterpart — the reference quantizes only the KV cache
(pyramidkv/quantcache.py).

Decisive properties:
- snapped-weights exactness: if every weight already sits on its int8 grid,
  the quantized forward equals the fp forward (up to the post-dot scale
  rounding, ~1e-6 rel in f32) — the scale-commute algebra is exact;
- random weights: logits stay close and per-weight reconstruction error is
  small;
- composition: GSPMD (dp, tp) sharding, pipeline parallelism, the engine,
  and chunked admission all produce token streams identical to their
  single-device / unsharded quantized counterparts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.config import (CompressionConfig, GenerationConfig,
                                        ModelConfig, ShardingConfig)
from kvcache_factory_tpu.models import llama
from kvcache_factory_tpu.models.weights import (WEIGHT_QUANT_KEYS,
                                                init_params, quantize_weights)


def tiny_cfg(moe=False):
    kw = dict(num_local_experts=4, num_experts_per_tok=2) if moe else {}
    return ModelConfig(
        model_type="mixtral" if moe else "llama", vocab_size=96,
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=256, dtype="float32", **kw)


def comp48():
    return CompressionConfig(method="snapkv", max_capacity_prompt=24,
                             window_size=8, kernel_size=7, pooling="maxpool")


def dequant_tree(qp):
    """Fold every {"q", "s"} leaf back to a dense fp matrix."""
    def deq(x):
        if isinstance(x, dict) and set(x) == {"q", "s"}:
            return x["q"].astype(jnp.float32) * x["s"]
        return x
    out = dict(qp)
    out["lm_head"] = deq(qp["lm_head"])
    out["layers"] = {k: deq(v) for k, v in qp["layers"].items()}
    return out


@pytest.mark.parametrize("moe", [False, True])
def test_snapped_weights_forward_is_exact(moe):
    """Weights already on the int8 grid -> quantize is lossless, so the
    quantized forward must match the fp forward with those same (snapped)
    weights to float-rounding of the post-dot scale multiply."""
    cfg = tiny_cfg(moe)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    snapped = dequant_tree(quantize_weights(params))  # on-grid fp weights
    qp = quantize_weights(snapped)
    # round-trip really is lossless on the int levels
    for k in WEIGHT_QUANT_KEYS:
        if k in qp["layers"]:
            np.testing.assert_array_equal(
                np.asarray(qp["layers"][k]["q"]),
                np.asarray(quantize_weights(params)["layers"][k]["q"]))

    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 48)), jnp.int32)
    tl = jnp.asarray([48, 37], jnp.int32)
    pre_f = llama.prefill(snapped, cfg, comp48(), toks, tl, cache_capacity=64)
    pre_q = llama.prefill(qp, cfg, comp48(), toks, tl, cache_capacity=64)
    np.testing.assert_allclose(np.asarray(pre_q.logits_last),
                               np.asarray(pre_f.logits_last),
                               rtol=1e-5, atol=1e-5)
    tok = jnp.argmax(pre_f.logits_last, -1).astype(jnp.int32)
    lg_f, _ = llama.decode_step(snapped, cfg, tok, pre_f.cache)
    lg_q, _ = llama.decode_step(qp, cfg, tok, pre_q.cache)
    np.testing.assert_allclose(np.asarray(lg_q), np.asarray(lg_f),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("moe", [False, True])
def test_random_weights_logits_close(moe):
    cfg = tiny_cfg(moe)
    params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    qp = quantize_weights(params)
    # per-weight reconstruction error: per-out-channel symmetric int8 on
    # normal weights sits well under 1% rel (RMS)
    for k in WEIGHT_QUANT_KEYS:
        if k not in params["layers"]:
            continue
        w = np.asarray(params["layers"][k], np.float32)
        wq = np.asarray(qp["layers"][k]["q"], np.float32) \
            * np.asarray(qp["layers"][k]["s"])
        rel = np.sqrt(((w - wq) ** 2).mean() / (w ** 2).mean())
        # per-out-channel max-scaled int8 on ~N(0, 1/fan_in) weights: step
        # = 2*max/254 with max ~4 sigma -> RMS error ~0.9% of sigma
        assert rel < 1.2e-2, (k, rel)

    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 48)), jnp.int32)
    tl = jnp.asarray([48, 40], jnp.int32)
    pre_f = llama.prefill(params, cfg, comp48(), toks, tl, cache_capacity=64)
    pre_q = llama.prefill(qp, cfg, comp48(), toks, tl, cache_capacity=64)
    lf, lq = np.asarray(pre_f.logits_last), np.asarray(pre_q.logits_last)
    assert np.all(np.isfinite(lq))
    # logit drift bounded well below the logit scale
    assert np.abs(lq - lf).max() < 0.1 * np.abs(lf).max(), \
        (np.abs(lq - lf).max(), np.abs(lf).max())


def test_unsupported_nbits_raises():
    params = init_params(tiny_cfg(), jax.random.PRNGKey(0))
    with pytest.raises(NotImplementedError):
        quantize_weights(params, nbits=4)


def test_skip_keeps_named_matrices_fp():
    """skip=("lm_head",) — the standard first accuracy mitigation — keeps
    the named matrix a plain array while the rest quantize."""
    params = init_params(tiny_cfg(), jax.random.PRNGKey(0),
                         dtype=jnp.float32)
    qp = quantize_weights(params, skip=("lm_head", "o_proj"))
    assert not isinstance(qp["lm_head"], dict)
    assert not isinstance(qp["layers"]["o_proj"], dict)
    assert isinstance(qp["layers"]["qkv_proj"], dict)
    # still forwards
    rng = np.random.default_rng(4)
    toks = jnp.asarray(rng.integers(0, 96, (1, 32)), jnp.int32)
    pre = llama.prefill(qp, tiny_cfg(), comp48(), toks,
                        jnp.asarray([32], jnp.int32), cache_capacity=48)
    assert np.isfinite(np.asarray(pre.logits_last)).all()
    with pytest.raises(ValueError, match="not quantizable"):
        quantize_weights(params, skip=("embed",))


def test_double_quantize_raises():
    params = init_params(tiny_cfg(), jax.random.PRNGKey(0))
    qp = quantize_weights(params)
    with pytest.raises(ValueError, match="already weight-quantized"):
        quantize_weights(qp)


def test_viz_infer_attention_quantized_weights():
    """utils/viz.py's per-layer replay loop handles quantized weights (a
    review pass found it was the one forward path missed by the wdot
    conversion sweep)."""
    from kvcache_factory_tpu.utils.viz import infer_attention

    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = np.random.default_rng(0).integers(0, cfg.vocab_size, 16)
    maps_f = infer_attention(params, cfg, toks)
    maps_q = infer_attention(quantize_weights(params), cfg, toks)
    assert len(maps_q) == cfg.num_hidden_layers
    for mf, mq in zip(maps_f, maps_q):
        assert np.isfinite(mq).all()
        # same softmax structure, quantization-sized drift
        assert np.abs(mq - mf).max() < 0.05 * np.abs(mf).max()


@pytest.mark.parametrize("dp,tp", [(2, 4), (1, 4)])
def test_sharded_quantized_generate_matches_single_device(dp, tp):
    """GSPMD (dp, tp) over quantized weights: q shards like its weight, the
    per-out-channel scale drops the reduced axis (mesh.py::place) — tokens
    must match the unsharded quantized run exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from kvcache_factory_tpu.parallel.mesh import (data_sharding, make_mesh,
                                                   shard_params)
    from kvcache_factory_tpu.runtime import generate

    if jax.device_count() < dp * tp:
        pytest.skip("needs 8 virtual devices")
    cfg = ModelConfig(
        model_type="llama", vocab_size=256, hidden_size=128,
        intermediate_size=256, num_hidden_layers=2, num_attention_heads=8,
        num_key_value_heads=4, head_dim=16, max_position_embeddings=512,
        dtype="float32")
    qp = quantize_weights(init_params(cfg, jax.random.PRNGKey(3),
                                      dtype=jnp.float32))
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=48,
                             window_size=8, kernel_size=7, pooling="maxpool")
    gen_cfg = GenerationConfig(max_new_tokens=6)
    B, S = max(dp, 2), 96
    rng = np.random.default_rng(dp * 10 + tp)
    toks = rng.integers(0, cfg.vocab_size, size=(B, S))
    tl = np.full((B,), S, np.int32)
    cap = 48 + 7

    single = generate(qp, cfg, comp, gen_cfg, jnp.asarray(toks, jnp.int32),
                      jnp.asarray(tl), cache_capacity=cap)
    mesh = make_mesh(ShardingConfig(dp=dp, tp=tp))
    sp = shard_params(qp, mesh, cfg)
    # the scale of a row-parallel weight must be replicated; of a
    # column-parallel weight, sharded with its out columns
    o_s = sp["layers"]["o_proj"]["s"].sharding.spec
    assert tuple(o_s) in ((None, None, None), ()), o_s
    qkv_q = sp["layers"]["qkv_proj"]["q"].sharding.spec
    assert tuple(qkv_q)[-1] == "tp", qkv_q
    toks_s = jax.device_put(jnp.asarray(toks, jnp.int32), data_sharding(mesh))
    tl_s = jax.device_put(jnp.asarray(tl), NamedSharding(mesh, P("dp")))
    with mesh:
        res = generate(sp, cfg, comp, gen_cfg, toks_s, tl_s,
                       cache_capacity=cap)
    np.testing.assert_array_equal(np.asarray(single.tokens),
                                  np.asarray(res.tokens))


def test_ep_sharded_quantized_generate_matches_single_device():
    """MoE expert parallelism over quantized expert weights: q and its
    per-out-channel scale both shard the expert axis over ep (the scale
    keeps every spec entry except the reduced input axis) — tokens must
    match the unsharded quantized run."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from kvcache_factory_tpu.parallel.mesh import make_mesh, shard_params
    from kvcache_factory_tpu.runtime import generate

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = ModelConfig(
        model_type="mixtral", vocab_size=256, hidden_size=128,
        intermediate_size=192, num_hidden_layers=2, num_attention_heads=8,
        num_key_value_heads=4, head_dim=16, max_position_embeddings=512,
        num_local_experts=4, num_experts_per_tok=2, dtype="float32")
    qp = quantize_weights(init_params(cfg, jax.random.PRNGKey(7),
                                      dtype=jnp.float32))
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=48,
                             window_size=8)
    gen_cfg = GenerationConfig(max_new_tokens=5)
    B, S = 2, 96
    rng = np.random.default_rng(17)
    toks = rng.integers(0, cfg.vocab_size, size=(B, S))
    tl = np.full((B,), S, np.int32)
    cap = 48 + 6

    single = generate(qp, cfg, comp, gen_cfg, jnp.asarray(toks, jnp.int32),
                      jnp.asarray(tl), cache_capacity=cap)
    mesh = make_mesh(ShardingConfig(dp=1, tp=2, ep=4))
    sp = shard_params(qp, mesh, cfg)
    gu = sp["layers"]["gate_up_proj"]
    assert gu["q"].sharding.spec[1] == "ep"
    assert gu["s"].sharding.spec[1] == "ep"          # scale rides its expert
    assert tuple(gu["s"].sharding.spec)[-1] == "tp"  # and its out columns
    toks_s = jax.device_put(jnp.asarray(toks, jnp.int32),
                            NamedSharding(mesh, P("dp", None)))
    tl_s = jax.device_put(jnp.asarray(tl), NamedSharding(mesh, P("dp")))
    with mesh:
        res = generate(sp, cfg, comp, gen_cfg, toks_s, tl_s,
                       cache_capacity=cap)
    np.testing.assert_array_equal(np.asarray(single.tokens),
                                  np.asarray(res.tokens))


def test_sp_ring_prefill_quantized_matches_single_device():
    """Sequence-parallel (ring-attention) prefill over quantized weights:
    the engine's sp path must produce the same tokens as the single-device
    quantized run (the ring fold never touches weights, but the sharded
    prefill drives every wdot site under shard_map+GSPMD)."""
    from kvcache_factory_tpu.config import EngineConfig
    from kvcache_factory_tpu.runtime.engine import InferenceEngine

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = tiny_cfg()
    qp = quantize_weights(init_params(cfg, jax.random.PRNGKey(3),
                                      dtype=jnp.float32))
    comp = comp48()
    prompt = np.random.default_rng(21).integers(
        0, cfg.vocab_size, 50).tolist()

    single = InferenceEngine(qp, EngineConfig(
        model=cfg, compression=comp, prefill_buckets=(64,)))
    sp = InferenceEngine(qp, EngineConfig(
        model=cfg, compression=comp, prefill_buckets=(64,),
        sharding=ShardingConfig(sp=4)))
    assert single.generate_ids(prompt, 5) == sp.generate_ids(prompt, 5)


def test_70b_tp8_wq8_lowers_and_compiles_abstract():
    """70B + W8A16 over tp=8: abstract GSPMD lowering with quantized q/s
    leaves, and the per-shard weight footprint halves — the regime where
    weight quantization buys CHIPS, not just tokens/s (70B bf16 needs
    tp=16 on v5e; int8 weights fit tp=8)."""
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P
    from kvcache_factory_tpu.parallel.mesh import make_mesh, param_specs
    from kvcache_factory_tpu.runtime import generate

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = ModelConfig(
        model_type="llama", vocab_size=32000, hidden_size=8192,
        intermediate_size=28672, num_hidden_layers=80,
        num_attention_heads=64, num_key_value_heads=8, head_dim=128,
        max_position_embeddings=8192)
    mesh = make_mesh(ShardingConfig(dp=1, tp=8))
    specs = param_specs(cfg)
    abs_params = jax.eval_shape(
        lambda k: quantize_weights(init_params(cfg, k)),
        jax.random.PRNGKey(0))

    def is_wq(n):
        return isinstance(n, dict) and set(n) == {"q", "s"}

    def attach(path, s):
        node = specs
        for p in path:
            node = node[p.key]
        if is_wq(s):
            s_spec = (P(*node[:-2], None, node[-1]) if len(node) >= 2
                      else node)
            return {"q": jax.ShapeDtypeStruct(
                        s["q"].shape, s["q"].dtype,
                        sharding=NamedSharding(mesh, node)),
                    "s": jax.ShapeDtypeStruct(
                        s["s"].shape, s["s"].dtype,
                        sharding=NamedSharding(mesh, s_spec))}
        return jax.ShapeDtypeStruct(s.shape, s.dtype,
                                    sharding=NamedSharding(mesh, node))

    abs_params = jax.tree_util.tree_map_with_path(attach, abs_params,
                                                  is_leaf=is_wq)
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
    # ~69 GB int8 matmul weights + ~1 GB fp embed/scales over 8 shards
    # (the bf16 test asserts 14-20 GB at the same geometry)
    assert 7 < per_shard_gb < 11, per_shard_gb


def test_engine_quantized_weights_chunked_admission():
    """The batching engine serves quantized weights end to end (chunked
    admission included): tokens match the plain-admission quantized drain."""
    from kvcache_factory_tpu.config import EngineConfig
    from kvcache_factory_tpu.runtime.batching import ContinuousBatchingEngine

    cfg = tiny_cfg()
    qp = quantize_weights(init_params(cfg, jax.random.PRNGKey(7),
                                      dtype=jnp.float32))
    ecfg = EngineConfig(model=cfg, compression=comp48(),
                        prefill_buckets=(64, 128))
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, cfg.vocab_size, size=s).tolist()
               for s in (40, 90, 120)]
    plain = ContinuousBatchingEngine(qp, ecfg, n_slots=2, max_new_cap=5)
    rp = [plain.submit(p, 5) for p in prompts]
    out_p = plain.run()
    chunked = ContinuousBatchingEngine(qp, ecfg, n_slots=2, max_new_cap=5,
                                       prefill_chunk_tokens=32)
    rc = [chunked.submit(p, 5) for p in prompts]
    out_c = chunked.run()
    assert all(out_p[a] == out_c[b] for a, b in zip(rp, rc))


def test_pp_generate_quantized_matches_single_program():
    """pp_generate with quantized weights: stage-sliced q/s leaves flow the
    GPipe loop; tokens match the plain quantized generate."""
    from kvcache_factory_tpu.parallel.pipeline import (make_pp_mesh,
                                                       pp_generate,
                                                       shard_params_pp)
    from kvcache_factory_tpu.runtime import generate

    if jax.device_count() < 2:
        pytest.skip("needs 2 virtual devices")
    cfg = ModelConfig(
        model_type="llama", vocab_size=96, hidden_size=64,
        intermediate_size=128, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=256,
        dtype="float32")
    qp = quantize_weights(init_params(cfg, jax.random.PRNGKey(5),
                                      dtype=jnp.float32))
    comp = comp48()
    rng = np.random.default_rng(9)
    B, S, N = 4, 48, 5
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    tl = jnp.full((B,), S, jnp.int32)
    cap = comp.layer_capacity(cfg.num_hidden_layers, S) + N + 1
    ref = generate(qp, cfg, comp, GenerationConfig(max_new_tokens=N),
                   toks, tl, cache_capacity=cap)
    mesh = make_pp_mesh(2)
    sharded = shard_params_pp(qp, mesh)
    out = jax.jit(lambda p, t, tl_: pp_generate(
        p, cfg, comp, t, tl_, mesh, n_microbatches=2,
        max_new_tokens=N, cache_capacity=cap))(sharded, toks, tl)
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(out))
