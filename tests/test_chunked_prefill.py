"""Chunked prefill parity vs the one-shot prefill (exact semantics claim).

Oracle: llama.prefill (the established, HF-parity-tested path) — chunked
prefill must produce equivalent logits, caches, and downstream generations
for every supported policy family, at any chunk size.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.config import (CompressionConfig, ModelConfig,
                                        QuantConfig)
from kvcache_factory_tpu.models import llama
from kvcache_factory_tpu.models.chunked_prefill import prefill_chunked
from kvcache_factory_tpu.models.weights import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=4,
                      head_dim=16, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    B, S = 2, 128
    toks = jnp.asarray(np.random.default_rng(3).integers(0, 128, (B, S)),
                       jnp.int32)
    tl = jnp.asarray([S, 101], jnp.int32)
    return cfg, params, toks, tl


METHODS = [
    dict(method="snapkv", max_capacity_prompt=48, window_size=8,
         kernel_size=7, pooling="maxpool"),
    dict(method="pyramidkv", max_capacity_prompt=48, window_size=8),
    dict(method="adakv", max_capacity_prompt=48, window_size=8),
    dict(method="streamingllm", max_capacity_prompt=48, window_size=44),
    dict(method="l2norm", max_capacity_prompt=48),
    dict(method="random", max_capacity_prompt=48, window_size=8),
    dict(method="fullkv", max_capacity_prompt=512),
    dict(method="cam", max_capacity_prompt=48, window_size=8),
    dict(method="think", max_capacity_prompt=48, window_size=8,
         pruning_ratio=0.4),
    dict(method="snapkv", max_capacity_prompt=48, window_size=8,
         group_reduce="mean"),
    # h2o (round 5): the full-q store reproduces the reference's
    # non-causal scoring exactly (module docstring)
    dict(method="h2o", max_capacity_prompt=48, window_size=8),
]


@pytest.mark.parametrize("kw", METHODS,
                         ids=[m["method"] + m.get("group_reduce", "")
                              for m in METHODS])
def test_chunked_matches_oneshot(setup, kw):
    cfg, params, toks, tl = setup
    comp = CompressionConfig(**kw)
    rng = jax.random.PRNGKey(5)
    ref = llama.prefill(params, cfg, comp, toks, tl, cache_capacity=160,
                        rng=rng, attn_backend="xla")
    got = prefill_chunked(params, cfg, comp, toks, tl, cache_capacity=160,
                          chunk_size=32, rng=rng)
    np.testing.assert_allclose(np.asarray(got.logits_last),
                               np.asarray(ref.logits_last),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(got.cache.lengths),
                                  np.asarray(ref.cache.lengths))
    np.testing.assert_allclose(np.asarray(got.cache.k),
                               np.asarray(ref.cache.k), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.cache.v),
                               np.asarray(ref.cache.v), rtol=2e-5, atol=2e-5)

    # downstream decode parity: 4 greedy tokens from each cache
    def decode4(pre):
        tok = jnp.argmax(pre.logits_last, -1).astype(jnp.int32)
        cache, out = pre.cache, []
        for _ in range(4):
            logits, cache = llama.decode_step(params, cfg, tok, cache,
                                              attn_backend="xla")
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            out.append(np.asarray(tok))
        return np.stack(out)

    np.testing.assert_array_equal(decode4(got), decode4(ref))


@pytest.mark.parametrize("chunk", [16, 64, 128])
def test_chunk_size_invariance(setup, chunk):
    """Any chunk size (including one chunk == the whole prompt) gives the
    same compressed cache."""
    cfg, params, toks, tl = setup
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=48,
                             window_size=8, kernel_size=7, pooling="maxpool")
    base = prefill_chunked(params, cfg, comp, toks, tl, cache_capacity=160,
                           chunk_size=32)
    got = prefill_chunked(params, cfg, comp, toks, tl, cache_capacity=160,
                          chunk_size=chunk)
    np.testing.assert_allclose(np.asarray(got.cache.k),
                               np.asarray(base.cache.k),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(got.cache.lengths),
                                  np.asarray(base.cache.lengths))


def test_short_prompt_compression_matches_oneshot(setup):
    """Prompts shorter than the trailing-query store (WK = max(window, 32))
    but longer than max_capacity_prompt DO compress; the store placement
    must put every row at its global position (round-4 advisor finding: a
    straight row-0 update shifted rows by WK - true_len, silently corrupting
    the compressed cache for prompt lengths in (capacity, 32))."""
    cfg, params, _, _ = setup
    toks = jnp.asarray(np.random.default_rng(11).integers(0, 128, (2, 64)),
                       jnp.int32)
    tl = jnp.asarray([20, 27], jnp.int32)  # < WK=32, > cap=12
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=12,
                             window_size=8, kernel_size=7, pooling="maxpool")
    ref = llama.prefill(params, cfg, comp, toks, tl, cache_capacity=64,
                        attn_backend="xla")
    got = prefill_chunked(params, cfg, comp, toks, tl, cache_capacity=64,
                          chunk_size=32)
    np.testing.assert_array_equal(np.asarray(got.cache.lengths),
                                  np.asarray(ref.cache.lengths))
    np.testing.assert_allclose(np.asarray(got.cache.k),
                               np.asarray(ref.cache.k), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.cache.v),
                               np.asarray(ref.cache.v), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.logits_last),
                               np.asarray(ref.logits_last),
                               rtol=2e-5, atol=2e-5)


def test_chunked_quant_cache(setup):
    """finalize builds the quantized cache via the shared tail."""
    cfg, params, toks, tl = setup
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=48,
                             window_size=8)
    q8 = QuantConfig(nbits=8, q_group_size=16)
    ref = llama.prefill(params, cfg, comp, toks, tl, cache_capacity=160,
                        quant=q8, attn_backend="xla")
    got = prefill_chunked(params, cfg, comp, toks, tl, cache_capacity=160,
                          chunk_size=32, quant=q8)
    assert type(got.cache).__name__ == type(ref.cache).__name__
    np.testing.assert_array_equal(np.asarray(got.cache.lengths),
                                  np.asarray(ref.cache.lengths))


def test_chunked_sliding_window(setup):
    """Mistral geometry: the chunk attention applies the sliding window."""
    import dataclasses
    cfg, params, toks, tl = setup
    cfg_sw = dataclasses.replace(cfg, model_type="mistral", sliding_window=24)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=48,
                             window_size=8)
    ref = llama.prefill(params, cfg_sw, comp, toks, tl, cache_capacity=160,
                        attn_backend="xla")
    got = prefill_chunked(params, cfg_sw, comp, toks, tl, cache_capacity=160,
                          chunk_size=32)
    np.testing.assert_allclose(np.asarray(got.logits_last),
                               np.asarray(ref.logits_last),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.cache.k),
                               np.asarray(ref.cache.k), rtol=2e-5, atol=2e-5)


def test_chunked_rejects_sparse(setup):
    cfg, params, toks, tl = setup
    with pytest.raises(NotImplementedError):
        prefill_chunked(params, cfg,
                        CompressionConfig(method="minference",
                                          sparse_prefill=("ashape", 1, 1, 4)),
                        toks, tl, cache_capacity=160, chunk_size=32)


# ---------------------------------------------------------------------------
# Continuous-batching chunked admission
# ---------------------------------------------------------------------------

def test_batching_chunked_admission_matches_oneshot():
    """prefill_chunk_tokens interleaves prompt chunks with decode chunks —
    outputs must equal the one-shot-admission drain exactly."""
    from kvcache_factory_tpu.config import EngineConfig
    from kvcache_factory_tpu.runtime.batching import ContinuousBatchingEngine

    cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=4,
                      head_dim=16, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    ecfg = EngineConfig(model=cfg, compression=comp,
                        prefill_buckets=(64, 128))
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, 128, size=s).tolist()
               for s in (40, 90, 120, 55, 70)]
    max_new = 6

    plain = ContinuousBatchingEngine(params, ecfg, n_slots=2,
                                     max_new_cap=max_new)
    rids_p = [plain.submit(p, max_new) for p in prompts]
    out_p = plain.run()

    chunked = ContinuousBatchingEngine(params, ecfg, n_slots=2,
                                       max_new_cap=max_new,
                                       prefill_chunk_tokens=32)
    rids_c = [chunked.submit(p, max_new) for p in prompts]
    out_c = chunked.run()

    for rp, rc in zip(rids_p, rids_c):
        assert out_p[rp] == out_c[rc], (out_p[rp], out_c[rc])


def test_concurrent_admissions_share_one_dispatch():
    """N prompts of one bucket pending together advance in ONE chunk_step
    dispatch per drain iteration (per-row c0), not N serial B=1 dispatches
    — and outputs still match the one-shot-admission drain exactly."""
    from kvcache_factory_tpu.config import EngineConfig
    from kvcache_factory_tpu.runtime.batching import ContinuousBatchingEngine

    cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=4,
                      head_dim=16, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    ecfg = EngineConfig(model=cfg, compression=comp, prefill_buckets=(128,))
    rng = np.random.default_rng(23)
    prompts = [rng.integers(0, 128, size=s).tolist()
               for s in (120, 100, 110, 90)]
    max_new = 5

    plain = ContinuousBatchingEngine(params, ecfg, n_slots=4,
                                     max_new_cap=max_new)
    rids_p = [plain.submit(p, max_new) for p in prompts]
    out_p = plain.run()

    eng = ContinuousBatchingEngine(params, ecfg, n_slots=4,
                                   max_new_cap=max_new,
                                   prefill_chunk_tokens=32)
    rids = [eng.submit(p, max_new) for p in prompts]
    out = eng.run()
    for rp, rc in zip(rids_p, rids):
        assert out_p[rp] == out[rc]
    # all four prompts admit together (4 free slots): every drain iteration
    # advances ALL of them in one dispatch, so dispatches ≈ the LONGEST
    # prompt's chunk count (4), not the sum (14)
    assert eng.prefill_chunks_executed == sum(
        -(-len(p) // 32) for p in prompts)
    assert eng.prefill_chunk_dispatches <= 5, eng.prefill_chunk_dispatches


def test_chunk_pool_shrinks_after_concurrency_burst():
    """A pool grown for a concurrency burst HALVES back once live rows fit
    in half of it — otherwise every later admission in the bucket would
    pay the peak batch's full per-chunk compute (inert tl=0 rows still
    run all layers' matmuls).  Outputs must stay exact through the
    compaction, including for rows still mid-prefill when the shrink
    happens."""
    from kvcache_factory_tpu.config import EngineConfig
    from kvcache_factory_tpu.runtime.batching import ContinuousBatchingEngine

    cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=4,
                      head_dim=16, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    ecfg = EngineConfig(model=cfg, compression=comp, prefill_buckets=(128,))
    rng = np.random.default_rng(31)
    # 4 long prompts burst together (pool doubles 1->2->4); the straggler
    # waits for a slot (n_slots=4) and so admits alone afterwards
    burst = [rng.integers(0, 128, size=s).tolist()
             for s in (120, 110, 100, 90)]
    straggler = rng.integers(0, 128, size=40).tolist()
    max_new = 5

    plain = ContinuousBatchingEngine(params, ecfg, n_slots=4,
                                     max_new_cap=max_new)
    rids_p = [plain.submit(p, max_new) for p in burst + [straggler]]
    out_p = plain.run()

    eng = ContinuousBatchingEngine(params, ecfg, n_slots=4,
                                   max_new_cap=max_new,
                                   prefill_chunk_tokens=32)
    rids = [eng.submit(p, max_new) for p in burst + [straggler]]
    out = eng.run()
    for rp, rc in zip(rids_p, rids):
        assert out_p[rp] == out[rc], (out_p[rp], out[rc])
    # the burst grew the pool to 4; once only the straggler (and then
    # nothing) remained live it halved back to 1
    assert eng._chunk_groups[128]["P"] == 1, eng._chunk_groups[128]["P"]


def test_chunk_pool_shrink_preserves_midflight_rows():
    """Shrink compacts live rows mid-prefill: two long prompts plus two
    short ones admit together (pool = 4); the short ones finish first, the
    pool halves to 2 while the long prompts still have chunks left, and
    their outputs stay exact."""
    from kvcache_factory_tpu.config import EngineConfig
    from kvcache_factory_tpu.runtime.batching import ContinuousBatchingEngine

    cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=4,
                      head_dim=16, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    ecfg = EngineConfig(model=cfg, compression=comp, prefill_buckets=(128,))
    rng = np.random.default_rng(37)
    prompts = [rng.integers(0, 128, size=s).tolist()
               for s in (128, 120, 33, 34)]
    max_new = 5

    plain = ContinuousBatchingEngine(params, ecfg, n_slots=4,
                                     max_new_cap=max_new)
    rids_p = [plain.submit(p, max_new) for p in prompts]
    out_p = plain.run()

    eng = ContinuousBatchingEngine(params, ecfg, n_slots=4,
                                   max_new_cap=max_new,
                                   prefill_chunk_tokens=32)
    rids = [eng.submit(p, max_new) for p in prompts]
    out = eng.run()
    for rp, rc in zip(rids_p, rids):
        assert out_p[rp] == out[rc], (out_p[rp], out[rc])
    assert eng._chunk_groups[128]["P"] == 2, eng._chunk_groups[128]["P"]


def test_batching_chunked_under_mesh_matches_single_device():
    """Chunked admission composes with a (dp, tp) mesh (round-5 headline):
    chunk buffers shard over tp kv-heads / dp rows and outputs are
    token-exact vs the single-device chunked drain AND the sharded one-shot
    drain."""
    from kvcache_factory_tpu.config import EngineConfig, ShardingConfig
    from kvcache_factory_tpu.runtime.batching import ContinuousBatchingEngine

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=4,
                      head_dim=16, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    rng = np.random.default_rng(29)
    prompts = [rng.integers(0, 128, size=s).tolist()
               for s in (120, 100, 90, 60)]
    max_new = 5

    def drain(sharding, chunk):
        ecfg = EngineConfig(model=cfg, compression=comp,
                            prefill_buckets=(64, 128), sharding=sharding)
        eng = ContinuousBatchingEngine(params, ecfg, n_slots=2,
                                       max_new_cap=max_new,
                                       prefill_chunk_tokens=chunk)
        rids = [eng.submit(p, max_new) for p in prompts]
        out = eng.run()
        return [out[r] for r in rids]

    single = drain(ShardingConfig(), 32)
    mesh24 = drain(ShardingConfig(dp=2, tp=4), 32)
    assert mesh24 == single
    oneshot24 = drain(ShardingConfig(dp=2, tp=4), 0)
    assert oneshot24 == single


def test_batching_chunked_quant_under_mesh():
    """Chunked admission + the quantized cache + a (dp, tp) mesh compose:
    finalize's quant build partitions under GSPMD and the drained tokens
    match the single-device chunked drain."""
    from kvcache_factory_tpu.config import (EngineConfig, QuantConfig,
                                            ShardingConfig)
    from kvcache_factory_tpu.runtime.batching import ContinuousBatchingEngine

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=4,
                      head_dim=16, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    rng = np.random.default_rng(37)
    prompts = [rng.integers(0, 128, size=s).tolist() for s in (120, 90)]

    def drain(sharding):
        ecfg = EngineConfig(model=cfg, compression=comp,
                            prefill_buckets=(128,), sharding=sharding,
                            quant=QuantConfig(nbits=8, q_group_size=16))
        eng = ContinuousBatchingEngine(params, ecfg, n_slots=2,
                                       max_new_cap=5,
                                       prefill_chunk_tokens=32)
        rids = [eng.submit(p, 5) for p in prompts]
        out = eng.run()
        return [out[r] for r in rids]

    assert drain(ShardingConfig(dp=2, tp=2)) == drain(ShardingConfig())


def test_batching_chunked_prefix_under_mesh():
    """Prefix caching works under the mesh too: snapshots carry their
    shardings and resumed admissions skip the prefix chunks."""
    from kvcache_factory_tpu.config import EngineConfig, ShardingConfig
    from kvcache_factory_tpu.runtime.batching import ContinuousBatchingEngine

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=4,
                      head_dim=16, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    rng = np.random.default_rng(31)
    system = rng.integers(0, 128, size=70).tolist()
    prompts = [system + rng.integers(0, 128, size=n).tolist()
               for n in (40, 50, 45)]

    def drain(sharding, register):
        ecfg = EngineConfig(model=cfg, compression=comp,
                            prefill_buckets=(128,), sharding=sharding)
        eng = ContinuousBatchingEngine(params, ecfg, n_slots=2,
                                       max_new_cap=5,
                                       prefill_chunk_tokens=32)
        if register:
            eng.cache_prefix(system)
        rids = [eng.submit(p, 5) for p in prompts]
        out = eng.run()
        return [out[r] for r in rids], eng.prefill_chunks_executed

    base, _ = drain(ShardingConfig(), False)
    got, n_mesh = drain(ShardingConfig(dp=2, tp=2), True)
    assert got == base
    plain_mesh, n_plain = drain(ShardingConfig(dp=2, tp=2), False)
    assert plain_mesh == base
    assert n_mesh < n_plain  # some prefix chunks were skipped


def test_batching_chunked_rejects_bad_bucket():
    from kvcache_factory_tpu.config import EngineConfig
    from kvcache_factory_tpu.runtime.batching import ContinuousBatchingEngine

    cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=4,
                      head_dim=16, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg,
        compression=CompressionConfig(method="snapkv",
                                      max_capacity_prompt=32, window_size=8),
        prefill_buckets=(96,))
    with pytest.raises(ValueError):
        ContinuousBatchingEngine(params, ecfg, prefill_chunk_tokens=64)


def test_chunked_prefill_kernel_path_matches_xla(setup):
    """chunk_step's flash chunk-mode path (patched to interpret on CPU)
    must match the XLA chunk attention end to end."""
    from unittest import mock
    import functools
    import kvcache_factory_tpu.ops.kernels.flash_prefill as fp

    cfg, params, toks, tl = setup
    import dataclasses
    cfg128 = dataclasses.replace(cfg, num_attention_heads=4,
                                 num_key_value_heads=2, head_dim=128,
                                 hidden_size=512, intermediate_size=768)
    params128 = init_params(cfg128, jax.random.PRNGKey(4),
                            dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=48,
                             window_size=8, kernel_size=7, pooling="maxpool")
    ref = prefill_chunked(params128, cfg128, comp, toks, tl,
                          cache_capacity=160, chunk_size=32)  # XLA path
    orig = fp.flash_prefill_attention_batched
    calls = []

    def interp(*a, **kw):
        calls.append(1)
        kw["interpret"] = True
        return orig(*a, **kw)

    jax.clear_caches()  # the ref call cached the XLA-path trace
    with mock.patch.object(jax, "default_backend", return_value="tpu"), \
            mock.patch.object(fp, "flash_prefill_attention_batched", interp):
        got = prefill_chunked(params128, cfg128, comp, toks, tl,
                              cache_capacity=160, chunk_size=32)
    assert calls, "kernel chunk path not taken"
    np.testing.assert_allclose(np.asarray(got.logits_last),
                               np.asarray(ref.logits_last),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.cache.k),
                               np.asarray(ref.cache.k), rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got.cache.lengths),
                                  np.asarray(ref.cache.lengths))


def test_prefix_cache_resume_matches_and_skips_chunks():
    """Registered shared prefixes snapshot their chunk state once and later
    admissions resume from it: identical outputs, fewer chunks executed."""
    from kvcache_factory_tpu.config import EngineConfig
    from kvcache_factory_tpu.runtime.batching import ContinuousBatchingEngine

    cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=4,
                      head_dim=16, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    ecfg = EngineConfig(model=cfg, compression=comp, prefill_buckets=(128,))
    rng = np.random.default_rng(13)
    system = rng.integers(0, 128, size=70).tolist()  # 2 chunks of 32 cached
    prompts = [system + rng.integers(0, 128, size=n).tolist()
               for n in (40, 50, 45)]
    max_new = 5

    def drain(register):
        # n_slots=1 serializes admissions so the snapshot exists before the
        # later prompts admit (with concurrent slots, a prompt admitted in
        # the same scheduler round as the snapshotting one misses — by
        # design: the cache never blocks admission)
        eng = ContinuousBatchingEngine(params, ecfg, n_slots=1,
                                       max_new_cap=max_new,
                                       prefill_chunk_tokens=32)
        if register:
            eng.cache_prefix(system)
        rids = [eng.submit(p, max_new) for p in prompts]
        out = eng.run()
        return [out[r] for r in rids], eng.prefill_chunks_executed

    plain, n_plain = drain(register=False)
    cached, n_cached = drain(register=True)
    assert cached == plain
    # the 64-token (2-chunk) prefix is skipped for the 2nd and 3rd prompts
    assert n_cached <= n_plain - 4, (n_cached, n_plain)


def test_prefix_cache_byte_budget_evicts_oldest():
    """The prefix-snapshot LRU is bounded in BYTES: a larger-bucket snapshot
    evicts smaller ones to stay under budget, and outputs stay correct when
    an evicted prefix's chunks must re-execute (round-4 verdict: the old
    4-entry cap pinned ~6 GB of HBM at 32k buckets)."""
    from kvcache_factory_tpu.config import EngineConfig
    from kvcache_factory_tpu.runtime.batching import ContinuousBatchingEngine

    cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=4,
                      head_dim=16, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    ecfg = EngineConfig(model=cfg, compression=comp,
                        prefill_buckets=(64, 128))
    rng = np.random.default_rng(17)
    pref_small = rng.integers(0, 128, size=33).tolist()  # 64-bucket prompts
    pref_large = rng.integers(0, 128, size=70).tolist()  # 128-bucket prompts

    def snap_bytes(bucket):
        # state = kbuf + vbuf ([L, 1, Hkv, S, D] fp32 each) + qwin + x_last
        kv = 2 * 2 * 1 * 4 * bucket * 16 * 4
        return kv + 2 * 1 * 8 * 32 * 16 * 4 + 128 * 4

    # budget admits the small snapshot OR the large one, never both
    eng = ContinuousBatchingEngine(
        params, ecfg, n_slots=1, max_new_cap=4, prefill_chunk_tokens=32,
        prefix_cache_bytes=snap_bytes(128) + snap_bytes(64) // 2)
    eng.cache_prefix(pref_small)
    eng.cache_prefix(pref_large)

    # tails are >= 31 tokens so the resume-point cap (true_len - 32) stays
    # past the first chunk boundary and snapshots actually get taken
    eng.submit(pref_small + rng.integers(0, 128, size=31).tolist(), 4)
    eng.run()
    assert len(eng._prefix_states) == 1  # small snapshot cached

    eng.submit(pref_large + rng.integers(0, 128, size=20).tolist(), 4)
    eng.run()
    # the large-bucket snapshot evicted the small one to stay under budget
    assert len(eng._prefix_states) == 1
    ((bucket, _),) = eng._prefix_states.keys()
    assert bucket == 128
    assert eng._prefix_state_bytes() <= eng._prefix_cache_bytes

    # evicted prefix re-executes its chunks and still decodes correctly
    before = eng.prefill_chunks_executed
    tail = rng.integers(0, 128, size=31).tolist()
    rid = eng.submit(pref_small + tail, 4)
    out = eng.run()
    # both chunks re-ran (a live snapshot would have skipped the first)
    assert eng.prefill_chunks_executed - before == 2
    plain = ContinuousBatchingEngine(params, ecfg, n_slots=1, max_new_cap=4)
    rid_p = plain.submit(pref_small + tail, 4)
    assert plain.run()[rid_p] == out[rid]


def test_prefix_cache_requires_chunked_admission():
    from kvcache_factory_tpu.config import EngineConfig
    from kvcache_factory_tpu.runtime.batching import ContinuousBatchingEngine

    cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=4,
                      head_dim=16, max_position_embeddings=512,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg,
        compression=CompressionConfig(method="snapkv",
                                      max_capacity_prompt=32, window_size=8),
        prefill_buckets=(128,))
    eng = ContinuousBatchingEngine(params, ecfg)
    with pytest.raises(ValueError):
        eng.cache_prefix([1, 2, 3])
