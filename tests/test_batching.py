"""Continuous batching + native scheduler tests.

Key property: greedy decoding is per-row deterministic, so the continuous
batcher must produce BIT-IDENTICAL outputs to one-at-a-time generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.config import (CompressionConfig, EngineConfig,
                                        GenerationConfig, ModelConfig)
from kvcache_factory_tpu.models.weights import init_params
from kvcache_factory_tpu.runtime import generate
from kvcache_factory_tpu.runtime.batching import ContinuousBatchingEngine
from kvcache_factory_tpu.runtime.native import (NativeScheduler, PyScheduler,
                                                make_scheduler)


@pytest.mark.parametrize("sched_cls", [PyScheduler, NativeScheduler])
def test_scheduler_lifecycle(sched_cls):
    try:
        s = sched_cls(2, [64, 128])
    except RuntimeError:
        pytest.skip("native scheduler not built")
    assert s.submit(200, 4) == -1  # exceeds largest bucket
    r1 = s.submit(50, 2)
    r2 = s.submit(100, 3)
    r3 = s.submit(10, 1)
    assert r1 > 0 and r2 == r1 + 1

    slot1, rid1, bucket1, mnt1 = s.admit()
    assert rid1 == r1 and bucket1 == 64 and mnt1 == 2
    slot2, rid2, bucket2, _ = s.admit()
    assert rid2 == r2 and bucket2 == 128
    assert s.admit() is None  # no free slot
    assert s.stats() == {"queued": 1, "active": 2, "free": 0, "completed": 0}

    assert not s.step(slot1, False)   # 1/2 tokens
    assert s.step(slot1, False)       # 2/2 -> finished
    assert s.stats()["completed"] == 1
    slot3, rid3, _, _ = s.admit()     # r3 reuses the freed slot
    assert rid3 == r3 and slot3 == slot1
    assert s.step(slot3, True)        # eos finishes immediately
    assert s.step(slot2, True)
    assert s.stats() == {"queued": 0, "active": 0, "free": 2, "completed": 3}


def test_native_scheduler_is_used():
    s = make_scheduler(2, [64])
    assert isinstance(s, NativeScheduler), "native scheduler should build here"


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=512,
        dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    return params, EngineConfig(model=cfg, compression=comp,
                                prefill_buckets=(64, 128))


def test_continuous_batching_matches_sequential(tiny):
    params, ecfg = tiny
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 128, size=n).tolist() for n in (40, 90, 25, 60, 70)]
    max_new = 6

    engine = ContinuousBatchingEngine(params, ecfg, n_slots=2,
                                      max_new_cap=max_new)
    rids = [engine.submit(p, max_new) for p in prompts]
    outputs = engine.run()
    assert set(outputs.keys()) == set(rids)

    # Sequential reference with the same bucketing.
    for rid, prompt in zip(rids, prompts):
        bucket = 64 if len(prompt) <= 64 else 128
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :len(prompt)] = prompt
        res = generate(params, ecfg.model, ecfg.compression,
                       GenerationConfig(max_new_tokens=max_new),
                       jnp.asarray(toks), jnp.asarray([len(prompt)], jnp.int32),
                       cache_capacity=engine.cache_capacity)
        expect = np.asarray(res.tokens)[0, :int(res.num_tokens[0])].tolist()
        assert outputs[rid] == expect, f"request {rid} diverged"

    st = engine.scheduler.stats()
    assert st == {"queued": 0, "active": 0, "free": 2, "completed": 5}


def test_batching_with_eos(tiny):
    params, ecfg = tiny
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 128, size=30).tolist()
    # Find the sequential output, then use its 3rd token as EOS.
    toks = np.zeros((1, 64), np.int32)
    toks[0, :30] = prompt
    res = generate(params, ecfg.model, ecfg.compression,
                   GenerationConfig(max_new_tokens=8),
                   jnp.asarray(toks), jnp.asarray([30], jnp.int32),
                   cache_capacity=150)
    seq = np.asarray(res.tokens)[0].tolist()
    eos = seq[2]

    engine = ContinuousBatchingEngine(params, ecfg, n_slots=2, max_new_cap=8,
                                      eos_token_ids=(eos,))
    rid = engine.submit(prompt, 8)
    outputs = engine.run()
    assert outputs[rid] == seq[:3]  # stops at the EOS token inclusive


def test_native_safetensors_reader(tmp_path):
    import numpy as np
    from safetensors.numpy import save_file
    from kvcache_factory_tpu.runtime.native import SafetensorsFile, _st

    rng = np.random.default_rng(3)
    tensors = {
        "a": rng.normal(size=(17, 33)).astype(np.float32),
        "b": rng.integers(-100, 100, size=(4, 5, 6)).astype(np.int32),
        "c": rng.normal(size=(128,)).astype(np.float16),
    }
    path = str(tmp_path / "test.safetensors")
    save_file(tensors, path)

    f = SafetensorsFile(path)
    assert _st() is not None, "native reader should be built"
    assert set(f.keys()) == set(tensors)
    for name, ref in tensors.items():
        got = f.tensor(name)
        np.testing.assert_array_equal(got, ref)
    f.close()


def test_batching_minference_gqa_matches_sequential(tiny):
    """minference keeps the cache at num_key_value_heads (like fullkv); the
    batched slot pool must allocate the same head count — a per-query-head
    pool silently wrote only the first Hkv head rows of each slot."""
    params, ecfg = tiny
    from dataclasses import replace
    comp = replace(ecfg.compression, method="minference",
                   sparse_prefill=("ashape", 1, 1, 1))  # dense-equivalent
    ecfg2 = EngineConfig(model=ecfg.model, compression=comp,
                         prefill_buckets=ecfg.prefill_buckets)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, 128, size=n).tolist() for n in (40, 90)]
    max_new = 5

    engine = ContinuousBatchingEngine(params, ecfg2, n_slots=2,
                                      max_new_cap=max_new)
    rids = [engine.submit(p, max_new) for p in prompts]
    outputs = engine.run()
    for rid, prompt in zip(rids, prompts):
        bucket = 64 if len(prompt) <= 64 else 128
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :len(prompt)] = prompt
        res = generate(params, ecfg2.model, ecfg2.compression,
                       GenerationConfig(max_new_tokens=max_new),
                       jnp.asarray(toks), jnp.asarray([len(prompt)], jnp.int32),
                       cache_capacity=engine.cache_capacity)
        expect = np.asarray(res.tokens)[0, :int(res.num_tokens[0])].tolist()
        assert outputs[rid] == expect, f"request {rid} diverged"


def _drain_and_compare(params, ecfg, prompts, max_new, n_slots=2,
                       chunk_size=16):
    """Batched drain must be bit-identical to sequential generate() under the
    same config (greedy rows are independent)."""
    engine = ContinuousBatchingEngine(params, ecfg, n_slots=n_slots,
                                      max_new_cap=max_new,
                                      chunk_size=chunk_size)
    rids = [engine.submit(p, max_new) for p in prompts]
    outputs = engine.run()
    for rid, prompt in zip(rids, prompts):
        bucket = 64 if len(prompt) <= 64 else 128
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :len(prompt)] = prompt
        res = generate(params, ecfg.model, ecfg.compression,
                       GenerationConfig(max_new_tokens=max_new),
                       jnp.asarray(toks),
                       jnp.asarray([len(prompt)], jnp.int32),
                       cache_capacity=engine.cache_capacity,
                       quant_cfg=ecfg.quant)
        expect = np.asarray(res.tokens)[0, :int(res.num_tokens[0])].tolist()
        assert outputs[rid] == expect, f"request {rid} diverged"
    return engine


def test_batching_quantized_cache_matches_sequential(tiny):
    """VERDICT round-2 #5: int8-quantized continuous batching, bit-identical
    to sequential quantized generation (the generic pytree slot pool)."""
    params, ecfg = tiny
    from kvcache_factory_tpu.config import QuantConfig
    rng = np.random.default_rng(17)
    prompts = [rng.integers(0, 128, size=n).tolist() for n in (40, 90, 55)]
    for nbits in (8, 4):
        qcfg = EngineConfig(model=ecfg.model, compression=ecfg.compression,
                            prefill_buckets=ecfg.prefill_buckets,
                            quant=QuantConfig(nbits=nbits, q_group_size=16))
        _drain_and_compare(params, qcfg, prompts, max_new=5)


def test_batching_decode_evict_matches_sequential(tiny):
    """EvictingKVCache rows follow the same [L, B, ...] layout rule; the
    drain must match sequential decode-evicting generation."""
    params, ecfg = tiny
    from dataclasses import replace
    comp = replace(ecfg.compression, decode_evict=True, eviction_recent=8)
    cfg = EngineConfig(model=ecfg.model, compression=comp,
                       prefill_buckets=ecfg.prefill_buckets)
    rng = np.random.default_rng(19)
    prompts = [rng.integers(0, 128, size=n).tolist() for n in (40, 90, 30)]
    _drain_and_compare(params, cfg, prompts, max_new=6)


def test_batching_think_packed_matches_sequential(tiny):
    """ThinKCache (packed pruned/dense split) rides the generic slot pool."""
    params, ecfg = tiny
    from dataclasses import replace
    comp = replace(ecfg.compression, method="think", think_packed=True,
                   pruning_ratio=0.4, recent_size=8)
    cfg = EngineConfig(model=ecfg.model, compression=comp,
                       prefill_buckets=ecfg.prefill_buckets)
    rng = np.random.default_rng(23)
    prompts = [rng.integers(0, 128, size=n).tolist() for n in (40, 70)]
    _drain_and_compare(params, cfg, prompts, max_new=5)


def test_batching_eos_early_exit_saves_steps(tiny):
    """VERDICT round-2 #9: a chunk whose rows all hit EOS early must exit the
    in-graph loop instead of burning chunk_size-1 garbage steps."""
    params, ecfg = tiny
    rng = np.random.default_rng(29)
    prompt = rng.integers(0, 128, size=30).tolist()
    # sequential run to find the 3rd emitted token -> use it as EOS
    toks = np.zeros((1, 64), np.int32)
    toks[0, :30] = prompt
    res = generate(params, ecfg.model, ecfg.compression,
                   GenerationConfig(max_new_tokens=16),
                   jnp.asarray(toks), jnp.asarray([30], jnp.int32),
                   cache_capacity=150)
    seq = np.asarray(res.tokens)[0].tolist()
    # EOS = an early token whose FIRST occurrence is at index >= 2 (else the
    # run finishes at the prefill token and no chunk steps are exercised)
    stop = next(i for i in range(2, len(seq)) if seq[i] not in seq[:i])
    eos = seq[stop]

    engine = ContinuousBatchingEngine(params, ecfg, n_slots=2, max_new_cap=16,
                                      eos_token_ids=(eos,), chunk_size=16)
    rid = engine.submit(prompt, 16)
    outputs = engine.run()
    assert outputs[rid] == seq[:stop + 1]
    # first token comes from prefill; the chunk needed `stop` more steps, and
    # the EOS-aware loop must stop right there instead of burning all 16
    assert engine.steps_executed == stop, engine.steps_executed
