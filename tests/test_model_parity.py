"""Logit & generation parity vs HuggingFace transformers (tiny random models).

The reference defers all modeling to HF (run_longbench.py:386) — our from-
scratch JAX forward must match HF's Llama/Mistral numerics.  Strategy: build
tiny randomly-initialized HF models locally (no downloads), convert their
state_dict, and compare fp32 logits and greedy continuations.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.config import CompressionConfig, GenerationConfig, ModelConfig
from kvcache_factory_tpu.models import llama as jl
from kvcache_factory_tpu.models.weights import params_from_state_dict
from kvcache_factory_tpu.runtime import generate


def tiny_hf_llama(seed=0, sliding_window=None):
    from transformers import LlamaConfig, LlamaForCausalLM, MistralConfig, MistralForCausalLM
    torch.manual_seed(seed)
    kw = dict(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, attention_bias=False,
    )
    if sliding_window is None:
        hf_cfg = LlamaConfig(**kw)
        model = LlamaForCausalLM(hf_cfg)
    else:
        hf_cfg = MistralConfig(**kw, sliding_window=sliding_window)
        model = MistralForCausalLM(hf_cfg)
    model.eval()
    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32"})
    params = params_from_state_dict(cfg, model.state_dict(), jnp.float32)
    return model, cfg, params


FULL = CompressionConfig(method="fullkv")


@pytest.fixture(scope="module")
def llama_setup():
    return tiny_hf_llama(0)


def test_prefill_logits_match_hf(llama_setup):
    model, cfg, params = llama_setup
    B, S = 2, 48
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, size=(B, S))
    with torch.no_grad():
        hf_logits = model(torch.tensor(toks)).logits.numpy()

    res = jl.prefill(params, cfg, FULL, jnp.asarray(toks, jnp.int32),
                     jnp.asarray([S, S], jnp.int32), cache_capacity=S,
                     return_all_logits=True)
    np.testing.assert_allclose(np.asarray(res.all_logits), hf_logits,
                               rtol=2e-4, atol=2e-4)


def test_prefill_right_padding_invariant(llama_setup):
    model, cfg, params = llama_setup
    S, S_pad = 40, 64
    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    toks_padded = np.pad(toks, ((0, 0), (0, S_pad - S)))

    exact = jl.prefill(params, cfg, FULL, jnp.asarray(toks, jnp.int32),
                       jnp.asarray([S], jnp.int32), cache_capacity=S)
    padded = jl.prefill(params, cfg, FULL, jnp.asarray(toks_padded, jnp.int32),
                        jnp.asarray([S], jnp.int32), cache_capacity=S_pad)
    np.testing.assert_allclose(np.asarray(exact.logits_last),
                               np.asarray(padded.logits_last), rtol=1e-5, atol=1e-5)


def test_greedy_generation_matches_hf(llama_setup):
    model, cfg, params = llama_setup
    S, new = 32, 12
    rng = np.random.default_rng(2)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    with torch.no_grad():
        hf_out = model.generate(torch.tensor(toks), max_new_tokens=new,
                                do_sample=False, num_beams=1,
                                pad_token_id=0, eos_token_id=None)
    hf_new = hf_out[0, S:].numpy()

    gen_cfg = GenerationConfig(max_new_tokens=new, eos_token_ids=())
    res = generate(params, cfg, FULL, gen_cfg, jnp.asarray(toks, jnp.int32),
                   jnp.asarray([S], jnp.int32), cache_capacity=S + new)
    np.testing.assert_array_equal(np.asarray(res.tokens)[0], hf_new)
    assert int(res.num_tokens[0]) == new


def test_mistral_sliding_window_matches_hf():
    model, cfg, params = tiny_hf_llama(3, sliding_window=16)
    assert cfg.sliding_window == 16
    B, S = 1, 48  # long enough that the window matters
    rng = np.random.default_rng(3)
    toks = rng.integers(0, cfg.vocab_size, size=(B, S))
    with torch.no_grad():
        hf_logits = model(torch.tensor(toks)).logits.numpy()
    res = jl.prefill(params, cfg, FULL, jnp.asarray(toks, jnp.int32),
                     jnp.asarray([S], jnp.int32), cache_capacity=S,
                     return_all_logits=True)
    np.testing.assert_allclose(np.asarray(res.all_logits), hf_logits,
                               rtol=2e-4, atol=2e-4)


def test_generate_with_snapkv_long_prompt(llama_setup):
    """Compression path end-to-end: budget < prompt length, decode proceeds."""
    model, cfg, params = llama_setup
    S, new, cap = 96, 8, 32
    rng = np.random.default_rng(4)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=cap,
                             window_size=8, kernel_size=7, pooling="maxpool")
    gen_cfg = GenerationConfig(max_new_tokens=new, eos_token_ids=())
    res = generate(params, cfg, comp, gen_cfg, jnp.asarray(toks, jnp.int32),
                   jnp.asarray([S], jnp.int32), cache_capacity=cap + new)
    assert int(res.num_tokens[0]) == new
    # cache lengths: cap after prefill + (new - 1) decode appends (the final
    # emitted token is never fed back, so its KV is not appended)
    lens = np.asarray(res.cache.lengths)
    assert np.all(lens == cap + new - 1)
    # positions advance past the compressed length (reference _seen_tokens sync)
    assert int(res.cache.positions[0]) == S + new - 1


def test_generate_with_snapkv_short_prompt_matches_fullkv(llama_setup):
    """Prompt below budget -> no-compress branch -> identical to fullkv."""
    model, cfg, params = llama_setup
    S, new = 24, 8
    rng = np.random.default_rng(5)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    gen_cfg = GenerationConfig(max_new_tokens=new, eos_token_ids=())
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=64,
                             window_size=8)
    full = generate(params, cfg, FULL, gen_cfg, jnp.asarray(toks, jnp.int32),
                    jnp.asarray([S], jnp.int32), cache_capacity=S + new)
    snap = generate(params, cfg, comp, gen_cfg, jnp.asarray(toks, jnp.int32),
                    jnp.asarray([S], jnp.int32), cache_capacity=S + new)
    np.testing.assert_array_equal(np.asarray(full.tokens), np.asarray(snap.tokens))


def test_eos_stops_generation(llama_setup):
    model, cfg, params = llama_setup
    S = 16
    rng = np.random.default_rng(6)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    # Find what greedy emits, then declare that token as EOS.
    gen_cfg0 = GenerationConfig(max_new_tokens=4, eos_token_ids=())
    first = generate(params, cfg, FULL, gen_cfg0, jnp.asarray(toks, jnp.int32),
                     jnp.asarray([S], jnp.int32), cache_capacity=S + 4)
    eos_tok = int(np.asarray(first.tokens)[0, 1])
    gen_cfg = GenerationConfig(max_new_tokens=8, eos_token_ids=(eos_tok,))
    res = generate(params, cfg, FULL, gen_cfg, jnp.asarray(toks, jnp.int32),
                   jnp.asarray([S], jnp.int32), cache_capacity=S + 8)
    assert int(res.num_tokens[0]) == 2  # first token + the EOS token
    assert np.all(np.asarray(res.tokens)[0, 2:] == 0)


def test_sampling_modes(llama_setup):
    from kvcache_factory_tpu.config import GenerationConfig
    model, cfg, params = llama_setup
    S, new = 24, 6
    rng = np.random.default_rng(9)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))

    def run(gen_cfg, seed=0):
        import jax
        res = generate(params, cfg, FULL, gen_cfg,
                       jnp.asarray(toks, jnp.int32),
                       jnp.asarray([S], jnp.int32), cache_capacity=S + new,
                       rng=jax.random.PRNGKey(seed))
        return np.asarray(res.tokens)[0]

    greedy = run(GenerationConfig(max_new_tokens=new))
    # temperature ~0 sampling converges to greedy
    cold = run(GenerationConfig(max_new_tokens=new, do_sample=True,
                                temperature=1e-4))
    np.testing.assert_array_equal(greedy, cold)
    # sampling with different seeds explores (usually differs)
    hot1 = run(GenerationConfig(max_new_tokens=new, do_sample=True,
                                temperature=2.0), seed=1)
    hot2 = run(GenerationConfig(max_new_tokens=new, do_sample=True,
                                temperature=2.0), seed=2)
    assert hot1.shape == (new,) and hot2.shape == (new,)
    # top-k=1 is greedy regardless of temperature
    k1 = run(GenerationConfig(max_new_tokens=new, do_sample=True,
                              temperature=5.0, top_k=1), seed=3)
    np.testing.assert_array_equal(greedy, k1)


def test_llama3_rope_scaling_matches_hf():
    """Llama-3.1-style rope_scaling logits parity vs HF."""
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(13)
    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64},
        tie_word_embeddings=False, attention_bias=False)
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32"})
    assert cfg.rope_scaling is not None and cfg.rope_scaling[0] == "llama3"
    params = params_from_state_dict(cfg, model.state_dict(), jnp.float32)

    S = 96  # beyond original_max to exercise the scaled frequencies
    rng = np.random.default_rng(13)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    with torch.no_grad():
        hf_logits = model(torch.tensor(toks)).logits.numpy()
    res = jl.prefill(params, cfg, FULL, jnp.asarray(toks, jnp.int32),
                     jnp.asarray([S], jnp.int32), cache_capacity=S,
                     return_all_logits=True)
    np.testing.assert_allclose(np.asarray(res.all_logits), hf_logits,
                               rtol=3e-4, atol=3e-4)


# ---------------------------------------------------------------------------
# Mixtral (sparse MoE) — capability extension; the reference lists Mixtral as
# an unchecked TODO (README.md:27)
# ---------------------------------------------------------------------------


def tiny_hf_mixtral(seed=10):
    from transformers import MixtralConfig, MixtralForCausalLM
    torch.manual_seed(seed)
    hf_cfg = MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=512, rope_theta=10000.0, rms_norm_eps=1e-5,
        sliding_window=None, tie_word_embeddings=False,
    )
    model = MixtralForCausalLM(hf_cfg)
    model.eval()
    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32"})
    assert cfg.is_moe and cfg.num_local_experts == 4
    params = params_from_state_dict(cfg, model.state_dict(), jnp.float32)
    return model, cfg, params


@pytest.fixture(scope="module")
def mixtral_setup():
    return tiny_hf_mixtral()


def test_mixtral_prefill_logits_match_hf(mixtral_setup):
    model, cfg, params = mixtral_setup
    B, S = 2, 40
    rng = np.random.default_rng(20)
    toks = rng.integers(0, cfg.vocab_size, size=(B, S))
    with torch.no_grad():
        hf_logits = model(torch.tensor(toks)).logits.numpy()
    res = jl.prefill(params, cfg, FULL, jnp.asarray(toks, jnp.int32),
                     jnp.asarray([S, S], jnp.int32), cache_capacity=S,
                     return_all_logits=True)
    np.testing.assert_allclose(np.asarray(res.all_logits), hf_logits,
                               rtol=3e-4, atol=3e-4)


def test_mixtral_greedy_generation_matches_hf(mixtral_setup):
    """Exercises the decode-time gathered-expert path (T=1, B*k <= E/2)."""
    model, cfg, params = mixtral_setup
    S, new = 24, 10
    rng = np.random.default_rng(21)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    with torch.no_grad():
        hf_out = model.generate(torch.tensor(toks), max_new_tokens=new,
                                do_sample=False, num_beams=1,
                                pad_token_id=0, eos_token_id=None)
    hf_new = hf_out[0, S:].numpy()
    gen_cfg = GenerationConfig(max_new_tokens=new, eos_token_ids=())
    res = generate(params, cfg, FULL, gen_cfg, jnp.asarray(toks, jnp.int32),
                   jnp.asarray([S], jnp.int32), cache_capacity=S + new)
    np.testing.assert_array_equal(np.asarray(res.tokens)[0], hf_new)


def test_mixtral_decode_gather_matches_dense(mixtral_setup):
    """The decode gathered-expert fast path must equal the dense all-expert
    combine bit-for-near (same math, different dispatch)."""
    model, cfg, params = mixtral_setup
    lp = jax.tree.map(lambda x: x[0], params["layers"])
    rng = np.random.default_rng(22)
    x1 = jnp.asarray(rng.normal(size=(1, 1, cfg.hidden_size)), jnp.float32)
    gathered = jl.moe_ffn(x1, lp, cfg)                       # T=1 fast path
    dense = jl.moe_ffn(jnp.tile(x1, (3, 2, 1)), lp, cfg)     # dense path
    np.testing.assert_allclose(np.asarray(gathered)[0, 0],
                               np.asarray(dense)[0, 0], rtol=1e-5, atol=1e-5)


def test_mixtral_snapkv_compression_generates(mixtral_setup):
    """Compression policies apply unchanged to the MoE family."""
    model, cfg, params = mixtral_setup
    S, new, cap = 96, 6, 32
    rng = np.random.default_rng(23)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=cap,
                             window_size=8)
    gen_cfg = GenerationConfig(max_new_tokens=new, eos_token_ids=())
    res = generate(params, cfg, comp, gen_cfg, jnp.asarray(toks, jnp.int32),
                   jnp.asarray([S], jnp.int32), cache_capacity=cap + new)
    assert int(res.num_tokens[0]) == new
    assert np.all(np.asarray(res.cache.lengths) == cap + new - 1)


def tiny_hf_qwen2(seed=7):
    from transformers import Qwen2Config, Qwen2ForCausalLM
    torch.manual_seed(seed)
    hf_cfg = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    model = Qwen2ForCausalLM(hf_cfg)
    model.eval()
    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32"})
    params = params_from_state_dict(cfg, model.state_dict(), jnp.float32)
    return model, cfg, params


def test_qwen2_prefill_logits_match_hf():
    """Qwen2 family = Llama + QKV bias (the reference covers only
    Llama/Mistral; the bias path exercises the fused qkv_bias leaf)."""
    model, cfg, params = tiny_hf_qwen2()
    assert cfg.sliding_window is None  # use_sliding_window=False gates it off
    assert "qkv_bias" in params["layers"]
    B, S = 2, 40
    rng = np.random.default_rng(8)
    toks = rng.integers(0, cfg.vocab_size, size=(B, S))
    with torch.no_grad():
        hf_logits = model(torch.tensor(toks)).logits.numpy()
    res = jl.prefill(params, cfg, FULL, jnp.asarray(toks, jnp.int32),
                     jnp.asarray([S, S], jnp.int32), cache_capacity=S,
                     return_all_logits=True)
    np.testing.assert_allclose(np.asarray(res.all_logits), hf_logits,
                               rtol=2e-4, atol=2e-4)


def test_qwen2_greedy_generation_matches_hf():
    model, cfg, params = tiny_hf_qwen2(8)
    S, new = 24, 10
    rng = np.random.default_rng(9)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    with torch.no_grad():
        hf_out = model.generate(torch.tensor(toks), max_new_tokens=new,
                                do_sample=False, num_beams=1,
                                pad_token_id=0, eos_token_id=None)
    hf_new = hf_out[0, S:].numpy()
    gen_cfg = GenerationConfig(max_new_tokens=new, eos_token_ids=())
    res = generate(params, cfg, FULL, gen_cfg, jnp.asarray(toks, jnp.int32),
                   jnp.asarray([S], jnp.int32), cache_capacity=S + new)
    np.testing.assert_array_equal(np.asarray(res.tokens)[0], hf_new)


def test_qwen2_snapkv_generates():
    model, cfg, params = tiny_hf_qwen2(9)
    S, new, cap = 96, 6, 32
    toks = np.random.default_rng(10).integers(0, cfg.vocab_size, size=(1, S))
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=cap,
                             window_size=8)
    gen_cfg = GenerationConfig(max_new_tokens=new, eos_token_ids=())
    res = generate(params, cfg, comp, gen_cfg, jnp.asarray(toks, jnp.int32),
                   jnp.asarray([S], jnp.int32), cache_capacity=cap + new)
    assert int(res.num_tokens[0]) == new


def test_llama_attention_and_mlp_bias_match_hf():
    """attention_bias=True adds q/k/v/o biases and mlp_bias=True adds
    gate/up/down biases in HF Llama — all six must be loaded and applied
    (o/down biases are added after their row-parallel matmuls)."""
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(11)
    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
        attention_bias=True, mlp_bias=True)
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    # HF initializes biases to zero — randomize so the test has teeth
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith(".bias"):
                p.normal_(0.0, 0.5)
    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32"})
    params = params_from_state_dict(cfg, model.state_dict(), jnp.float32)
    for leaf in ("qkv_bias", "o_bias", "gate_up_bias", "down_bias"):
        assert leaf in params["layers"], leaf

    B, S = 2, 40
    toks = np.random.default_rng(12).integers(0, cfg.vocab_size, size=(B, S))
    with torch.no_grad():
        hf_logits = model(torch.tensor(toks)).logits.numpy()
    res = jl.prefill(params, cfg, FULL, jnp.asarray(toks, jnp.int32),
                     jnp.asarray([S, S], jnp.int32), cache_capacity=S,
                     return_all_logits=True)
    np.testing.assert_allclose(np.asarray(res.all_logits), hf_logits,
                               rtol=2e-4, atol=2e-4)
    # decode path applies the same biases
    new = 8
    with torch.no_grad():
        hf_out = model.generate(torch.tensor(toks[:1]), max_new_tokens=new,
                                do_sample=False, num_beams=1,
                                pad_token_id=0, eos_token_id=None)
    gen_cfg = GenerationConfig(max_new_tokens=new, eos_token_ids=())
    gres = generate(params, cfg, FULL, gen_cfg,
                    jnp.asarray(toks[:1], jnp.int32),
                    jnp.asarray([S], jnp.int32), cache_capacity=S + new)
    np.testing.assert_array_equal(np.asarray(gres.tokens)[0],
                                  hf_out[0, S:].numpy())


def test_qwen2_sliding_window_config_semantics():
    """HF Qwen2 applies its window only to layers >= max_window_layers; a
    uniform-full config resolves to no window, a genuinely mixed one is
    rejected loudly instead of silently mis-windowing every layer."""
    base = dict(model_type="qwen2", vocab_size=128, hidden_size=64,
                intermediate_size=128, num_hidden_layers=4,
                num_attention_heads=4, sliding_window=1024)
    # gated off (HF default)
    assert ModelConfig.from_hf_config(
        {**base, "use_sliding_window": False}).sliding_window is None
    # window active but first max_window_layers >= L layers are full -> none
    assert ModelConfig.from_hf_config(
        {**base, "use_sliding_window": True,
         "max_window_layers": 4}).sliding_window is None
    # mixed full/sliding layers: refuse
    with pytest.raises(NotImplementedError):
        ModelConfig.from_hf_config({**base, "use_sliding_window": True,
                                    "max_window_layers": 2})
    with pytest.raises(NotImplementedError):
        ModelConfig.from_hf_config(
            {**base, "layer_types": ["full_attention", "sliding_attention",
                                     "sliding_attention", "sliding_attention"]})
    # uniform sliding layer_types keeps the window (Mistral-like)
    assert ModelConfig.from_hf_config(
        {**base, "layer_types": ["sliding_attention"] * 4}).sliding_window == 1024


def test_min_new_tokens_suppresses_eos(llama_setup):
    """HF min_length semantics: before min_new_tokens the EOS logit is
    masked, so EOS never appears inside the output (the old behavior
    recorded an interior EOS and conditioned later tokens on it)."""
    model, cfg, params = llama_setup
    S = 16
    rng = np.random.default_rng(6)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    gen_cfg0 = GenerationConfig(max_new_tokens=4, eos_token_ids=())
    first = generate(params, cfg, FULL, gen_cfg0, jnp.asarray(toks, jnp.int32),
                     jnp.asarray([S], jnp.int32), cache_capacity=S + 4)
    eos_tok = int(np.asarray(first.tokens)[0, 1])  # greedy pick at step 2
    gen_cfg = GenerationConfig(max_new_tokens=6, eos_token_ids=(eos_tok,),
                               min_new_tokens=4)
    res = generate(params, cfg, FULL, gen_cfg, jnp.asarray(toks, jnp.int32),
                   jnp.asarray([S], jnp.int32), cache_capacity=S + 8)
    out = np.asarray(res.tokens)[0, :int(res.num_tokens[0])]
    # EOS must not occur before position min_new_tokens-1 (0-indexed interior)
    assert eos_tok not in out[:3].tolist(), out
    assert int(res.num_tokens[0]) >= 4


def test_mistral_sliding_window_decode_matches_hf():
    """Decode steps past the window must mask old keys like HF's FORWARD
    pass does (decode previously attended to the full cache).  Oracle is a
    teacher-forced HF full forward: HF's own generate() disagrees with its
    own forward for the first post-prefill token under sliding window (its
    cache path masks differently), so forward semantics — what the model
    was trained with — are the ground truth here."""
    model, cfg, params = tiny_hf_llama(3, sliding_window=16)
    S, new = 40, 6
    rng = np.random.default_rng(9)
    toks = rng.integers(0, cfg.vocab_size, size=(1, S))
    cont = rng.integers(0, cfg.vocab_size, size=(1, new))
    full = np.concatenate([toks, cont], axis=1)

    with torch.no_grad():
        hf_logits = model(torch.tensor(full)).logits.numpy()  # [1, S+new, V]

    pre = jl.prefill(params, cfg, FULL, jnp.asarray(toks, jnp.int32),
                     jnp.asarray([S], jnp.int32), cache_capacity=S + new)
    np.testing.assert_allclose(np.asarray(pre.logits_last)[0],
                               hf_logits[0, S - 1], rtol=2e-4, atol=2e-4)
    cache = pre.cache
    for i in range(new):
        lg, cache = jl.decode_step(params, cfg,
                                   jnp.asarray(full[:, S + i], jnp.int32),
                                   cache)
        np.testing.assert_allclose(np.asarray(lg)[0], hf_logits[0, S + i],
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"decode step {i}")
