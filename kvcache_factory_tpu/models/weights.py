"""Parameter initialization and HF checkpoint loading.

Weights layout (all matrices stored input-major so forward is ``x @ W``).
QKV and gate/up are fused into single matmuls — at batch 1 decode is
bandwidth/dispatch-bound and fewer, larger matmuls run measurably faster:

    {
      "embed":        [V, hidden],
      "layers": {     # every leaf stacked over layers on axis 0 for lax.scan
        "qkv_proj":   [L, hidden, (Hq + 2*Hkv) * D],
        "o_proj":     [L, Hq*D, hidden],
        "gate_up_proj": [L, hidden, 2*ffn],
        "down_proj":  [L, ffn, hidden],
        "input_norm": [L, hidden],       "post_norm": [L, hidden],
      },
      "final_norm":   [hidden],
      "lm_head":      [hidden, V],
    }

Loading sources: a HF model directory (config.json + *.safetensors, the same
artifacts the reference consumes via AutoModelForCausalLM,
run_longbench.py:386-393) or an in-memory torch ``state_dict`` (used by the
parity tests against tiny random HF models).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig

_LAYER_MAP = {
    "qkv_proj": ("self_attn.q_proj.weight", "self_attn.k_proj.weight",
                 "self_attn.v_proj.weight"),
    "o_proj": "self_attn.o_proj.weight",
    "gate_up_proj": ("mlp.gate_proj.weight", "mlp.up_proj.weight"),
    "down_proj": "mlp.down_proj.weight",
    "input_norm": "input_layernorm.weight",
    "post_norm": "post_attention_layernorm.weight",
}


def init_params(cfg: ModelConfig, key: jax.Array, dtype=None) -> Dict[str, Any]:
    """Random init (normal / sqrt(fan_in)) — for benches and tests."""
    dtype = dtype or jnp.bfloat16
    h, ffn = cfg.hidden_size, cfg.intermediate_size
    qd, kvd = cfg.num_attention_heads * cfg.head_dim, cfg.num_key_value_heads * cfg.head_dim
    L, V = cfg.num_hidden_layers, cfg.vocab_size
    ks = jax.random.split(key, 9)

    def mat(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) / np.sqrt(shape[0])).astype(dtype)

    if cfg.is_moe:  # expert-stacked FFN + router (Mixtral layout)
        E = cfg.num_local_experts
        ffn_w = {
            "router": _stacked(ks[2], L, (h, E), dtype),
            "gate_up_proj": _stacked(ks[5], L, (E, h, 2 * ffn), dtype),
            "down_proj": _stacked(ks[7], L, (E, ffn, h), dtype),
        }
    else:
        ffn_w = {
            "gate_up_proj": _stacked(ks[5], L, (h, 2 * ffn), dtype),
            "down_proj": _stacked(ks[7], L, (ffn, h), dtype),
        }
    params = {
        "embed": mat(ks[0], (V, h)),
        "layers": {
            "qkv_proj": _stacked(ks[1], L, (h, qd + 2 * kvd), dtype),
            "o_proj": _stacked(ks[4], L, (qd, h), dtype),
            **ffn_w,
            "input_norm": jnp.ones((L, h), dtype),
            "post_norm": jnp.ones((L, h), dtype),
        },
        "final_norm": jnp.ones((h,), dtype),
        "lm_head": mat(ks[8], (h, V)),
    }
    return params


def _stacked(key, L, shape, dtype):
    # fan_in is the second-to-last dim (matrices are input-major; expert-
    # stacked MoE weights carry a leading expert dim).
    return (jax.random.normal(key, (L,) + shape, jnp.float32)
            / np.sqrt(shape[-2])).astype(dtype)


def params_from_state_dict(cfg: ModelConfig, state: Dict[str, Any],
                           dtype=jnp.float32) -> Dict[str, Any]:
    """Convert a HF Llama/Mistral ``state_dict``-like mapping (name -> numpy
    array, HF [out, in] layout) to the stacked JAX layout."""

    def get(name):
        arr = state[name]
        if hasattr(arr, "detach"):  # torch tensor
            arr = arr.detach().to("cpu").float().numpy()
        return np.asarray(arr)

    L = cfg.num_hidden_layers
    layer_map = dict(_LAYER_MAP)
    if cfg.is_moe:
        del layer_map["gate_up_proj"], layer_map["down_proj"]
    layers = {}
    for ours, theirs in layer_map.items():
        mats = []
        for l in range(L):
            if isinstance(theirs, tuple):  # fused: concat along output dim
                w = np.concatenate(
                    [get(f"model.layers.{l}.{t}").T for t in theirs], axis=1)
            else:
                w = get(f"model.layers.{l}.{theirs}")
                if w.ndim == 2:
                    w = w.T  # HF [out, in] -> ours [in, out]
            mats.append(w)
        layers[ours] = jnp.asarray(np.stack(mats), dtype)

    # Optional biases, detected from the checkpoint: Qwen2-family carries
    # q/k/v biases only; Llama attention_bias=True adds o_proj.bias too;
    # mlp_bias=True adds gate/up/down biases.  Fused to match the fused
    # matmuls.
    bias_map = {
        "qkv_bias": ("self_attn.q_proj.bias", "self_attn.k_proj.bias",
                     "self_attn.v_proj.bias"),
        "o_bias": ("self_attn.o_proj.bias",),
        "gate_up_bias": ("mlp.gate_proj.bias", "mlp.up_proj.bias"),
        "down_bias": ("mlp.down_proj.bias",),
    }
    for ours, theirs in bias_map.items():
        if f"model.layers.0.{theirs[0]}" in state:
            layers[ours] = jnp.asarray(np.stack([
                np.concatenate([get(f"model.layers.{l}.{t}") for t in theirs])
                for l in range(L)]), dtype)

    if cfg.is_moe:
        # Mixtral block_sparse_moe: gate (router) [E, h]; per-expert w1
        # (gate), w3 (up), w2 (down) — stacked [L, E, ...] input-major.
        E = cfg.num_local_experts
        routers, gus, downs = [], [], []
        for l in range(L):
            pre = f"model.layers.{l}.block_sparse_moe"
            routers.append(get(f"{pre}.gate.weight").T)  # [h, E]
            gus.append(np.stack([
                np.concatenate([get(f"{pre}.experts.{e}.w1.weight").T,
                                get(f"{pre}.experts.{e}.w3.weight").T], axis=1)
                for e in range(E)]))                     # [E, h, 2f]
            downs.append(np.stack([
                get(f"{pre}.experts.{e}.w2.weight").T for e in range(E)]))
        layers["router"] = jnp.asarray(np.stack(routers), dtype)
        layers["gate_up_proj"] = jnp.asarray(np.stack(gus), dtype)
        layers["down_proj"] = jnp.asarray(np.stack(downs), dtype)

    embed = get("model.embed_tokens.weight")
    if cfg.tie_word_embeddings or "lm_head.weight" not in state:
        lm_head = embed.T
    else:
        lm_head = get("lm_head.weight").T
    return {
        "embed": jnp.asarray(embed, dtype),
        "layers": layers,
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(lm_head, dtype),
    }


def load_params(model_dir: str, cfg: Optional[ModelConfig] = None,
                dtype=jnp.bfloat16):
    """Load from a HF checkpoint directory (safetensors shards) using the
    native mmap/parallel reader (csrc/safetensors_reader.cpp) with a
    pure-Python mmap fallback."""
    from ..runtime.native import SafetensorsFile

    if cfg is None:
        cfg = ModelConfig.from_json(os.path.join(model_dir, "config.json"))

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            weight_map = json.load(f)["weight_map"]
        shards = sorted(set(weight_map.values()))
    else:
        shards = [f for f in os.listdir(model_dir) if f.endswith(".safetensors")]

    state: Dict[str, np.ndarray] = {}
    for shard in shards:
        f = SafetensorsFile(os.path.join(model_dir, shard))
        for name in f.keys():
            state[name] = np.asarray(f.tensor(name))
        f.close()
    return params_from_state_dict(cfg, state, dtype), cfg


# ---------------------------------------------------------------------------
# Weight-only quantization (W8A16)
# ---------------------------------------------------------------------------

# Matmul weights that carry the bandwidth at decode.  NOT quantized: the
# router (its fp32 logits steer top-k expert routing — tiny and
# accuracy-critical), the embedding (consumed by a 1-row gather per decode
# step, no bandwidth to win), norms and biases (1-D, negligible).
WEIGHT_QUANT_KEYS = ("qkv_proj", "o_proj", "gate_up_proj", "down_proj")


def quantize_weights(params: Dict[str, Any], nbits: int = 8,
                     skip: tuple = ()) -> Dict[str, Any]:
    """Weight-only int8 quantization (W8A16) of the matmul weights.

    Each weight [..., in, out] becomes ``{"q": int8, "s": f32 [..., 1, out]}``
    with a per-OUT-channel symmetric scale over the input axis; the forward
    dequantizes POST-dot (the scale commutes with the contraction —
    ``models/llama.py::wdot``), so decode streams half the weight bytes.
    Measured on v5e: the decode FFN chain runs 1.84x faster
    (``tools/bench_wquant_probe.py``); per-channel symmetric int8 weight
    reconstruction error is ~0.2-0.4% rel on normal-ish weights.

    No reference counterpart — the reference quantizes only the KV cache
    (pyramidkv/quantcache.py:13-27); at every measured batch size the
    WEIGHT stream is the larger decode term (BASELINE.md attribution).
    Compose freely with the quantized KV cache (independent subsystems).

    Apply BEFORE ``parallel.mesh.shard_params`` (it lays out q/s leaves).

    ``skip`` keeps named matrices fp — e.g. ``skip=("lm_head",)`` (the
    standard first-mitigation when a quantized checkpoint drifts: the
    output head is the most drift-sensitive matmul and only ~6% of this
    geometry's weight bytes).  Valid names: "lm_head" and the
    WEIGHT_QUANT_KEYS layer entries.
    """
    if nbits != 8:
        raise NotImplementedError(
            "weight-only quantization supports nbits=8; int4 weights need a "
            "packed-nibble unpack in the matmul path — not built.  (tried, "
            "2026-08-21: XLA does not fuse the nibble unpack into the dot "
            "read — the interleave-reshape variant ran 9.53 ms and the "
            "two-dot even/odd-plane variant 2.87 ms on the FFN probe chain "
            "vs int8's 0.838 / bf16's 1.542; XLA materializes the "
            "dequantized planes, so W4 would need a Pallas matvec kernel "
            "with in-kernel unpack like decode_attn_quant's)")

    if isinstance(params.get("lm_head"), dict) or any(
            isinstance(v, dict) for v in params["layers"].values()):
        raise ValueError(
            "params are already weight-quantized ({'q', 's'} leaves found); "
            "quantize_weights must be applied to fp weights exactly once")

    @jax.jit
    def q1(w):
        wf = w.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2, keepdims=True),
                        1e-30) / 127.0
        # round the scale to bf16 BEFORE computing q: the stored f32 scale
        # is then bf16-exact, so wdot's cast to the activation dtype is
        # lossless on TPU (a post-hoc bf16 cast would stack ~2^-9
        # per-channel error on every matmul), and the rounding is absorbed
        # into q optimally.  Free at runtime.
        s = s.astype(jnp.bfloat16).astype(jnp.float32)
        q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
        return {"q": q, "s": s}

    known = set(WEIGHT_QUANT_KEYS) | {"lm_head"}
    unknown = set(skip) - known
    if unknown:
        raise ValueError(f"skip names {sorted(unknown)} not quantizable "
                         f"(valid: {sorted(known)})")
    out = dict(params)
    if "lm_head" not in skip:
        out["lm_head"] = q1(params["lm_head"])
    out["layers"] = {
        k: (q1(v) if k in WEIGHT_QUANT_KEYS and k not in skip else v)
        for k, v in params["layers"].items()}
    return out
