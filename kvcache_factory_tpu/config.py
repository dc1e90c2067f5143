"""Typed configuration for the TPU-native KV-cache-compression inference engine.

The reference (assassin808/KVCache-Factory) spreads configuration across three
mechanisms: argparse flags, per-layer attribute injection onto HF config objects
(run_longbench.py:241-261), and lazy ``init_*`` defaults
(pyramidkv/pyramidkv_utils.py:880-1085).  Here everything is a frozen dataclass
resolved *before* compilation; per-layer budget schedules become arrays, not
monkeypatched attributes.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Model configuration
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters for a Llama/Mistral-family decoder.

    Mirrors the fields of HF ``LlamaConfig`` / ``MistralConfig`` that the
    reference relies on (pyramidkv/llama_model.py uses the HF modeling config),
    but as a frozen, hashable object usable as a jit static argument.
    """

    model_type: str = "llama"  # "llama" | "mistral" | "mixtral"
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: int = 128
    max_position_embeddings: int = 8192
    rope_theta: float = 10000.0
    # HF rope_scaling (hashable): ("llama3", factor, low_freq_factor,
    # high_freq_factor, original_max_position) or ("linear", factor, 0, 0, 0).
    rope_scaling: Optional[Tuple[str, float, float, float, int]] = None
    rms_norm_eps: float = 1e-5
    sliding_window: Optional[int] = None  # Mistral v0.1 uses 4096
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    # Mixtral-style sparse MoE (the reference lists Mixtral as an unchecked
    # TODO, README.md:27 — a capability extension here): 0 = dense FFN.
    num_local_experts: int = 0
    num_experts_per_tok: int = 2
    dtype: str = "bfloat16"

    @property
    def num_key_value_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @property
    def is_moe(self) -> bool:
        return self.num_local_experts > 0

    @staticmethod
    def from_hf_config(cfg: Any) -> "ModelConfig":
        """Build from a HF PretrainedConfig (or a dict loaded from config.json)."""
        if not isinstance(cfg, dict):
            cfg = cfg.to_dict()
        head_dim = cfg.get("head_dim") or cfg["hidden_size"] // cfg["num_attention_heads"]
        return ModelConfig(
            model_type=cfg.get("model_type", "llama"),
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
            head_dim=head_dim,
            max_position_embeddings=cfg.get("max_position_embeddings", 8192),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=_rope_scaling_tuple(cfg.get("rope_scaling")),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            sliding_window=_resolve_sliding_window(cfg),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            attention_bias=cfg.get("attention_bias", False),
            mlp_bias=cfg.get("mlp_bias", False),
            num_local_experts=cfg.get("num_local_experts", 0) or 0,
            num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
        )

    @staticmethod
    def from_json(path: str) -> "ModelConfig":
        with open(path) as f:
            return ModelConfig.from_hf_config(json.load(f))


def _resolve_sliding_window(cfg: dict):
    """HF sliding-window semantics, resolved to this repo's single global
    window.  Mistral: plain ``sliding_window`` on every layer.  Qwen2: gated
    by ``use_sliding_window`` (default False in HF) and applied only to
    layers >= ``max_window_layers`` / per ``layer_types`` — uniform-full and
    uniform-sliding resolve here; genuinely mixed layer types are rejected
    loudly rather than silently mis-windowed."""
    sw = cfg.get("sliding_window")
    if sw is None:
        return None
    if "use_sliding_window" in cfg and not cfg["use_sliding_window"]:
        return None  # Qwen2 default: window configured but gated off
    lt = cfg.get("layer_types")
    if lt:
        kinds = set(lt)
        if kinds == {"full_attention"}:
            return None
        if kinds != {"sliding_attention"}:
            raise NotImplementedError(
                "mixed full/sliding attention layer_types not supported")
        return sw
    mwl = cfg.get("max_window_layers")
    if cfg.get("use_sliding_window") and mwl:
        if mwl >= cfg["num_hidden_layers"]:
            return None  # the first mwl layers are full attention: all of them
        raise NotImplementedError(
            "per-layer sliding window (max_window_layers) not supported")
    return sw


def _rope_scaling_tuple(rs):
    """HF rope_scaling dict -> hashable tuple (or None)."""
    if not rs:
        return None
    rope_type = rs.get("rope_type") or rs.get("type")
    return (rope_type, float(rs.get("factor", 1.0)),
            float(rs.get("low_freq_factor", 0.0)),
            float(rs.get("high_freq_factor", 0.0)),
            int(rs.get("original_max_position_embeddings", 0)))


# ---------------------------------------------------------------------------
# Compression configuration
# ---------------------------------------------------------------------------

# Methods on the reference scoreboard (eval.py:99-110 / monkeypatch.py:19-88).
KNOWN_METHODS = (
    "fullkv",
    "minference",  # sparse prefill, full KV retained (monkeypatch.py:51)
    "snapkv",
    "pyramidkv",
    "h2o",
    "streamingllm",
    "l2norm",
    "cam",
    "adakv",
    "headkv",
    "think",
    "random",
)


@dataclass(frozen=True)
class CompressionConfig:
    """Prefill-time KV compression policy configuration.

    Semantics follow the reference clusters (pyramidkv/pyramidkv_utils.py):

    * ``method``              — one of :data:`KNOWN_METHODS`.
    * ``max_capacity_prompt`` — total retained tokens per layer (budget+window),
                                reference default 2048 (:885) / 4096 (:909).
    * ``window_size``         — observation window, runner sets 8 for score
                                methods and capacity-4 for streamingllm
                                (run_longbench.py:220-223).
    * ``kernel_size``/``pooling`` — 1-D pooling over scores (:328-333);
                                runner uses 7/"maxpool" (run_longbench.py:236-237).
    * ``beta``                — PyramidKV pyramid shape parameter (:174).
    * ``skip_layers``         — L2Norm layers left uncompressed (:961-962).
    * ``start_budget_ratio``  — CAM sink budget ratio (:432).
    * ``floor_ratio``/``normalize`` — AdaKV budget floor / score normalization
                                (:626-636, :709-711).
    * ``head_capacity``       — HeadKV per-(layer,head) budgets, precomputed
                                offline (run_longbench.py:225-234); tuple of
                                tuples so the config stays hashable.
    * ``pruning_ratio``/``recent_size`` — ThinK channel pruning (:13-26, :349-391).
    * ``merge``               — LOOK-M pivot merging of evicted KV (:119-170).
    * ``group_reduce``        — TPU extension: "none" reproduces the reference
                                exactly (compression after repeat_kv, cache
                                stores one entry-set per *query* head,
                                llama_model.py:158-167); "mean"/"max" aggregate
                                scores within a GQA group and keep the cache at
                                num_key_value_heads for real GQA memory savings.
    * ``head_capacity_bound_factor`` — static upper bound (× base capacity) on
                                any single head's adaptive budget for
                                AdaKV/HeadKV; needed for static shapes on TPU.
    """

    method: str = "fullkv"
    max_capacity_prompt: int = 2048
    window_size: int = 32
    kernel_size: int = 7
    pooling: str = "maxpool"  # "avgpool" | "maxpool"
    beta: int = 20
    skip_layers: Tuple[int, ...] = (0, 1)
    start_budget_ratio: float = 0.1
    floor_ratio: float = 0.2
    normalize: bool = True
    head_capacity: Optional[Tuple[Tuple[int, ...], ...]] = None
    head_beta: float = 1.01
    pruning_ratio: float = 0.4
    recent_size: int = 32
    # ThinK storage mode: False = pruned channels zeroed in place (decode math
    # identical to the reference, no shape change); True = REAL memory saving —
    # keys stored at D*(1-ratio) channels plus a small dense buffer for recent
    # + decoded rows, decode splits the QK product exactly like the
    # reference's pruned-past + dense-recent attention
    # (llama_model_think.py:175-181).  Packed mode prunes whenever rows are
    # older than recent_size (no no-compress carve-out for short prompts).
    think_packed: bool = False
    merge: Optional[str] = None  # None | "pivot"
    group_reduce: str = "none"  # "none" | "mean" | "max" | "sum"
    head_capacity_bound_factor: float = 2.0
    # MInference-equivalent sparse prefill (reference pyramidkv/minference.py
    # delegates to the external package), applied inside the Pallas flash
    # prefill kernel: (sink_blocks, local_blocks, stride) or
    # ("ashape", sinks, local, stride) — static a-shape pattern;
    # ("vertical_slash", v_topk, s_topk, last_q) — MInference's flagship
    # dynamic pattern, per-head block mask estimated from the last queries'
    # attention (vertical columns + slash diagonals).
    sparse_prefill: Optional[Tuple] = None
    # Decode-stage compression (unchecked TODO in the reference, README.md:31:
    # "Support KV cache compression at decoding stage"): when the cache is
    # full, H2O-style eviction replaces the lowest accumulated-attention
    # non-recent entry instead of growing — decode memory stays bounded.
    decode_evict: bool = False
    eviction_recent: int = 32

    def __post_init__(self):
        if self.method not in KNOWN_METHODS:
            raise ValueError(f"unknown method {self.method!r}; expected one of {KNOWN_METHODS}")
        if self.max_capacity_prompt - self.window_size <= 0 \
                and self.method not in ("fullkv", "minference", "l2norm"):
            raise ValueError("max_capacity_prompt must exceed window_size")
        if self.pooling not in ("avgpool", "maxpool"):
            raise ValueError("pooling must be avgpool or maxpool")
        if self.think_packed and self.method != "think":
            raise ValueError("think_packed requires method='think'")

    @property
    def base_capacity(self) -> int:
        """Retained non-window budget (reference ``max_capacity_prompt - window``)."""
        return self.max_capacity_prompt - self.window_size

    def cache_heads(self, num_query_heads: int, num_kv_heads: int) -> int:
        """Heads the packed cache carries: ``num_kv_heads`` when nothing is
        selected per query head — fullkv AND minference retain the raw KV
        (policies/methods.py fullkv/minference branch) — or when selections
        are group-reduced; otherwise per-query-head (reference parity after
        repeat_kv, llama_model.py:158-167).  Single source of truth for the
        model prefill and the batched-slot allocator."""
        if self.method in ("fullkv", "minference") or self.group_reduce != "none":
            return num_kv_heads
        return num_query_heads

    def layer_capacity(self, num_layers: int, prefill_len: int) -> int:
        """Static per-layer cache capacity needed to hold this policy's output.

        For most methods this is ``max_capacity_prompt`` (or the prompt length
        if shorter — the reference's no-compress branch,
        pyramidkv_utils.py:314-315).  PyramidKV's top layers get up to
        ``max_num`` (:205-215); AdaKV heads can exceed the base budget, bounded
        here by ``head_capacity_bound_factor``; L2Norm skip-layers retain the
        full prompt.
        """
        if self.method in ("fullkv", "minference"):
            return prefill_len
        cap = self.max_capacity_prompt
        if prefill_len <= cap:
            return prefill_len
        if self.method == "pyramidkv":
            base = self.base_capacity
            min_num = base // self.beta
            max_num = base * 2 - min_num
            max_num = min(max_num, prefill_len - self.window_size)
            return max_num + self.window_size
        if self.method in ("adakv", "headkv"):
            bound = int(math.ceil(self.base_capacity * self.head_capacity_bound_factor))
            bound = min(bound, prefill_len - self.window_size)
            return bound + self.window_size
        if self.method == "l2norm" and self.skip_layers:
            return prefill_len  # skip layers keep everything
        return cap


# ---------------------------------------------------------------------------
# Quantized-cache configuration
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class QuantConfig:
    """Quantized KV cache (reference: pyramidkv/quantcache.py, HQQ-backed).

    TPU-native design difference (SURVEY.md §7.4): instead of dequantizing the
    whole cache every decode step (quantcache.py:77-82), KV is stored
    group-wise quantized and dequant is fused into the decode attention matmul
    by XLA / the Pallas decode kernel.  Outlier handling is dense per-group
    slots rather than a sparse scatter (quantcache.py:51-58) — see
    ``outlier_extract``.
    """

    nbits: int = 8  # 1 | 2 | 3 | 4 | 8 (reference HQQ accepts 1-8, quantcache.py:26)
    q_group_size: int = 64  # groups along head_dim (reference run_longbench.py:287)
    # Store each group's largest-|x| value exactly (bf16 + int8 index,
    # ~0.4 bits/value) and one-hot-scatter it back at dequant — the dense
    # TPU equivalent of the reference's |x|>6 sparse outlier table
    # (quantcache.py:51-58).  Measured A/B vs an HQQ+outlier oracle
    # (tools/quant_accuracy_ab.py; table in BASELINE.md): cuts low-bit
    # reconstruction error ~2-4x on heavy-tailed K/V, so it defaults on.
    # Honored on the XLA grouped path; the Pallas int8/int4 kernels keep
    # per-token scales (their layout; accuracy quantified in the same table).
    outlier_extract: bool = True
    # Recent tokens kept in full precision alongside the quantized store (the
    # reference's fp residual buffer, quantcache.py:59-96 — there it batches
    # re-quantization; here every token is also quantized once at write, and
    # the fp ring simply wins the read for the last ``residual_length``
    # entries, so accuracy matches the reference's "recent tokens are exact"
    # semantics with no re-quantization stall).  0 disables the ring.
    # Honored on the XLA quant path (the Pallas int8/int4 kernels keep
    # per-token full-head_dim scales instead).
    residual_length: int = 0
    axis_key: int = 1
    axis_value: int = 0

    def __post_init__(self):
        if self.nbits not in (1, 2, 3, 4, 8):
            raise ValueError("quantized cache supports nbits in {1, 2, 3, 4, 8}")


# ---------------------------------------------------------------------------
# Generation / engine configuration
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 128
    eos_token_ids: Tuple[int, ...] = ()
    # Greedy decoding matches the reference protocol (run_longbench.py:266-275:
    # num_beams=1, do_sample=False); sampling is a serving extension.
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0       # 0 = disabled
    top_p: float = 1.0   # 1.0 = disabled
    min_new_tokens: int = 1  # reference min_length=context+1


@dataclass(frozen=True)
class ShardingConfig:
    """Device-mesh layout. ``dp`` shards batch, ``tp`` shards heads/ffn,
    ``ep`` shards the MoE expert axis (expert parallel; only meaningful for
    MoE models — each ep shard computes its local experts on all tokens and
    XLA all-reduces the weighted combine).

    ``sp`` is sequence/context parallelism for PREFILL: the prompt's token
    axis is sharded over ``sp`` devices and attention runs as ring attention
    over ICI (parallel/ring_attention.py), so one prompt's prefill compute
    and activation memory split across chips — context beyond a single
    chip's HBM (the reference truncates the prompt middle instead,
    run_longbench.py:199-205).

    sp COMPOSES with dp and tp (round 4): one ``(dp, sp, tp)`` mesh — the
    ring fold is head-local, so each (dp, tp) tile runs an independent ring
    over its head/batch slice while weights shard over tp (the repo's own
    north star, 70B + 32k context, needs both axes at once).  With dp and
    tp at 1 the mesh degenerates to the dedicated sp ring.  sp does not
    compose with ep or pp."""

    dp: int = 1
    tp: int = 1
    ep: int = 1
    sp: int = 1
    # Pipeline parallelism: layers sharded over ``pp`` stages; generation
    # runs the GPipe schedule end-to-end (parallel/pipeline.py pp_generate —
    # cache-building prefill + pipelined decode with a token-return ring).
    # Like sp it is a dedicated mesh.  ``pp_microbatches`` (0 = pp) must be
    # >= pp for bubble-free steady-state decode and divide the batch.
    pp: int = 1
    pp_microbatches: int = 0
    # Multi-host: how many of the ``dp`` ways ride DCN (across hosts) rather
    # than ICI.  dp has no collectives during inference (independent batch
    # shards), so it is the axis that belongs on the slow inter-host fabric;
    # tp/ep collectives (all-reduce per layer) stay inside a slice on ICI.
    # 1 = single host.  Must divide dp.
    dcn_dp: int = 1

    def __post_init__(self):
        if self.dp % self.dcn_dp != 0:
            raise ValueError("dcn_dp must divide dp")
        if self.sp > 1 and self.ep > 1:
            raise ValueError("sp composes with dp/tp (one (dp, sp, tp) "
                             "mesh) but not with ep")
        if self.pp > 1 and (self.dp * self.tp * self.ep > 1 or self.sp > 1):
            raise ValueError("pp is a dedicated mesh; it does not compose "
                             "with dp/tp/ep/sp in one config")
        if self.pp_microbatches and self.pp_microbatches < self.pp:
            raise ValueError("pp_microbatches must be >= pp (GPipe decode "
                             "needs one microbatch per in-flight stage)")

    @property
    def axis_names(self) -> Tuple[str, ...]:
        return ("dp", "ep", "tp") if self.ep > 1 else ("dp", "tp")


@dataclass(frozen=True)
class EngineConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    compression: CompressionConfig = field(default_factory=CompressionConfig)
    quant: Optional[QuantConfig] = None
    generation: GenerationConfig = field(default_factory=GenerationConfig)
    sharding: ShardingConfig = field(default_factory=ShardingConfig)
    prefill_buckets: Tuple[int, ...] = (512, 1024, 2048, 4096, 8192)
    # Budget as a FRACTION of the prompt length (reference
    # --max_capacity_prompts_ratio, run_longbench.py:215-216:
    # ``cap = round(prompt_len * ratio)``).  Static shapes make this
    # per-bucket here: cap = round(bucket * ratio), window follows the
    # method table (streamingllm window = cap - 4).  None = absolute budget.
    capacity_ratio: Optional[float] = None

    def replace(self, **kw) -> "EngineConfig":
        return dataclasses.replace(self, **kw)


def dtype_of(cfg: ModelConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[cfg.dtype]
