"""Device mesh + sharding layouts.

The reference has no real distribution story — multi-GPU is HF accelerate
layer placement (run_longbench.py:390) and the ``tensor_parallel`` import is
dead code (run_needle_in_haystack.py:21, 208; SURVEY.md §2.6).  This module is
the TPU-native replacement: a ``(dp, tp)`` mesh where ``dp`` shards the batch
(data parallel over ICI/DCN) and ``tp`` shards attention heads and the FFN
(tensor parallel over ICI), with the KV cache sharded over its head axis so
decode attention needs no collective at all and only the output projection /
FFN reductions all-reduce over ``tp``.

GQA note (SURVEY.md §2.6): with reference-parity compression
(``group_reduce="none"``) the cache stores num_attention_heads entries, so tp
can exceed num_key_value_heads; with grouped caches tp is bounded by
num_key_value_heads.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig, ShardingConfig


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host runtime init (SURVEY.md §2.6 to-build: the reference has no
    distributed backend at all — its multi-GPU story is accelerate layer
    placement, run_longbench.py:390).  Call once per host process before any
    device use; no-op when already initialized or single-process with no
    coordinator given.  With TPU pod environment variables set (GKE/QR), all
    arguments are auto-detected by jax."""
    import os

    from jax._src import distributed as _distributed
    if _distributed.global_state.client is not None:
        return  # already initialized
    # NOTE: do NOT probe jax.process_count()/jax.devices() here — touching
    # the backends initializes them, after which jax.distributed.initialize
    # raises ("must be called before any JAX computations are executed").
    auto_env = any(os.environ.get(v) for v in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"))
    if coordinator_address is None and num_processes is None and not auto_env:
        return  # single-host run
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(cfg: ShardingConfig, devices=None) -> Mesh:
    """Build the (dp[, ep], tp) mesh.

    Multi-host (``cfg.dcn_dp > 1``): the dp axis is split so its leading
    ``dcn_dp`` ways cross hosts over DCN and everything else stays inside a
    slice on ICI — dp needs no collectives during inference, so it is the
    only axis that belongs on the inter-host fabric
    (``mesh_utils.create_hybrid_device_mesh``).  Single-process runs (tests,
    the virtual CPU mesh) fall back to a flat mesh with the same shape."""
    devices = devices if devices is not None else jax.devices()
    n = cfg.dp * cfg.ep * cfg.tp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    shape = (cfg.dp, cfg.ep, cfg.tp) if cfg.ep > 1 else (cfg.dp, cfg.tp)
    if cfg.dcn_dp > 1 and jax.process_count() > 1:
        if cfg.dp % cfg.dcn_dp != 0:
            raise ValueError(
                f"dp={cfg.dp} must be divisible by dcn_dp={cfg.dcn_dp} (the "
                "inter-host ways are peeled off the dp axis)")
        ici = (cfg.dp // cfg.dcn_dp,) + shape[1:]
        dcn = (cfg.dcn_dp,) + (1,) * (len(shape) - 1)
        arr = mesh_utils.create_hybrid_device_mesh(
            ici, dcn, devices=devices[:n])
        return Mesh(arr, cfg.axis_names)
    arr = mesh_utils.create_device_mesh(shape, devices=devices[:n])
    return Mesh(arr, cfg.axis_names)


def param_specs(model_cfg: ModelConfig, ep: bool = False) -> Dict[str, Any]:
    """PartitionSpec tree matching models/weights.py layout (Megatron-style:
    column-parallel qkv/gate/up, row-parallel o/down, replicated norms).

    MoE models: expert-stacked FFN weights [L, E, ...] shard the expert axis
    over ``ep`` (when the mesh has one) and keep the Megatron tp split inside
    each expert; the router is replicated.  Each ep shard computes its local
    experts on all tokens and the weighted combine all-reduces over ep — no
    token-dropping dispatch, perfectly balanced compute (per device cost
    equals the dense model when ep == num_local_experts)."""
    if model_cfg.is_moe:
        e_axis = "ep" if ep else None
        ffn = {
            "router": P(None, None, None),
            "gate_up_proj": P(None, e_axis, None, "tp"),
            "down_proj": P(None, e_axis, "tp", None),
        }
    else:
        ffn = {
            "gate_up_proj": P(None, None, "tp"),
            "down_proj": P(None, "tp", None),
        }
    return {
        "embed": P(None, None),
        "layers": {
            "qkv_proj": P(None, None, "tp"),
            # Optional bias leaves (Qwen2 qkv; Llama attention_bias/mlp_bias):
            # column-parallel biases split with their matmul outputs;
            # row-parallel outputs get replicated biases added post-reduce.
            "qkv_bias": P(None, "tp"),
            "o_bias": P(None, None),
            "gate_up_bias": P(None, "tp"),
            "down_bias": P(None, None),
            "o_proj": P(None, "tp", None),
            **ffn,
            "input_norm": P(None, None),
            "post_norm": P(None, None),
        },
        "final_norm": P(None),
        "lm_head": P(None, "tp"),
    }


def cache_specs() -> Any:
    """KVCache sharding: [L, B, H, C, D] — batch over dp, heads over tp."""
    from ..cache.kv_cache import KVCache
    return KVCache(
        k=P(None, "dp", "tp", None, None),
        v=P(None, "dp", "tp", None, None),
        lengths=P(None, "dp", "tp"),
        positions=P("dp"),
    )


def shard_params(params: Dict[str, Any], mesh: Mesh,
                 model_cfg: ModelConfig) -> Dict[str, Any]:
    specs = param_specs(model_cfg, ep="ep" in mesh.axis_names)

    # PartitionSpec subclasses tuple (a pytree node), so walk by key path
    # instead of zipping trees.  Weight-quantized leaves
    # (models/weights.py::quantize_weights) are {"q": int8, "s": scale}
    # dicts, detected STRUCTURALLY via is_leaf (not by key name — a future
    # param legitimately named "q"/"s" must not be misrouted): q shards
    # like its weight; s [..., 1, out] keeps every spec entry except the
    # reduced input axis (-2), which has size 1 — so a row-parallel
    # weight's scale is replicated and a column-parallel one's shards with
    # its output columns.
    def is_wq(n):
        return isinstance(n, dict) and set(n) == {"q", "s"}

    def place(path, x):
        node = specs
        for p in path:
            node = node[p.key]
        if is_wq(x):
            s_spec = (P(*node[:-2], None, node[-1]) if len(node) >= 2
                      else node)
            return {"q": jax.device_put(x["q"], NamedSharding(mesh, node)),
                    "s": jax.device_put(x["s"],
                                        NamedSharding(mesh, s_spec))}
        return jax.device_put(x, NamedSharding(mesh, node))

    return jax.tree_util.tree_map_with_path(place, params, is_leaf=is_wq)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp", None))
