"""GPipe-style pipeline parallelism over a mesh axis.

Reference parity target (SURVEY.md §2.6): the reference's only multi-GPU
story is HF accelerate ``device_map="auto"`` — sequential layer placement
with NO microbatching, so at any instant all but one GPU idles
(run_longbench.py:390, README.md:9).  This module is the TPU-native
upgrade: the layer-stacked weights are sharded along the LAYER axis over a
``pp`` mesh axis (each device holds L/P contiguous layers), and prefill
microbatches flow stage-to-stage via ``ppermute`` inside ``shard_map`` — a
software pipeline with the classic GPipe schedule (M + P - 1 ticks for M
microbatches over P stages, bubble fraction (P-1)/(M+P-1)).

Scope: full-attention forward to last-token logits (the eval scoring path).
Cache-building prefill and decode remain on the (dp, tp) + ring-sp meshes —
for decode, PP only adds transfer latency on a single token; TP is the
right axis there (SURVEY.md §2.6 table).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig, dtype_of
from ..models.llama import (_causal_mask, _merge_heads, _split_heads,
                            apply_rope, grouped_attention, rms_norm,
                            rope_tables, swiglu_fused)


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_stages
    return Mesh(np.asarray(devices[:n_stages]), ("pp",))


def shard_params_pp(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Layer stacks sharded over pp (dim 0); embed/norm/lm_head replicated
    (every stage holds them — stage 0 uses embed, the last uses lm_head;
    they are small next to L/P layers)."""
    def place(path, x):
        spec = P("pp") if (path and getattr(path[0], "key", None) == "layers") \
            else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, params)


def pipeline_forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    tokens: jnp.ndarray,     # [B, S] int32, right-padded
    true_len: jnp.ndarray,   # [B] int32
    mesh: Mesh,
    *,
    n_microbatches: int,
) -> jnp.ndarray:
    """Last-token logits [B, V] computed with the GPipe schedule.

    B must divide into n_microbatches equal microbatches; the layer count
    must divide by the number of stages.
    """
    B, S = tokens.shape
    L = cfg.num_hidden_layers
    n_stages = mesh.shape["pp"]
    M = n_microbatches
    assert B % M == 0, f"batch {B} must divide into {M} microbatches"
    assert L % n_stages == 0, f"layers {L} must divide over {n_stages} stages"
    mb = B // M
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    dtype = dtype_of(cfg)
    cos, sin = rope_tables(cfg, S)

    def apply_local_layers(x, layers, mask):
        def layer_fn(x, lp):
            h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
            qkv = h @ lp["qkv_proj"]
            if "qkv_bias" in lp:  # Qwen2-family QKV bias
                qkv = qkv + lp["qkv_bias"]
            q = _split_heads(qkv[..., :Hq * D], Hq, D)
            k = _split_heads(qkv[..., Hq * D:(Hq + Hkv) * D], Hkv, D)
            v = _split_heads(qkv[..., (Hq + Hkv) * D:], Hkv, D)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            attn = grouped_attention(q, k, v, mask)
            h = _merge_heads(attn) @ lp["o_proj"]
            if "o_bias" in lp:
                h = h + lp["o_bias"]
            x = x + h
            h2 = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
            return x + swiglu_fused(h2, lp["gate_up_proj"], lp["down_proj"],
                                    lp.get("gate_up_bias"),
                                    lp.get("down_bias")), None
        x, _ = lax.scan(layer_fn, x, layers)
        return x

    def stage_program(params, tokens, true_len):
        # params["layers"] arrives as this stage's local [L/P, ...] shard.
        stage = lax.axis_index("pp")
        last = n_stages - 1

        def tick(t, carry):
            recv, outs = carry
            mb_idx = jnp.clip(t - stage, 0, M - 1)
            toks_mb = lax.dynamic_slice_in_dim(tokens, mb_idx * mb, mb, 0)
            len_mb = lax.dynamic_slice_in_dim(true_len, mb_idx * mb, mb, 0)
            mask = _causal_mask(S, len_mb, cfg.sliding_window)

            fresh = params["embed"][toks_mb].astype(dtype)
            x_in = jnp.where(stage == 0, fresh, recv)
            h = apply_local_layers(x_in, params["layers"], mask)

            # Last stage finishes microbatch t - (P-1): final norm + logits
            # at each sequence's last valid token.  The vocab-wide lm_head
            # matmul is gated behind a real lax.cond — stage/t are runtime
            # scalars inside shard_map, so non-emitting stages/ticks skip the
            # [mb, V] projection entirely instead of computing and discarding
            # it ((P-1)/P of the pipeline's matmul cost at large vocab).
            done_idx = jnp.clip(t - last, 0, M - 1)
            emit = (stage == last) & (t >= last) & (t - last < M)

            def project(_):
                xf = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
                last_tok = jnp.maximum(len_mb - 1, 0)
                x_last = jnp.take_along_axis(xf, last_tok[:, None, None],
                                             axis=1)
                logits = (x_last[:, 0] @ params["lm_head"]).astype(jnp.float32)
                return lax.dynamic_update_slice_in_dim(outs, logits,
                                                       done_idx * mb, 0)

            outs = lax.cond(emit, project, lambda _: outs, None)

            recv = lax.ppermute(h, "pp",
                                [(i, (i + 1) % n_stages)
                                 for i in range(n_stages)])
            return recv, outs

        # Initial carries must be typed as varying over pp (each stage's
        # values diverge immediately through ppermute / stage-gated writes).
        recv0 = lax.pcast(jnp.zeros((mb, S, cfg.hidden_size), dtype),
                          ("pp",), to="varying")
        outs0 = lax.pcast(jnp.zeros((B, cfg.vocab_size), jnp.float32),
                          ("pp",), to="varying")
        _, outs = lax.fori_loop(0, M + n_stages - 1, tick, (recv0, outs0))
        # Every stage returns a [1, B, V] slab; only the last stage's is
        # real — the caller takes index -1 of the stacked [P, B, V].
        return outs[None]

    param_specs = jax.tree.map(lambda _: P(), params)
    param_specs["layers"] = jax.tree.map(lambda _: P("pp"), params["layers"])
    out = jax.shard_map(
        stage_program, mesh=mesh,
        in_specs=(param_specs, P(), P()),
        out_specs=P("pp"),
    )(params, tokens, true_len)
    return out[-1]
