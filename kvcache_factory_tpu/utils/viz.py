"""Attention visualization — equivalent of the reference's viztools.

Reference: pyramidkv/viztools/infer.py:4-25 (``infer_attention`` runs a
forward with ``output_attentions=True`` and returns per-layer CPU attention
maps scaled x1e4) and viztools/visualization.py:8-30 (heatmap plotting); used
by examples/visualization.ipynb to reproduce the paper's layer-wise
attention-pattern observations.

Here the attention maps come from a dedicated non-scanned forward that
materializes per-layer softmax probabilities (viz runs on short prompts, so
the O(S^2) maps are fine).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.llama import (_causal_mask, _merge_heads, _split_heads,
                            apply_rope, grouped_attention, rms_norm,
                            rope_tables, swiglu_fused, wdot)


def infer_attention(params, cfg: ModelConfig, tokens: np.ndarray,
                    scale: float = 1e4) -> List[np.ndarray]:
    """Returns one [Hq, S, S] fp32 attention map per layer, scaled by
    ``scale`` (the reference multiplies by 10^4, viztools/infer.py:20)."""
    tokens = jnp.asarray(tokens, jnp.int32)
    if tokens.ndim == 1:
        tokens = tokens[None]
    B, S = tokens.shape
    assert B == 1, "visualization runs on a single prompt"
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    G = Hq // Hkv

    x = params["embed"][tokens].astype(jnp.float32)
    cos, sin = rope_tables(cfg, S)
    mask = _causal_mask(S, jnp.asarray([S], jnp.int32), cfg.sliding_window)

    maps = []
    L = cfg.num_hidden_layers
    layers = params["layers"]
    for l in range(L):
        lp = jax.tree.map(lambda a: a[l].astype(jnp.float32), layers)
        h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
        qkv = wdot(h, lp["qkv_proj"])
        if "qkv_bias" in lp:  # Qwen2-family QKV bias
            qkv = qkv + lp["qkv_bias"]
        q = _split_heads(qkv[..., :Hq * D], Hq, D)
        k = _split_heads(qkv[..., Hq * D:(Hq + Hkv) * D], Hkv, D)
        v = _split_heads(qkv[..., (Hq + Hkv) * D:], Hkv, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        # One implementation of the attention math (grouped_attention,
        # models/llama.py) — the viz maps must show what the model computes.
        out, probs = grouped_attention(q, k, v, mask, return_probs=True)
        maps.append(np.asarray(probs.reshape(Hq, S, S)) * scale)
        h = wdot(_merge_heads(out), lp["o_proj"])
        if "o_bias" in lp:
            h = h + lp["o_bias"]
        x = x + h
        h2 = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
        x = x + swiglu_fused(h2, lp["gate_up_proj"], lp["down_proj"],
                             lp.get("gate_up_bias"), lp.get("down_bias"))
    return maps


def plot_attention_heatmap(attn_map: np.ndarray, head: Optional[int] = None,
                           save_path: Optional[str] = None, title: str = "",
                           log_scale: bool = True):
    """Heatmap of one layer's attention (mean over heads unless ``head``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    m = attn_map[head] if head is not None else attn_map.mean(axis=0)
    if log_scale:
        m = np.log1p(m)
    plt.figure(figsize=(8, 7))
    plt.imshow(m, cmap="viridis", aspect="auto")
    plt.colorbar(label="log(1 + attention x 1e4)" if log_scale else "attention")
    plt.xlabel("key position")
    plt.ylabel("query position")
    plt.title(title or ("head %d" % head if head is not None else "mean heads"))
    plt.tight_layout()
    if save_path:
        plt.savefig(save_path, dpi=120)
        plt.close()
        return save_path
    return plt.gcf()


def plot_budget_allocation(lengths: np.ndarray, save_path: Optional[str] = None):
    """Per-layer/per-head retained-cache lengths ([L, H] or [L, B, H]) —
    visualizes PyramidKV's pyramid and AdaKV's adaptive head budgets."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    lengths = np.asarray(lengths)
    if lengths.ndim == 3:
        lengths = lengths[:, 0]
    plt.figure(figsize=(9, 5))
    plt.imshow(lengths, cmap="magma", aspect="auto")
    plt.colorbar(label="retained KV entries")
    plt.xlabel("head")
    plt.ylabel("layer")
    plt.title("KV budget allocation")
    plt.tight_layout()
    if save_path:
        plt.savefig(save_path, dpi=120)
        plt.close()
        return save_path
    return plt.gcf()
