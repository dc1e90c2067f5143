"""Attention-pattern visualization example (counterpart of the reference's
examples/visualization.ipynb): renders per-layer attention heatmaps and the
per-layer/per-head KV budget allocation for a compressed prefill.

Run: python examples/visualization.py [--model_path HF_DIR] [--out_dir viz_out]
Without --model_path a small randomly initialized model is used.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--out_dir", default="viz_out")
    ap.add_argument("--prompt_len", type=int, default=256)
    ap.add_argument("--method", default="snapkv")
    ap.add_argument("--capacity", type=int, default=64)
    args = ap.parse_args()

    from kvcache_factory_tpu.config import CompressionConfig, ModelConfig
    from kvcache_factory_tpu.models import llama
    from kvcache_factory_tpu.models.weights import init_params, load_params
    from kvcache_factory_tpu.utils import (infer_attention,
                                           plot_attention_heatmap,
                                           plot_budget_allocation)

    if args.model_path:
        params, cfg = load_params(args.model_path)
    else:
        cfg = ModelConfig(model_type="llama", vocab_size=256, hidden_size=128,
                          intermediate_size=256, num_hidden_layers=4,
                          num_attention_heads=8, num_key_value_heads=4,
                          head_dim=16, dtype="float32")
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)

    os.makedirs(args.out_dir, exist_ok=True)
    toks = np.random.default_rng(0).integers(0, cfg.vocab_size,
                                             size=args.prompt_len)

    maps = infer_attention(params, cfg, toks)
    for l in (0, len(maps) // 2, len(maps) - 1):
        p = plot_attention_heatmap(
            maps[l], save_path=os.path.join(args.out_dir, f"attn_layer{l}.png"),
            title=f"layer {l} (mean heads)")
        print("wrote", p)

    comp = CompressionConfig(method=args.method,
                             max_capacity_prompt=args.capacity,
                             window_size=8, kernel_size=7, pooling="maxpool")
    res = llama.prefill(params, cfg, comp, jnp.asarray(toks[None], jnp.int32),
                        jnp.asarray([len(toks)], jnp.int32),
                        cache_capacity=comp.layer_capacity(
                            cfg.num_hidden_layers, len(toks)))
    p = plot_budget_allocation(np.asarray(res.cache.lengths),
                               save_path=os.path.join(args.out_dir, "budgets.png"))
    print("wrote", p)


if __name__ == "__main__":
    main()
