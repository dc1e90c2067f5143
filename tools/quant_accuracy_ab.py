"""Quant-scheme accuracy A/B: per-group-range (this repo) vs HQQ+outlier
extraction (the reference's quantcache.py:29-58 semantics, torch oracle in
tests/torch_spec.py).

Two measurements at nbits in {1, 2, 3, 4, 8}:

1. Reconstruction on heavy-tailed tensors — relative MSE and max-abs error on
   N(0,1) data with a fraction of entries scaled to land beyond the
   reference's outlier threshold (6.0), the regime its sparse side table was
   built for.
2. End-to-end logits drift on a seeded tiny model — prefill an fp32 cache,
   round-trip K/V through each scheme, decode greedily, compare logits
   against the fp baseline.  This is the measurement that matters: cache
   quantization only exists to serve decode attention.

Run:  python tools/quant_accuracy_ab.py            (table to stdout)
Asserted bounds live in tests/test_quant_ab.py; the table is recorded in
BASELINE.md ("Quantization accuracy A/B").
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "tests"))

import numpy as np

NBITS = (1, 2, 3, 4, 8)
GROUP = 64


def heavy_tailed(rng, shape, outlier_frac=0.005, outlier_scale=10.0):
    x = rng.standard_normal(shape).astype(np.float32)
    n = x.size
    k = max(1, int(n * outlier_frac))
    idx = rng.choice(n, size=k, replace=False)
    flat = x.reshape(-1)
    flat[idx] *= outlier_scale  # |x| ~ 10 sigma >> threshold 6.0
    return x


def ours_roundtrip(x, nbits, group):
    """Plain per-group-range (outlier_extract off): the round-1 design."""
    import jax.numpy as jnp
    from kvcache_factory_tpu.cache.quant_cache import (dequantize_groups,
                                                       quantize_groups)
    codes, scale, zero = quantize_groups(jnp.asarray(x), group, nbits)
    out = dequantize_groups(codes, scale, zero, group, dtype=jnp.float32)
    return np.asarray(out)


def ours_outlier_roundtrip(x, nbits, group):
    """Per-group-range + dense top-1 outlier slot (the shipped default)."""
    import jax.numpy as jnp
    from kvcache_factory_tpu.cache import quant_cache as QC
    from kvcache_factory_tpu.config import QuantConfig
    cfg = QuantConfig(nbits=nbits, q_group_size=group, outlier_extract=True)
    stored, scale, zero, oval, oidx = QC.encode(jnp.asarray(x), cfg)
    out = QC.decode_values(stored, scale, zero, cfg, jnp.float32,
                           oval=oval, oidx=oidx)
    return np.asarray(out)


def per_token_roundtrip(x, nbits):
    """The Pallas kernel layouts' quantizer: one scale per row over the full
    last dim (int8) / int4 per-token variant."""
    import jax.numpy as jnp
    from kvcache_factory_tpu.cache import quant_cache as QC
    if nbits == 8:
        codes, scale, zero = QC.quantize_per_token(jnp.asarray(x))
        out = (codes.astype(jnp.float32) + 128.0) * scale[..., None] \
            + zero[..., None]
    else:
        codes, scale, zero = QC.quantize_per_token4(jnp.asarray(x))
        out = codes.astype(jnp.float32) * scale[..., None] + zero[..., None]
    return np.asarray(out)


def oracle_roundtrip(x, nbits, group):
    import torch
    from torch_spec import hqq_outlier_roundtrip
    return hqq_outlier_roundtrip(torch.from_numpy(x).float(), nbits,
                                 group_size=group).numpy()


def recon_table():
    rng = np.random.default_rng(7)
    x = heavy_tailed(rng, (64, 512))  # 512 = 8 groups of 64 per row
    ref_var = float(np.mean(x * x))
    rows = []
    for nbits in NBITS:
        a0 = ours_roundtrip(x, nbits, GROUP)
        a1 = ours_outlier_roundtrip(x, nbits, GROUP)
        b = oracle_roundtrip(x, nbits, GROUP)
        row = {
            "nbits": nbits,
            "plain_rel_mse": float(np.mean((a0 - x) ** 2)) / ref_var,
            "ours_rel_mse": float(np.mean((a1 - x) ** 2)) / ref_var,
            "hqq_rel_mse": float(np.mean((b - x) ** 2)) / ref_var,
            "ours_max_abs": float(np.max(np.abs(a1 - x))),
            "hqq_max_abs": float(np.max(np.abs(b - x))),
        }
        if nbits in (4, 8):  # Pallas kernel layouts exist at these widths
            t = per_token_roundtrip(x.reshape(64, 4, 128), nbits)
            row["per_token_rel_mse"] = \
                float(np.mean((t.reshape(x.shape) - x) ** 2)) / ref_var
        rows.append(row)
    return rows


def e2e_drift_table(steps=8, outlier_scale=10.0):
    """Tiny-model logits drift: fp decode vs decode over a round-tripped
    cache, with K/V tails amplified (same amplified cache is the baseline,
    so the drift isolates quantization error)."""
    import jax
    import jax.numpy as jnp
    from kvcache_factory_tpu.config import (CompressionConfig, ModelConfig)
    from kvcache_factory_tpu.models import llama
    from kvcache_factory_tpu.models.weights import init_params

    cfg = ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=512,
        dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(42), dtype=jnp.float32)
    comp = CompressionConfig(method="fullkv", max_capacity_prompt=96)
    rng = np.random.default_rng(11)
    toks = rng.integers(2, 128, size=(1, 96)).astype(np.int32)
    true_len = np.array([96], np.int32)
    res = llama.prefill(params, cfg, comp, jnp.asarray(toks),
                        jnp.asarray(true_len), cache_capacity=96 + steps + 1,
                        attn_backend="xla")
    cache = res.cache

    # amplify tails so |x| > 6.0 exists (trained-model K/V have such
    # channels; a random-init tiny model does not)
    def amplify(arr):
        a = np.asarray(arr, np.float32).copy()
        flat = a.reshape(-1)
        idx = np.random.default_rng(3).choice(
            flat.size, size=max(1, flat.size // 200), replace=False)
        flat[idx] *= outlier_scale
        return a

    k0, v0 = amplify(cache.k), amplify(cache.v)
    # zero out the decode headroom the roundtrip shouldn't see
    k0[..., 96:, :] = 0.0
    v0[..., 96:, :] = 0.0

    def drift(k, v):
        c = cache._replace(k=jnp.asarray(k), v=jnp.asarray(v))
        base = cache._replace(k=jnp.asarray(k0), v=jnp.asarray(v0))
        tok_q = tok_b = jnp.argmax(res.logits_last, -1).astype(jnp.int32)
        worst = 0.0
        for _ in range(steps):
            lq, c = llama.decode_step(params, cfg, tok_q, c,
                                      attn_backend="xla")
            lb, base = llama.decode_step(params, cfg, tok_b, base,
                                         attn_backend="xla")
            worst = max(worst, float(jnp.max(jnp.abs(lq - lb))))
            tok_b = jnp.argmax(lb, -1).astype(jnp.int32)
            tok_q = tok_b  # force same token stream; measure pure logit drift
        return worst

    group = 16  # head_dim of the tiny model
    rows = []
    for nbits in NBITS:
        k_p, v_p = ours_roundtrip(k0, nbits, group), ours_roundtrip(v0, nbits, group)
        ka, va = (ours_outlier_roundtrip(k0, nbits, group),
                  ours_outlier_roundtrip(v0, nbits, group))
        kb, vb = oracle_roundtrip(k0, nbits, group), oracle_roundtrip(v0, nbits, group)
        rows.append({"nbits": nbits,
                     "plain_logit_drift": drift(k_p, v_p),
                     "ours_logit_drift": drift(ka, va),
                     "hqq_logit_drift": drift(kb, vb)})
    return rows


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    print("== reconstruction rel-MSE, heavy-tailed N(0,1) + 0.5% x10 "
          f"outliers, group={GROUP} ==")
    print(f"{'nbits':>5} {'plain-range':>12} {'ours(+slot)':>12} "
          f"{'hqq+outlier':>12} {'per-token':>10} "
          f"{'ours max|e|':>12} {'hqq max|e|':>12}")
    for r in recon_table():
        pt = f"{r['per_token_rel_mse']:>10.5f}" if "per_token_rel_mse" in r \
            else f"{'-':>10}"
        print(f"{r['nbits']:>5} {r['plain_rel_mse']:>12.5f} "
              f"{r['ours_rel_mse']:>12.5f} {r['hqq_rel_mse']:>12.5f} {pt} "
              f"{r['ours_max_abs']:>12.4f} {r['hqq_max_abs']:>12.4f}")
    print("\n== end-to-end tiny-model max logit drift vs fp cache "
          "(8 decode steps) ==")
    print(f"{'nbits':>5} {'plain-range':>12} {'ours(+slot)':>12} "
          f"{'hqq+outlier':>12}")
    for r in e2e_drift_table():
        print(f"{r['nbits']:>5} {r['plain_logit_drift']:>12.5f} "
              f"{r['ours_logit_drift']:>12.5f} "
              f"{r['hqq_logit_drift']:>12.5f}")


if __name__ == "__main__":
    main()
