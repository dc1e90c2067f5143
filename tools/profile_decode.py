"""Attribute the B=1 decode step's time to components on the real chip.

VERDICT r2 #6: two rounds at ~0.84 of spec speed-of-light with no breakdown.
Decode at B=1 is HBM-bandwidth-bound (every step streams all weights + the
compressed cache), so each component is characterized as bytes / time =
achieved GB/s and compared against

  a) the v5e HBM spec (819 GB/s), and
  b) the chip's *achievable* streaming bandwidth, measured here by timing a
     pure reduction over the full parameter pytree (no compute to speak of,
     no cache, no kernel dispatch) — spec bandwidth is never reachable by a
     real program, so "floor" must be argued against (b), not (a).

Components measured (each an in-jit 256-step loop, forced host readback,
median of 3 — CLAUDE.md timing rules):

  param_stream   sum(|leaf + eps(acc)|) over all params  -> achievable GB/s
  lm_head        [1, hidden] x [hidden, vocab] matvec loop
  full_step      bench.py protocol (SnapKV cap 2048, prompt 4096, C~2432)
  small_cache    same model, cache capacity 128 -> isolates the cache-
                 streaming term (full - small ~= attention's cache traffic)

Output: a table of (component, ms/step, bytes, GB/s) + the derived floor
fraction, pasted into BASELINE.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from kvcache_factory_tpu.config import CompressionConfig
from kvcache_factory_tpu.models import llama
from kvcache_factory_tpu.models.weights import init_params

V5E_HBM_GBPS = 819.0


def timed(run, *args):
    """Median-of-3 wall time of a pre-jitted callable, forced readback."""
    out = run(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # compile+warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--prompt_len", type=int, default=4096)
    ap.add_argument("--capacity", type=int, default=2048)
    args = ap.parse_args()
    steps = args.steps

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import flagship
    cfg = flagship()
    L = cfg.num_hidden_layers
    params = init_params(cfg, jax.random.PRNGKey(0))
    param_bytes = sum(x.size * x.dtype.itemsize
                      for x in jax.tree.leaves(params))
    lm_bytes = params["lm_head"].size * params["lm_head"].dtype.itemsize

    rows = []

    # --- (1) achievable HBM streaming bandwidth ------------------------------
    leaves = jax.tree.leaves(params)

    @jax.jit
    def stream(leaves):
        def body(i, acc):
            # the acc-derived eps defeats loop hoisting of the reductions
            eps = (acc * 1e-30).astype(jnp.float32)
            s = jnp.float32(0)
            for leaf in leaves:
                s = s + jnp.sum(jnp.abs(leaf.astype(jnp.float32) + eps))
            return acc + s * 1e-30
        return lax.fori_loop(0, steps, body, jnp.float32(0))

    # (the astype(f32) is elementwise inside the reduce; XLA fuses it into
    # the read — bytes streamed are the bf16 bytes)
    t = timed(stream, leaves) / steps
    rows.append(("param_stream", t, param_bytes))

    # --- (2) lm_head matvec --------------------------------------------------
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.hidden_size),
                           jnp.bfloat16)

    @jax.jit
    def lm_loop(x, w):
        def body(i, acc):
            xi = x + (acc * 0).astype(x.dtype)
            return acc + (xi @ w)[0, 0].astype(jnp.float32)
        return lax.fori_loop(0, steps, body, jnp.float32(0))

    t = timed(lm_loop, x0, params["lm_head"]) / steps
    rows.append(("lm_head", t, lm_bytes))

    # --- (3) full decode step at the bench protocol / (4) tiny cache ---------
    def build_and_time(capacity):
        comp = CompressionConfig(method="snapkv", max_capacity_prompt=capacity,
                                 window_size=8, kernel_size=7,
                                 pooling="maxpool")
        S = args.prompt_len
        cache_capacity = comp.layer_capacity(L, S) + steps + 1
        cache_capacity = -(-cache_capacity // 128) * 128
        tokens = jnp.asarray(np.random.default_rng(0).integers(
            0, cfg.vocab_size, (1, S)), jnp.int32)
        tl = jnp.full((1,), S, jnp.int32)
        pre = jax.jit(lambda p, t_, l_: llama.prefill(
            p, cfg, comp, t_, l_, cache_capacity=cache_capacity))(
                params, tokens, tl)
        jax.block_until_ready(jax.tree.leaves(pre.cache))
        first = jnp.argmax(pre.logits_last, axis=-1).astype(jnp.int32)

        def decode_n(params, tok, cache):
            def body(carry, _):
                tok, cache = carry
                logits, cache = llama.decode_step(params, cfg, tok, cache)
                return (jnp.argmax(logits, -1).astype(jnp.int32), cache), tok
            (tok, cache), toks = lax.scan(body, (tok, cache), None,
                                          length=steps)
            return toks
        run = jax.jit(decode_n)
        t = timed(run, params, first, pre.cache) / steps
        kbuf = pre.cache.k  # [L, B, H, C, D]
        cache_bytes = int(2 * L * kbuf.shape[2] * kbuf.shape[3]
                          * kbuf.shape[4] * kbuf.dtype.itemsize)
        return t, cache_bytes

    t_full, cb_full = build_and_time(args.capacity)
    rows.append(("full_step(cap%d)" % args.capacity, t_full,
                 param_bytes + cb_full))
    t_small, cb_small = build_and_time(64)
    rows.append(("small_cache(cap64)", t_small, param_bytes + cb_small))
    rows.append(("attn cache delta", t_full - t_small, cb_full - cb_small))

    print(f"\n{'component':>20} {'ms/step':>9} {'MB':>9} {'GB/s':>7} "
          f"{'vs spec':>8}")
    for name, t, b in rows:
        gbps = b / t / 1e9
        print(f"{name:>20} {t*1e3:9.3f} {b/1e6:9.1f} {gbps:7.0f} "
              f"{gbps/V5E_HBM_GBPS:8.2f}")

    ach = rows[0][2] / rows[0][1] / 1e9  # param_stream GB/s
    sol_spec = (param_bytes + cb_full) / (V5E_HBM_GBPS * 1e9)
    sol_ach = (param_bytes + cb_full) / (ach * 1e9)
    print(f"\nfull step {t_full*1e3:.3f} ms = {sol_spec/t_full:.3f} of SPEC "
          f"SoL ({sol_spec*1e3:.3f} ms), {sol_ach/t_full:.3f} of ACHIEVABLE "
          f"SoL ({sol_ach*1e3:.3f} ms @ {ach:.0f} GB/s measured stream)")


if __name__ == "__main__":
    main()
