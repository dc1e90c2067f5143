"""Concurrent chunked-admission stall on the real TPU chip (round 5).

Measures the drain-loop admission stall — the wall time one chunk_step
dispatch takes — with P prompts prefilling CONCURRENTLY:

 * pooled (this repo): all P rows advance in ONE per-row-c0 dispatch;
 * serial (the round-4 layout, for A/B): P separate B=1 dispatches per
   drain iteration, each paying the ~25-40 ms axon tunnel round trip.

Timing per CLAUDE.md rules: a full prefill's worth of chunks per
measurement with ONE trailing readback (per-chunk readbacks would rival
the chunks), warmed up at identical shapes, repeated and medianed.

Run: python tools/bench_chunked_admission.py [--bucket 8192]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from kvcache_factory_tpu.config import CompressionConfig, ModelConfig
from kvcache_factory_tpu.models import chunked_prefill as cp
from kvcache_factory_tpu.models.weights import init_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", type=int, default=8192)
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--pending", type=int, nargs="*", default=[1, 2, 3])
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    cfg = ModelConfig(
        model_type="llama", vocab_size=32000, hidden_size=2048,
        intermediate_size=5632, num_hidden_layers=22, num_attention_heads=16,
        num_key_value_heads=4, head_dim=128,
        max_position_embeddings=max(8192, args.bucket))
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=2048,
                             window_size=8, kernel_size=7, pooling="maxpool")
    params = init_params(cfg, jax.random.PRNGKey(0))
    S, Sc = args.bucket, args.chunk
    n_chunks = S // Sc
    rng = np.random.default_rng(0)

    step = jax.jit(
        lambda p, t, c0, tl, st: cp.chunk_step(p, cfg, t, c0, tl, *st),
        donate_argnums=(4,))

    def run_chunks(P, toks, tl_host):
        """All n_chunks of a P-row pool in one pooled dispatch per chunk;
        returns wall seconds.  Axon's block_until_ready does not reliably
        wait (CLAUDE.md timing rule) — force HOST READBACKS instead; the
        trailing x_last readback forces the whole dispatch chain."""
        state = cp.init_chunked_state(cfg, comp, P, S)
        float(np.asarray(state[3]).sum())
        t0 = time.perf_counter()
        for c in range(n_chunks):
            tc = toks[:, c * Sc:(c + 1) * Sc].copy()
            state = step(params, jnp.asarray(tc),
                         jnp.asarray([c * Sc] * P, jnp.int32),
                         jnp.asarray(tl_host, jnp.int32), state)
        float(np.asarray(state[3]).sum())
        return time.perf_counter() - t0

    print(f"bucket={S} chunk={Sc} ({n_chunks} chunks/prompt), flagship "
          f"1.1B, snapkv 2048")
    base_ms = None
    for P in args.pending:
        toks = rng.integers(0, cfg.vocab_size, (P, S)).astype(np.int32)
        tl = [S] * P

        # pooled: one dispatch advances all P rows
        run_chunks(P, toks, tl)  # warmup/compile at this P
        pooled = min(run_chunks(P, toks, tl) for _ in range(args.repeats))
        pooled_ms = pooled / n_chunks * 1e3

        # serial (round-4 layout): P independent B=1 pools, one dispatch
        # each per drain iteration
        run_chunks(1, toks[:1], tl[:1])  # warmup at B=1
        def serial_once():
            states = [cp.init_chunked_state(cfg, comp, 1, S)
                      for _ in range(P)]
            for st in states:
                float(np.asarray(st[3]).sum())
            t0 = time.perf_counter()
            for c in range(n_chunks):
                for i in range(P):
                    tc = toks[i:i + 1, c * Sc:(c + 1) * Sc].copy()
                    states[i] = step(params, jnp.asarray(tc),
                                     jnp.asarray([c * Sc], jnp.int32),
                                     jnp.asarray(tl[i:i + 1], jnp.int32),
                                     states[i])
            for st in states:
                float(np.asarray(st[3]).sum())
            return time.perf_counter() - t0
        serial = min(serial_once() for _ in range(args.repeats))
        serial_ms = serial / n_chunks * 1e3

        if base_ms is None:
            base_ms = pooled_ms
        print(f"P={P}: pooled {pooled_ms:7.1f} ms/drain-iter "
              f"(stall vs P=1: {pooled_ms / base_ms:4.2f}x) | "
              f"serial {serial_ms:7.1f} ms/drain-iter "
              f"({serial_ms / pooled_ms:4.2f}x pooled)")


if __name__ == "__main__":
    main()
