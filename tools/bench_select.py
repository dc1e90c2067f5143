"""A/B: XLA top-k+gather selection vs a Pallas select-and-pack prototype.

Backs the README "TPU-first design" claim that the policy zoo's shared
``select_and_pack`` core (policies/base.py: ``lax.top_k`` + fused
``take_along_axis`` gather) is the right TPU implementation, measured rather
than asserted (VERDICT r2 #7 / r1 #9).

Contenders, at eval shapes (H=32 query heads, D=128, S in {4k, 8k, 32k},
C in {128, 2048} — the reference's headline budgets, README.md:88):

  a) shipped:   full ``select_and_pack`` (scores -> lax.top_k -> gather K+V)
  b) topk only: ``lax.top_k`` ranking alone (isolates rank vs gather cost)
  c) argsort:   full-sort ranking alternative (jnp.argsort desc + slice)
  d) pallas:    Pallas pack prototype — given ranked indices, gathers K/V rows
                via one-hot x KV matmuls on the MXU (the Mosaic-legal way to
                gather dynamic rows: value-level dynamic_slice and row scatter
                do not lower; cf. the decode kernel's one-hot-dot append).
                This is the strongest honest Pallas contender: a from-scratch
                in-kernel top-k would need a sort network in VMEM *plus* this
                same gather.

Timing per CLAUDE.md: in-jit fori_loop iterations + forced host readback;
never run concurrently with another TPU process.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kvcache_factory_tpu.policies.base import select_and_pack


def _pack_kernel(SB: int, idx_ref, kv_ref, o_ref):
    """One [CB, D2] output block accumulated over the S grid axis.

    Each selected row's one-hot hits exactly one S block, so cross-block
    accumulation in the output dtype is exact (all other contributions are 0).
    """
    sb = pl.program_id(2)

    @pl.when(sb == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    ids = idx_ref[0, 0]  # [CB] int32, global row ids
    local = sb * SB + lax.broadcasted_iota(jnp.int32, (ids.shape[0], SB), 1)
    onehot = (ids[:, None] == local).astype(kv_ref.dtype)  # [CB, SB]
    o_ref[0] += jax.lax.dot_general(
        onehot, kv_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("CB", "SB", "interpret"))
def pallas_pack(kv: jnp.ndarray, idx: jnp.ndarray, CB: int = 128,
                SB: int = 1024, interpret: bool = False):
    """Gather ``kv[h, idx[h, c], :]`` -> [H, C, D2] via MXU one-hot dots."""
    H, S, D2 = kv.shape
    C = idx.shape[1]
    grid = (H, C // CB, S // SB)
    return pl.pallas_call(
        functools.partial(_pack_kernel, SB),
        grid=grid,
        in_specs=[
            # [H, 1, C] layout: a (1, 1, CB) block satisfies the (8, 128)
            # tile rule (dim -2 equals the full array dim)
            pl.BlockSpec((1, 1, CB), lambda h, cb, sb: (h, 0, cb)),
            pl.BlockSpec((1, SB, D2), lambda h, cb, sb: (h, sb, 0)),
        ],
        out_specs=pl.BlockSpec((1, CB, D2), lambda h, cb, sb: (h, cb, 0)),
        out_shape=jax.ShapeDtypeStruct((H, C, D2), kv.dtype),
        interpret=interpret,
    )(idx[:, None, :], kv)


def bench(fn, *args, iters):
    """Median-of-3 of an iters-amortized in-jit loop, forced readback."""
    run = jax.jit(lambda *a: lax.fori_loop(
        0, iters, lambda i, acc: acc + fn(*a, i), jnp.float32(0.0)))
    float(np.asarray(run(*args)))  # compile + warm
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(run(*args)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--seqlens", type=int, nargs="*",
                    default=[4096, 8192, 32768])
    ap.add_argument("--caps", type=int, nargs="*", default=[128, 2048])
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()
    H, D = args.h, args.d

    print(f"{'S':>6} {'C':>5} | {'shipped':>9} {'topk':>9} {'argsort':>9} "
          f"{'pallas':>9}  (ms per call)")
    for S in args.seqlens:
        key = jax.random.PRNGKey(0)
        kk, kv_, ks = jax.random.split(key, 3)
        k = jax.random.normal(kk, (H, S, D), jnp.bfloat16)
        v = jax.random.normal(kv_, (H, S, D), jnp.bfloat16)
        scores = jax.random.normal(ks, (H, S), jnp.float32)
        tl = jnp.asarray(S, jnp.int32)
        for C in args.caps:
            if C > S:
                continue
            w = 8
            budget = jnp.full((H,), C - w, jnp.int32)
            nc = jnp.asarray(False)

            def shipped(k, v, scores, i):
                p = select_and_pack(k, v, scores + i, budget, w, tl, C, nc)
                return p.k[0, 0, 0].astype(jnp.float32)

            def topk_only(scores, i):
                _, idx = lax.top_k(scores + i, C)
                return idx[0, 0].astype(jnp.float32)

            def argsort_rank(scores, i):
                idx = jnp.argsort(scores + i, axis=-1, descending=True)[:, :C]
                return idx[0, 0].astype(jnp.float32)

            kvs = jnp.concatenate([k, v], axis=-1)  # one pack for K and V
            _, idx0 = lax.top_k(scores, C)

            def pallas_full(scores, kvs, i):
                _, idx = lax.top_k(scores + i, C)
                out = pallas_pack(kvs, idx, CB=min(128, C), SB=1024)
                return out[0, 0, 0].astype(jnp.float32)

            row = [("shipped", shipped, (k, v, scores)),
                   ("topk", topk_only, (scores,)),
                   ("argsort", argsort_rank, (scores,)),
                   ("pallas", pallas_full, (scores, kvs))]
            ts = []
            for name, fn, fargs in row:
                t = bench(fn, *fargs, iters=args.iters)
                ts.append(t)
                print(f"  [{S} C={C}] {name}: {t*1e3:.3f} ms", flush=True)
            t_ship, t_topk, t_sort, t_pal = ts
            print(f"{S:>6} {C:>5} | {t_ship*1e3:9.3f} {t_topk*1e3:9.3f} "
                  f"{t_sort*1e3:9.3f} {t_pal*1e3:9.3f}", flush=True)


if __name__ == "__main__":
    main()
