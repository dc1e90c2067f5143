"""De-risk probe for weight-only int8 decode (W8A16): does XLA:TPU stream
int8 weights from HBM and fuse the convert into the matvec, or does it
materialize bf16 copies?

Geometry mimics the flagship decode FFN chain (the dominant weight
stream): L layers of x -> x + (x @ Wg[l]) @ Wd[l] with [h, f]/[f, h]
matrices, scanned like the real decode's layer scan.  Per-out-channel
scales commute with the matmul (x @ (q * s_col) == (x @ q) * s_col), so
dequant is applied POST-dot — the int8 variant's only extra on-chip work
is one convert per weight element and an O(out) multiply.

Timing per CLAUDE.md: in-jit steps, forced readback, median of 3.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

H, F, L = 2048, 5632, 22
STEPS = 256


def timed(run, *args):
    out = run(*args)
    float(np.asarray(out).ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*args)
        float(np.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1]


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    wg = (jax.random.normal(k1, (L, H, F), jnp.float32) / np.sqrt(H))
    wd = (jax.random.normal(k2, (L, F, H), jnp.float32) / np.sqrt(F))

    def quant(w):  # per-out-channel symmetric int8 over the input axis
        s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
        q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        return q, s.astype(jnp.bfloat16)

    wg_b, wd_b = wg.astype(jnp.bfloat16), wd.astype(jnp.bfloat16)
    wg_q, sg = jax.jit(quant)(wg)
    wd_q, sd = jax.jit(quant)(wd)
    jax.block_until_ready((wg_b, wd_b, wg_q, sg, wd_q, sd))
    x0 = jax.random.normal(jax.random.PRNGKey(2), (1, H), jnp.bfloat16)

    bytes_bf16 = 2 * L * H * F * 2
    bytes_int8 = 2 * L * H * F * 1

    @jax.jit
    def run_bf16(x, wg, wd):
        def step(i, acc):
            def layer(c, w):
                g, d = w
                return c + jnp.tanh(c @ g) @ d, None
            c, _ = lax.scan(layer, x + (acc * 0).astype(x.dtype), (wg, wd))
            return acc + c[0, 0].astype(jnp.float32)
        return lax.fori_loop(0, STEPS, step, jnp.float32(0))

    @jax.jit
    def run_int8(x, wgq, sg, wdq, sd):
        def step(i, acc):
            def layer(c, w):
                gq, gs, dq, ds = w
                u = jnp.tanh((c @ gq.astype(jnp.bfloat16)) * gs)
                return c + (u @ dq.astype(jnp.bfloat16)) * ds, None
            c, _ = lax.scan(layer, x + (acc * 0).astype(x.dtype),
                            (wgq, sg, wdq, sd))
            return acc + c[0, 0].astype(jnp.float32)
        return lax.fori_loop(0, STEPS, step, jnp.float32(0))

    t_b = timed(run_bf16, x0, wg_b, wd_b) / STEPS
    t_q = timed(run_int8, x0, wg_q, sg, wd_q, sd) / STEPS
    print(f"bf16 : {t_b*1e3:7.3f} ms/step  {bytes_bf16/t_b/1e9:6.0f} GB/s")
    print(f"int8 : {t_q*1e3:7.3f} ms/step  {bytes_int8/t_q/1e9:6.0f} GB/s "
          f"(vs bf16 bytes: {bytes_bf16/t_q/1e9:6.0f})")
    print(f"speedup x{t_b/t_q:.2f}  (2.0 = perfect byte-bound halving)")

    # batched variant (B=8): does the win survive batch?
    x8 = jax.random.normal(jax.random.PRNGKey(3), (8, H), jnp.bfloat16)

    @jax.jit
    def run_bf16_b(x, wg, wd):
        def step(i, acc):
            def layer(c, w):
                g, d = w
                return c + jnp.tanh(c @ g) @ d, None
            c, _ = lax.scan(layer, x + (acc * 0).astype(x.dtype), (wg, wd))
            return acc + jnp.sum(c).astype(jnp.float32)
        return lax.fori_loop(0, STEPS, step, jnp.float32(0))

    @jax.jit
    def run_int8_b(x, wgq, sg, wdq, sd):
        def step(i, acc):
            def layer(c, w):
                gq, gs, dq, ds = w
                u = jnp.tanh((c @ gq.astype(jnp.bfloat16)) * gs)
                return c + (u @ dq.astype(jnp.bfloat16)) * ds, None
            c, _ = lax.scan(layer, x + (acc * 0).astype(x.dtype),
                            (wgq, sg, wdq, sd))
            return acc + jnp.sum(c).astype(jnp.float32)
        return lax.fori_loop(0, STEPS, step, jnp.float32(0))

    t_b8 = timed(run_bf16_b, x8, wg_b, wd_b) / STEPS
    t_q8 = timed(run_int8_b, x8, wg_q, sg, wd_q, sd) / STEPS
    print(f"B=8 bf16 : {t_b8*1e3:7.3f} ms/step   int8 : {t_q8*1e3:7.3f} "
          f"ms/step   speedup x{t_b8/t_q8:.2f}")


if __name__ == "__main__":
    main()
