"""Ring attention: causal self-attention over a sequence-sharded mesh axis.

Context parallelism for prompts beyond a single chip's HBM (SURVEY.md §2.6 —
the reference has no sequence scaling at all; it truncates the prompt middle,
run_longbench.py:199-205).  Each device holds one sequence shard of Q/K/V;
K/V shards circulate around the ring via ``lax.ppermute`` while every device
accumulates its online-softmax partial attention — classic ring attention,
expressed with XLA collectives so it compiles to ICI transfers on a real
slice and runs on the virtual CPU mesh in tests.

Use under ``shard_map`` with the sequence axis sharded:

    out = shard_map(
        functools.partial(ring_attention, axis_name="sp"),
        mesh=mesh,
        in_specs=(P(None, None, "sp", None),) * 3 + (P(),),
        out_specs=P(None, None, "sp", None),
    )(q, k, v, true_len)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.attention import NEG_INF  # canonical mask constant


def ring_attention(
    q: jnp.ndarray,        # [B, Hq, S_local, D] (this device's sequence shard)
    k: jnp.ndarray,        # [B, Hkv, S_local, D]
    v: jnp.ndarray,        # [B, Hkv, S_local, D]
    true_len: jnp.ndarray,  # [B] GLOBAL valid length
    axis_name: str = "sp",
) -> jnp.ndarray:
    """Causal attention over the global sequence; returns this shard's rows."""
    B, Hq, S_loc, D = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    n = lax.psum(1, axis_name)
    my = lax.axis_index(axis_name)
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))

    qg = q.reshape(B, Hkv, G, S_loc, D)
    rows = my * S_loc + lax.broadcasted_iota(jnp.int32, (S_loc, S_loc), 0)

    def fold(i, m, l, acc, k_blk, v_blk):
        src = (my - i) % n  # ring: after i hops we hold shard `src`
        logits = jnp.einsum("bhgqd,bhkd->bhgqk", qg, k_blk,
                            preferred_element_type=jnp.float32) * scale
        cols = src * S_loc + lax.broadcasted_iota(jnp.int32, (S_loc, S_loc), 1)
        bad = (cols > rows)[None] | (cols[None] >= true_len[:, None, None])
        logits = jnp.where(bad[:, None, None], NEG_INF, logits)

        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bhgqk,bhkd->bhgqd", p.astype(v_blk.dtype), v_blk,
                        preferred_element_type=jnp.float32)
        return m_new, l_new, acc * alpha + pv

    def step(i, carry):
        m, l, acc, kv = carry
        k_blk, v_blk = kv
        m, l, acc = fold(i, m, l, acc, k_blk, v_blk)
        perm = [(j, (j + 1) % n) for j in range(n)]
        kv_next = (lax.ppermute(k_blk, axis_name, perm),
                   lax.ppermute(v_blk, axis_name, perm))
        return m, l, acc, kv_next

    # pvary: the zero/neg-inf carries are device-invariant at init but the
    # loop writes device-varying values into them — mark them varying over
    # the ring axis up front (shard_map vma typing, jax >= 0.8).
    m0 = lax.pvary(jnp.full((B, Hkv, G, S_loc, 1), NEG_INF, jnp.float32),
                   axis_name)
    l0 = lax.pvary(jnp.zeros((B, Hkv, G, S_loc, 1), jnp.float32), axis_name)
    acc0 = lax.pvary(jnp.zeros((B, Hkv, G, S_loc, D), jnp.float32), axis_name)
    # n-1 fold+permute hops, then a final fold with NO trailing permute —
    # the n-th ppermute's result was discarded (two wasted ICI transfers of
    # full K/V shards per call).
    m, l, acc, kv = lax.fori_loop(0, n - 1, step, (m0, l0, acc0, (k, v)))
    m, l, acc = fold(n - 1, m, l, acc, *kv)

    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = (acc / l_safe).reshape(B, Hq, S_loc, D)
    return out.astype(q.dtype)


def make_ring_attention(mesh, axis_name: str = "sp"):
    """shard_map-wrapped ring attention over ``axis_name`` of ``mesh``."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    return shard_map(
        functools.partial(ring_attention, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(None, None, axis_name, None),
                  P(None, None, axis_name, None),
                  P(None, None, axis_name, None), P(None)),
        out_specs=P(None, None, axis_name, None),
    )
