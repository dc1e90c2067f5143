"""Prefill attention ops.

``blocked_causal_attention`` processes query rows in blocks with a scan, so
peak memory is O(H * q_block * S) instead of the O(H * S^2) a naive masked
softmax materializes — this is what lets a single chip prefill 32k-token
contexts (the reference never scales context; it truncates the prompt middle
instead, run_longbench.py:199-205 / SURVEY.md §5).

The math is exact (full-row softmax per block, fp32), so it is
interchangeable with the direct computation — parity-tested in
tests/test_attention.py.  A Pallas flash kernel can slot in behind the same
signature later; XLA already fuses this scan well on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = float(jnp.finfo(jnp.float32).min)


def blocked_causal_attention(
    q: jnp.ndarray,  # [B, Hq, S_q, D]
    k: jnp.ndarray,  # [B, Hkv, S, D]
    v: jnp.ndarray,  # [B, Hkv, S, D]
    true_len: jnp.ndarray,  # [B]
    sliding_window: Optional[int] = None,
    q_block: int = 512,
    row_offset=None,  # scalar or [B] int32: q row r has global id offset + r
) -> jnp.ndarray:
    """Causal (optionally sliding-window) self-attention, q-row blocked.

    ``row_offset`` (chunked prefill, models/chunked_prefill.py): q is a
    chunk of a longer sequence whose keys fill ``k``/``v``; every mask uses
    the global row ids, so running all chunks reproduces the one-shot
    attention exactly.  A [B] vector gives every batch row its own offset
    (concurrent chunked admissions at different prefill depths share one
    dispatch).  With it unset, q and k share one length S."""
    B, Hq, S_q, D = q.shape
    Hk = k.shape[1]
    S = k.shape[2]
    G = Hq // Hk
    if row_offset is None:
        assert S_q == S, "q/k lengths differ only with row_offset"
        row_offset = jnp.int32(0)
    row_offset = jnp.broadcast_to(jnp.asarray(row_offset, jnp.int32), (B,))
    qb = min(q_block, S_q)
    n_blocks = (S_q + qb - 1) // qb
    S_pad = n_blocks * qb
    if S_pad != S_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, S_pad - S_q), (0, 0)))

    qg = q.reshape(B, Hk, G, S_pad, D)
    # [nb, B, Hk, G, qb, D] scan layout
    q_blocks = qg.reshape(B, Hk, G, n_blocks, qb, D).transpose(3, 0, 1, 2, 4, 5)
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    cols = lax.broadcasted_iota(jnp.int32, (qb, S), 1)

    def body(_, qb_and_idx):
        qblk, bi = qb_and_idx  # [B, Hk, G, qb, D], scalar
        logits = jnp.einsum("bhgqd,bhkd->bhgqk", qblk, k,
                            preferred_element_type=jnp.float32) * scale
        rows = (row_offset[:, None, None] + bi * qb
                + lax.broadcasted_iota(jnp.int32, (qb, S), 0)[None])  # [B,qb,S]
        m = cols[None] <= rows
        if sliding_window is not None:
            m = m & (cols[None] > rows - sliding_window)
        m = m & (cols[None] < true_len[:, None, None])  # [B, qb, S]
        logits = jnp.where(m[:, None, None], logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhgqk,bhkd->bhgqd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        return None, out.astype(q.dtype)

    blk_idx = jnp.arange(n_blocks, dtype=jnp.int32)
    _, outs = lax.scan(body, None, (q_blocks, blk_idx))
    # [nb, B, Hk, G, qb, D] -> [B, Hq, S_q, D]
    out = outs.transpose(1, 2, 3, 0, 4, 5).reshape(B, Hq, S_pad, D)
    return out[:, :, :S_q]
