"""Pallas TPU kernel: causal flash prefill attention + in-kernel SnapKV scores.

North-star requirement (BASELINE.json): "prefill flash-attention kernels emit
compression scores in-kernel".  The reference computes attention AND a second
window x S scoring matmul per layer (pyramidkv_utils.py:317-327); here both
come out of one kernel:

 * causal flash attention (online softmax, KV streamed block-by-block from
   HBM with double buffering, O(QB * D) VMEM);
 * observation-window column scores: the window rows' softmax rows are exactly
   their causal-attention rows (the reference's scoring mask — causal tail
   block + all past columns — coincides with causal attention for those rows),
   so after a q-block's online softmax finishes, a bounded second sweep over
   KV renormalizes with the final (m, l) and accumulates column sums for rows
   inside [true_len - w, true_len).  At most ceil(w/QB)+1 of the q blocks pay
   that sweep.  The scores output block stays resident across the sequential
   q-block grid iterations and accumulates in place (TPU grids are sequential).

Numerical note: scores match the fp32 two-pass softmax exactly (same m/l
renormalization), solving SURVEY.md §7 hard part #2.

Shapes: per (batch, query-head) — the wrapper maps heads/batch onto the grid;
GQA indexes the shared KV head.  Requires lane-aligned head_dim (D % 128 == 0).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _flash_kernel(S: int, QB: int, KB: int, D: int, G: int, W: int,
                  scale: float, sparse, sink_blocks: int, local_blocks: int,
                  stride: int,
                  tl_ref,               # scalar prefetch [1] true_len
                  q_ref,                # VMEM [1, QB, D]
                  k_hbm, v_hbm,         # HBM [Hkv, S, D]
                  o_ref,                # VMEM [1, QB, D]
                  scores_ref,           # VMEM [1, 1, S] f32 (resident)
                  k_s, v_s,             # VMEM [2, KB, D]
                  sems):                # DMA [2]
    hq = pl.program_id(0)
    qb = pl.program_id(1)
    n_qb = pl.num_programs(1)
    hkv = hq // G
    true_len = tl_ref[0]
    win_start = true_len - W

    row0 = qb * QB
    # Causal: this q block only needs kv blocks [0, kv_hi).
    kv_hi = lax.min((row0 + QB + KB - 1) // KB, S // KB)

    @pl.when(qb == 0)
    def _():
        scores_ref[0, 0, :] = jnp.zeros((S,), jnp.float32)

    def get_k(slot, blk):
        return pltpu.make_async_copy(
            k_hbm.at[hkv, pl.ds(blk * KB, KB), :], k_s.at[slot], sems.at[0])

    def get_v(slot, blk):
        return pltpu.make_async_copy(
            v_hbm.at[hkv, pl.ds(blk * KB, KB), :], v_s.at[slot], sems.at[1])

    if not sparse:  # dense path double-buffers; sparse DMAs inline per block
        get_k(0, 0).start()
        get_v(0, 0).start()

    q = q_ref[0].astype(jnp.float32)  # [QB, D]
    rows = row0 + lax.broadcasted_iota(jnp.int32, (QB, KB), 0)

    def logits_for(blk, kb):
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        cols = blk * KB + lax.broadcasted_iota(jnp.int32, (QB, KB), 1)
        bad = (cols > rows) | (cols >= true_len)
        return jnp.where(bad, NEG_INF, s)

    diag_blk = kv_hi - 1

    def block_selected(blk):
        """MInference-style a-shape pattern: attention sinks + local band +
        strided global columns (minference integration equivalent,
        pyramidkv/minference.py:49-59 delegates to the external package)."""
        return ((blk < sink_blocks) | (blk > diag_blk - local_blocks)
                | (blk % stride == 0))

    if sparse:
        def body(blk, carry):
            def compute(carry):
                m, l, acc = carry
                cp_k = get_k(0, blk)
                cp_v = get_v(0, blk)
                cp_k.start()
                cp_v.start()
                cp_k.wait()
                s = logits_for(blk, k_s[0].astype(jnp.float32))
                m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m - m_new)
                l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
                cp_v.wait()
                pv = jax.lax.dot_general(p, v_s[0].astype(jnp.float32),
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                return m_new, l_new, pv + acc * alpha

            return lax.cond(block_selected(blk), compute, lambda c: c, carry)
    else:
        def body(blk, carry):
            m, l, acc = carry
            slot = blk % 2

            @pl.when(blk + 1 < kv_hi)
            def _():
                get_k((blk + 1) % 2, blk + 1).start()
                get_v((blk + 1) % 2, blk + 1).start()

            get_k(slot, blk).wait()
            s = logits_for(blk, k_s[slot].astype(jnp.float32))
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            get_v(slot, blk).wait()
            pv = jax.lax.dot_general(p, v_s[slot].astype(jnp.float32),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            return m_new, l_new, pv + acc * alpha

    m0 = jnp.full((QB, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((QB, 1), jnp.float32)
    acc0 = jnp.zeros((QB, D), jnp.float32)
    m, l, acc = lax.fori_loop(0, kv_hi, body, (m0, l0, acc0))

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)

    # ---- window-score emission: bounded second sweep ----
    row_ids = row0 + lax.broadcasted_iota(jnp.int32, (QB, 1), 0)
    in_window = (row_ids >= win_start) & (row_ids < true_len)  # [QB, 1]
    has_window_rows = jnp.any(in_window)

    @pl.when(has_window_rows)
    def _():
        inv_l = jnp.where(in_window, 1.0 / l_safe, 0.0)  # zero non-window rows

        def score_body(blk, _):
            def compute(_):
                cp = get_k(0, blk)
                cp.start()
                cp.wait()
                s = logits_for(blk, k_s[0].astype(jnp.float32))
                p = jnp.exp(s - m) * inv_l  # final-normalized window rows
                colsum = jnp.sum(p, axis=0)  # [KB]
                cur = scores_ref[0, 0, pl.ds(blk * KB, KB)]
                scores_ref[0, 0, pl.ds(blk * KB, KB)] = cur + colsum
                return 0

            if sparse:
                return lax.cond(block_selected(blk), compute, lambda c: c, 0)
            return compute(0)

        lax.fori_loop(0, kv_hi, score_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("window", "q_block", "kv_block",
                                    "interpret", "sparse_pattern"))
def flash_prefill_attention(
    q: jnp.ndarray,        # [Hq, S, D]
    k: jnp.ndarray,        # [Hkv, S, D]
    v: jnp.ndarray,        # [Hkv, S, D]
    true_len: jnp.ndarray,  # scalar int32
    window: int,
    q_block: int = 1024,   # swept on v5e at 32k: 1024/1024 -> 65 TF/s
    kv_block: int = 1024,
    interpret: bool = False,
    sparse_pattern: Optional[Tuple[int, int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (out [Hq, S, D], window_scores [Hq, S] fp32).

    ``window_scores`` are the SnapKV observation-window column sums (sum over
    window rows of the causal softmax).  Positions >= true_len - window are
    meaningless for selection and must be masked by the caller (the packed
    selection core does this), matching ``window_attention_scores``.
    """
    Hq, S, D = q.shape
    Hkv = k.shape[0]
    G = Hq // Hkv
    assert D % 128 == 0, "flash prefill requires lane-aligned head_dim"
    QB = min(q_block, S)
    KB = min(kv_block, S)
    S_pad = max(_round_up(S, QB), _round_up(S, KB))
    S_pad = _round_up(S_pad, QB)
    S_pad = _round_up(S_pad, KB)
    if S_pad != S:
        pq = ((0, 0), (0, S_pad - S), (0, 0))
        q = jnp.pad(q, pq)
        k = jnp.pad(k, pq)
        v = jnp.pad(v, pq)

    scale = 1.0 / float(D) ** 0.5
    # sparse_pattern = (sink_blocks, local_blocks, stride): the MInference-
    # equivalent a-shape sparse prefill — each q block attends its causal
    # sinks, a local diagonal band, and every stride-th block between.
    if sparse_pattern is not None:
        sink_b, local_b, stride = sparse_pattern
        sparse = True
    else:
        sink_b, local_b, stride = 0, 0, 1
        sparse = False
    kernel = functools.partial(_flash_kernel, S_pad, QB, KB, D, G, window,
                               scale, sparse, sink_b, local_b, stride)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Hq, S_pad // QB),
        in_specs=[
            pl.BlockSpec((1, QB, D), lambda h, b, tl: (h, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, QB, D), lambda h, b, tl: (h, b, 0),
                         memory_space=pltpu.VMEM),
            # scores block resident across the q-block loop (same index per h)
            pl.BlockSpec((1, 1, S_pad), lambda h, b, tl: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KB, D), k.dtype),
            pltpu.VMEM((2, KB, D), v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out, scores = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Hq, S_pad, D), q.dtype),
            jax.ShapeDtypeStruct((Hq, 1, S_pad), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.reshape(true_len.astype(jnp.int32), (1,)), q, k, v)

    return out[:, :S], scores[:, 0, :S]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
