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

Small-S throughput notes (v5e, round 3): fitting rate vs block size gives
~1.1 us fixed overhead per [1024, 1024] block-pair against a 144 TF/s
steady-state rate, so 8k runs at ~91 TF/s while 64k (2048-blocks) reaches
134.  Two structural attacks were built and MEASURED SLOWER, then reverted:
(tried: cross-grid-step DMA prefetch of the next step's first K/V blocks —
the per-step scalar/branch cost exceeds the ~0.3 us DMA latency it hides,
8k 90.2 -> 87.4, 4k 56.5 -> 53.7 TF/s)
(tried: flat-pipeline rewrite — one grid step per head, scalar-prefetched
(qb, blk) pair schedule so the MXU/VPU pipeline never restarts at q-block
boundaries, whole-head q/o VMEM blocks, select-reset online-softmax carry —
8k 85.9, 16k 103.8 vs 90.2/111.3 for this kernel: the flattened body's
per-pair overhead (dynamic q-ref slices, SMEM schedule reads, branchy
boundary finalize) exceeds the ramp it removes.  A first variant with
manual q/o DMA and conditional per-q-block waits deadlocked on real
hardware while passing interpret-mode parity — conditional DMA waits and
DMA-written HBM *output* refs are the constructs that broke; keep waits
unconditional and outputs Mosaic-pipelined.)
(tried, round 4, third and FINAL 8k attack: fewer/bigger grid steps —
QB=2048/KB=1024 (two q-blocks sharing one K/V stream) 85.3 TF/s and
QB=1024/KB=2048 87.0 vs 90.4 for the shipped 1024^2 same-session.  Item
closed at the ~91 TF/s characterized floor; batching recovers it where it
matters — B=8 at 8k runs 96 TF/s through the batched grid.)

Shapes: per (batch, query-head) — the wrapper maps heads/batch onto the grid;
GQA indexes the shared KV head.  Requires lane-aligned head_dim
(D % 128 == 0).  Block sizes below 128 are interpret-only: the scores
plane slices at KB-lane granularity, which Mosaic rejects under 128 on
hardware (found round 5 — qb=64 fails remote compile even dense).
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
                  WPAD: int, use_stash: bool, scale: float, sparse,
                  sink_blocks: int, local_blocks: int, stride: int,
                  use_mask: bool, SW, use_off: bool, emit_ml: bool,
                  *refs):
    # emit_ml (ring-attention fold, round 5): a third output carries each
    # row's final online-softmax stats — lanes 0:128 broadcast m, lanes
    # 128:256 broadcast l — so an XLA wrapper can combine per-hop partial
    # attentions exactly (parallel/ring_attention.py).
    refs = list(refs)
    n_scalar = 2 if (use_mask or use_off) else 1
    ml_ref = refs.pop(n_scalar + 5) if emit_ml else None
    if use_mask:
        # scalar prefetch: [off [B]], tl [B], mask [B, Hq, n_qb, n_kvb] int32
        (tl_ref, mask_ref, q_ref, k_hbm, v_hbm, o_ref, scores_ref,
         k_s, v_s, s_buf, swin_buf, ml_buf, sems) = refs
        off_ref = None
    elif use_off:
        (off_ref, tl_ref, q_ref, k_hbm, v_hbm, o_ref, scores_ref,
         k_s, v_s, s_buf, swin_buf, ml_buf, sems) = refs
        mask_ref = None
    else:
        (tl_ref, q_ref, k_hbm, v_hbm, o_ref, scores_ref,
         k_s, v_s, s_buf, swin_buf, ml_buf, sems) = refs
        mask_ref = off_ref = None
    # Grid (B, Hq, n_qb), B outermost (VERDICT r3 #4: batch folded into the
    # grid; the per-example true_len rides the [B] scalar-prefetch vector —
    # the decode kernel's lens idiom — replacing the per-example Python loop
    # of unrolled pallas_calls).
    b = pl.program_id(0)
    hq = pl.program_id(1)
    qb = pl.program_id(2)
    n_qb = pl.num_programs(2)
    hkv = hq // G
    true_len = tl_ref[b]
    win_start = true_len - W

    # Chunked-prefill mode (use_off): q rows are a CHUNK of a longer
    # sequence; their global row ids start at off_ref[b] (per-row on the
    # scalar-prefetch vector, like true_len — concurrent admissions at
    # different prefill depths batch into ONE call) and K/V span the full
    # buffer.  Causality/window/kv_hi all use the global ids, so blocks
    # past the chunk's causal frontier are skipped — total attention over
    # all chunks is exactly the causal half, at kernel speed.
    row0 = qb * QB + (off_ref[b] if use_off else 0)
    # Causal: this q block only needs kv blocks [0, kv_hi).
    kv_hi = lax.min((row0 + QB + KB - 1) // KB, S // KB)
    # Sliding window (Mistral/Qwen2, mistral_model.py:273-288): row r sees
    # cols (r - SW, r], so blocks strictly below (row0 - SW + 1) // KB hold
    # no visible keys for ANY row of this q block and are skipped entirely —
    # windowed prefill streams O(S * SW) instead of O(S^2) bytes, the whole
    # point of the window.  Whole-sequence prefill always has
    # kv_lo <= row0 // KB < kv_hi (the diagonal block is in range), but in
    # chunk mode row0 can exceed the KV buffer (ring hops: row0 includes
    # (my - src) * S_loc), where an unclamped kv_lo could reach kv_hi —
    # the prologue would then DMA out of bounds and the epilogue wait on a
    # never-signaled semaphore (interpret-clean, DEADLOCK on hardware).
    # Clamp to kv_hi - 1: the degenerate single block is fully
    # window-masked, and its garbage (m=finfo.min, l) folds to zero weight
    # in the ring combine exactly like any fully-masked hop row.
    if SW is None:
        kv_lo = 0  # static: dense code is byte-identical to before
    else:
        kv_lo = jnp.clip((row0 - SW + 1) // KB, 0, kv_hi - 1)

    @pl.when(qb == 0)
    def _():
        scores_ref[0, 0, 0, :] = jnp.zeros((S,), jnp.float32)

    def get_k(slot, blk):
        return pltpu.make_async_copy(
            k_hbm.at[b, hkv, pl.ds(blk * KB, KB), :], k_s.at[slot],
            sems.at[slot, 0])

    def get_v(slot, blk):
        return pltpu.make_async_copy(
            v_hbm.at[b, hkv, pl.ds(blk * KB, KB), :], v_s.at[slot],
            sems.at[slot, 1])

    if not sparse:  # dense path triple-buffers; sparse DMAs inline per block
        get_k(kv_lo % 3, kv_lo).start()
        get_v(kv_lo % 3, kv_lo).start()

        if S // KB > 1:  # static: chunk 1's slice must exist to be traced
            @pl.when(kv_hi > kv_lo + 1)
            def _():
                get_k((kv_lo + 1) % 3, kv_lo + 1).start()
                get_v((kv_lo + 1) % 3, kv_lo + 1).start()

    # MXU inputs stay in the storage dtype (bf16 on TPU): bf16 x bf16
    # products are exact under the fp32 accumulation the MXU always does, so
    # upcasting to fp32 first gains nothing and costs 3-6x the MXU passes.
    q = q_ref[0, 0]  # [QB, D]
    # Hoisted mask state: col > row (causal) OR col >= true_len collapses to
    # col > min(row, true_len - 1); the min and both iotas live outside the
    # KV loop so the per-block mask is one add + one compare + one select.
    # (tried: lax.cond-skipping the mask for interior blocks — the branch
    # costs more than the VPU select it saves, 95 -> 71 TF/s; also tried
    # splitting the fori_loop into nomask-interior + masked-boundary loops —
    # the dynamic loop boundary breaks Mosaic's pipelining, 111 -> 108 TF/s)
    rows = row0 + lax.broadcasted_iota(jnp.int32, (QB, KB), 0)
    row_lim = jnp.minimum(rows, true_len - 1)
    col_base = lax.broadcasted_iota(jnp.int32, (QB, KB), 1)

    def logits_for(blk, kb):
        # (tried: raw logits with 1/sqrt(D) folded into the fold-step exp —
        # the extra [QB, KB] fp32 temp blew the 16 MB scoped-VMEM budget)
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        bad = (blk * KB + col_base) > row_lim
        if SW is not None:  # window lower bound: col <= row - SW is out
            bad = bad | ((blk * KB + col_base) <= rows - SW)
        return jnp.where(bad, NEG_INF, s)

    def fold(m, l, acc, s_prev, v_blk):
        """Online-softmax fold of one block's logits + its PV matmul."""
        m_new = jnp.maximum(m, jnp.max(s_prev, axis=-1, keepdims=True))
        p = jnp.exp(s_prev - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v_blk.dtype), v_blk,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return m_new, l_new, pv + acc * alpha

    diag_blk = kv_hi - 1

    # ---- window-score bookkeeping (dense path) ----
    # Instead of a second serial sweep over K (re-DMA + re-matmul of every
    # block — ~2/n_qb of the main work at small S, unpipelined), the dense
    # path STASHES the window rows' logits as they are computed: only
    # ceil(W/QB)+1 q blocks contain window rows, and only WPAD rows of each
    # [QB, KB] logits block are kept ([WPAD, S] fp32 scratch).  The final
    # renormalization pass is pure VPU work on data already in VMEM.
    row_ids = row0 + lax.broadcasted_iota(jnp.int32, (QB, 1), 0)
    in_window = (row_ids >= win_start) & (row_ids < true_len)  # [QB, 1]
    has_window_rows = jnp.any(in_window)
    # 8-aligned row window inside the q block covering all window rows this
    # block holds (WPAD >= W + 7 guarantees coverage after aligning down).
    # Clip in 8-row units with the multiply OUTSIDE so Mosaic can prove the
    # dynamic sublane start is tile-aligned (same idiom as the decode
    # kernel's RMW window).
    r0_al = jnp.clip((win_start - row0) // 8, 0, max(QB - WPAD, 0) // 8) * 8

    def stash_window(blk):
        """Copy the window rows of s_buf[blk % 2] into the stash.  Mosaic has
        no value-level dynamic_slice; slicing a REF at an 8-aligned dynamic
        sublane start lowers fine."""
        if not use_stash:
            return  # sparse paths / oversize windows keep the re-sweep

        @pl.when(has_window_rows)
        def _():
            swin_buf[:, pl.ds(blk * KB, KB)] = \
                s_buf[blk % 2, pl.ds(r0_al, WPAD), :]

    def block_selected(blk):
        """MInference-equivalent sparse patterns (the reference delegates to
        the external package, pyramidkv/minference.py:49-59): static a-shape
        (attention sinks + local band + strided global columns) or a dynamic
        per-(head, q-block) vertical-slash block mask estimated from the last
        queries' attention (computed in XLA, prefetched to SMEM)."""
        if use_mask:
            return mask_ref[b, hq, qb, blk] != 0
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
                s = logits_for(blk, k_s[0])
                cp_v.wait()
                return fold(m, l, acc, s, v_s[0])

            return lax.cond(block_selected(blk), compute, lambda c: c, carry)

    m0 = jnp.full((QB, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((QB, 1), jnp.float32)
    acc0 = jnp.zeros((QB, D), jnp.float32)
    if sparse:
        m, l, acc = lax.fori_loop(0, kv_hi, body, (m0, l0, acc0))
    else:
        # Software-pipelined: block blk-1's logits live in a persistent VMEM
        # ping-pong scratch (s_buf) so that iteration blk's QK matmul (MXU)
        # has no data dependence on the softmax fold of the previous block
        # (VPU) and the two can overlap — the naive fused body is one serial
        # MXU->VPU->MXU chain.  A fori_loop *carry* for the logits forces a
        # multi-MB copy per iteration (measured 106 -> 89 TF/s); the scratch
        # write/read is in place.
        get_k(kv_lo % 3, kv_lo).wait()
        s_buf[kv_lo % 2] = logits_for(kv_lo, k_s[kv_lo % 3])
        stash_window(kv_lo)

        def body(blk, carry):
            m, l, acc = carry

            @pl.when(blk + 1 < kv_hi)
            def _():
                get_k((blk + 1) % 3, blk + 1).start()
                get_v((blk + 1) % 3, blk + 1).start()

            get_k(blk % 3, blk).wait()
            s_buf[blk % 2] = logits_for(blk, k_s[blk % 3])
            stash_window(blk)
            get_v((blk - 1) % 3, blk - 1).wait()
            m, l, acc = fold(m, l, acc, s_buf[(blk - 1) % 2],
                             v_s[(blk - 1) % 3])
            return m, l, acc

        m, l, acc = lax.fori_loop(kv_lo + 1, kv_hi, body, (m0, l0, acc0))
        get_v((kv_hi - 1) % 3, kv_hi - 1).wait()
        m, l, acc = fold(m, l, acc, s_buf[(kv_hi - 1) % 2],
                         v_s[(kv_hi - 1) % 3])

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)
    if emit_ml:
        # raw (m, l), not l_safe.  NOTE a fully-masked row does NOT read
        # back l == 0: masked logits are finfo.min (finite), so each masked
        # column contributes exp(0) = 1 and l sums to the folded column
        # count, with m = finfo.min.  The hop combine still weighs such a
        # row to zero because beta = exp(finfo.min - m_new) underflows to
        # exactly 0.0 whenever any other hop saw a real column.  Do NOT use
        # l == 0 to detect fully-masked rows downstream — test m instead.
        ml_ref[0, 0, :, 0:128] = jnp.broadcast_to(m, (QB, 128))
        ml_ref[0, 0, :, 128:256] = jnp.broadcast_to(l, (QB, 128))

    # ---- window-score emission ----
    @pl.when(has_window_rows)
    def _():
        inv_l = jnp.where(in_window, 1.0 / l_safe, 0.0)  # zero non-window rows

        if use_stash:
            # Dense: renormalize the STASHED window-row logits with the final
            # (m, l) — no K re-read, no second QK matmul (the re-sweep cost
            # ~2/n_qb of the main pass at 8k, measured 81 TF/s; VERDICT #2).
            # Mosaic has no value-level dynamic_slice: stage the per-row
            # (m, inv_l) through a VMEM ref and slice the REF at the
            # 8-aligned dynamic start.
            ml_buf[:, 0, :] = jnp.broadcast_to(m, (QB, 128))
            ml_buf[:, 1, :] = jnp.broadcast_to(inv_l, (QB, 128))
            m_w = ml_buf[pl.ds(r0_al, WPAD), 0, :][:, 0:1]
            il_w = ml_buf[pl.ds(r0_al, WPAD), 1, :][:, 0:1]

            def score_body(blk, _):
                sw = swin_buf[:, pl.ds(blk * KB, KB)]  # [WPAD, KB]
                p = jnp.exp(sw - m_w) * il_w
                colsum = jnp.sum(p, axis=0)  # [KB]
                cur = scores_ref[0, 0, 0, pl.ds(blk * KB, KB)]
                scores_ref[0, 0, 0, pl.ds(blk * KB, KB)] = cur + colsum
                return 0

            lax.fori_loop(0, kv_hi, score_body, 0)
            return

        # Sparse paths / oversize windows: bounded second sweep over K.
        def score_body(blk, _):
            def compute(_):
                cp = get_k(0, blk)
                cp.start()
                cp.wait()
                s = logits_for(blk, k_s[0])
                p = jnp.exp(s - m) * inv_l  # final-normalized window rows
                colsum = jnp.sum(p, axis=0)  # [KB]
                cur = scores_ref[0, 0, 0, pl.ds(blk * KB, KB)]
                scores_ref[0, 0, 0, pl.ds(blk * KB, KB)] = cur + colsum
                return 0

            if sparse:
                return lax.cond(block_selected(blk), compute, lambda c: c, 0)
            return compute(0)

        lax.fori_loop(0, kv_hi, score_body, 0)


def vertical_slash_block_mask(
    q: jnp.ndarray,        # [Hq, S_pad, D] (padded)
    k: jnp.ndarray,        # [Hkv, S_pad, D]
    true_len: jnp.ndarray,  # scalar int32
    QB: int, KB: int, v_topk: int, s_topk: int, last_q: int,
    head_budgets: Optional[jnp.ndarray] = None,  # [Hq, 2] int32 (v, s)
) -> jnp.ndarray:
    """MInference vertical-slash pattern estimation (block-granular TPU
    adaptation of MInference's flagship head pattern; the reference delegates
    to the external ``minference`` package, pyramidkv/minference.py:9-12).

    The last ``last_q`` queries' attention over all keys estimates (a) per-
    column "vertical" mass and (b) per-diagonal "slash" mass (constant
    row-col offset).  The top ``v_topk`` columns and ``s_topk`` diagonals are
    converted to a [Hq, n_qb, n_kvb] block mask; sink and diagonal blocks are
    always kept.  All shapes static (top-k of fixed size, scatter-add bins).

    ``head_budgets`` carries MInference's PER-HEAD (vertical, slash) counts
    (the external package loads them per model, minference.py:9-12 +
    MODEL2PATH config jsons): top-k still runs at the static v_topk/s_topk
    sizes, and each head keeps only its first ``head_budgets[h]`` ranked
    columns/diagonals (rank mask — shapes stay static, budgets stay traced).
    """
    Hq, S, D = q.shape
    Hkv = k.shape[0]
    G = Hq // Hkv
    n_qb, n_kvb = S // QB, S // KB
    scale = 1.0 / float(D) ** 0.5

    start = jnp.maximum(true_len - last_q, 0)
    qw = lax.dynamic_slice_in_dim(q, start, last_q, axis=1)  # [Hq, lq, D]
    # bf16 MXU matmul with fp32 accumulation; grouped einsum instead of
    # materializing repeat_kv (G x the K bytes at long S).
    logits = jnp.einsum("hgqd,hkd->hgqk",
                        qw.reshape(Hkv, G, last_q, D), k,
                        preferred_element_type=jnp.float32
                        ).reshape(Hq, last_q, S) * scale
    rows_g = start + jnp.arange(last_q)[:, None]           # [lq, 1] global row
    cols = jnp.arange(S)[None, :]                          # [1, S]
    valid = (cols <= rows_g) & (cols < true_len) & (rows_g < true_len)
    logits = jnp.where(valid[None], logits, NEG_INF)
    A = jax.nn.softmax(logits, axis=-1)
    A = jnp.where(valid[None], A, 0.0)

    # vertical: column sums of the estimation window
    vert = jnp.sum(A, axis=1)                              # [Hq, S]
    nv = min(v_topk, S)
    _, vcols = lax.top_k(vert, nv)                         # [Hq, v_topk]
    v_keep = jnp.ones((Hq, nv), jnp.bool_)
    if head_budgets is not None:
        v_keep = jnp.arange(nv)[None] < head_budgets[:, 0:1]
    vert_blk = jnp.any(jax.nn.one_hot(vcols // KB, n_kvb, dtype=jnp.bool_)
                       & v_keep[..., None], axis=1)        # [Hq, n_kvb]

    # slash: diagonal sums at offset d = row - col.  Skew trick instead of a
    # scatter: reverse columns and right-shift row r by r (static pads), so
    # every diagonal lands on one column of the summed [S + lq] vector at
    # position p = (S - 1 - d) + start - ... relabeled below.
    A_rev = A[:, :, ::-1]                                  # c' = S-1-c
    skew = jnp.stack([jnp.pad(A_rev[:, r], ((0, 0), (r, last_q - r)))
                      for r in range(last_q)], axis=1)     # [Hq, lq, S+lq]
    diag_sum = jnp.sum(skew, axis=1)                       # [Hq, S+lq]
    ns = min(s_topk, S)
    _, spos = lax.top_k(diag_sum, ns)                      # [Hq, s_topk]
    # position p = c' + r = (S - 1 - c) + (row_g - start); d = row_g - c
    # => d = p + start - (S - 1)
    sdist = spos + start - (S - 1)                         # [Hq, s_topk]
    if head_budgets is not None:
        # rank mask: ranks past this head's slash budget point at an
        # impossible diagonal (> S) so no block intersects them
        s_keep = jnp.arange(ns)[None] < head_budgets[:, 1:2]
        sdist = jnp.where(s_keep, sdist, S + last_q + 1)

    # block intersections: q block qb rows [r0, r0+QB) hit kv block kvb cols
    # [c0, c0+KB) along diagonal d iff r0-c0-KB < d <= r0-c0+QB-1.
    diff = (jnp.arange(n_qb)[:, None] * QB
            - jnp.arange(n_kvb)[None, :] * KB)             # [n_qb, n_kvb]
    d = sdist[:, None, None, :]                            # [Hq, 1, 1, s_topk]
    hit = (d > (diff - KB)[None, ..., None]) & \
          (d <= (diff + QB - 1)[None, ..., None])
    slash_blk = jnp.any(hit, axis=-1)                      # [Hq, n_qb, n_kvb]

    mask = slash_blk | vert_blk[:, None, :]
    # always keep sinks and the diagonal blocks (exact local attention)
    diag = (diff >= -(KB - 1)) & (diff <= QB - 1)
    mask = mask | diag[None] | (jnp.arange(n_kvb) == 0)[None, None, :]
    return mask.astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("window", "q_block", "kv_block",
                                    "interpret", "sparse_pattern",
                                    "sliding_window", "return_ml"))
def flash_prefill_attention_batched(
    q: jnp.ndarray,        # [B, Hq, S, D]
    k: jnp.ndarray,        # [B, Hkv, S, D]
    v: jnp.ndarray,        # [B, Hkv, S, D]
    true_len: jnp.ndarray,  # [B] int32
    window: int,
    q_block: Optional[int] = None,  # None = adaptive (see sweep below)
    kv_block: Optional[int] = None,
    interpret: bool = False,
    sparse_pattern: Optional[Tuple[int, int, int]] = None,
    sparse_head_budgets: Optional[jnp.ndarray] = None,  # [Hq, 2] int32
    sliding_window: Optional[int] = None,
    row_offset: Optional[jnp.ndarray] = None,  # scalar | [B] int32 (chunk)
    return_ml: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Returns (out [B, Hq, S_q, D], window_scores [B, Hq, S_k] fp32);
    with ``return_ml`` additionally (m, l) [B, Hq, S_q] fp32 — each row's
    final online-softmax stats, for exact cross-call combining (the ring-
    attention fold: out here is LOCAL attention over this call's keys;
    ``acc = out * l`` recovers the unnormalized accumulator).

    Chunk mode (``row_offset`` given): q is a CHUNK [B, Hq, S_q, D] of a
    longer sequence whose keys fill k/v [B, Hkv, S_k, D]; q row r of batch
    row b has global id row_offset[b] + r (a scalar offset broadcasts —
    per-row offsets let concurrent admissions at different prefill depths
    share one dispatch) and attends causally over the buffer.  Blocks
    past each q block's causal frontier are skipped, so running all chunks
    costs exactly the causal half at kernel speed — the chunked-prefill
    attention (models/chunked_prefill.py).  Score emission and sparse
    patterns require whole-sequence q (window=0 / dense only here).

    ONE pallas_call for the whole batch (VERDICT r3 #4): grid (B, Hq, n_qb)
    with each example's true_len read off the [B] scalar-prefetch vector —
    no per-example Python loop, no unrolled kernel chain; matters for
    continuous-batching admission and dp-sharded eval prefill.

    ``window_scores`` are the SnapKV observation-window column sums (sum over
    window rows of the causal softmax).  Positions >= true_len - window are
    meaningless for selection and must be masked by the caller (the packed
    selection core does this), matching ``window_attention_scores``.

    ``sliding_window`` masks cols <= row - sliding_window (Mistral/Qwen2,
    mistral_model.py:273-288) AND skips kv blocks entirely below every row's
    window — windowed prefill is CHEAPER than dense, as it should be.  Score
    emission is dense-softmax-normalized by construction, which a windowed
    softmax cannot reproduce, so the two are mutually exclusive here: the
    model passes window=0 under sliding_window and the (w x S, ~0.1% of
    prefill FLOPs) scoring matmul runs in XLA for exact policy parity.
    """
    B, Hq, S_q, D = q.shape
    Hkv = k.shape[1]
    S = k.shape[2]
    G = Hq // Hkv
    use_off = row_offset is not None
    assert D % 128 == 0, "flash prefill requires lane-aligned head_dim"
    assert sliding_window is None or window == 0, (
        "in-kernel score emission assumes dense causal softmax; pass "
        "window=0 with sliding_window and score in XLA instead")
    assert sliding_window is None or sliding_window >= 1
    if use_off:
        assert window == 0 and sparse_pattern is None, (
            "chunk mode: score emission and sparse patterns need "
            "whole-sequence queries")
    else:
        assert S_q == S, "q and k lengths differ only in chunk mode"
    if return_ml:
        assert window == 0 and sparse_pattern is None, (
            "(m, l) emission is a dense-attention feature (ring fold)")
    # NOTE: row_offset must be non-negative.  A q block whose causal
    # frontier lies entirely before kv block 0 (kv_hi == 0) leaves the DMA
    # prologue's slot started but the epilogue waiting on slot (kv_hi-1)%3
    # — a semaphore never signaled: interpret-clean, DEADLOCK on hardware
    # (the Mosaic conditional-wait landmine).  Callers gate such calls out
    # (the ring fold's `src <= my` hop skip).
    # v5e sweep (s_buf-pipelined kernel, vmem_limit raised past the 16 MB
    # default): 32k/64k want 2048x2048 blocks (121/131 TF/s); at <=16k the
    # shorter KV runs favor 1024x1024 (4k 51, 8k 81, 16k 102 TF/s).  Sparse
    # patterns are parameterized in BLOCK units (sink/local/stride counts,
    # vertical-slash mask granularity), so they pin to the historical 1024
    # blocks — an S-adaptive size would silently rescale the pattern.
    if q_block is None:
        q_block = 1024 if (S <= 16384 or sparse_pattern is not None) else 2048
    if kv_block is None:
        kv_block = q_block
    QB = min(q_block, S_q)
    KB = min(kv_block, S)
    if not use_off:
        # q and k pad together so the square grids stay exactly as before
        S_pad = max(_round_up(S, QB), _round_up(S, KB))
        S_pad = _round_up(S_pad, QB)
        S_pad = _round_up(S_pad, KB)
        Sq_pad = S_pad
    else:
        S_pad = _round_up(S, KB)
        Sq_pad = _round_up(S_q, QB)
    if Sq_pad != S_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Sq_pad - S_q), (0, 0)))
    if S_pad != S:
        pk = ((0, 0), (0, 0), (0, S_pad - S), (0, 0))
        k = jnp.pad(k, pk)
        v = jnp.pad(v, pk)

    scale = 1.0 / float(D) ** 0.5
    # sparse_pattern: the MInference-equivalent sparse prefill.
    #  * (sink_blocks, local_blocks, stride) or ("ashape", s, l, st) — static
    #    a-shape: causal sinks + local diagonal band + every stride-th block;
    #  * ("vertical_slash", v_topk, s_topk, last_q) — MInference's flagship
    #    dynamic pattern: per-head block mask estimated from the last queries.
    sink_b, local_b, stride = 0, 0, 1
    sparse = use_mask = False
    tl1 = jnp.reshape(true_len.astype(jnp.int32), (B,))
    scalar_args = ((jnp.broadcast_to(
        jnp.asarray(row_offset, jnp.int32).reshape(-1), (B,)), tl1)
        if use_off else (tl1,))
    if sparse_pattern is not None:
        if sparse_pattern[0] == "vertical_slash":
            _, v_topk, s_topk, last_q = sparse_pattern
            sparse = use_mask = True
            mask = jax.vmap(
                lambda qe, ke, te: vertical_slash_block_mask(
                    qe, ke, te, QB, KB, v_topk, s_topk, last_q,
                    head_budgets=sparse_head_budgets))(q, k, tl1)
            scalar_args = (tl1, mask)  # [B, Hq, n_qb, n_kvb]
        elif sparse_pattern[0] == "ashape":
            _, sink_b, local_b, stride = sparse_pattern
            sparse = True
        else:
            sink_b, local_b, stride = sparse_pattern
            sparse = True
    # Window-logit stash rows: 8-aligned cover of W rows after aligning the
    # start down (needs W + 7 rows).  Oversize windows (streamingllm passes
    # window = cap - 4 though its scores go unused) fall back to the re-sweep.
    WPAD = _round_up(window + 7, 8) if window > 0 else 8
    use_stash = (not sparse) and window > 0 and WPAD <= min(QB, S_pad)
    if not use_stash:
        WPAD = 8  # minimal placeholder scratch
    kernel = functools.partial(_flash_kernel, S_pad, QB, KB, D, G, window,
                               WPAD, use_stash, scale, sparse, sink_b,
                               local_b, stride, use_mask, sliding_window,
                               use_off, return_ml)

    n_scalar = len(scalar_args)
    blk_q = lambda b, h, qb, *_: (b, h, qb, 0)
    blk_s = lambda b, h, qb, *_: (b, h, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalar,
        grid=(B, Hq, Sq_pad // QB),
        in_specs=[
            pl.BlockSpec((1, 1, QB, D), blk_q, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, QB, D), blk_q, memory_space=pltpu.VMEM),
            # scores block resident across the q-block loop (same per (b, h))
            pl.BlockSpec((1, 1, 1, S_pad), blk_s, memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((1, 1, QB, 256), blk_q,
                           memory_space=pltpu.VMEM)] if return_ml else []),
        scratch_shapes=[
            pltpu.VMEM((3, KB, D), k.dtype),
            pltpu.VMEM((3, KB, D), v.dtype),
            # logits ping-pong: dense pipeline only — the sparse paths never
            # touch it, so they get a minimal placeholder instead of QB*KB*8B
            pltpu.VMEM((2, QB, KB) if not sparse else (1, 8, 128),
                       jnp.float32),
            # window-row logit stash (dense score emission without a K
            # re-sweep); placeholder-sized when the stash is off
            pltpu.VMEM((WPAD, S_pad) if use_stash else (8, 128),
                       jnp.float32),
            # (m, inv_l) staging rows for ref-level dynamic row slicing
            pltpu.VMEM((QB, 2, 128) if use_stash else (1, 8, 128),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
    )

    # Under a check_vma=True shard_map (the ring fold) pallas outputs must
    # declare how they vary over mesh axes: exactly as the inputs do.
    vma = (getattr(jax.typeof(q), "vma", frozenset())
           | getattr(jax.typeof(k), "vma", frozenset())
           | getattr(jax.typeof(true_len), "vma", frozenset()))
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt, vma=vma)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            sds((B, Hq, Sq_pad, D), q.dtype),
            sds((B, Hq, 1, S_pad), jnp.float32),
        ] + ([sds((B, Hq, Sq_pad, 256), jnp.float32)]
             if return_ml else []),
        # The default scoped-VMEM limit is 16 MB (a compiler default, not the
        # hardware: v5e has ~128 MB of physical VMEM); the s_buf pipeline +
        # triple-buffered KV chunks sit right at that edge, and larger block
        # configs beat the 16 MB-constrained sweep optimum.
        # (tried: dimension_semantics=("parallel", "arbitrary") — hangs on
        # hardware; the kernel's manual DMA pipeline assumes grid order)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*scalar_args, q, k, v)

    out, scores = outs[0], outs[1]
    if return_ml:
        ml = outs[2]
        return (out[:, :, :S_q], scores[:, :, 0, :S],
                ml[:, :, :S_q, 0], ml[:, :, :S_q, 128])
    return out[:, :, :S_q], scores[:, :, 0, :S]


def flash_prefill_attention(
    q: jnp.ndarray,        # [Hq, S, D]
    k: jnp.ndarray,        # [Hkv, S, D]
    v: jnp.ndarray,        # [Hkv, S, D]
    true_len: jnp.ndarray,  # scalar int32
    window: int,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-example convenience wrapper over the batched kernel.
    Returns (out [Hq, S, D], window_scores [Hq, S] fp32)."""
    out, scores = flash_prefill_attention_batched(
        q[None], k[None], v[None],
        jnp.reshape(true_len, (1,)).astype(jnp.int32), window, **kw)
    return out[0], scores[0]


def flash_prefill_attention_batched_sharded(
    mesh,                   # jax.sharding.Mesh with "dp" and "tp" axes
    q: jnp.ndarray,         # [B, Hq, S, D]
    k: jnp.ndarray,         # [B, Hkv, S, D]
    v: jnp.ndarray,         # [B, Hkv, S, D]
    true_len: jnp.ndarray,  # [B] int32
    window: int,
    sparse_head_budgets: Optional[jnp.ndarray] = None,  # [Hq, 2] int32
    row_offset: Optional[jnp.ndarray] = None,  # scalar | [B] int32 (chunk)
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-device flash prefill (round 4): batch shards over ``dp``, heads
    over ``tp``, every device runs the batched kernel on its
    [B/dp, Hq/tp] tile.  The kernel is head-local (query head h reads kv
    head h // G), so tp tiles are independent as long as tp divides Hkv —
    each shard's local G == global G and the causal/window math is
    untouched.  Window scores come back per-shard ([B/dp, Hq/tp, S]) and
    recombine under GSPMD for the (head-wise) compression policies.
    MInference per-head (vertical, slash) budgets shard over tp with their
    heads (the vertical-slash mask estimation is itself head-local).

    ``row_offset`` (chunk mode, round 5) is an explicit argument rather
    than a ``**kw`` passthrough because its [B] form must shard over dp
    WITH its batch rows — a closed-over vector would reach every shard
    whole.  When dp does not divide B (e.g. a single admission on a dp>1
    mesh) the batch stays replicated and only heads shard.

    This closes the round-3 'kernels at scale' gap for PREFILL: multi-device
    meshes previously always fell back to the blocked XLA path because GSPMD
    cannot auto-partition pallas_call — shard_map hands each device its tile
    exactly as the decode wrappers do."""
    from jax.sharding import PartitionSpec as P

    B, Hq, S, D = q.shape
    Hkv = k.shape[1]
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    assert Hq % tp == 0 and Hkv % tp == 0, (
        f"Hq {Hq} %% tp {tp}, Hkv {Hkv} %% tp {tp} must be 0")
    b_ax = "dp" if (dp > 1 and B % dp == 0) else None

    args = [q, k, v, true_len.astype(jnp.int32)]
    specs = [P(b_ax, "tp"), P(b_ax, "tp"), P(b_ax, "tp"), P(b_ax)]
    use_off = row_offset is not None
    if use_off:
        args.append(jnp.broadcast_to(
            jnp.asarray(row_offset, jnp.int32).reshape(-1), (B,)))
        specs.append(P(b_ax))
    if sparse_head_budgets is not None:
        args.append(jnp.asarray(sparse_head_budgets, jnp.int32))
        specs.append(P("tp", None))

    def local(qs, ks, vs, tl, *rest):
        rest = list(rest)
        lkw = dict(kw)
        if use_off:
            lkw["row_offset"] = rest.pop(0)
        if sparse_head_budgets is not None:
            lkw["sparse_head_budgets"] = rest.pop(0)
        return flash_prefill_attention_batched(qs, ks, vs, tl, window, **lkw)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=tuple(specs),
        out_specs=(P(b_ax, "tp"), P(b_ax, "tp")),
        check_vma=False)
    return fn(*args)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
