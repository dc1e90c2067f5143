"""Pallas TPU kernel: fused decode attention + in-place cache append.

This is the TPU-native replacement for BOTH of the reference's decode hot
spots (SURVEY.md §3.2, §3.4):
 * the CUDA realloc+copy append kernel ``update_flatten_view``
   (csrc/csrc/cuda_api.cu:11-53) — here the new token is written into its
   per-head slot in HBM, in place, via ``input_output_aliases`` and an
   aligned read-modify-write DMA;
 * attention over the compressed cache — streamed in a few large chunks per
   head from HBM into VMEM through a *global* chunk pipeline that crosses
   head (grid-program) boundaries: while head h computes on its chunks, head
   h+1's first chunk is already in flight.  Per-head valid lengths mask the
   ragged budgets, so no varlen metadata is needed.

Decode attention is pure HBM bandwidth; the kernel's job is to keep one
maximal-size DMA in flight at all times.  Chunks are ~C/2 rows (hundreds of
KB), not small blocks — at decode the dots are trivial MXU/VPU work and every
stall is a DMA gap.  (The first version used 512-row blocks double-buffered
only within a head and reached ~15% of HBM bandwidth; the pipeline here keeps
head-boundary bubbles out by handing each program the job of prefetching its
successor's chunks.)

Pipeline schedule (three VMEM slots, slot = global_chunk % 3):
  program 0 primes chunks 0 and 1; every program, after waiting on chunk
  ``gi``, starts chunk ``gi + 2`` — two-ahead never lands on the slot being
  computed on (gi % 3) nor the one already in flight ((gi+1) % 3).

Layout: cache [H, C, D] per batch element, q [H, G, D] where G = query heads
per cache head (1 for reference-parity per-query-head caches,
num_heads/num_kv_heads for grouped caches).  TPU memrefs are (8/16, 128)-
tiled; the kernel requires lane-aligned head_dim (D % 128 == 0) so every DMA
slices at row granularity only (Mosaic cannot reshape across the 128-lane
dim, so packing F entries per row is not viable).

The kernel computes attention over the cache *plus* the incoming token (whose
K/V stay in VMEM), so the append and the read never race: the appended entry
(slot ``lens[h]``) is masked out of the streamed chunks (ids < L) and folded
in exactly from registers; the RMW write-back rewrites every other row of its
aligned window with identical bytes, so a chunk DMA overlapping it reads
correct data regardless of ordering.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)
APPEND_TILE = 16  # sublane-aligned RMW window (rows) for the in-place append
LANE = 128
N_SLOTS = 3       # VMEM chunk buffers; two-ahead prefetch needs three
MAX_BLK = 4096    # rows per chunk cap (keeps 6 slot buffers ~6 MB at D=128)


def _decode_kernel(C: int, BLK: int, NC: int, G: int, D: int, H: int,
                   lens_ref,            # scalar prefetch [H] (SMEM)
                   q_ref,               # VMEM [1, G, D]
                   knew_ref, vnew_ref,  # VMEM [1, 1, D]
                   k_hbm, v_hbm,        # HBM [H, C, D] (aliased outputs)
                   out_ref,             # VMEM [1, G, D]
                   ko_hbm, vo_hbm,      # aliased outputs of k_hbm/v_hbm
                   k_scratch, v_scratch,  # VMEM [N_SLOTS, BLK, D]
                   ktile, vtile,        # VMEM [APPEND_TILE, D]
                   chunk_sems,          # DMA sems [N_SLOTS, 2]
                   app_sems):           # DMA sems [2]
    h = pl.program_id(0)
    # Clamp: appending into a FULL cache would RMW out of bounds; the engine
    # always leaves headroom, this guard overwrites the last slot instead of
    # corrupting memory if it ever happens.
    L = jnp.minimum(lens_ref[h], C - 1)

    def chunk_copies(gi):
        """DMA descriptor pair for global chunk gi = head * NC + c."""
        hh = gi // NC
        cc = gi % NC
        slot = gi % N_SLOTS
        ck = pltpu.make_async_copy(
            k_hbm.at[hh, pl.ds(cc * BLK, BLK), :], k_scratch.at[slot],
            chunk_sems.at[slot, 0])
        cv = pltpu.make_async_copy(
            v_hbm.at[hh, pl.ds(cc * BLK, BLK), :], v_scratch.at[slot],
            chunk_sems.at[slot, 1])
        return ck, cv

    def start_chunk(gi):
        ck, cv = chunk_copies(gi)
        ck.start()
        cv.start()

    gi0 = h * NC
    total = H * NC

    # Prime the pipeline: program 0 starts the first two chunks; thereafter
    # every program starts chunk gi+2 right after waiting on chunk gi, so by
    # the time program h runs, both of its first two chunks are in flight.
    @pl.when(h == 0)
    def _():
        start_chunk(0)
        start_chunk(1)

    # ---- in-place append: new token K/V -> entry L of this head ----
    # The aligned APPEND_TILE-row window containing row L is read, row L is
    # replaced in VMEM, and the window is written back; other rows rewrite
    # identical bytes, and row L is masked out of the streamed attention, so
    # chunk reads overlapping the write-back stay correct.
    Lt = (L // APPEND_TILE) * APPEND_TILE
    tile_in_k = pltpu.make_async_copy(
        k_hbm.at[h, pl.ds(Lt, APPEND_TILE), :], ktile, app_sems.at[0])
    tile_in_v = pltpu.make_async_copy(
        v_hbm.at[h, pl.ds(Lt, APPEND_TILE), :], vtile, app_sems.at[1])
    tile_in_k.start()
    tile_in_v.start()

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (APPEND_TILE, D), 0)
    sel = row_ids == (L - Lt)
    kn_t = knew_ref[0]  # [1, D]
    vn_t = vnew_ref[0]
    tile_in_k.wait()
    tile_in_v.wait()
    ktile[:] = jnp.where(sel, kn_t, ktile[:])
    vtile[:] = jnp.where(sel, vn_t, vtile[:])
    append_k = pltpu.make_async_copy(
        ktile, ko_hbm.at[h, pl.ds(Lt, APPEND_TILE), :], app_sems.at[0])
    append_v = pltpu.make_async_copy(
        vtile, vo_hbm.at[h, pl.ds(Lt, APPEND_TILE), :], app_sems.at[1])
    append_k.start()
    append_v.start()

    # Fold 1/sqrt(D) into q once so both the streamed-chunk dots and the
    # new-token dot are scaled identically to the XLA grouped_attention path.
    q = q_ref[0].astype(jnp.float32) * (D ** -0.5)  # [G, D]

    def chunk_body(c, carry):
        m, l, acc = carry  # [G,1], [G,1], [G,D] f32
        gi = gi0 + c
        ck, cv = chunk_copies(gi)
        ck.wait()
        cv.wait()

        # Keep the pipeline two chunks ahead (into slot (gi+2) % 3, disjoint
        # from this chunk's slot and from the one already in flight).
        @pl.when(gi + 2 < total)
        def _():
            start_chunk(gi + 2)

        slot = gi % N_SLOTS
        kb = k_scratch[slot].astype(jnp.float32)  # [BLK, D]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [G, BLK]
        ids = c * BLK + jax.lax.broadcasted_iota(jnp.int32, (G, BLK), 1)
        s = jnp.where(ids < L, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)

        vb = v_scratch[slot].astype(jnp.float32)  # [BLK, D]
        pv = jax.lax.dot_general(p, vb, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [G, D]
        acc_new = acc * alpha + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((G, 1), jnp.float32)
    acc0 = jnp.zeros((G, D), jnp.float32)
    m, l, acc = lax.fori_loop(0, NC, chunk_body, (m0, l0, acc0), unroll=True)

    # ---- fold in the just-appended token (K/V still in VMEM) ----
    kn = knew_ref[0].astype(jnp.float32)  # [1, D]
    vn = vnew_ref[0].astype(jnp.float32)
    s_new = jax.lax.dot_general(q, kn, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [G, 1]
    m_f = jnp.maximum(m, s_new)
    alpha = jnp.exp(m - m_f)
    p_new = jnp.exp(s_new - m_f)
    l_f = l * alpha + p_new
    acc_f = acc * alpha + p_new * vn  # [G,1]*[1,D] broadcast

    out_ref[0] = (acc_f / l_f).astype(out_ref.dtype)

    append_k.wait()
    append_v.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_append(
    q: jnp.ndarray,        # [H, G, D]
    k_cache: jnp.ndarray,  # [H, C, D]
    v_cache: jnp.ndarray,  # [H, C, D]
    lengths: jnp.ndarray,  # [H] int32
    k_new: jnp.ndarray,    # [H, D]
    v_new: jnp.ndarray,    # [H, D]
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (out [H, G, D], k_cache', v_cache', lengths').

    The caches are updated in place (entry ``lengths[h]`` receives the new
    token); everything else is untouched — no O(C) rewrite per step.
    """
    H, C, D = k_cache.shape
    G = q.shape[1]
    assert D % LANE == 0, f"pallas decode kernel requires head_dim % {LANE} == 0"

    # As few, as large chunks as VMEM allows: near-half-cache DMAs (hundreds
    # of KB) keep the HBM pipe full; the tiny capacity pad costs nothing next
    # to the DMA efficiency of huge transfers.
    NC = max(2, -(-C // MAX_BLK))
    BLK = _round_up(-(-C // NC), APPEND_TILE)
    C_pad = NC * BLK
    if C_pad != C:
        pad = ((0, 0), (0, C_pad - C), (0, 0))
        k_cache = jnp.pad(k_cache, pad)
        v_cache = jnp.pad(v_cache, pad)

    kernel = functools.partial(_decode_kernel, C_pad, BLK, NC, G, D, H)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H,),
        in_specs=[
            pl.BlockSpec((1, G, D), lambda h, lens: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda h, lens: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda h, lens: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, G, D), lambda h, lens: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((N_SLOTS, BLK, D), k_cache.dtype),
            pltpu.VMEM((N_SLOTS, BLK, D), v_cache.dtype),
            pltpu.VMEM((APPEND_TILE, D), k_cache.dtype),
            pltpu.VMEM((APPEND_TILE, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((N_SLOTS, 2)),
            pltpu.SemaphoreType.DMA(2),
        ],
    )

    out, k_out, v_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H, G, D), q.dtype),
            jax.ShapeDtypeStruct((H, C_pad, D), k_cache.dtype),
            jax.ShapeDtypeStruct((H, C_pad, D), v_cache.dtype),
        ],
        # Indices include the scalar-prefetch operand: 0=lengths, 1=q,
        # 2=k_new, 3=v_new, 4=k_cache, 5=v_cache.
        input_output_aliases={4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lengths, q, k_new[:, None, :], v_new[:, None, :], k_cache, v_cache)

    if C_pad != C:
        k_out = k_out[:, :C]
        v_out = v_out[:, :C]
    return out, k_out, v_out, jnp.minimum(lengths + 1, C)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
