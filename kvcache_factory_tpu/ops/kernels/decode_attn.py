"""Pallas TPU kernel: fused decode attention + in-place cache append.

This is the TPU-native replacement for BOTH of the reference's decode hot
spots (SURVEY.md §3.2, §3.4):
 * the CUDA realloc+copy append kernel ``update_flatten_view``
   (csrc/csrc/cuda_api.cu:11-53) — here the new token is written into its
   per-head slot in HBM, in place, via ``input_output_aliases`` and an
   aligned read-modify-write DMA;
 * attention over the compressed cache — streamed block-by-block from HBM
   into VMEM with double buffering and online-softmax accumulation, masked by
   per-head valid lengths (ragged per-head budgets need no varlen metadata).

Layout: cache [H, C, D] per batch element, q [H, G, D] where G = query heads
per cache head (1 for reference-parity per-query-head caches,
num_heads/num_kv_heads for grouped caches).  TPU memrefs are (8, 128)-tiled,
so for head_dim < 128 the wrapper folds F = 128 // D capacity entries into
each 128-lane row; all kernel DMAs slice only at row/tile granularity.

The kernel computes attention over the cache *plus* the incoming token (whose
K/V stay in VMEM), so the append and the read never race.
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


def _decode_kernel(C: int, BLK: int, G: int, D: int, F: int,
                   lens_ref,            # scalar prefetch [H] (SMEM)
                   q_ref,               # VMEM [1, G, D]
                   knew_ref, vnew_ref,  # VMEM [1, 1, D]
                   k_hbm, v_hbm,        # HBM [H, C//F, D*F] (aliased outputs)
                   out_ref,             # VMEM [1, G, D]
                   ko_hbm, vo_hbm,      # aliased outputs of k_hbm/v_hbm
                   k_scratch, v_scratch,  # VMEM [2, BLK//F, D*F]
                   ktile, vtile,        # VMEM [APPEND_TILE, D*F]
                   sems):               # DMA sems [4]
    h = pl.program_id(0)
    # Clamp: appending into a FULL cache would RMW out of bounds; the engine
    # always leaves headroom, this guard overwrites the last slot instead of
    # corrupting memory if it ever happens.
    L = jnp.minimum(lens_ref[h], C - 1)
    n_blocks = C // BLK
    rows_per_blk = BLK // F
    DW = D * F  # row width in elements

    # ---- in-place append: new token K/V -> entry L of this head ----
    # Entry L lives at row L//F, lane band (L%F)*D.  The aligned APPEND_TILE-
    # row window containing it is read, the band is replaced in VMEM, and the
    # window is written back; rows < L are rewritten with identical bytes, so
    # concurrent block reads stay correct.
    Lrow = L // F
    Lt = (Lrow // APPEND_TILE) * APPEND_TILE
    tile_in_k = pltpu.make_async_copy(
        k_hbm.at[h, pl.ds(Lt, APPEND_TILE), :], ktile, sems.at[2])
    tile_in_v = pltpu.make_async_copy(
        v_hbm.at[h, pl.ds(Lt, APPEND_TILE), :], vtile, sems.at[3])
    tile_in_k.start()
    tile_in_v.start()
    row = Lrow - Lt
    band = (L % F) * D
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (APPEND_TILE, DW), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (APPEND_TILE, DW), 1)
    sel = (row_ids == row) & (lane_ids >= band) & (lane_ids < band + D)
    # knew tiled across all F bands; `sel` picks the right one.
    kn_t = jnp.concatenate([knew_ref[0]] * F, axis=-1)  # [1, DW]
    vn_t = jnp.concatenate([vnew_ref[0]] * F, axis=-1)
    tile_in_k.wait()
    tile_in_v.wait()
    ktile[:] = jnp.where(sel, kn_t, ktile[:])
    vtile[:] = jnp.where(sel, vn_t, vtile[:])
    append_k = pltpu.make_async_copy(
        ktile, ko_hbm.at[h, pl.ds(Lt, APPEND_TILE), :], sems.at[2])
    append_v = pltpu.make_async_copy(
        vtile, vo_hbm.at[h, pl.ds(Lt, APPEND_TILE), :], sems.at[3])
    append_k.start()
    append_v.start()

    def get_k(slot, blk):
        return pltpu.make_async_copy(
            k_hbm.at[h, pl.ds(blk * rows_per_blk, rows_per_blk), :],
            k_scratch.at[slot], sems.at[0])

    def get_v(slot, blk):
        return pltpu.make_async_copy(
            v_hbm.at[h, pl.ds(blk * rows_per_blk, rows_per_blk), :],
            v_scratch.at[slot], sems.at[1])

    get_k(0, 0).start()
    get_v(0, 0).start()

    # Standard scaled attention: fold 1/sqrt(D) into q once so both the
    # streamed-block dots and the new-token dot are scaled (this was the
    # round-1 "in-graph divergence" — the kernel computed softmax(QK^T)
    # without the scale while the XLA path scales in grouped_attention).
    q = q_ref[0].astype(jnp.float32) * (D ** -0.5)  # [G, D]

    def body(blk, carry):
        m, l, acc = carry  # [G,1], [G,1], [G,D] f32
        slot = blk % 2

        @pl.when(blk + 1 < n_blocks)
        def _():
            get_k((blk + 1) % 2, blk + 1).start()
            get_v((blk + 1) % 2, blk + 1).start()

        get_k(slot, blk).wait()
        kb = k_scratch[slot].astype(jnp.float32)  # [BLK, D] (F == 1)
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [G, BLK]
        ids = blk * BLK + jax.lax.broadcasted_iota(jnp.int32, (G, BLK), 1)
        s = jnp.where(ids < L, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)

        get_v(slot, blk).wait()
        vb = v_scratch[slot].astype(jnp.float32)  # [BLK, D] (F == 1)
        pv = jax.lax.dot_general(p, vb, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [G, D]
        acc_new = acc * alpha + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((G, 1), jnp.float32)
    acc0 = jnp.zeros((G, D), jnp.float32)
    m, l, acc = lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))

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


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def decode_attention_append(
    q: jnp.ndarray,        # [H, G, D]
    k_cache: jnp.ndarray,  # [H, C, D]
    v_cache: jnp.ndarray,  # [H, C, D]
    lengths: jnp.ndarray,  # [H] int32
    k_new: jnp.ndarray,    # [H, D]
    v_new: jnp.ndarray,    # [H, D]
    block_size: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (out [H, G, D], k_cache', v_cache', lengths').

    The caches are updated in place (entry ``lengths[h]`` receives the new
    token); everything else is untouched — no O(C) rewrite per step.
    """
    H, C, D = k_cache.shape
    G = q.shape[1]
    # Mosaic cannot reshape vectors across the 128-lane dim, so packing
    # multiple entries per row is not viable; the kernel requires lane-aligned
    # head_dim (use the XLA path for smaller head dims).
    assert D % LANE == 0, f"pallas decode kernel requires head_dim % {LANE} == 0"
    F = 1

    # Pad capacity so C is a multiple of both the block and the RMW window.
    BLK = min(block_size, _round_up(C, APPEND_TILE * F))
    BLK = _round_up(BLK, APPEND_TILE * F)
    C_pad = _round_up(C, BLK)
    if C_pad != C:
        pad = ((0, 0), (0, C_pad - C), (0, 0))
        k_cache = jnp.pad(k_cache, pad)
        v_cache = jnp.pad(v_cache, pad)

    kc = k_cache.reshape(H, C_pad // F, D * F)
    vc = v_cache.reshape(H, C_pad // F, D * F)

    kernel = functools.partial(_decode_kernel, C_pad, BLK, G, D, F)

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
            pltpu.VMEM((2, BLK // F, D * F), k_cache.dtype),
            pltpu.VMEM((2, BLK // F, D * F), v_cache.dtype),
            pltpu.VMEM((APPEND_TILE, D * F), k_cache.dtype),
            pltpu.VMEM((APPEND_TILE, D * F), v_cache.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    out, k_out, v_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H, G, D), q.dtype),
            jax.ShapeDtypeStruct((H, C_pad // F, D * F), k_cache.dtype),
            jax.ShapeDtypeStruct((H, C_pad // F, D * F), v_cache.dtype),
        ],
        # Indices include the scalar-prefetch operand: 0=lengths, 1=q,
        # 2=k_new, 3=v_new, 4=k_cache, 5=v_cache.
        input_output_aliases={4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lengths, q, k_new[:, None, :], v_new[:, None, :], kc, vc)

    k_out = k_out.reshape(H, C_pad, D)
    v_out = v_out.reshape(H, C_pad, D)
    if C_pad != C:
        k_out = k_out[:, :C]
        v_out = v_out[:, :C]
    return out, k_out, v_out, jnp.minimum(lengths + 1, C)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
