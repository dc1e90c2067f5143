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

The kernel operates on the FULL layer-stacked caches [Lyr, H, C, D] with the
layer index supplied as a scalar-prefetch value.  This is the key to making
the whole decode step zero-copy: the layer loop carries the stacked caches
through ``lax.scan`` and each iteration's kernel aliases them in place.
Scanning per-layer caches as scan xs/ys instead (the first design) made XLA
materialize a 2x [H, C, D] copy per layer (slice-in + stack-out), which cost
more HBM traffic than the attention itself.

Decode attention is pure HBM bandwidth; the kernel's job is to keep one
maximal-size DMA in flight at all times.  Chunks are ~C/2 rows (hundreds of
KB) — at decode the dots are trivial MXU/VPU work and every stall is a DMA
gap.  Measured on v5e at H=16, C=2432, D=128: ~30 us/call ≈ 82% of HBM
peak, vs ~15% for the first 512-row-block within-head double-buffer design.

Pipeline schedule (three VMEM slots, slot = global_chunk % 3):
  program 0 primes chunks 0 and 1; every program, after waiting on chunk
  ``gi``, starts chunk ``gi + 2`` — two-ahead never lands on the slot being
  computed on (gi % 3) nor the one already in flight ((gi+1) % 3).

Layout: cache [Lyr, H, C, D] (H = batch * cache heads), q [H, G, D] where
G = query heads per cache head (1 for reference-parity per-query-head
caches, num_heads/num_kv_heads for grouped caches).  TPU memrefs are
(8/16, 128)-tiled; the kernel requires lane-aligned head_dim (D % 128 == 0)
so every DMA slices at row granularity only (Mosaic cannot reshape across
the 128-lane dim, so packing F entries per row is not viable), and capacity
C % 16 == 0 so chunk and RMW windows stay sublane-tile aligned with no
padding copy.  When C is not a multiple of NC*BLK the LAST chunk re-reads
the tail window [C-BLK, C) and masks rows below c*BLK so nothing is double
counted — sizes stay static, no pad.

The kernel computes attention over the cache *plus* the incoming token
(whose K/V stay in VMEM), so the append and the read never race: the
appended entry (slot ``lens[h]``) is masked out of the streamed chunks
(ids < L) and folded in exactly from registers; the RMW write-back rewrites
every other row of its aligned window with identical bytes, so a chunk DMA
overlapping it reads correct data regardless of ordering.
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
APPEND_TILE = 16  # sublane-aligned RMW window (rows) for the in-place append
LANE = 128
N_SLOTS = 3       # VMEM chunk buffers; two-ahead prefetch needs three
MAX_BLK = 4096    # rows per chunk cap (keeps 6 slot buffers ~6 MB at D=128)


def _decode_kernel(C: int, BLK: int, NC: int, G: int, D: int, H: int,
                   lens_ref,            # scalar prefetch [H] (SMEM)
                   lidx_ref,            # scalar prefetch [1] (SMEM): layer
                   lower_ref,           # scalar prefetch [H] (SMEM): window lo
                   q_ref,               # VMEM [1, G, D]
                   knew_ref, vnew_ref,  # VMEM [1, 1, D]
                   k_hbm, v_hbm,        # HBM [Lyr, H, C, D] (aliased outputs)
                   out_ref,             # VMEM [1, G, D]
                   ko_hbm, vo_hbm,      # aliased outputs of k_hbm/v_hbm
                   k_scratch, v_scratch,  # VMEM [N_SLOTS, BLK, D]
                   ktile, vtile,        # VMEM [APPEND_TILE, D]
                   chunk_sems,          # DMA sems [N_SLOTS, 2]
                   app_sems):           # DMA sems [2]
    h = pl.program_id(0)
    li = lidx_ref[0]
    # Clamp: appending into a FULL cache would RMW out of bounds; the engine
    # always leaves headroom, this guard overwrites the last slot instead of
    # corrupting memory if it ever happens.
    L = jnp.minimum(lens_ref[h], C - 1)
    # Sliding-window lower bound on the valid range (0 = dense).  The caller
    # computes it per head (decode_step: cache rows below pos+1-window are
    # masked only when the cache index IS the absolute position — the
    # identity rows of decode_mask; Mistral/Qwen2 HF decode semantics,
    # mistral_model.py:2511-2535).  The just-appended token is always the
    # newest and never window-masked.
    lo = lower_ref[h]

    def chunk_copies(gi):
        """DMA descriptor pair for global chunk gi = head * NC + c."""
        hh = gi // NC
        cc = gi % NC
        # Last chunk re-reads the tail window when NC*BLK > C; rows below
        # cc*BLK are masked out of the scores so nothing is double counted.
        # The min runs in APPEND_TILE units with the multiply OUTSIDE so
        # Mosaic can prove the dynamic slice start is sublane-tile aligned.
        sc = jnp.minimum(cc * (BLK // APPEND_TILE),
                         (C - BLK) // APPEND_TILE) * APPEND_TILE
        slot = gi % N_SLOTS
        ck = pltpu.make_async_copy(
            k_hbm.at[li, hh, pl.ds(sc, BLK), :], k_scratch.at[slot],
            chunk_sems.at[slot, 0])
        cv = pltpu.make_async_copy(
            v_hbm.at[li, hh, pl.ds(sc, BLK), :], v_scratch.at[slot],
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
        if H * NC > 1:
            start_chunk(1)

    # ---- in-place append: new token K/V -> entry L of this head ----
    # The aligned APPEND_TILE-row window containing row L is read, row L is
    # replaced in VMEM, and the window is written back; other rows rewrite
    # identical bytes, and row L is masked out of the streamed attention, so
    # chunk reads overlapping the write-back stay correct.
    Lt = (L // APPEND_TILE) * APPEND_TILE
    tile_in_k = pltpu.make_async_copy(
        k_hbm.at[li, h, pl.ds(Lt, APPEND_TILE), :], ktile, app_sems.at[0])
    tile_in_v = pltpu.make_async_copy(
        v_hbm.at[li, h, pl.ds(Lt, APPEND_TILE), :], vtile, app_sems.at[1])
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
        ktile, ko_hbm.at[li, h, pl.ds(Lt, APPEND_TILE), :], app_sems.at[0])
    append_v = pltpu.make_async_copy(
        vtile, vo_hbm.at[li, h, pl.ds(Lt, APPEND_TILE), :], app_sems.at[1])
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
        sc = jnp.minimum(c * BLK, C - BLK)  # last chunk re-reads the tail
        ids = sc + jax.lax.broadcasted_iota(jnp.int32, (G, BLK), 1)
        s = jnp.where((ids >= c * BLK) & (ids >= lo) & (ids < L), s, NEG_INF)

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
def decode_attention_append_stacked(
    q: jnp.ndarray,        # [H, G, D]
    k_all: jnp.ndarray,    # [Lyr, H, C, D]
    v_all: jnp.ndarray,    # [Lyr, H, C, D]
    lengths: jnp.ndarray,  # [H] int32 (this layer's lengths)
    layer: jnp.ndarray,    # [] or [1] int32 layer index
    k_new: jnp.ndarray,    # [H, D]
    v_new: jnp.ndarray,    # [H, D]
    interpret: bool = False,
    lower: Optional[jnp.ndarray] = None,  # [H] int32 sliding-window lo bound
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (out [H, G, D], k_all', v_all', lengths').

    Layer ``layer`` of the stacked caches is updated in place (entry
    ``lengths[h]`` receives the new token); nothing else moves — the caller
    keeps the stacks in a scan carry and the whole decode step is zero-copy.

    ``lower`` masks cache entries below it out of the attention (per head);
    the sliding-window decode bound (None = dense, no masking).
    """
    Lyr, H, C, D = k_all.shape
    G = q.shape[1]
    assert D % LANE == 0, f"pallas decode kernel requires head_dim % {LANE} == 0"
    assert C % APPEND_TILE == 0 and C >= 2 * APPEND_TILE, \
        f"capacity must be a multiple of {APPEND_TILE} (allocators round up)"

    # As few, as large chunks as VMEM allows: near-half-cache DMAs (hundreds
    # of KB) keep the HBM pipe full.
    NC = max(1, -(-C // MAX_BLK))
    BLK = min(_round_up(-(-C // NC), APPEND_TILE), C)

    kernel = functools.partial(_decode_kernel, C, BLK, NC, G, D, H)
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    if lower is None:
        lower = jnp.zeros((H,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(H,),
        in_specs=[
            pl.BlockSpec((1, G, D), lambda h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, G, D), lambda h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((N_SLOTS, BLK, D), k_all.dtype),
            pltpu.VMEM((N_SLOTS, BLK, D), v_all.dtype),
            pltpu.VMEM((APPEND_TILE, D), k_all.dtype),
            pltpu.VMEM((APPEND_TILE, D), v_all.dtype),
            pltpu.SemaphoreType.DMA((N_SLOTS, 2)),
            pltpu.SemaphoreType.DMA(2),
        ],
    )

    out, k_out, v_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H, G, D), q.dtype),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        # Indices include the scalar-prefetch operands: 0=lengths, 1=layer,
        # 2=lower, 3=q, 4=k_new, 5=v_new, 6=k_all, 7=v_all.
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lengths, lidx, lower, q, k_new[:, None, :], v_new[:, None, :],
      k_all, v_all)

    return out, k_out, v_out, jnp.minimum(lengths + 1, C)


def decode_attention_append_stacked_sharded(
    mesh,                  # jax.sharding.Mesh with "dp" and "tp" axes
    q: jnp.ndarray,        # [B, H, G, D] (H = cache heads, NOT fused with B)
    k_all: jnp.ndarray,    # [Lyr, B, H, C, D]
    v_all: jnp.ndarray,    # [Lyr, B, H, C, D]
    lengths: jnp.ndarray,  # [B, H] int32 (this layer)
    layer: jnp.ndarray,    # [] int32
    k_new: jnp.ndarray,    # [B, H, D]
    v_new: jnp.ndarray,    # [B, H, D]
    interpret: bool = False,
    lower: Optional[jnp.ndarray] = None,  # [B, H] int32 window lo bound
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Multi-device decode: batch shards over ``dp``, cache heads over ``tp``,
    and every device runs the single-chip kernel on its local rows.

    Decode attention is head-local (the cache is already head-sharded with no
    collectives, parallel/mesh.py:cache_specs), so GSPMD's inability to
    partition ``pallas_call`` costs nothing here: ``shard_map`` hands each
    device its [B/dp, H/tp] slice and the in-place aliased append works
    per-shard exactly as on one chip.  Batch and head stay SEPARATE axes at
    the shard_map boundary (a fused B*H axis sharded over ("dp", "tp") would
    split into contiguous runs of (B*H)/(dp*tp), which is not the
    [B/dp] x [H/tp] tiling) and fuse locally inside.

    Returns (out [B, H, G, D], k_all', v_all', lengths') with unchanged
    global shapes/shardings.  No reference counterpart — VERDICT round-2 #3
    (multi-device decode previously fell back to XLA, runtime/engine.py).
    """
    from jax.sharding import PartitionSpec as P

    B, H, G, D = q.shape
    Lyr, _, _, C, _ = k_all.shape
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    assert B % dp == 0 and H % tp == 0, (
        f"batch {B} %% dp {dp} and cache heads {H} %% tp {tp} must be 0")

    if lower is None:
        lower = jnp.zeros((B, H), jnp.int32)

    def local(q4, kals, vals, lens2, li, kn, vn, lo2):
        Bl, Hl = q4.shape[0], q4.shape[1]
        BHl = Bl * Hl
        out, k_o, v_o, lens_o = decode_attention_append_stacked(
            q4.reshape(BHl, G, D), kals.reshape(Lyr, BHl, C, D),
            vals.reshape(Lyr, BHl, C, D), lens2.reshape(BHl), li,
            kn.reshape(BHl, D), vn.reshape(BHl, D), interpret=interpret,
            lower=lo2.reshape(BHl))
        return (out.reshape(Bl, Hl, G, D),
                k_o.reshape(Lyr, Bl, Hl, C, D),
                v_o.reshape(Lyr, Bl, Hl, C, D), lens_o.reshape(Bl, Hl))

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("dp", "tp"), P(None, "dp", "tp"), P(None, "dp", "tp"),
                  P("dp", "tp"), P(), P("dp", "tp"), P("dp", "tp"),
                  P("dp", "tp")),
        out_specs=(P("dp", "tp"), P(None, "dp", "tp"), P(None, "dp", "tp"),
                   P("dp", "tp")),
        check_vma=False)
    return fn(q, k_all, v_all, lengths,
              jnp.asarray(layer, jnp.int32).reshape(()), k_new, v_new, lower)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_append(
    q: jnp.ndarray,        # [H, G, D]
    k_cache: jnp.ndarray,  # [H, C, D]
    v_cache: jnp.ndarray,  # [H, C, D]
    lengths: jnp.ndarray,  # [H] int32
    k_new: jnp.ndarray,    # [H, D]
    v_new: jnp.ndarray,    # [H, D]
    interpret: bool = False,
    lower: Optional[jnp.ndarray] = None,  # [H] int32 window lo bound
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-layer convenience wrapper: a stack of one layer.

    Capacities that are not multiples of 16 are padded here (a copy — fine
    for tests and one-off calls; the engine allocates 16-aligned capacities
    and uses the stacked API, which never pads).
    """
    H, C, D = k_cache.shape
    C_pad = max(_round_up(C, APPEND_TILE), 2 * APPEND_TILE)
    if C_pad != C:
        pad = ((0, 0), (0, C_pad - C), (0, 0))
        k_cache = jnp.pad(k_cache, pad)
        v_cache = jnp.pad(v_cache, pad)
    out, k_out, v_out, _ = decode_attention_append_stacked(
        q, k_cache[None], v_cache[None], lengths,
        jnp.zeros((1,), jnp.int32), k_new, v_new, interpret=interpret,
        lower=lower)
    k_out = k_out[0]
    v_out = v_out[0]
    if C_pad != C:
        k_out = k_out[:, :C]
        v_out = v_out[:, :C]
    return out, k_out, v_out, jnp.minimum(lengths + 1, C)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
