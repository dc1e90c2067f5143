"""Pallas TPU kernel: decode attention over an INT8-quantized cache with
dequantization fused into the attention dots — plus in-place quantized append.

North-star requirement (BASELINE.json): "the retained cache is stored
weight-only-quantized with dequant fused into the decode attention matmul".
The reference instead dequantizes the whole cache every decode step
(pyramidkv/quantcache.py:77-82).

Design: per-token affine quantization over the full head_dim (one scale+zero
per cache entry).  The algebra keeps every step reshape-free (Mosaic cannot
reshape across the 128-lane dim):

    k_j = c_j * ks_j + kz_j            (c int8 codes, per-token ks/kz)
    s_j = q . k_j = (q . c_j) * ks_j + (sum(q)) * kz_j
    o   = sum_j p_j v_j
        = (p * vs) @ cv + (sum_j p_j vz_j) * 1_D

so scales/zeros only ever multiply along the token axis ([G, BLK] row
vectors) and HBM streams int8 codes (2x less traffic than bf16).

Structure mirrors the bf16 kernel (decode_attn.py): the kernel operates on
the FULL layer-stacked caches [Lyr, H, C, D] with the layer index as a
scalar-prefetch value, so the decode layer loop carries the stacks through
``lax.scan`` aliased in place — zero cache copies.  Codes stream in ~C/2-row
chunks through a 3-slot VMEM pipeline that crosses head boundaries (program
0 primes chunks 0 and 1; after waiting on chunk gi every program starts
chunk gi+2).  The chunk loop is a Python loop so every chunk's row offset is
a compile-time constant.

Scale layout: [4, C] bf16 per head — TOKENS ON LANES, four rows (k_scale,
k_zero, v_scale, v_zero).  This makes the per-token scale vector of a chunk
a plain static lane slice ``plane[0:1, sc:sc+BLK]``, so the whole chunk is
two big MXU dots plus one softmax pass over [G, BLK]; token-on-sublane or
128-token-row layouts force per-sub-block gathers/reshapes that Mosaic
either forbids or lowers to ~15 tiny VPU ops per 128 tokens (the first two
designs of this kernel; both were compute-bound at ~4x the int8 stream
time).  One DMA loads the plane; one [4, 128] lane-aligned RMW window
appends all four scalars of the new token.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)
TOK_BLK = 128          # lane tile: RMW window width / capacity alignment
CODE_TILE = 32         # int8 sublane tile (RMW window rows for code append)
N_SLOTS = 3            # code-chunk VMEM buffers (two-ahead prefetch)
MAX_BLK = 8192         # int8 rows per chunk cap (6 slot buffers ~6 MB at D=128)
N_PLANES = 4           # k_scale, k_zero, v_scale, v_zero rows



def _bcast_row(row, G: int):
    """[BLK] plane slice -> [G, BLK] via an MXU outer product.  A plain jnp
    broadcast lowers to vector.broadcast from an offset-0 sublane layout to a
    replicated one, which Mosaic rejects ("Invalid input layout") in some
    surrounding-graph contexts (reproducibly with G=4 when the kernel is
    called directly; context-dependent inside the decode scan).  The
    [G,1]x[1,BLK] dot is a few thousand MACs - noise at decode."""
    if G == 1:
        return row.reshape(1, -1)
    return jax.lax.dot_general(jnp.ones((G, 1), jnp.float32),
                               row.reshape(1, -1).astype(jnp.float32),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _quant_decode_kernel(C: int, BLK: int, NC: int, G: int, D: int, H: int,
                         lens_ref,              # scalar prefetch [H]
                         lidx_ref,              # scalar prefetch [1]
                         lower_ref,             # scalar prefetch [H]: window
                         q_ref,                 # VMEM [1, G, D]
                         knew_ref, vnew_ref,    # VMEM [1, 1, D] (bf16/f32)
                         kc_hbm, vc_hbm,        # HBM [Lyr, H, C, D] int8
                         sc_hbm,                # HBM [Lyr, H, 4, C] bf16
                         out_ref,               # VMEM [1, G, D]
                         kco, vco, sco,         # aliased outputs
                         kc_s, vc_s,            # VMEM [N_SLOTS, BLK, D] int8
                         sc_s,                  # VMEM [3, 4, C] bf16
                         kctile, vctile,        # VMEM [CODE_TILE, D] int8
                         stile,                 # VMEM [4, TOK_BLK] bf16
                         chunk_sems,            # DMA sems [N_SLOTS, 2]
                         plane_sems,            # DMA sems [3]
                         app_sems):             # DMA sems [3]
    h = pl.program_id(0)
    li = lidx_ref[0]
    L = jnp.minimum(lens_ref[h], C - 1)
    # Sliding-window lower bound (0 = dense): same semantics as the bf16
    # kernel — only identity rows (cache index == absolute position) get it
    # (decode_mask / mistral_model.py:2511-2535); the just-appended token is
    # the newest and never masked.
    lo = lower_ref[h]

    def chunk_start_row(cc: int) -> int:
        # Last chunk re-reads the tail window (mask keeps rows >= cc*BLK).
        return min(cc * BLK, C - BLK)

    def chunk_copies(gi):
        hh = gi // NC
        cc = gi % NC
        # cc is traced here (gi includes the traced program id); compute the
        # start in sublane-tile units so Mosaic can prove alignment.
        sc = jnp.minimum(cc * (BLK // CODE_TILE),
                         (C - BLK) // CODE_TILE) * CODE_TILE
        slot = gi % N_SLOTS
        ck = pltpu.make_async_copy(
            kc_hbm.at[li, hh, pl.ds(sc, BLK), :], kc_s.at[slot],
            chunk_sems.at[slot, 0])
        cv = pltpu.make_async_copy(
            vc_hbm.at[li, hh, pl.ds(sc, BLK), :], vc_s.at[slot],
            chunk_sems.at[slot, 1])
        return ck, cv

    def plane_copy(hh):
        return pltpu.make_async_copy(
            sc_hbm.at[li, hh], sc_s.at[hh % 3], plane_sems.at[hh % 3])

    def start_chunk(gi):
        ck, cv = chunk_copies(gi)
        ck.start()
        cv.start()
        # The head's scale plane rides with its first chunk.  THREE
        # plane slots: with NC == 1 (whole capacity in one chunk — the
        # common case, fewer/larger DMAs) the +2 chunk lookahead starts
        # head h+2's plane while program h is still reading slot h%2, so
        # two slots would race; mod-3 keeps the in-flight plane disjoint
        # from both readers.
        @pl.when(gi % NC == 0)
        def _():
            plane_copy(gi // NC).start()

    gi0 = h * NC
    total = H * NC

    @pl.when(h == 0)
    def _():
        start_chunk(0)
        if H * NC > 1:
            start_chunk(1)

    # ---- in-place append: quantize the new token in-register ----
    def quantize(x):  # [1, D] f32 -> codes f32 in [0,255], scale, zero
        mn = jnp.min(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        scale = jnp.maximum(mx - mn, 1e-8) / 255.0
        codes = jnp.clip(jnp.round((x - mn) / scale), 0, 255)
        return codes, scale, mn

    kn = knew_ref[0].astype(jnp.float32)  # [1, D]
    vn = vnew_ref[0].astype(jnp.float32)
    kcodes, ks_new, kz_new = quantize(kn)
    vcodes, vs_new, vz_new = quantize(vn)

    Lt_c = (L // CODE_TILE) * CODE_TILE
    Lt_s = (L // TOK_BLK) * TOK_BLK  # lane-tile-aligned window start (tokens)

    rmw_reads = [
        pltpu.make_async_copy(kco.at[li, h, pl.ds(Lt_c, CODE_TILE), :],
                              kctile, app_sems.at[0]),
        pltpu.make_async_copy(vco.at[li, h, pl.ds(Lt_c, CODE_TILE), :],
                              vctile, app_sems.at[1]),
        pltpu.make_async_copy(sco.at[li, h, :, pl.ds(Lt_s, TOK_BLK)],
                              stile, app_sems.at[2]),
    ]
    for cp in rmw_reads:
        cp.start()
    for cp in rmw_reads:
        cp.wait()

    crow = jax.lax.broadcasted_iota(jnp.int32, (CODE_TILE, D), 0)
    kctile[:] = jnp.where(crow == (L - Lt_c),
                          (kcodes - 128.0).astype(jnp.int8), kctile[:])
    vctile[:] = jnp.where(crow == (L - Lt_c),
                          (vcodes - 128.0).astype(jnp.int8), vctile[:])
    srow = jax.lax.broadcasted_iota(jnp.int32, (N_PLANES, TOK_BLK), 0)
    slane = jax.lax.broadcasted_iota(jnp.int32, (N_PLANES, TOK_BLK), 1)
    vals = stile[:]
    for i, val in enumerate((ks_new, kz_new, vs_new, vz_new)):
        vals = jnp.where((srow == i) & (slane == L - Lt_s),
                         val.astype(stile.dtype), vals)
    stile[:] = vals

    rmw_writes = [
        pltpu.make_async_copy(kctile, kco.at[li, h, pl.ds(Lt_c, CODE_TILE), :],
                              app_sems.at[0]),
        pltpu.make_async_copy(vctile, vco.at[li, h, pl.ds(Lt_c, CODE_TILE), :],
                              app_sems.at[1]),
        pltpu.make_async_copy(stile, sco.at[li, h, :, pl.ds(Lt_s, TOK_BLK)],
                              app_sems.at[2]),
    ]
    for cp in rmw_writes:
        cp.start()

    # 1/sqrt(D) folded into q once: scales the code dots, the zero-point
    # correction (qsum), and the new-token fold-in.
    q = q_ref[0].astype(jnp.float32) * (D ** -0.5)  # [G, D]
    qsum = jnp.sum(q, axis=-1, keepdims=True)       # [G, 1]

    plane_copy(h).wait()
    planes = sc_s[h % 3].astype(jnp.float32)  # [4, C] f32

    m = jnp.full((G, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((G, 1), jnp.float32)
    acc = jnp.zeros((G, D), jnp.float32)

    for c in range(NC):  # Python loop: chunk offsets are static
        gi = gi0 + c
        ck, cv = chunk_copies(gi)
        ck.wait()
        cv.wait()

        @pl.when(gi + 2 < total)
        def _(gi=gi):
            start_chunk(gi + 2)

        slot = gi % N_SLOTS
        sc0 = chunk_start_row(c)

        cb = kc_s[slot].astype(jnp.float32) + 128.0       # [BLK, D]
        qc = jax.lax.dot_general(q, cb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [G,BLK]
        ks_w = _bcast_row(planes[0, sc0:sc0 + BLK], G)    # static lane slices
        kz_w = _bcast_row(planes[1, sc0:sc0 + BLK], G)
        s = qc * ks_w + qsum * kz_w                       # [G, BLK]
        ids = sc0 + jax.lax.broadcasted_iota(jnp.int32, (G, BLK), 1)
        s = jnp.where((ids >= c * BLK) & (ids >= lo) & (ids < L), s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)

        cvb = vc_s[slot].astype(jnp.float32) + 128.0      # [BLK, D]
        pw = p * _bcast_row(planes[2, sc0:sc0 + BLK], G)
        pv = jax.lax.dot_general(pw, cvb, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [G, D]
        pz = jnp.sum(p * _bcast_row(planes[3, sc0:sc0 + BLK], G), axis=-1,
                     keepdims=True)
        acc = acc * alpha + pv + pz
        m = m_new

    # Fold in the just-appended token exactly (fp values still in registers).
    s_new = jax.lax.dot_general(q, kn, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    m_f = jnp.maximum(m, s_new)
    alpha = jnp.exp(m - m_f)
    p_new = jnp.exp(s_new - m_f)
    l_f = l * alpha + p_new
    acc_f = acc * alpha + p_new * vn

    out_ref[0] = (acc_f / l_f).astype(out_ref.dtype)

    for cp in rmw_writes:
        cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_decode_attention_append_stacked(
    q: jnp.ndarray,         # [H, G, D]
    k_codes: jnp.ndarray,   # [Lyr, H, C, D] int8
    v_codes: jnp.ndarray,   # [Lyr, H, C, D] int8
    scales: jnp.ndarray,    # [Lyr, H, 4, C] bf16 (token-on-lanes planes)
    lengths: jnp.ndarray,   # [H] int32 (this layer)
    layer: jnp.ndarray,     # [] or [1] int32
    k_new: jnp.ndarray,     # [H, D] fp
    v_new: jnp.ndarray,
    interpret: bool = False,
    lower: Optional[jnp.ndarray] = None,  # [H] int32 window lo bound
):
    """Returns (out [H,G,D], k_codes', v_codes', scales', lengths'); layer
    ``layer`` of the stacks updated in place."""
    Lyr, H, C, D = k_codes.shape
    G = q.shape[1]
    assert D % 128 == 0, "quant decode kernel requires lane-aligned head_dim"
    assert C % TOK_BLK == 0, f"capacity {C} must be a multiple of {TOK_BLK}"
    assert scales.shape == (Lyr, H, N_PLANES, C), scales.shape

    NC = max(1, -(-C // MAX_BLK))
    BLK = min(_round_up(-(-C // NC), TOK_BLK), C)
    kernel = functools.partial(_quant_decode_kernel, C, BLK, NC, G, D, H)
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
        ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        out_specs=[
            pl.BlockSpec((1, G, D), lambda h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        scratch_shapes=[
            pltpu.VMEM((N_SLOTS, BLK, D), jnp.int8),
            pltpu.VMEM((N_SLOTS, BLK, D), jnp.int8),
            pltpu.VMEM((3, N_PLANES, C), scales.dtype),
            pltpu.VMEM((CODE_TILE, D), jnp.int8),
            pltpu.VMEM((CODE_TILE, D), jnp.int8),
            pltpu.VMEM((N_PLANES, TOK_BLK), scales.dtype),
            pltpu.SemaphoreType.DMA((N_SLOTS, 2)),
            pltpu.SemaphoreType.DMA(3),
            pltpu.SemaphoreType.DMA(3),
        ],
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H, G, D), q.dtype),
            jax.ShapeDtypeStruct(k_codes.shape, jnp.int8),
            jax.ShapeDtypeStruct(v_codes.shape, jnp.int8),
            jax.ShapeDtypeStruct(scales.shape, scales.dtype),
        ],
        # operand idx (incl. scalar prefetch 0=lens, 1=layer, 2=lower):
        # q=3 kn=4 vn=5 kc=6 vc=7 scales=8
        input_output_aliases={6: 1, 7: 2, 8: 3},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lengths, lidx, lower, q, k_new[:, None, :], v_new[:, None, :],
      k_codes, v_codes, scales)

    out, kc, vc, sc = outs
    return out, kc, vc, sc, jnp.minimum(lengths + 1, C)


def _sharded_quant_decode(inner, mesh, q, k_codes, v_codes, scales,
                          lengths, layer, k_new, v_new, interpret, lower):
    """Shared (dp, tp) shard_map plumbing for the int8/int4 fused-dequant
    kernels (round-5 review: the two wrappers were ~55-line near-verbatim
    copies — spec/assert fixes could silently miss one).  ``inner`` is the
    single-chip stacked kernel; the code-plane row count is read off
    ``k_codes`` (C for int8, C//2 for int4 token-block nibbles) and the
    scale planes always carry [N_PLANES, C].  Batch shards over ``dp``,
    cache heads over ``tp``; the kernel is head-local (codes + wide scale
    planes + lens all tile the same way, no collectives), exactly like the
    bf16 wrapper (decode_attn.py::decode_attention_append_stacked_sharded).
    No reference counterpart — north-star tokens/s at scale."""
    from jax.sharding import PartitionSpec as P

    B, H, G, D = q.shape
    Lyr, _, _, Cc, _ = k_codes.shape   # code rows: C (int8) | C//2 (int4)
    Cs = scales.shape[-1]              # scale-plane lanes: always C
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    assert B % dp == 0 and H % tp == 0, (
        f"batch {B} %% dp {dp} and cache heads {H} %% tp {tp} must be 0")

    if lower is None:
        lower = jnp.zeros((B, H), jnp.int32)

    def local(q4, kcs, vcs, scs, lens2, li, kn, vn, lo2):
        Bl, Hl = q4.shape[0], q4.shape[1]
        BHl = Bl * Hl
        out, kc_o, vc_o, sc_o, lens_o = inner(
            q4.reshape(BHl, G, D), kcs.reshape(Lyr, BHl, Cc, D),
            vcs.reshape(Lyr, BHl, Cc, D),
            scs.reshape(Lyr, BHl, N_PLANES, Cs),
            lens2.reshape(BHl), li, kn.reshape(BHl, D), vn.reshape(BHl, D),
            interpret=interpret, lower=lo2.reshape(BHl))
        return (out.reshape(Bl, Hl, G, D),
                kc_o.reshape(Lyr, Bl, Hl, Cc, D),
                vc_o.reshape(Lyr, Bl, Hl, Cc, D),
                sc_o.reshape(Lyr, Bl, Hl, N_PLANES, Cs),
                lens_o.reshape(Bl, Hl))

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("dp", "tp"), P(None, "dp", "tp"), P(None, "dp", "tp"),
                  P(None, "dp", "tp"), P("dp", "tp"), P(),
                  P("dp", "tp"), P("dp", "tp"), P("dp", "tp")),
        out_specs=(P("dp", "tp"), P(None, "dp", "tp"), P(None, "dp", "tp"),
                   P(None, "dp", "tp"), P("dp", "tp")),
        check_vma=False)
    return fn(q, k_codes, v_codes, scales, lengths,
              jnp.asarray(layer, jnp.int32).reshape(()), k_new, v_new, lower)


def quant_decode_attention_append_stacked_sharded(
    mesh, q, k_codes, v_codes, scales, lengths, layer, k_new, v_new,
    interpret: bool = False, lower=None,
):
    """Multi-device INT8 quant decode (VERDICT round-3 #2) — see
    :func:`_sharded_quant_decode`."""
    return _sharded_quant_decode(
        quant_decode_attention_append_stacked, mesh, q, k_codes, v_codes,
        scales, lengths, layer, k_new, v_new, interpret, lower)


def quant4_decode_attention_append_stacked_sharded(
    mesh, q, k_codes, v_codes, scales, lengths, layer, k_new, v_new,
    interpret: bool = False, lower=None,
):
    """INT4 variant: the nibble planes tile over (dp, tp) exactly like the
    int8 codes (the token-block packing lives inside each head's [C2, D]
    plane) — see :func:`_sharded_quant_decode`."""
    return _sharded_quant_decode(
        quant4_decode_attention_append_stacked, mesh, q, k_codes, v_codes,
        scales, lengths, layer, k_new, v_new, interpret, lower)


def quant_decode_attention_append(
    q: jnp.ndarray,         # [H, G, D]
    k_codes: jnp.ndarray,   # [H, C, D] int8
    v_codes: jnp.ndarray,   # [H, C, D] int8
    k_scale: jnp.ndarray,   # [H, Cr, 128] bf16 (legacy 128-token-row planes)
    k_zero: jnp.ndarray,
    v_scale: jnp.ndarray,
    v_zero: jnp.ndarray,
    lengths: jnp.ndarray,   # [H] int32
    k_new: jnp.ndarray,     # [H, D] fp
    v_new: jnp.ndarray,
    interpret: bool = False,
):
    """Single-layer convenience wrapper over the stacked kernel (legacy
    128-token-row scale planes in/out — the relayout copies are fine for
    tests; the engine stores the wide [4, C] layout and calls the stacked
    API)."""
    H, C, D = k_codes.shape
    Cr = k_scale.shape[1]

    def to_wide(p):  # [H, Cr, 128] -> [H, C]
        return p.reshape(H, Cr * 128)[:, :C]

    scales = jnp.stack([to_wide(p) for p in (k_scale, k_zero,
                                             v_scale, v_zero)], axis=1)
    out, kc, vc, sc, lens = quant_decode_attention_append_stacked(
        q, k_codes[None], v_codes[None], scales[None], lengths,
        jnp.zeros((1,), jnp.int32), k_new, v_new, interpret=interpret)

    def to_planes(p):  # [H, C] -> [H, Cr, 128]
        pad = Cr * 128 - C
        return jnp.pad(p, ((0, 0), (0, pad))).reshape(H, Cr, 128)

    sc = sc[0]
    return (out, kc[0], vc[0], to_planes(sc[:, 0]), to_planes(sc[:, 1]),
            to_planes(sc[:, 2]), to_planes(sc[:, 3]), lens)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# INT4 variant: two tokens per byte, block-packed along the token axis
# ---------------------------------------------------------------------------
#
# Channel-axis nibble packing (the XLA path's layout) needs a [*, D/2] ->
# [*, D] unpack — a reshape across the 128-lane dim Mosaic forbids.  Instead
# byte row t of a [C2, D] plane (C2 = C//2) holds token t (low nibble) and
# token C2+t (high nibble).  Each streamed chunk of BLK byte rows yields TWO
# token blocks whose per-token scales are both static lane slices of the same
# wide [4, C] plane (at sc0 and C2+sc0).  Unpacking is ALGEBRAIC (see the
# chunk loop): two elementwise passes per byte plane (signed convert +
# hi-nibble floor-extract) feed two MXU dots, and the lo-nibble results fall
# out of [G, BLK]-level algebra — the earlier per-nibble shift/mask/convert
# chain did 4x the int8 kernel's VPU work per token and made int4 SLOWER than
# int8 despite half the HBM traffic (round-1 bench: 1714 vs 1859 tok/s).
# Per byte streamed this does 2x the dots of the int8 kernel — i.e. the same
# MACs per TOKEN — while halving the HBM traffic.  Decode append is a nibble
# RMW on one [CODE_TILE, D] window (row L % C2, nibble L // C2).


def _quant4_decode_kernel(C: int, BLK: int, NC: int, G: int, D: int, H: int,
                          lens_ref,              # scalar prefetch [H]
                          lidx_ref,              # scalar prefetch [1]
                          lower_ref,             # scalar prefetch [H]: window
                          q_ref,                 # VMEM [1, G, D]
                          knew_ref, vnew_ref,    # VMEM [1, 1, D] (bf16/f32)
                          kc_hbm, vc_hbm,        # HBM [Lyr, H, C2, D] int8
                          sc_hbm,                # HBM [Lyr, H, 4, C] bf16
                          out_ref,               # VMEM [1, G, D]
                          kco, vco, sco,         # aliased outputs
                          kc_s, vc_s,            # VMEM [N_SLOTS, BLK, D] int8
                          sc_s,                  # VMEM [3, 4, C] bf16
                          kctile, vctile,        # VMEM [CODE_TILE, D] int8
                          stile,                 # VMEM [4, TOK_BLK] bf16
                          chunk_sems,            # DMA sems [N_SLOTS, 2]
                          plane_sems,            # DMA sems [3]
                          app_sems):             # DMA sems [3]
    C2 = C // 2
    h = pl.program_id(0)
    li = lidx_ref[0]
    L = jnp.minimum(lens_ref[h], C - 1)
    lo = lower_ref[h]  # sliding-window lower bound (0 = dense); see int8

    def chunk_start_row(cc: int) -> int:
        # Last chunk re-reads the tail byte-row window (mask dedups).
        return min(cc * BLK, C2 - BLK)

    def chunk_copies(gi):
        hh = gi // NC
        cc = gi % NC
        sc = jnp.minimum(cc * (BLK // CODE_TILE),
                         (C2 - BLK) // CODE_TILE) * CODE_TILE
        slot = gi % N_SLOTS
        ck = pltpu.make_async_copy(
            kc_hbm.at[li, hh, pl.ds(sc, BLK), :], kc_s.at[slot],
            chunk_sems.at[slot, 0])
        cv = pltpu.make_async_copy(
            vc_hbm.at[li, hh, pl.ds(sc, BLK), :], vc_s.at[slot],
            chunk_sems.at[slot, 1])
        return ck, cv

    def plane_copy(hh):
        return pltpu.make_async_copy(
            sc_hbm.at[li, hh], sc_s.at[hh % 3], plane_sems.at[hh % 3])

    def start_chunk(gi):
        ck, cv = chunk_copies(gi)
        ck.start()
        cv.start()

        @pl.when(gi % NC == 0)
        def _():
            plane_copy(gi // NC).start()

    gi0 = h * NC
    total = H * NC

    @pl.when(h == 0)
    def _():
        start_chunk(0)
        if H * NC > 1:
            start_chunk(1)

    # ---- in-place append: 4-bit quantize the new token in-register ----
    def quantize4(x):  # [1, D] f32 -> codes i32 in [0,15], scale, zero
        mn = jnp.min(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        scale = jnp.maximum(mx - mn, 1e-8) / 15.0
        codes = jnp.clip(jnp.round((x - mn) / scale), 0, 15)
        return codes.astype(jnp.int32), scale, mn

    kn = knew_ref[0].astype(jnp.float32)  # [1, D]
    vn = vnew_ref[0].astype(jnp.float32)
    kcodes, ks_new, kz_new = quantize4(kn)
    vcodes, vs_new, vz_new = quantize4(vn)

    hi_sel = L >= C2            # which nibble the new token lands in
    row = L - jnp.where(hi_sel, C2, 0)  # target byte row (== L % C2)
    Lt_c = (row // CODE_TILE) * CODE_TILE
    Lt_s = (L // TOK_BLK) * TOK_BLK     # scale-plane lane window (full C)

    rmw_reads = [
        pltpu.make_async_copy(kco.at[li, h, pl.ds(Lt_c, CODE_TILE), :],
                              kctile, app_sems.at[0]),
        pltpu.make_async_copy(vco.at[li, h, pl.ds(Lt_c, CODE_TILE), :],
                              vctile, app_sems.at[1]),
        pltpu.make_async_copy(sco.at[li, h, :, pl.ds(Lt_s, TOK_BLK)],
                              stile, app_sems.at[2]),
    ]
    for cp in rmw_reads:
        cp.start()
    for cp in rmw_reads:
        cp.wait()

    crow = jax.lax.broadcasted_iota(jnp.int32, (CODE_TILE, D), 0)
    sel = crow == (row - Lt_c)

    def nibble_rmw(tile, codes):
        told = (tile.astype(jnp.int32) + 128) & 0xFF          # 0..255
        keep = jnp.where(hi_sel, told & 0x0F, told & 0xF0)
        put = jnp.where(hi_sel, codes << 4, codes)            # [1, D] bcast
        return (jnp.where(sel, keep | put, told) - 128).astype(jnp.int8)

    kctile[:] = nibble_rmw(kctile[:], kcodes)
    vctile[:] = nibble_rmw(vctile[:], vcodes)

    srow = jax.lax.broadcasted_iota(jnp.int32, (N_PLANES, TOK_BLK), 0)
    slane = jax.lax.broadcasted_iota(jnp.int32, (N_PLANES, TOK_BLK), 1)
    vals = stile[:]
    for i, val in enumerate((ks_new, kz_new, vs_new, vz_new)):
        vals = jnp.where((srow == i) & (slane == L - Lt_s),
                         val.astype(stile.dtype), vals)
    stile[:] = vals

    rmw_writes = [
        pltpu.make_async_copy(kctile, kco.at[li, h, pl.ds(Lt_c, CODE_TILE), :],
                              app_sems.at[0]),
        pltpu.make_async_copy(vctile, vco.at[li, h, pl.ds(Lt_c, CODE_TILE), :],
                              app_sems.at[1]),
        pltpu.make_async_copy(stile, sco.at[li, h, :, pl.ds(Lt_s, TOK_BLK)],
                              app_sems.at[2]),
    ]
    for cp in rmw_writes:
        cp.start()

    # The lo-nibble recovery below (qlo = qraw + 128*qsum - 16*qhi) is a
    # CANCELLATION: q.raw carries ~8.5x the magnitude of q.lo, so any
    # operand rounding inside the dots amplifies.  Defense: round q to a
    # bf16-exact f32 value up front (the planes are small integers, already
    # bf16-exact), so whether Mosaic lowers the f32 dots as bf16-operand MXU
    # passes or higher-precision multi-pass, the dot operands are EXACTLY
    # the values qsum is computed from and the identity holds.  (v5e has no
    # bf16 VPU ALU — elementwise work stays f32.)  The 1/sqrt(D) scale
    # cannot ride on q (not a power of two, would break bf16-exactness); it
    # is applied to the [G, BLK] logits after the dots.
    isd = D ** -0.5
    qf = q_ref[0].astype(jnp.bfloat16).astype(jnp.float32)  # [G, D]
    qsum = jnp.sum(qf, axis=-1, keepdims=True)       # [G, 1] unscaled

    plane_copy(h).wait()
    planes = sc_s[h % 3].astype(jnp.float32)  # [4, C] f32

    m = jnp.full((G, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((G, 1), jnp.float32)
    acc = jnp.zeros((G, D), jnp.float32)

    for c in range(NC):  # Python loop: chunk offsets are static
        gi = gi0 + c
        ck, cv = chunk_copies(gi)
        ck.wait()
        cv.wait()

        @pl.when(gi + 2 < total)
        def _(gi=gi):
            start_chunk(gi + 2)

        slot = gi % N_SLOTS
        sc0 = chunk_start_row(c)

        # Nibble unpack, algebraically (VERDICT round-1 #5: the per-nibble
        # shift+mask+convert chain was VPU-bound at ~4x the int8 kernel's
        # elementwise work).  Only TWO elementwise passes touch each [BLK, D]
        # byte plane: a signed int8 -> f32 convert (raw = lo + 16*hi - 128)
        # and a floor((raw + 128) / 16) = hi extraction (exact in f32: raw is
        # a small integer, /16 is a power of two).  The lo-nibble K logits
        # come from algebra on the [G, BLK] dot outputs instead of a third
        # plane:  q . lo_j = q . raw_j + 128*sum(q) - 16 * (q . hi_j).
        rawk = kc_s[slot].astype(jnp.float32)             # [BLK, D] signed
        hik = jnp.floor(rawk * 0.0625 + 8.0)              # [BLK, D] in [0,15]
        qraw = jax.lax.dot_general(qf, rawk, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        qhi = jax.lax.dot_general(qf, hik, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        qlo = qraw + 128.0 * qsum - 16.0 * qhi            # [G, BLK] exact

        # Tokens [sc0, sc0+BLK) ride the low nibbles, [C2+sc0, ...) the high
        # nibbles; scale rows are static lane slices at both offsets.
        # _bcast_row: see its Mosaic vector.broadcast note.
        s_lo = (qlo * _bcast_row(planes[0, sc0:sc0 + BLK], G)
                + qsum * _bcast_row(planes[1, sc0:sc0 + BLK], G)) * isd
        s_hi = (qhi * _bcast_row(planes[0, C2 + sc0:C2 + sc0 + BLK], G)
                + qsum * _bcast_row(planes[1, C2 + sc0:C2 + sc0 + BLK], G)
                ) * isd
        ids = sc0 + jax.lax.broadcasted_iota(jnp.int32, (G, BLK), 1)
        # lower bounds dedup the last chunk's tail re-read; `lo` is the
        # sliding-window bound on the GLOBAL token index
        s_lo = jnp.where((ids >= c * BLK) & (ids >= lo) & (ids < L),
                         s_lo, NEG_INF)
        s_hi = jnp.where((C2 + ids >= C2 + c * BLK) & (C2 + ids >= lo)
                         & (C2 + ids < L), s_hi, NEG_INF)

        # One fused online-softmax update for both token blocks.
        m_new = jnp.maximum(m, jnp.maximum(
            jnp.max(s_lo, axis=-1, keepdims=True),
            jnp.max(s_hi, axis=-1, keepdims=True)))
        p_lo = jnp.exp(s_lo - m_new)
        p_hi = jnp.exp(s_hi - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p_lo + p_hi, axis=-1, keepdims=True)

        # V side: same cancellation (a@lo recovered from a@raw), made safe
        # the same way as K — the probability weights are rounded to
        # bf16-exact f32 on the cheap [G, BLK] side BEFORE both dots, so
        # whatever operand precision the MXU uses, a_e@raw and a_e@hi see
        # identical weights and  a_e@lo = a_e@raw + 128*sum(a_e) - 16*a_e@hi
        # holds; the (b_e - 16 a_e) operand's own rounding contributes
        # ~2^-9 * 16/15 ≈ 0.2% — far under int4 quantization error.  This
        # keeps the byte plane at TWO elementwise passes (convert +
        # hi-extract), like K.
        rawv = vc_s[slot].astype(jnp.float32)
        hiv = jnp.floor(rawv * 0.0625 + 8.0)
        a = p_lo * _bcast_row(planes[2, sc0:sc0 + BLK], G)   # [G, BLK]
        b = p_hi * _bcast_row(planes[2, C2 + sc0:C2 + sc0 + BLK], G)
        ae = a.astype(jnp.bfloat16).astype(jnp.float32)
        be = b.astype(jnp.bfloat16).astype(jnp.float32)
        pv = jax.lax.dot_general(ae, rawv, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) \
            + jax.lax.dot_general(be - 16.0 * ae, hiv,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        pz = jnp.sum(p_lo * _bcast_row(planes[3, sc0:sc0 + BLK], G)
                     + p_hi * _bcast_row(planes[3, C2 + sc0:C2 + sc0 + BLK],
                                         G)
                     + 128.0 * ae, axis=-1, keepdims=True)
        acc = acc * alpha + pv + pz
        m = m_new

    # Fold in the just-appended token exactly (fp values still in registers;
    # 1/sqrt(D) applied post-dot, matching the chunk logits).
    s_new = jax.lax.dot_general(qf, kn, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * isd
    m_f = jnp.maximum(m, s_new)
    alpha = jnp.exp(m - m_f)
    p_new = jnp.exp(s_new - m_f)
    l_f = l * alpha + p_new
    acc_f = acc * alpha + p_new * vn

    out_ref[0] = (acc_f / l_f).astype(out_ref.dtype)

    for cp in rmw_writes:
        cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant4_decode_attention_append_stacked(
    q: jnp.ndarray,         # [H, G, D]
    k_codes: jnp.ndarray,   # [Lyr, H, C//2, D] int8 (token-block nibbles)
    v_codes: jnp.ndarray,   # [Lyr, H, C//2, D] int8
    scales: jnp.ndarray,    # [Lyr, H, 4, C] bf16 (token-on-lanes planes)
    lengths: jnp.ndarray,   # [H] int32 (this layer)
    layer: jnp.ndarray,     # [] or [1] int32
    k_new: jnp.ndarray,     # [H, D] fp
    v_new: jnp.ndarray,
    interpret: bool = False,
    lower: Optional[jnp.ndarray] = None,  # [H] int32 window lo bound
):
    """Returns (out [H,G,D], k_codes', v_codes', scales', lengths'); layer
    ``layer`` of the stacks updated in place."""
    Lyr, H, C2, D = k_codes.shape
    C = 2 * C2
    G = q.shape[1]
    assert D % 128 == 0, "int4 decode kernel requires lane-aligned head_dim"
    assert C % 256 == 0, f"capacity {C} must be a multiple of 256"
    assert scales.shape == (Lyr, H, N_PLANES, C), scales.shape

    NC = max(1, -(-C2 // MAX_BLK))
    BLK = min(_round_up(-(-C2 // NC), TOK_BLK), C2)
    kernel = functools.partial(_quant4_decode_kernel, C, BLK, NC, G, D, H)
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
        ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        out_specs=[
            pl.BlockSpec((1, G, D), lambda h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        scratch_shapes=[
            pltpu.VMEM((N_SLOTS, BLK, D), jnp.int8),
            pltpu.VMEM((N_SLOTS, BLK, D), jnp.int8),
            pltpu.VMEM((3, N_PLANES, C), scales.dtype),
            pltpu.VMEM((CODE_TILE, D), jnp.int8),
            pltpu.VMEM((CODE_TILE, D), jnp.int8),
            pltpu.VMEM((N_PLANES, TOK_BLK), scales.dtype),
            pltpu.SemaphoreType.DMA((N_SLOTS, 2)),
            pltpu.SemaphoreType.DMA(3),
            pltpu.SemaphoreType.DMA(3),
        ],
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H, G, D), q.dtype),
            jax.ShapeDtypeStruct(k_codes.shape, jnp.int8),
            jax.ShapeDtypeStruct(v_codes.shape, jnp.int8),
            jax.ShapeDtypeStruct(scales.shape, scales.dtype),
        ],
        # operand idx (incl. scalar prefetch 0=lens, 1=layer, 2=lower):
        # q=3 kn=4 vn=5 kc=6 vc=7 scales=8
        input_output_aliases={6: 1, 7: 2, 8: 3},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lengths, lidx, lower, q, k_new[:, None, :], v_new[:, None, :],
      k_codes, v_codes, scales)

    out, kc, vc, sc = outs
    return out, kc, vc, sc, jnp.minimum(lengths + 1, C)
