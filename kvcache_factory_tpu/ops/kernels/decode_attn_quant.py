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

Layouts (per batch element; wrapper folds batch into H):
    codes:  [H, C, D]   int8   (C mult of 32 — int8 sublane tile)
    scales: [H, C//128, 128] bf16  (tokens on lanes; block row = 128 tokens)
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
TOK_BLK = 128          # tokens per inner block == scale-row width
CODE_TILE = 32         # int8 sublane tile (RMW window rows for code append)
SCALE_TILE = 16        # bf16 sublane tile (RMW window rows for scale append)


def _quant_decode_kernel(C: int, Cr: int, G: int, D: int,
                         lens_ref,              # scalar prefetch [H]
                         q_ref,                 # VMEM [1, G, D]
                         knew_ref, vnew_ref,    # VMEM [1, 1, D] (bf16/f32)
                         kc_hbm, vc_hbm,        # HBM [H, C, D] int8
                         ksc_hbm, kzr_hbm,      # HBM [H, C//128, 128] bf16
                         vsc_hbm, vzr_hbm,      # HBM [H, C//128, 128] bf16
                         out_ref,               # VMEM [1, G, D]
                         kco, vco, ksco, kzro, vsco, vzro,  # aliased outputs
                         kc_s, vc_s,            # VMEM [2, TOK_BLK, D] int8
                         sc_s,                  # VMEM [4, Cr, 128] bf16 (all planes)
                         kctile, vctile,        # VMEM [CODE_TILE, D] int8 (RMW)
                         stiles,                # VMEM [4, SCALE_TILE, 128] bf16
                         sems):                 # DMA sems [16]
    h = pl.program_id(0)
    L = lens_ref[h]
    n_blocks = C // TOK_BLK

    # 1/sqrt(D) folded into q once: scales the code dots, the zero-point
    # correction (qsum), and the new-token fold-in — matching the XLA path's
    # grouped_attention scaling (missing scale was the round-1 divergence).
    q = q_ref[0].astype(jnp.float32) * (D ** -0.5)  # [G, D]
    qsum = jnp.sum(q, axis=-1, keepdims=True)   # [G, 1]

    # ------------------------------------------------------------------
    # In-place quantized append of the new token (codes + scales), K then V.
    # Quantize in-register: per-token affine over D.
    # ------------------------------------------------------------------
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

    # All six RMW appends fly in parallel: start every read, modify the tiles
    # in VMEM, start every write-back; completion is awaited before the first
    # streamed block could overlap the written region (same-data rewrite makes
    # ordering benign anyway — only row L changes and it is masked out).
    Lt_c = (L // CODE_TILE) * CODE_TILE
    Lr = L // TOK_BLK
    Lt_s = (Lr // SCALE_TILE) * SCALE_TILE

    code_reads = [
        pltpu.make_async_copy(kco.at[h, pl.ds(Lt_c, CODE_TILE), :], kctile,
                              sems.at[4]),
        pltpu.make_async_copy(vco.at[h, pl.ds(Lt_c, CODE_TILE), :], vctile,
                              sems.at[5]),
    ]
    scale_outs = (ksco, kzro, vsco, vzro)
    scale_reads = [
        pltpu.make_async_copy(ref.at[h, pl.ds(Lt_s, SCALE_TILE), :],
                              stiles.at[i], sems.at[6 + i])
        for i, ref in enumerate(scale_outs)
    ]
    for cp in code_reads + scale_reads:
        cp.start()
    for cp in code_reads + scale_reads:
        cp.wait()

    crow = jax.lax.broadcasted_iota(jnp.int32, (CODE_TILE, D), 0)
    kctile[:] = jnp.where(crow == (L - Lt_c), (kcodes - 128.0).astype(jnp.int8),
                          kctile[:])
    vctile[:] = jnp.where(crow == (L - Lt_c), (vcodes - 128.0).astype(jnp.int8),
                          vctile[:])
    srow = jax.lax.broadcasted_iota(jnp.int32, (SCALE_TILE, TOK_BLK), 0)
    slane = jax.lax.broadcasted_iota(jnp.int32, (SCALE_TILE, TOK_BLK), 1)
    ssel = (srow == Lr - Lt_s) & (slane == L % TOK_BLK)
    for i, val in enumerate((ks_new, kz_new, vs_new, vz_new)):
        stiles[i] = jnp.where(ssel, val.astype(stiles.dtype), stiles[i])

    code_writes = [
        pltpu.make_async_copy(kctile, kco.at[h, pl.ds(Lt_c, CODE_TILE), :],
                              sems.at[4]),
        pltpu.make_async_copy(vctile, vco.at[h, pl.ds(Lt_c, CODE_TILE), :],
                              sems.at[5]),
    ]
    scale_writes = [
        pltpu.make_async_copy(stiles.at[i],
                              ref.at[h, pl.ds(Lt_s, SCALE_TILE), :],
                              sems.at[6 + i])
        for i, ref in enumerate(scale_outs)
    ]
    for cp in code_writes + scale_writes:
        cp.start()
    for cp in code_writes + scale_writes:
        cp.wait()

    # ------------------------------------------------------------------
    # Streaming attention over the quantized cache.  Scale planes are tiny
    # (Cr * 128 bf16 per plane) — load them all into VMEM once; per-block
    # rows are then selected with a one-hot dot (no unaligned slicing).
    # ------------------------------------------------------------------
    plane_loads = [
        pltpu.make_async_copy(ref.at[h], sc_s.at[i], sems.at[10 + i])
        for i, ref in enumerate((ksc_hbm, kzr_hbm, vsc_hbm, vzr_hbm))
    ]
    for cp in plane_loads:
        cp.start()
    for cp in plane_loads:
        cp.wait()
    scales_all = sc_s[:].astype(jnp.float32)  # [4, Cr, 128]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, Cr), 1)

    def get_codes(slot, blk):
        a = pltpu.make_async_copy(
            kc_hbm.at[h, pl.ds(blk * TOK_BLK, TOK_BLK), :], kc_s.at[slot],
            sems.at[0])
        b = pltpu.make_async_copy(
            vc_hbm.at[h, pl.ds(blk * TOK_BLK, TOK_BLK), :], vc_s.at[slot],
            sems.at[1])
        return a, b

    def start_all(slot, blk):
        a, b = get_codes(slot, blk)
        a.start()
        b.start()

    def wait_all(slot, blk):
        a, b = get_codes(slot, blk)
        a.wait()
        b.wait()

    start_all(0, 0)

    def body(blk, carry):
        m, l, acc = carry
        slot = blk % 2

        @pl.when(blk + 1 < n_blocks)
        def _():
            start_all((blk + 1) % 2, blk + 1)

        wait_all(slot, blk)
        cb = kc_s[slot].astype(jnp.float32) + 128.0   # [BLK, D] codes
        onehot = (row_iota == blk).astype(jnp.float32)  # [1, Cr]
        ks = jax.lax.dot_general(onehot, scales_all[0],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [1, 128]
        kz = jax.lax.dot_general(onehot, scales_all[1],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        vs = jax.lax.dot_general(onehot, scales_all[2],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        vz = jax.lax.dot_general(onehot, scales_all[3],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

        qc = jax.lax.dot_general(q, cb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [G, BLK]
        s = qc * ks + qsum * kz
        ids = blk * TOK_BLK + jax.lax.broadcasted_iota(jnp.int32, (G, TOK_BLK), 1)
        s = jnp.where(ids < L, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)

        cvb = vc_s[slot].astype(jnp.float32) + 128.0  # [BLK, D]
        pv = jax.lax.dot_general(p * vs, cvb, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [G, D]
        pz = jnp.sum(p * vz, axis=-1, keepdims=True)  # [G, 1]
        acc_new = acc * alpha + pv + pz
        return m_new, l_new, acc_new

    m0 = jnp.full((G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((G, 1), jnp.float32)
    acc0 = jnp.zeros((G, D), jnp.float32)
    m, l, acc = lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))

    # Fold in the just-appended token exactly (fp values still in registers).
    s_new = jax.lax.dot_general(q, kn, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    m_f = jnp.maximum(m, s_new)
    alpha = jnp.exp(m - m_f)
    p_new = jnp.exp(s_new - m_f)
    l_f = l * alpha + p_new
    acc_f = acc * alpha + p_new * vn

    out_ref[0] = (acc_f / l_f).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_decode_attention_append(
    q: jnp.ndarray,         # [H, G, D]
    k_codes: jnp.ndarray,   # [H, C, D] int8
    v_codes: jnp.ndarray,   # [H, C, D] int8
    k_scale: jnp.ndarray,   # [H, C//128, 128] bf16
    k_zero: jnp.ndarray,
    v_scale: jnp.ndarray,
    v_zero: jnp.ndarray,
    lengths: jnp.ndarray,   # [H] int32
    k_new: jnp.ndarray,     # [H, D] fp
    v_new: jnp.ndarray,
    interpret: bool = False,
):
    """Returns (out [H,G,D], k_codes', v_codes', k_scale', k_zero', v_scale',
    v_zero', lengths'), caches updated in place."""
    H, C, D = k_codes.shape
    G = q.shape[1]
    assert D % 128 == 0, "quant decode kernel requires lane-aligned head_dim"
    assert C % TOK_BLK == 0, f"capacity {C} must be a multiple of {TOK_BLK}"
    # Scale planes carry their own row padding to a SCALE_TILE multiple.
    assert k_scale.shape[1] % SCALE_TILE == 0 and k_scale.shape[1] >= C // TOK_BLK

    Cr = k_scale.shape[1]
    kernel = functools.partial(_quant_decode_kernel, C, Cr, G, D)
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
        ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * 6,
        out_specs=[
            pl.BlockSpec((1, G, D), lambda h, lens: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * 6,
        scratch_shapes=[
            pltpu.VMEM((2, TOK_BLK, D), jnp.int8),
            pltpu.VMEM((2, TOK_BLK, D), jnp.int8),
            pltpu.VMEM((4, Cr, TOK_BLK), k_scale.dtype),
            pltpu.VMEM((CODE_TILE, D), jnp.int8),
            pltpu.VMEM((CODE_TILE, D), jnp.int8),
            pltpu.VMEM((4, SCALE_TILE, TOK_BLK), k_scale.dtype),
            pltpu.SemaphoreType.DMA((16,)),
        ],
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H, G, D), q.dtype),
            jax.ShapeDtypeStruct(k_codes.shape, jnp.int8),
            jax.ShapeDtypeStruct(v_codes.shape, jnp.int8),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(k_zero.shape, k_zero.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
            jax.ShapeDtypeStruct(v_zero.shape, v_zero.dtype),
        ],
        # operand idx (incl. scalar prefetch 0): q=1 kn=2 vn=3 kc=4 vc=5
        # ks=6 kz=7 vs=8 vz=9
        input_output_aliases={4: 1, 5: 2, 6: 3, 7: 4, 8: 5, 9: 6},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lengths, q, k_new[:, None, :], v_new[:, None, :],
      k_codes, v_codes, k_scale, k_zero, v_scale, v_zero)

    out = outs[0]
    return (out,) + tuple(outs[1:]) + (jnp.minimum(lengths + 1, C),)
