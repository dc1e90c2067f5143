"""Quantized KV cache: group-wise INT8 / packed INT4 with fused dequant.

Reference: pyramidkv/quantcache.py (KVQuantizedCache) — HQQ-quantized cache
that dequantizes the ENTIRE stream every decode step (:77-82) and re-quantizes
whole when the fp residual exceeds ``residual_length`` (:83-92), with sparse
outlier extraction (:51-58).

TPU-native redesign (SURVEY.md §7.4 / BASELINE.json north star):
 * values are stored affine-quantized per (token, channel-group) with
   ``q_group_size`` channels per group (matching the reference's
   ``q_group_size=64``, run_longbench.py:287) — asymmetric min/max affine like
   HQQ's default;
 * each token is quantized ONCE at cache-write time (prefill pack or decode
   append); there is no residual re-quantization stall;
 * dequant happens inside the decode attention computation, where XLA fuses
   convert+scale into the matmul operand stream — HBM traffic is the int8/int4
   read (2x / 4x less than bf16), never a materialized fp cache;
 * outlier handling is DENSE: the largest-|x| value of every group is stored
   exactly (bf16 value + int8 in-group index, ~0.4 extra bits/value) and
   scattered back with a one-hot select at dequant.  This is the TPU-native
   equivalent of the reference's sparse outlier side table
   (quantcache.py:51-58, threshold 6.0 + torch.nonzero scatter): no dynamic
   shapes, no gather/scatter of ragged indices, and unlike a fixed threshold
   it adapts to the tensor's scale.  Measured A/B vs an HQQ+outlier torch
   oracle: tools/quant_accuracy_ab.py, table in BASELINE.md.

INT4 packs two values per int8 byte along the channel axis.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import QuantConfig


class QuantizedKVCache(NamedTuple):
    """Stacked [L, ...] quantized cache; same control interface as KVCache.

    ``rk``/``rv`` are an optional full-precision ring over the most recent
    ``residual_length`` entries (the reference's fp residual buffer,
    quantcache.py:59-96): ring slot for cache row ``c`` is ``c % R``; reads of
    recent rows take the fp ring instead of the dequantized codes."""

    qk: jnp.ndarray        # [L, B, H, C, D_packed] int8
    qv: jnp.ndarray        # [L, B, H, C, D_packed] int8
    k_scale: jnp.ndarray   # [L, B, H, C, G] bf16
    k_zero: jnp.ndarray    # [L, B, H, C, G] bf16
    v_scale: jnp.ndarray   # [L, B, H, C, G] bf16
    v_zero: jnp.ndarray    # [L, B, H, C, G] bf16
    lengths: jnp.ndarray   # [L, B, H] int32
    positions: jnp.ndarray  # [B] int32
    rk: Optional[jnp.ndarray] = None  # [L, B, H, R, D] fp residual ring
    rv: Optional[jnp.ndarray] = None  # [L, B, H, R, D]
    # dense per-group outlier slots (QuantConfig.outlier_extract)
    k_oval: Optional[jnp.ndarray] = None  # [L, B, H, C, G] bf16 exact value
    k_oidx: Optional[jnp.ndarray] = None  # [L, B, H, C, G] int8 in-group idx
    v_oval: Optional[jnp.ndarray] = None
    v_oidx: Optional[jnp.ndarray] = None

    @property
    def capacity(self) -> int:
        return self.qk.shape[3]

    @property
    def residual_length(self) -> int:
        return 0 if self.rk is None else self.rk.shape[3]


def _qparams(nbits: int) -> Tuple[float, int]:
    return float(2 ** nbits - 1), 2 ** nbits - 1


def quantize_groups(x: jnp.ndarray, group_size: int, nbits: int):
    """x: [..., D] -> (codes int [..., D], scale [..., G], zero [..., G]).

    Affine per-group: code = round((x - min) / scale), x' = code*scale + min.
    """
    *lead, D = x.shape
    G = D // group_size
    xg = x.astype(jnp.float32).reshape(*lead, G, group_size)
    mn = jnp.min(xg, axis=-1)
    mx = jnp.max(xg, axis=-1)
    qmax, _ = _qparams(nbits)
    scale = jnp.maximum(mx - mn, 1e-8) / qmax
    codes = jnp.clip(jnp.round((xg - mn[..., None]) / scale[..., None]),
                     0, qmax).astype(jnp.int32)
    return codes.reshape(*lead, D), scale, mn


def dequantize_groups(codes: jnp.ndarray, scale: jnp.ndarray,
                      zero: jnp.ndarray, group_size: int, dtype=jnp.bfloat16):
    *lead, D = codes.shape
    G = D // group_size
    cg = codes.reshape(*lead, G, group_size).astype(jnp.float32)
    x = cg * scale[..., None] + zero[..., None]
    return x.reshape(*lead, D).astype(dtype)


# How many quantized values share one stored byte, per bit-width.  3-bit
# values occupy a nibble each (the reference's HQQ 3-bit packing wastes bits
# similarly — hqq Quantizer bit_to_packing maps 3 -> "3bit_32" over int32;
# here the storage grain is int8 so a nibble is the natural slot).
VALUES_PER_BYTE = {1: 8, 2: 4, 3: 2, 4: 2, 8: 1}


def values_per_byte(nbits: int) -> int:
    return VALUES_PER_BYTE[nbits]


def pack_codes(codes: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """[..., D] int codes (0..2^nbits-1) -> [..., D//vpb] int8, ``vpb``
    adjacent values per byte (value i in bits [i*w, i*w+nbits), w = 8//vpb),
    biased by -128 to fit signed int8 storage."""
    if nbits == 8:
        return (codes - 128).astype(jnp.int8)
    vpb = values_per_byte(nbits)
    w = 8 // vpb
    *lead, D = codes.shape
    cg = codes.reshape(*lead, D // vpb, vpb)
    shifts = (jnp.arange(vpb, dtype=jnp.int32) * w)
    byte = jnp.sum(cg << shifts, axis=-1)
    return (byte - 128).astype(jnp.int8)


def unpack_codes(packed: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """[..., D//vpb] int8 -> [..., D] int codes (0..2^nbits-1)."""
    if nbits == 8:
        return packed.astype(jnp.int32) + 128
    vpb = values_per_byte(nbits)
    w = 8 // vpb
    p = (packed.astype(jnp.int32) + 128) & 0xFF
    shifts = (jnp.arange(vpb, dtype=jnp.int32) * w)
    vals = (p[..., None] >> shifts) & ((1 << nbits) - 1)
    return vals.reshape(*packed.shape[:-1], packed.shape[-1] * vpb)


def pack_int4(codes: jnp.ndarray) -> jnp.ndarray:
    """[..., D] int codes (0..15) -> [..., D//2] int8 (see pack_codes)."""
    return pack_codes(codes, 4)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., D//2] int8 -> [..., D] int codes (0..15)."""
    return unpack_codes(packed, 4)


def extract_group_outliers(x: jnp.ndarray, group_size: int):
    """[..., D] -> (stripped [..., D] f32 with the outlier zeroed,
    oval [..., G] f32 exact value, oidx [..., G] int8 in-group index).

    One slot per group: the largest-|x| entry.  Zeroing it before min/max
    (like the reference strips |x| > 6 before HQQ-quantizing,
    quantcache.py:51-58) keeps the group's quantization range tight."""
    *lead, D = x.shape
    G = D // group_size
    xg = x.astype(jnp.float32).reshape(*lead, G, group_size)
    oidx = jnp.argmax(jnp.abs(xg), axis=-1)  # [..., G]
    oval = jnp.take_along_axis(xg, oidx[..., None], axis=-1)[..., 0]
    slot = (jnp.arange(group_size, dtype=jnp.int32)
            == oidx[..., None].astype(jnp.int32))
    stripped = jnp.where(slot, 0.0, xg).reshape(*lead, D)
    return stripped, oval, oidx.astype(jnp.int8)


def scatter_group_outliers(x: jnp.ndarray, oval: jnp.ndarray,
                           oidx: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """Inverse of :func:`extract_group_outliers`: one-hot write each group's
    exact outlier value back into the dequantized tensor (dense select — the
    TPU-friendly replacement for the reference's torch.nonzero scatter,
    quantcache.py:43-49)."""
    *lead, D = x.shape
    G = D // group_size
    xg = x.reshape(*lead, G, group_size)
    slot = (jnp.arange(group_size, dtype=jnp.int32)
            == oidx[..., None].astype(jnp.int32))
    xg = jnp.where(slot, oval[..., None].astype(x.dtype), xg)
    return xg.reshape(*lead, D)


def encode(x: jnp.ndarray, cfg: QuantConfig):
    """[..., D] fp -> (stored int8 [..., D_packed], scale, zero, oval, oidx);
    the outlier planes are None when cfg.outlier_extract is off."""
    oval = oidx = None
    if cfg.outlier_extract:
        x, oval, oidx = extract_group_outliers(x, cfg.q_group_size)
        oval = oval.astype(jnp.bfloat16)
    codes, scale, zero = quantize_groups(x, cfg.q_group_size, cfg.nbits)
    stored = pack_codes(codes, cfg.nbits)
    return (stored, scale.astype(jnp.bfloat16), zero.astype(jnp.bfloat16),
            oval, oidx)


def decode_codes(stored: jnp.ndarray, cfg: QuantConfig) -> jnp.ndarray:
    return unpack_codes(stored, cfg.nbits)


def decode_values(stored: jnp.ndarray, scale: jnp.ndarray, zero: jnp.ndarray,
                  cfg: QuantConfig, dtype=jnp.bfloat16,
                  oval: Optional[jnp.ndarray] = None,
                  oidx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    x = dequantize_groups(decode_codes(stored, cfg), scale, zero,
                          cfg.q_group_size, dtype)
    if oval is not None:
        x = scatter_group_outliers(x, oval, oidx, cfg.q_group_size)
    return x


def packed_dim(head_dim: int, cfg: QuantConfig) -> int:
    return head_dim // values_per_byte(cfg.nbits)


def residual_ring_rows(lengths: jnp.ndarray, R: int, capacity: int):
    """Cache-row index feeding each ring slot at prefill: ring slot ``j``
    holds the unique row ``r`` in ``[max(0, len-R), len)`` with ``r % R == j``
    (rows that don't exist yet are clamped; they're never read because the
    recent-window mask bounds reads to ``[len-R, len)``)."""
    j = jnp.arange(R, dtype=jnp.int32)
    r0 = lengths[..., None] - R  # [..., 1] broadcast against j
    rows = r0 + jnp.mod(j - r0, R)
    return jnp.clip(rows, 0, capacity - 1)


def from_packed_prefill(k: jnp.ndarray, v: jnp.ndarray, lengths: jnp.ndarray,
                        positions: jnp.ndarray, cfg: QuantConfig,
                        extra_capacity: int = 0) -> QuantizedKVCache:
    """Quantize a prefill-packed dense cache [L, B, H, C, D] (+ optional decode
    headroom appended as zero slots)."""
    qk, ks, kz, ko, koi = encode(k, cfg)
    qv, vs, vz, vo, voi = encode(v, cfg)
    rk = rv = None
    if cfg.residual_length > 0:
        rows = residual_ring_rows(lengths, cfg.residual_length, k.shape[3])
        rk = jnp.take_along_axis(k, rows[..., None], axis=3)
        rv = jnp.take_along_axis(v, rows[..., None], axis=3)
    if extra_capacity:
        pad5 = ((0, 0), (0, 0), (0, 0), (0, extra_capacity), (0, 0))
        qk, qv = jnp.pad(qk, pad5), jnp.pad(qv, pad5)
        ks, kz = jnp.pad(ks, pad5), jnp.pad(kz, pad5)
        vs, vz = jnp.pad(vs, pad5), jnp.pad(vz, pad5)
        if ko is not None:
            ko, koi = jnp.pad(ko, pad5), jnp.pad(koi, pad5)
            vo, voi = jnp.pad(vo, pad5), jnp.pad(voi, pad5)
    return QuantizedKVCache(qk, qv, ks, kz, vs, vz, lengths, positions,
                            rk, rv, ko, koi, vo, voi)


# ---------------------------------------------------------------------------
# TPU-kernel layout: per-token scales stored as 128-lane planes
# ---------------------------------------------------------------------------


class QuantKVCacheTPU(NamedTuple):
    """INT8 cache in the layout the Pallas quant decode kernel streams:
    codes [L, B, H, C, D] int8; ONE scale plane per head, [L, B, H, 4, C]
    bf16 with TOKENS ON LANES and four rows (k_scale, k_zero, v_scale,
    v_zero) — a chunk's per-token scale vector is a static lane slice, one
    DMA loads the plane, and one [4, 128] lane-aligned RMW window appends
    all four scalars.  One scale per (token, head) over the full head_dim
    (q_group_size == head_dim)."""

    k_codes: jnp.ndarray
    v_codes: jnp.ndarray
    scales: jnp.ndarray     # [L, B, H, 4, C] bf16
    lengths: jnp.ndarray    # [L, B, H] int32
    positions: jnp.ndarray  # [B] int32

    @property
    def capacity(self) -> int:
        return self.k_codes.shape[3]


def quantize_per_token(x: jnp.ndarray):
    """[..., C, D] -> (codes int8 biased, scale [..., C], zero [..., C])."""
    xf = x.astype(jnp.float32)
    mn = jnp.min(xf, axis=-1)
    mx = jnp.max(xf, axis=-1)
    scale = jnp.maximum(mx - mn, 1e-8) / 255.0
    codes = jnp.clip(jnp.round((xf - mn[..., None]) / scale[..., None]),
                     0, 255) - 128.0
    return codes.astype(jnp.int8), scale, mn


def from_packed_prefill_tpu(k: jnp.ndarray, v: jnp.ndarray,
                            lengths: jnp.ndarray, positions: jnp.ndarray
                            ) -> QuantKVCacheTPU:
    """Quantize a prefill-packed dense cache [L, B, H, C, D] (C must be a
    multiple of 128; the engine rounds the capacity up)."""
    L, B, H, C, D = k.shape
    assert C % 128 == 0, f"quant TPU cache capacity {C} must be 128-aligned"
    kc, ks, kz = quantize_per_token(k)
    vc, vs, vz = quantize_per_token(v)
    scales = jnp.stack([p.astype(jnp.bfloat16) for p in (ks, kz, vs, vz)],
                       axis=-2)  # [L, B, H, 4, C]
    return QuantKVCacheTPU(k_codes=kc, v_codes=vc, scales=scales,
                           lengths=lengths, positions=positions)


# ---------------------------------------------------------------------------
# INT4 TPU-kernel layout: two TOKENS per byte, block-packed along the token
# axis
# ---------------------------------------------------------------------------


class QuantKVCacheTPU4(NamedTuple):
    """INT4 cache in the layout the Pallas int4 decode kernel streams.

    Mosaic cannot reshape across the 128-lane dim, which rules out the usual
    channel-axis nibble packing (unpacking [*, D/2] -> [*, D] is a lane
    reshape).  Instead two TOKENS share a byte, block-packed along the token
    (sublane) axis: byte row ``t`` of a ``[C2, D]`` plane (``C2 = C // 2``)
    holds token ``t`` in the low nibble and token ``C2 + t`` in the high
    nibble.  Unpacking is elementwise bit-ops; a streamed chunk of byte rows
    yields two token blocks whose per-token scale vectors are both static
    lane slices of the SAME wide ``[4, C]`` scale plane (at ``sc0`` and
    ``C2 + sc0``).  Bytes are stored biased by -128 so they fit int8.

    One scale per (token, head) over the full head_dim, as in
    :class:`QuantKVCacheTPU`.  Requires ``C % 256 == 0``.
    """

    k_codes: jnp.ndarray    # [L, B, H, C//2, D] int8 (biased packed nibbles)
    v_codes: jnp.ndarray    # [L, B, H, C//2, D] int8
    scales: jnp.ndarray     # [L, B, H, 4, C] bf16
    lengths: jnp.ndarray    # [L, B, H] int32
    positions: jnp.ndarray  # [B] int32

    @property
    def capacity(self) -> int:
        return self.scales.shape[-1]


def quantize_per_token4(x: jnp.ndarray):
    """[..., C, D] -> (codes int32 in [0, 15], scale [..., C], zero [..., C])."""
    xf = x.astype(jnp.float32)
    mn = jnp.min(xf, axis=-1)
    mx = jnp.max(xf, axis=-1)
    scale = jnp.maximum(mx - mn, 1e-8) / 15.0
    codes = jnp.clip(jnp.round((xf - mn[..., None]) / scale[..., None]),
                     0, 15).astype(jnp.int32)
    return codes, scale, mn


def pack_tokens_int4(codes: jnp.ndarray) -> jnp.ndarray:
    """[..., C, D] int codes (0..15) -> [..., C//2, D] int8, token-block
    packed (row t = tokens t | (C//2 + t) << 4), biased by -128."""
    C = codes.shape[-2]
    C2 = C // 2
    lo = codes[..., :C2, :]
    hi = codes[..., C2:, :]
    return ((lo | (hi << 4)) - 128).astype(jnp.int8)


def unpack_tokens_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., C//2, D] int8 -> [..., C, D] int32 codes (0..15)."""
    p = (packed.astype(jnp.int32) + 128) & 0xFF
    return jnp.concatenate([p & 0xF, (p >> 4) & 0xF], axis=-2)


def from_packed_prefill_tpu4(k: jnp.ndarray, v: jnp.ndarray,
                             lengths: jnp.ndarray, positions: jnp.ndarray
                             ) -> QuantKVCacheTPU4:
    """Quantize a prefill-packed dense cache [L, B, H, C, D] to int4 (C must
    be a multiple of 256; the engine rounds the capacity up)."""
    L, B, H, C, D = k.shape
    assert C % 256 == 0, f"int4 TPU cache capacity {C} must be 256-aligned"
    kc, ks, kz = quantize_per_token4(k)
    vc, vs, vz = quantize_per_token4(v)
    scales = jnp.stack([p.astype(jnp.bfloat16) for p in (ks, kz, vs, vz)],
                       axis=-2)  # [L, B, H, 4, C]
    return QuantKVCacheTPU4(k_codes=pack_tokens_int4(kc),
                            v_codes=pack_tokens_int4(vc),
                            scales=scales, lengths=lengths,
                            positions=positions)
