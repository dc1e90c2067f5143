"""ThinK packed cache: channel-pruned keys with REAL memory savings.

Reference: pyramidkv/llama_model_think.py stores channel-pruned past keys as a
narrower tensor plus a channel mask and splits the decode QK product into
``masked_query @ key_pruned^T`` for the pruned past and a dense product for
recent keys (:175-181); the pruned/dense boundary is fixed at prefill and all
decode-appended keys stay dense (cache_utils_think.py:390-424).

TPU-native layout (static shapes):

* ``kp [L, B, H, C, Dk]``   — kept channels of every prefill row
  (``Dk = D - int(D * pruning_ratio)``); rows at or past ``boundary`` are
  shadowed by the dense buffer and never read.
* ``channels [L, B, H, Dk]``— kept channel ids per (layer, head), ascending.
* ``kd [L, B, H, Cr, D]``   — dense keys for rows >= ``boundary``:
  slot ``j`` holds cache row ``boundary + j`` (recent prefill rows + every
  decode append).  ``Cr = recent_size + decode headroom``.
* ``v  [L, B, H, C, D]``    — values are never pruned (ThinK prunes keys only).
* ``boundary [L, B, H]``    — ``max(lengths - recent_size, 0)`` at prefill,
  fixed thereafter.

Decode attention computes pruned logits ``q[channels] . kp`` for all rows and
overwrites rows >= boundary with exact dense logits ``q . kd`` — identical
math to the reference's split product (a dot over kept channels equals the
dot over all channels with dropped ones zeroed).

Key-memory bytes per layer: ``C*Dk + Cr*D`` vs dense ``C*D`` — e.g. ratio 0.4,
C 2048, Cr 160: 0.66x the dense key bytes (plus untouched values).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ThinKCache(NamedTuple):
    kp: jnp.ndarray         # [L, B, H, C, Dk] pruned-channel keys
    channels: jnp.ndarray   # [L, B, H, Dk] int32 kept channel ids (ascending)
    kd: jnp.ndarray         # [L, B, H, Cr, D] dense keys, slot j = row boundary+j
    v: jnp.ndarray          # [L, B, H, C, D]
    boundary: jnp.ndarray   # [L, B, H] int32 pruned/dense split (fixed)
    lengths: jnp.ndarray    # [L, B, H] int32 valid rows
    positions: jnp.ndarray  # [B] int32 uncompressed token count

    @property
    def capacity(self) -> int:
        return self.v.shape[3]

    @property
    def dense_capacity(self) -> int:
        return self.kd.shape[3]

    @property
    def kept_dim(self) -> int:
        return self.kp.shape[4]


def build_think_cache(
    k_all: jnp.ndarray,      # [L, B, H, C, D] UNPRUNED packed prefill keys
    v_all: jnp.ndarray,      # [L, B, H, C, D]
    channels: jnp.ndarray,   # [L, B, H, Dk] int32
    lengths: jnp.ndarray,    # [L, B, H]
    positions: jnp.ndarray,  # [B]
    recent_size: int,
    dense_capacity: int,
) -> ThinKCache:
    L, B, H, C, D = k_all.shape
    boundary = jnp.maximum(lengths - recent_size, 0).astype(jnp.int32)
    kp = jnp.take_along_axis(k_all, channels[:, :, :, None, :], axis=4)
    ridx = jnp.clip(boundary[..., None]
                    + jnp.arange(dense_capacity, dtype=jnp.int32), 0, C - 1)
    kd = jnp.take_along_axis(k_all, ridx[..., None], axis=3)
    return ThinKCache(kp=kp, channels=channels, kd=kd, v=v_all,
                      boundary=boundary, lengths=lengths, positions=positions)
