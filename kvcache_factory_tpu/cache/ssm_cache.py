"""SSM (Mamba-family) recurrent cache — TPU-native equivalent of the
reference's vendored ``MambaCache`` (cache_utils_think.py:1596-1690).

The reference vendors HF's MambaCache (two mutable tensors
``conv_states [L, B, intermediate, conv_kernel]`` and
``ssm_states [L, B, intermediate, state]``, updated in place with
``roll`` + indexed write / wholesale replace) but never exercises it —
no runner builds a Mamba model.  This module closes that declared breadth
gap with a functional pytree following the repo's cache layout rule
(``positions`` is [B]; every other leaf is [L, B, ...]), so the
continuous-batching engine's generic slot machinery (`_insert_row`,
`_alloc_pool`) serves it like every attention cache.

Semantics matched to the reference (tested against a numpy emulation of
the torch code):

* ``update_conv``: the convolution window ROLLS left one slot and the
  newest input column lands at ``min(position, K-1)`` — the reference's
  ``cache_position.clamp(0, conv_kernel_size - 1)`` followed by
  ``roll(shifts=-1, dims=-1)`` + indexed write (:1674-1683).  During the
  first K steps the clamp makes the write position advance 0,1,...,K-1;
  afterwards it pins to K-1 and the roll provides the shift — both cases
  are the same two XLA ops here (roll is a concat of static slices; the
  write is a one-hot select), fully fused into a jitted decode step.
* ``update_ssm``: wholesale replacement of the layer's state (:1685-1688).

All updates are functional (return a new cache pytree) and jit-safe with
static shapes; ``layer_idx`` may be traced (lax.dynamic_update_index).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class SSMCache(NamedTuple):
    conv_states: jnp.ndarray  # [L, B, intermediate, conv_kernel]
    ssm_states: jnp.ndarray   # [L, B, intermediate, state]
    positions: jnp.ndarray    # [B] int32 — tokens seen (the conv clamp clock)

    @property
    def conv_kernel_size(self) -> int:
        return self.conv_states.shape[3]

    @property
    def num_layers(self) -> int:
        return self.conv_states.shape[0]


def init_ssm_cache(num_layers: int, batch: int, intermediate: int,
                   conv_kernel: int, state: int,
                   dtype=jnp.bfloat16) -> SSMCache:
    """Zeroed cache (reference ``MambaCache.__init__``, :1656-1672)."""
    return SSMCache(
        conv_states=jnp.zeros((num_layers, batch, intermediate, conv_kernel),
                              dtype),
        ssm_states=jnp.zeros((num_layers, batch, intermediate, state), dtype),
        positions=jnp.zeros((batch,), jnp.int32),
    )


def update_conv(cache: SSMCache, layer_idx, x_t: jnp.ndarray) -> SSMCache:
    """Push one timestep's input column into the layer's conv window.

    ``x_t``: [B, intermediate].  Reference :1674-1683 — roll left, write
    the new column at ``clamp(position, 0, K-1)``.  The per-example
    ``positions`` clock plays the reference's ``cache_position`` (which HF
    passes in; one scalar per batch row here so ragged streams compose).
    """
    K = cache.conv_kernel_size
    conv = lax.dynamic_index_in_dim(cache.conv_states, layer_idx, 0,
                                    keepdims=False)  # [B, I, K]
    rolled = jnp.roll(conv, -1, axis=-1)
    pos = jnp.minimum(cache.positions, K - 1)  # [B]
    onehot = jax.nn.one_hot(pos, K, dtype=conv.dtype)  # [B, K]
    new = (rolled * (1.0 - onehot[:, None, :])
           + x_t.astype(conv.dtype)[:, :, None] * onehot[:, None, :])
    return cache._replace(conv_states=lax.dynamic_update_index_in_dim(
        cache.conv_states, new, layer_idx, 0))


def update_ssm(cache: SSMCache, layer_idx, new_state: jnp.ndarray) -> SSMCache:
    """Replace the layer's SSM state (reference :1685-1688).

    ``new_state``: [B, intermediate, state]."""
    return cache._replace(ssm_states=lax.dynamic_update_index_in_dim(
        cache.ssm_states, new_state.astype(cache.ssm_states.dtype),
        layer_idx, 0))


def advance(cache: SSMCache) -> SSMCache:
    """Advance the per-example step clock after all layers updated."""
    return cache._replace(positions=cache.positions + 1)


def conv_window(cache: SSMCache, layer_idx) -> jnp.ndarray:
    """The layer's current conv window [B, intermediate, K], newest last —
    what a Mamba block convolves against its kernel taps."""
    return lax.dynamic_index_in_dim(cache.conv_states, layer_idx, 0,
                                    keepdims=False)
