"""Host-offloaded KV cache: prefill KV in pinned host memory, decode appends
on device.

Reference: HF ``OffloadedCache`` (vendored at cache_utils_think.py:507) keeps
every layer's KV on CPU and prefetches layer k+1 while layer k computes, at
the cost of an H2D stream per layer per token.  TPU-native redesign with the
same capability (serve caches larger than HBM) and a cleaner split:

* ``hk / hv [L, B, H, C, D]`` — the compressed prefill cache, moved ONCE to
  ``pinned_host`` memory after prefill and immutable thereafter (prefill-only
  compression means decode never rewrites it — SURVEY.md §1 key fact).
* ``dk / dv [L, B, H, R, D]`` — a small device-resident ring for decode
  appends (R = decode headroom), so no host writes ever happen; the
  reference's per-token ``prefetch_stream`` CPU→GPU copy of the WHOLE layer
  plus eviction copy back is replaced by one per-layer H2D fetch inside the
  jitted step (XLA overlaps the copy-start of layer i+1 with layer i's
  compute where the schedule allows).

Peak HBM for the cache drops from ``L * 2BHCD`` to ``2BHCD`` (one layer in
flight) + the decode ring; the H2D link becomes the bandwidth bound — the
same tradeoff the reference's OffloadedCache makes on PCIe.

Not supported on the axon tunnel backend (its PJRT lacks host memory
spaces); works on real TPU and CPU backends.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class OffloadedKVCache(NamedTuple):
    hk: jnp.ndarray        # [L, B, H, C, D] pinned_host, immutable
    hv: jnp.ndarray        # [L, B, H, C, D] pinned_host, immutable
    dk: jnp.ndarray        # [L, B, H, R, D] device decode buffer
    dv: jnp.ndarray        # [L, B, H, R, D]
    prefill_len: jnp.ndarray  # [L, B, H] int32 valid host rows (fixed)
    lengths: jnp.ndarray   # [L, B, H] int32 total valid rows
    positions: jnp.ndarray  # [B] int32 uncompressed token count

    @property
    def capacity(self) -> int:
        return self.hk.shape[3] + self.dk.shape[3]

    @property
    def host_capacity(self) -> int:
        return self.hk.shape[3]

    @property
    def device_capacity(self) -> int:
        return self.dk.shape[3]


def _memory_sharding(x: jnp.ndarray, kind: str):
    s = x.sharding
    return s.with_memory_kind(kind)


def offload_kv_cache(cache, decode_headroom: int) -> OffloadedKVCache:
    """Move a prefill ``KVCache``'s KV to pinned host memory and attach a
    device-resident decode ring of ``decode_headroom`` slots.

    Call outside jit, once, after prefill.  Raises on backends without host
    memory spaces (the axon tunnel)."""
    dev = cache.k.devices().pop()
    kinds = {m.kind for m in dev.addressable_memories()}
    if "pinned_host" not in kinds:
        raise NotImplementedError(
            f"backend {jax.default_backend()!r} exposes no pinned_host "
            "memory space; host-offloaded caches need a real TPU/CPU PJRT "
            f"client (available: {sorted(kinds)})")
    host = _memory_sharding(cache.k, "pinned_host")
    # Decode ring on the SAME device sharding as the prefill cache: a plain
    # jnp.zeros would land on the default device, splitting the cache across
    # devices when cache.k lives elsewhere (then the jitted decode step sees
    # mixed placements and errors or silently transfers).
    dev_shard = cache.k.sharding
    L, B, H, C, D = cache.k.shape
    R = decode_headroom
    zeros = lambda dt: jax.device_put(jnp.zeros((L, B, H, R, D), dt),
                                      dev_shard)
    return OffloadedKVCache(
        hk=jax.device_put(cache.k, host),
        hv=jax.device_put(cache.v, host),
        dk=zeros(cache.k.dtype),
        dv=zeros(cache.v.dtype),
        prefill_len=cache.lengths,
        lengths=cache.lengths,
        positions=cache.positions,
    )
