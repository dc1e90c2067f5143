"""CAM cache-merging value update (vectorized + lax.fori_loop).

Reference: pyramidkv/pyramidkv_utils.py:480-502 — before H2O-style eviction,
each to-be-evicted value is probabilistically (Bernoulli on its attention
ratio) spread over the following ``merge_budget`` values.  The reference runs
a Python loop over token indices with host-side Bernoulli draws; here the
per-column attention means are precomputed once (they are loop-invariant: the
reference recomputes ``attn_weights[:, :, :t, :t].mean(-2)`` every step, but
the row slice always covers the full observation window, so the column means
never change), uniforms are pre-drawn, and the sequential value compounding —
iteration t reads values already modified by earlier iterations — runs in a
``fori_loop``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def cam_merge_values(
    v: jnp.ndarray,          # [H, S, D] values (will be merged)
    col_mean: jnp.ndarray,   # [H, S] fp32 mean attention per column (window rows)
    true_len: jnp.ndarray,   # scalar int32
    start_budget_ratio: float,
    window_size: int,        # == recent_budget == merge_budget in the reference
    key: jax.Array,
    uniforms: jnp.ndarray = None,  # [S, H] override for deterministic testing
) -> jnp.ndarray:
    """Returns values with CAM probabilistic merging applied.

    Loop range matches the reference (:492): t in [start_budget + recent,
    true_len); evicted column c = t - recent receives merge probability
    ``col_mean[c] / max(col_mean[sinks ∪ recent-window])`` (:495-500) and, on a
    Bernoulli hit, ``v[c] / merge_budget`` is added to ``v[c+1 : c+1+budget]``
    (:501-502).
    """
    H, S, D = v.shape
    w = window_size
    start_budget = jnp.ceil(start_budget_ratio * true_len).astype(jnp.int32)
    if uniforms is None:
        uniforms = jax.random.uniform(key, (S, H))
    col_ids = lax.broadcasted_iota(jnp.int32, (H, S), 1)

    # Pad so the w-row merge segment never runs off the end.
    v = jnp.pad(v, ((0, 0), (0, w + 1), (0, 0)))

    def body(t, v):
        c = t - w
        active = (t >= start_budget + w) & (t < true_len) & (c >= 0)
        in_ref = (col_ids < start_budget) | ((col_ids >= c) & (col_ids < t))
        mean_attn = jnp.max(jnp.where(in_ref, col_mean, -jnp.inf), axis=-1)  # [H]
        p = col_mean[:, c] / mean_attn
        p = jnp.where(jnp.isnan(p), 0.0, p)
        p = jnp.where(jnp.isinf(p), 1.0, p)
        p = jnp.clip(p, 0.0, 1.0)
        bern = (uniforms[t] < p).astype(v.dtype)  # [H]
        add = v[:, c, :] * bern[:, None] / w  # [H, D]
        seg = lax.dynamic_slice_in_dim(v, c + 1, w, axis=1)
        seg = seg + jnp.where(active, 1.0, 0.0).astype(v.dtype) * add[:, None, :]
        return lax.dynamic_update_slice_in_dim(v, seg, c + 1, axis=1)

    v = lax.fori_loop(w, S, body, v)
    return v[:, :S, :]
