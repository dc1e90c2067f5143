"""Direct parity tests for ops/attention.blocked_causal_attention.

Oracle is an independent naive fp32 masked softmax (materializes the full
[S, S] attention matrix) — NOT another blocked/kernel implementation, per the
repo convention that parity tests compare against an independent oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kvcache_factory_tpu.ops.attention import blocked_causal_attention


def naive_causal_attention(q, k, v, true_len, sliding_window=None):
    """Full-matrix fp32 causal attention oracle (numpy)."""
    q = np.asarray(q, np.float32)
    k = np.asarray(k, np.float32)
    v = np.asarray(v, np.float32)
    B, Hq, S, D = q.shape
    Hk = k.shape[1]
    G = Hq // Hk
    out = np.zeros_like(q)
    rows = np.arange(S)[:, None]
    cols = np.arange(S)[None, :]
    for b in range(B):
        mask = cols <= rows
        if sliding_window is not None:
            mask = mask & (cols > rows - sliding_window)
        mask = mask & (cols < int(true_len[b]))
        for h in range(Hq):
            logits = (q[b, h] @ k[b, h // G].T) / np.sqrt(D)
            logits = np.where(mask, logits, -np.inf)
            # rows fully masked (padding rows) -> uniform softmax is fine;
            # guard the nan and zero them like jax.nn.softmax over NEG_INF
            m = logits.max(axis=-1, keepdims=True)
            m = np.where(np.isfinite(m), m, 0.0)
            e = np.exp(logits - m)
            e = np.where(np.isfinite(logits), e, 0.0)
            denom = e.sum(axis=-1, keepdims=True)
            probs = np.where(denom > 0, e / np.maximum(denom, 1e-30), 0.0)
            out[b, h] = probs @ v[b, h // G]
    return out


@pytest.mark.parametrize("sliding_window", [None, 7])
@pytest.mark.parametrize("q_block", [4, 16, 512])
def test_blocked_matches_naive(sliding_window, q_block):
    rng = np.random.default_rng(0)
    B, Hq, Hk, S, D = 2, 4, 2, 37, 16
    q = rng.standard_normal((B, Hq, S, D), np.float32)
    k = rng.standard_normal((B, Hk, S, D), np.float32)
    v = rng.standard_normal((B, Hk, S, D), np.float32)
    true_len = np.array([37, 21], np.int32)
    got = blocked_causal_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), jnp.asarray(true_len),
                                   sliding_window=sliding_window,
                                   q_block=q_block)
    want = naive_causal_attention(q, k, v, true_len,
                                  sliding_window=sliding_window)
    # only rows < true_len are consumed downstream; compare those
    for b in range(B):
        t = int(true_len[b])
        np.testing.assert_allclose(np.asarray(got)[b, :, :t],
                                   want[b, :, :t], rtol=2e-5, atol=2e-5)


def test_padding_invariance():
    """Extending the padded S with garbage must not change valid rows."""
    rng = np.random.default_rng(1)
    B, Hq, Hk, S, D = 1, 2, 2, 24, 8
    q = rng.standard_normal((B, Hq, S, D), np.float32)
    k = rng.standard_normal((B, Hk, S, D), np.float32)
    v = rng.standard_normal((B, Hk, S, D), np.float32)
    true_len = np.array([S], np.int32)
    base = blocked_causal_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), jnp.asarray(true_len),
                                    q_block=8)
    pad = 16
    qp = np.concatenate([q, rng.standard_normal((B, Hq, pad, D), np.float32) * 50],
                        axis=2)
    kp = np.concatenate([k, rng.standard_normal((B, Hk, pad, D), np.float32) * 50],
                        axis=2)
    vp = np.concatenate([v, rng.standard_normal((B, Hk, pad, D), np.float32) * 50],
                        axis=2)
    padded = blocked_causal_attention(jnp.asarray(qp), jnp.asarray(kp),
                                      jnp.asarray(vp), jnp.asarray(true_len),
                                      q_block=8)
    np.testing.assert_allclose(np.asarray(padded)[:, :, :S],
                               np.asarray(base), rtol=1e-6, atol=1e-6)
