"""Sequential-loop oracles for CAM value merging and LOOK-M pivot merging."""

import numpy as np

import jax
import jax.numpy as jnp

from kvcache_factory_tpu.policies.base import PackedKV
from kvcache_factory_tpu.policies.cam import cam_merge_values
from kvcache_factory_tpu.policies.lookm import lookm_pivot_merge


def cam_spec(v, col_mean, start_budget, w, uniforms):
    """Direct numpy transcription of the reference loop semantics
    (pyramidkv_utils.py:489-502): per token t, probabilistic merge of the
    evicted value into the following w values, compounding sequentially."""
    v = v.astype(np.float64).copy()
    H, S, D = v.shape
    for t in range(int(start_budget) + w, S):
        c = t - w
        ref_cols = list(range(int(start_budget))) + list(range(c, t))
        mean_attn = col_mean[:, ref_cols].max(axis=1)  # [H]
        with np.errstate(divide="ignore", invalid="ignore"):
            p = col_mean[:, c] / mean_attn
        p = np.where(np.isnan(p), 0.0, p)
        p = np.where(np.isinf(p), 1.0, p)
        p = np.clip(p, 0.0, 1.0)
        mask = (uniforms[t] < p).astype(np.float64)
        add = v[:, c] * mask[:, None] / w
        end = min(c + 1 + w, S)
        v[:, c + 1:end] += add[:, None, :]
    return v


def test_cam_merge_matches_sequential_spec():
    rng = np.random.default_rng(0)
    H, S, D, w = 2, 48, 8, 4
    v = rng.normal(size=(H, S, D)).astype(np.float32)
    col_mean = np.abs(rng.normal(size=(H, S))).astype(np.float32)
    uniforms = rng.uniform(size=(S, H)).astype(np.float32)
    ratio = 0.1
    true_len = S
    start_budget = int(np.ceil(ratio * true_len))

    ours = cam_merge_values(jnp.asarray(v), jnp.asarray(col_mean),
                            jnp.int32(true_len), ratio, w,
                            jax.random.PRNGKey(0),
                            uniforms=jnp.asarray(uniforms))
    expect = cam_spec(v, col_mean, start_budget, w, uniforms)
    np.testing.assert_allclose(np.asarray(ours), expect, rtol=1e-4, atol=1e-5)


def test_cam_merge_respects_true_len():
    """Tokens beyond true_len must not trigger merges."""
    rng = np.random.default_rng(1)
    H, S, D, w = 2, 64, 8, 4
    v = rng.normal(size=(H, S, D)).astype(np.float32)
    col_mean = np.abs(rng.normal(size=(H, S))).astype(np.float32)
    uniforms = rng.uniform(size=(S, H)).astype(np.float32)
    tl = 40
    ours = cam_merge_values(jnp.asarray(v), jnp.asarray(col_mean),
                            jnp.int32(tl), 0.1, w, jax.random.PRNGKey(0),
                            uniforms=jnp.asarray(uniforms))
    expect = cam_spec(v[:, :tl], col_mean[:, :tl],
                      int(np.ceil(0.1 * tl)), w, uniforms[:tl])
    np.testing.assert_allclose(np.asarray(ours)[:, :tl - w],
                               expect[:, :tl - w], rtol=1e-4, atol=1e-5)


def lookm_spec(k_full, v_full, gather_idx, lengths, true_len):
    """Numpy pivot merge with this framework's consistent [sel|win] ordering."""
    H, S, D = k_full.shape
    C = gather_idx.shape[1]
    k_out = np.zeros((H, C, D))
    v_out = np.zeros((H, C, D))
    for h in range(H):
        L = lengths[h]
        kept_idx = gather_idx[h, :L]
        k_ret = k_full[h, kept_idx].astype(np.float64)
        v_ret = v_full[h, kept_idx].astype(np.float64)
        dropped = sorted(set(range(true_len)) - set(kept_idx.tolist()))
        kn = k_full[h].astype(np.float64)
        vn = v_full[h].astype(np.float64)

        def unit(x):
            return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 0e0 + 1e-12)

        sums_k = k_ret.copy()
        sums_v = v_ret.copy()
        counts = np.ones(L)
        for p_idx in dropped:
            sim = unit(kn[p_idx]) @ unit(k_ret).T
            c = int(np.argmax(sim))
            sums_k[c] += (kn[p_idx] + k_ret[c]) / 2
            sums_v[c] += (vn[p_idx] + v_ret[c]) / 2
            counts[c] += 1
        k_out[h, :L] = sums_k / counts[:, None]
        v_out[h, :L] = sums_v / counts[:, None]
    return k_out, v_out


def test_lookm_matches_spec():
    rng = np.random.default_rng(2)
    H, S, D, C = 2, 40, 8, 16
    k = rng.normal(size=(H, S, D)).astype(np.float32)
    v = rng.normal(size=(H, S, D)).astype(np.float32)
    # arbitrary distinct kept indices per head
    gather_idx = np.stack([rng.permutation(S)[:C] for _ in range(H)])
    lengths = np.array([C, C - 4], np.int32)
    packed = PackedKV(
        jnp.asarray(np.take_along_axis(k, gather_idx[..., None], 1)),
        jnp.asarray(np.take_along_axis(v, gather_idx[..., None], 1)),
        jnp.asarray(lengths))
    out = lookm_pivot_merge(packed, jnp.asarray(gather_idx), jnp.asarray(k),
                            jnp.asarray(v), jnp.int32(S))
    ek, ev = lookm_spec(k, v, gather_idx, lengths, S)
    for h in range(H):
        L = lengths[h]
        np.testing.assert_allclose(np.asarray(out.k)[h, :L], ek[h, :L],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.v)[h, :L], ev[h, :L],
                                   rtol=1e-4, atol=1e-5)
