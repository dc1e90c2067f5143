"""Ring attention (sequence/context parallelism) vs single-device reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental import mesh_utils

from kvcache_factory_tpu.ops.attention import blocked_causal_attention
from kvcache_factory_tpu.parallel.ring_attention import make_ring_attention


@pytest.mark.parametrize("n_dev,true_len", [(4, 256), (8, 256), (4, 200)])
def test_ring_attention_matches_dense(n_dev, true_len):
    devices = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devices, ("sp",))
    B, Hq, Hkv, S, D = 2, 4, 2, 256, 32
    rng = np.random.default_rng(n_dev)
    q = rng.normal(size=(B, Hq, S, D)).astype(np.float32)
    k = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
    v = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
    tl = np.full((B,), true_len, np.int32)

    ring = make_ring_attention(mesh, "sp")
    with mesh:
        out = ring(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                   jnp.asarray(tl))
    ref = blocked_causal_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), jnp.asarray(tl))
    o, r = np.asarray(out), np.asarray(ref)
    np.testing.assert_allclose(o[:, :, :true_len], r[:, :, :true_len],
                               rtol=2e-5, atol=2e-5)
