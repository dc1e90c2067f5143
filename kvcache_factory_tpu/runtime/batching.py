"""Continuous batching: slot-based request scheduling over one batched cache.

The reference evaluates strictly one sequence at a time (eval_batch_size
default 1, run_longbench.py:339).  Here a fixed pool of decode slots shares a
single batched cache [L, B_slots, H, C, D]; finished slots are refilled from
the request queue without stopping the other streams:

    submit -> (C++ scheduler FIFO) -> admit into free slot
      -> single-row prefill (bucketed jit) -> insert row into batched cache
      -> CHUNKED decode: K tokens per jit dispatch over all slots
      -> EOS/len frees the slot at the next chunk boundary

Decode runs ``chunk_size`` steps inside one jit (a ``lax.scan`` carrying
tokens and cache) so the host syncs with the scheduler once per K tokens,
not once per token — the axon TPU tunnel costs 25-40 ms per dispatch +
readback, which would cap a per-token loop at ~30 tok/s for the whole pool
regardless of kernel speed.  Rows that hit EOS mid-chunk keep decoding
garbage until the boundary; their extra tokens are discarded on host and
their extra cache appends land in slots that are fully overwritten on
re-admission (greedy rows are independent, so live rows are unaffected —
bit-identical to one-at-a-time generation, tests/test_batching.py).

Parallelism: with ``cfg.sharding`` spanning >1 device the slot pool is
sharded over ``dp`` and the weights/heads over ``tp`` (parallel/mesh.py);
decode dispatches are unchanged, GSPMD inserts the collectives.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..cache.kv_cache import KVCache
from ..config import CompressionConfig, EngineConfig, GenerationConfig
from ..models import llama
from .native import make_scheduler


@functools.partial(jax.jit, donate_argnums=(0,))
def _insert_row(batched: KVCache, row: KVCache, slot: jnp.ndarray) -> KVCache:
    """Insert a single-sequence cache (B=1) into batch position `slot`."""
    def put(buf, r):
        idx = (0, slot) + (0,) * (buf.ndim - 2)
        return jax.lax.dynamic_update_slice(buf, r, idx)

    def put_pos(buf, r):  # positions: [B]
        return jax.lax.dynamic_update_slice(buf, r, (slot,))

    return KVCache(
        k=put(batched.k, row.k), v=put(batched.v, row.v),
        lengths=jax.lax.dynamic_update_slice(
            batched.lengths, row.lengths, (0, slot, 0)),
        positions=put_pos(batched.positions, row.positions),
    )


class ContinuousBatchingEngine:
    """Drains a request queue through a fixed-slot batched decode loop."""

    def __init__(self, params, cfg: EngineConfig, n_slots: int = 4,
                 max_new_cap: int = 256,
                 eos_token_ids: Sequence[int] = (),
                 head_capacity=None, rng=None,
                 chunk_size: int = 16):
        # The slot pool batches plain dense KVCache rows; configs whose cache
        # is a different pytree would be SILENTLY stripped to dense KV by
        # _insert_row — refuse them loudly instead of mis-serving.
        if cfg.quant is not None:
            raise NotImplementedError(
                "continuous batching batches dense KVCache rows; quantized "
                "caches are served through InferenceEngine")
        if cfg.compression.decode_evict or (
                cfg.compression.method == "think"
                and cfg.compression.think_packed):
            raise NotImplementedError(
                "continuous batching does not support decode_evict or "
                "think_packed caches (non-KVCache pytrees)")
        if cfg.compression.method == "headkv" and head_capacity is None:
            raise ValueError("headkv requires head_capacity (as in "
                             "InferenceEngine)")
        self.cfg = cfg
        self.n_slots = n_slots
        self.max_new_cap = max_new_cap
        self.chunk_size = max(1, chunk_size)
        self.eos = tuple(eos_token_ids)
        self.head_capacity = (None if head_capacity is None
                              else jnp.asarray(head_capacity, jnp.int32))
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.buckets = sorted(cfg.prefill_buckets)
        self.scheduler = make_scheduler(n_slots, self.buckets)
        self._prompts: Dict[int, List[int]] = {}
        self._max_new: Dict[int, int] = {}

        sh = cfg.sharding
        self.mesh = None
        if sh.dp * sh.tp * sh.ep > 1:
            from ..parallel.mesh import make_mesh, shard_params
            if n_slots % sh.dp != 0:
                raise ValueError(f"n_slots={n_slots} must be divisible by "
                                 f"dp={sh.dp} (slots shard over dp)")
            self.mesh = make_mesh(sh)
            params = shard_params(params, self.mesh, cfg.model)
        self.params = params
        self.attn_backend = "xla" if self.mesh is not None else "auto"

        L = cfg.model.num_hidden_layers
        caps = [cfg.compression.layer_capacity(L, b) for b in self.buckets]
        self.cache_capacity = max(caps) + max_new_cap + 1

    def submit(self, prompt_ids: Sequence[int], max_new_tokens: int) -> int:
        max_new_tokens = min(max_new_tokens, self.max_new_cap)
        rid = self.scheduler.submit(len(prompt_ids), max_new_tokens)
        if rid < 0:
            raise ValueError(f"prompt length {len(prompt_ids)} exceeds largest "
                             f"bucket {self.buckets[-1]}")
        self._prompts[rid] = list(prompt_ids)
        self._max_new[rid] = max_new_tokens
        return rid

    def _prefill_row(self, prompt: List[int], bucket: int):
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :len(prompt)] = prompt
        res = llama.prefill(
            self.params, self.cfg.model, self.cfg.compression,
            jnp.asarray(toks), jnp.asarray([len(prompt)], jnp.int32),
            cache_capacity=self.cache_capacity,
            head_capacity=self.head_capacity, rng=self.rng,
            attn_backend=self.attn_backend)
        first = jnp.argmax(res.logits_last, axis=-1).astype(jnp.int32)
        return res.cache, first

    def _make_decode_chunk(self):
        cfg_model = self.cfg.model
        K = self.chunk_size
        backend = self.attn_backend

        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_chunk(params, cur, cache):
            """K greedy decode steps in one dispatch; returns [K, B] tokens."""
            def step(carry, _):
                cur, cache = carry
                logits, cache = llama.decode_step(params, cfg_model, cur,
                                                  cache, attn_backend=backend)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (nxt, cache), nxt

            (_, cache), toks = jax.lax.scan(step, (cur, cache), None, length=K)
            return toks, cache

        return decode_chunk

    def run(self, progress: bool = False) -> Dict[int, List[int]]:
        """Blocking drain: returns {request_id: generated token ids}."""
        cfg = self.cfg
        L = cfg.model.num_hidden_layers
        cache_heads = cfg.compression.cache_heads(
            cfg.model.num_attention_heads, cfg.model.num_key_value_heads)
        from ..cache.kv_cache import init_cache
        from ..config import dtype_of
        batched = init_cache(L, self.n_slots, cache_heads, self.cache_capacity,
                             cfg.model.head_dim, dtype_of(cfg.model))
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from ..parallel.mesh import cache_specs
            specs = cache_specs()
            batched = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
                batched, specs)

        decode_chunk = self._make_decode_chunk()
        K = self.chunk_size

        outputs: Dict[int, List[int]] = {}
        slot_rid = [-1] * self.n_slots
        cur = np.zeros((self.n_slots,), np.int32)
        active = np.zeros((self.n_slots,), bool)

        def _put_cur(arr):
            j = jnp.asarray(arr)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                return jax.device_put(j, NamedSharding(self.mesh, P("dp")))
            return j

        while True:
            # Admit as many queued requests as there are free slots.
            while True:
                adm = self.scheduler.admit()
                if adm is None:
                    break
                slot, rid, bucket, _ = adm
                row_cache, first_tok = self._prefill_row(
                    self._prompts[rid], bucket)
                batched = _insert_row(batched, row_cache, jnp.int32(slot))
                ft = int(first_tok[0])
                outputs[rid] = [ft]
                slot_rid[slot] = rid
                cur[slot] = ft
                active[slot] = True
                # The prefill token counts toward max_new; a first-token EOS
                # finishes immediately (min_new_tokens=1 semantics).
                if self.scheduler.step(slot, ft in self.eos):
                    active[slot] = False
                    slot_rid[slot] = -1

            if not active.any():
                st = self.scheduler.stats()
                if st["queued"] == 0 and st["active"] == 0:
                    break
                continue

            # One dispatch, K tokens; sync with the scheduler afterwards.
            toks, batched = decode_chunk(self.params, _put_cur(cur), batched)
            toks_np = np.asarray(toks)  # [K, B]
            for k in range(K):
                for slot in range(self.n_slots):
                    if not active[slot]:
                        continue
                    tok = int(toks_np[k, slot])
                    rid = slot_rid[slot]
                    outputs[rid].append(tok)
                    if self.scheduler.step(slot, tok in self.eos):
                        active[slot] = False
                        slot_rid[slot] = -1
            cur = toks_np[K - 1].copy()
            if progress:
                print(self.scheduler.stats())

        return outputs
