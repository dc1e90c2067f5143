"""Continuous batching: slot-based request scheduling over one batched cache.

The reference evaluates strictly one sequence at a time (eval_batch_size
default 1, run_longbench.py:339).  Here a fixed pool of decode slots shares a
single batched cache [L, B_slots, H, C, D]; finished slots are refilled from
the request queue without stopping the other streams:

    submit -> (C++ scheduler FIFO) -> admit into free slot
      -> single-row prefill (bucketed jit) -> insert row into batched cache
      -> batched decode step over all active slots -> EOS/len frees the slot

Greedy decoding is deterministic per row, so outputs are bit-identical to
one-at-a-time generation (asserted in tests/test_batching.py).
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
                 head_capacity=None, rng=None):
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
        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.max_new_cap = max_new_cap
        self.eos = tuple(eos_token_ids)
        self.head_capacity = (None if head_capacity is None
                              else jnp.asarray(head_capacity, jnp.int32))
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.buckets = sorted(cfg.prefill_buckets)
        self.scheduler = make_scheduler(n_slots, self.buckets)
        self._prompts: Dict[int, List[int]] = {}
        self._max_new: Dict[int, int] = {}

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
            head_capacity=self.head_capacity, rng=self.rng)
        first = jnp.argmax(res.logits_last, axis=-1).astype(jnp.int32)
        return res.cache, first

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

        decode = jax.jit(lambda p, t, c: llama.decode_step(p, cfg.model, t, c))

        outputs: Dict[int, List[int]] = {}
        slot_rid = [-1] * self.n_slots
        cur = np.zeros((self.n_slots,), np.int32)
        active = np.zeros((self.n_slots,), bool)

        while True:
            # Admit as many queued requests as there are free slots.
            admitted = False
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
                admitted = True
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

            logits, batched = decode(self.params, jnp.asarray(cur), batched)
            nxt = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
            for slot in range(self.n_slots):
                if not active[slot]:
                    continue
                tok = int(nxt[slot])
                rid = slot_rid[slot]
                outputs[rid].append(tok)
                finished = self.scheduler.step(slot, tok in self.eos)
                if finished:
                    active[slot] = False
                    slot_rid[slot] = -1
                else:
                    cur[slot] = tok
            if progress:
                print(self.scheduler.stats())

        return outputs
