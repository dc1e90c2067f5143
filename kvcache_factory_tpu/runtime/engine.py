"""High-level inference engine: bucketing, jit caching, tokenizer plumbing.

The reference pays a fresh HF ``generate`` dispatch per example with Python
per-layer hooks; here each (prompt-bucket, max_new_tokens) pair compiles once
and is reused across the whole evaluation run — prompt lengths are padded up
to the nearest bucket and masked via ``true_len`` (bit-identical results to
exact-length runs; see tests/test_policies.py padding-invariance tests).
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (CompressionConfig, EngineConfig, GenerationConfig,
                      ModelConfig)
from .generate import GenerateResult, generate


class InferenceEngine:
    def __init__(self, params, cfg: EngineConfig,
                 head_capacity: Optional[np.ndarray] = None,
                 rng: Optional[jax.Array] = None):
        self.params = params
        self.cfg = cfg
        self.head_capacity = (None if head_capacity is None
                              else jnp.asarray(head_capacity, jnp.int32))
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.buckets = sorted(cfg.prefill_buckets)

    def _bucket(self, n: int) -> int:
        i = bisect.bisect_left(self.buckets, n)
        if i == len(self.buckets):
            raise ValueError(f"prompt length {n} exceeds largest bucket "
                             f"{self.buckets[-1]}")
        return self.buckets[i]

    def generate_ids(self, prompt_ids: Sequence[int], max_new_tokens: int,
                     eos_token_ids: Sequence[int] = ()) -> List[int]:
        """Single-prompt greedy generation; returns generated ids (EOS-trimmed)."""
        n = len(prompt_ids)
        S = self._bucket(n)
        toks = np.zeros((1, S), np.int32)
        toks[0, :n] = prompt_ids
        gen_cfg = GenerationConfig(max_new_tokens=max_new_tokens,
                                   eos_token_ids=tuple(eos_token_ids))
        comp = self.cfg.compression
        L = self.cfg.model.num_hidden_layers
        cache_capacity = comp.layer_capacity(L, S) + max_new_tokens + 1
        if self.cfg.quant is not None:  # pallas quant cache layouts
            align = 256 if self.cfg.quant.nbits == 4 else 128
            cache_capacity = -(-cache_capacity // align) * align
        res = generate(self.params, self.cfg.model, comp, gen_cfg,
                       jnp.asarray(toks), jnp.asarray([n], jnp.int32),
                       cache_capacity, rng=self.rng,
                       head_capacity=self.head_capacity,
                       quant_cfg=self.cfg.quant)
        num = int(res.num_tokens[0])
        return np.asarray(res.tokens)[0, :num].tolist()
