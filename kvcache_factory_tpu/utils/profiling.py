"""Profiling & phase timing — first-class observability.

The reference's entire tracing story is one NVTX range around the AdaKV cache
append (pyramidkv_utils.py:63-69) and wall-clock prints in the needle runner
(SURVEY.md §5).  Here:

 * :func:`trace` wraps ``jax.profiler.trace`` (view in TensorBoard/XProf);
 * :func:`annotate` adds named regions to device traces;
 * :class:`PhaseTimer` records per-phase wall time and derived tokens/s, with
   correct device synchronization (``block_until_ready`` on the phase's
   outputs — crucial on the async dispatch path).
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): run()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (device + host timeline)."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class PhaseTimer:
    phases: Dict[str, List[float]] = field(default_factory=dict)
    tokens: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, outputs: Any = None, num_tokens: int = 0):
        """Times a phase; pass the phase's jax outputs via a mutable list or
        call :meth:`sync` manually before exiting."""
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            if outputs is not None:
                jax.block_until_ready(outputs)
                # The axon TPU tunnel's block_until_ready does not reliably
                # wait (CLAUDE.md timing rule) — force a host readback of one
                # leaf so the phase really covers the device work.
                import numpy as _np
                for leaf in jax.tree.leaves(outputs):
                    if hasattr(leaf, "shape"):
                        _np.asarray(leaf[(0,) * leaf.ndim])  # one scalar D2H
                        break
            dt = time.perf_counter() - t0
            self.phases.setdefault(name, []).append(dt)
            if num_tokens:
                self.tokens[name] = self.tokens.get(name, 0) + num_tokens

    def record(self, name: str, seconds: float, num_tokens: int = 0):
        self.phases.setdefault(name, []).append(seconds)
        if num_tokens:
            self.tokens[name] = self.tokens.get(name, 0) + num_tokens

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, times in self.phases.items():
            total = sum(times)
            entry = {"count": len(times), "total_s": round(total, 4),
                     "mean_s": round(total / len(times), 4)}
            if name in self.tokens and total > 0:
                entry["tokens_per_s"] = round(self.tokens[name] / total, 2)
            out[name] = entry
        return out

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.summary(), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s
