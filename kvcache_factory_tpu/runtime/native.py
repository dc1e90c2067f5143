"""ctypes bindings for the native (C++) runtime components.

Two libraries built by ``make -C csrc``:
 * ``libkvcf_sched.so`` — continuous-batching scheduler core;
 * ``libkvcf_st.so``    — mmap + parallel-copy safetensors reader.

Both have pure-Python fallbacks so the framework works untouched on a machine
without a toolchain; the native paths are preferred when the .so exists (built
automatically on first import if g++ is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from collections import deque
from typing import List, Optional, Tuple

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")


def _load(name: str):
    path = os.path.join(_CSRC, name)
    if not os.path.exists(path):
        try:
            subprocess.run(["make", "-C", _CSRC, name], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None


# ---------------------------------------------------------------------------
# Scheduler
# ---------------------------------------------------------------------------

_sched_lib = None


def _sched():
    global _sched_lib
    if _sched_lib is None:
        lib = _load("libkvcf_sched.so")
        if lib is not None:
            lib.kvcf_sched_create.restype = ctypes.c_void_p
            lib.kvcf_sched_create.argtypes = [
                ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
            lib.kvcf_sched_destroy.argtypes = [ctypes.c_void_p]
            lib.kvcf_sched_submit.restype = ctypes.c_int64
            lib.kvcf_sched_submit.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                              ctypes.c_int32]
            lib.kvcf_sched_admit.restype = ctypes.c_int32
            lib.kvcf_sched_admit.argtypes = [ctypes.c_void_p,
                                             ctypes.POINTER(ctypes.c_int64)]
            lib.kvcf_sched_step.restype = ctypes.c_int32
            lib.kvcf_sched_step.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                            ctypes.c_int32]
            lib.kvcf_sched_stats.argtypes = [ctypes.c_void_p,
                                             ctypes.POINTER(ctypes.c_int64)]
        _sched_lib = lib if lib is not None else False
    return _sched_lib or None


class NativeScheduler:
    """Continuous-batching scheduler backed by the C++ core."""

    def __init__(self, n_slots: int, buckets: List[int]):
        lib = _sched()
        if lib is None:
            raise RuntimeError("libkvcf_sched.so unavailable")
        self._lib = lib
        arr = (ctypes.c_int32 * len(buckets))(*sorted(buckets))
        self._h = lib.kvcf_sched_create(n_slots, arr, len(buckets))
        self.n_slots = n_slots

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.kvcf_sched_destroy(self._h)
            self._h = None

    def submit(self, prompt_len: int, max_new_tokens: int) -> int:
        return int(self._lib.kvcf_sched_submit(self._h, prompt_len,
                                               max_new_tokens))

    def admit(self) -> Optional[Tuple[int, int, int, int]]:
        out = (ctypes.c_int64 * 4)()
        if self._lib.kvcf_sched_admit(self._h, out):
            return int(out[0]), int(out[1]), int(out[2]), int(out[3])
        return None

    def step(self, slot: int, hit_eos: bool) -> bool:
        return bool(self._lib.kvcf_sched_step(self._h, slot, int(hit_eos)))

    def stats(self) -> dict:
        out = (ctypes.c_int64 * 4)()
        self._lib.kvcf_sched_stats(self._h, out)
        return {"queued": int(out[0]), "active": int(out[1]),
                "free": int(out[2]), "completed": int(out[3])}


class PyScheduler:
    """Pure-Python fallback with identical semantics."""

    def __init__(self, n_slots: int, buckets: List[int]):
        self.n_slots = n_slots
        self._buckets = sorted(buckets)
        self._queue: deque = deque()
        self._free = list(range(n_slots - 1, -1, -1))
        self._slots = [None] * n_slots  # (request_id, generated, max_new)
        self._next_id = 1
        self._completed = 0
        self._mu = threading.Lock()

    def _bucket_for(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        return -1

    def submit(self, prompt_len: int, max_new_tokens: int) -> int:
        with self._mu:
            if self._bucket_for(prompt_len) < 0:
                return -1
            rid = self._next_id
            self._next_id += 1
            self._queue.append((rid, prompt_len, max_new_tokens))
            return rid

    def admit(self):
        with self._mu:
            if not self._queue or not self._free:
                return None
            rid, plen, mnt = self._queue.popleft()
            slot = self._free.pop()
            self._slots[slot] = [rid, 0, mnt]
            return slot, rid, self._bucket_for(plen), mnt

    def step(self, slot: int, hit_eos: bool) -> bool:
        with self._mu:
            # Reject out-of-range slots (negative Python indexing would
            # silently hit the LAST slot; the native core rejects them too).
            if not 0 <= slot < len(self._slots):
                return False
            st = self._slots[slot]
            if st is None:
                return False
            st[1] += 1
            if hit_eos or st[1] >= st[2]:
                self._slots[slot] = None
                self._free.append(slot)
                self._completed += 1
                return True
            return False

    def stats(self) -> dict:
        with self._mu:
            return {"queued": len(self._queue),
                    "active": sum(s is not None for s in self._slots),
                    "free": len(self._free), "completed": self._completed}


def make_scheduler(n_slots: int, buckets: List[int]):
    try:
        return NativeScheduler(n_slots, buckets)
    except RuntimeError:
        return PyScheduler(n_slots, buckets)


# ---------------------------------------------------------------------------
# Safetensors reader
# ---------------------------------------------------------------------------

_st_lib = None


def _st():
    global _st_lib
    if _st_lib is None:
        lib = _load("libkvcf_st.so")
        if lib is not None:
            lib.kvcf_st_open.restype = ctypes.c_void_p
            lib.kvcf_st_open.argtypes = [ctypes.c_char_p]
            lib.kvcf_st_close.argtypes = [ctypes.c_void_p]
            lib.kvcf_st_size.restype = ctypes.c_int64
            lib.kvcf_st_size.argtypes = [ctypes.c_void_p]
            lib.kvcf_st_read.restype = ctypes.c_int32
            lib.kvcf_st_read.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                         ctypes.c_uint64, ctypes.c_void_p,
                                         ctypes.c_int32]
            lib.kvcf_st_ptr.restype = ctypes.c_void_p
            lib.kvcf_st_ptr.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        _st_lib = lib if lib is not None else False
    return _st_lib or None


_ST_DTYPES = {
    "F64": ("<f8", 8), "F32": ("<f4", 4), "F16": ("<f2", 2),
    "BF16": ("bfloat16", 2), "I64": ("<i8", 8), "I32": ("<i4", 4),
    "I16": ("<i2", 2), "I8": ("<i1", 1), "U8": ("<u1", 1), "BOOL": ("<u1", 1),
}


class SafetensorsFile:
    """Safetensors shard reader: native mmap when available, else mmap module.

    Supports bf16 via ml_dtypes (numpy has no native bf16)."""

    def __init__(self, path: str, threads: int = 0):
        import json

        self.path = path
        self.threads = threads or (os.cpu_count() or 1)
        self._lib = _st()
        if self._lib is not None:
            self._h = self._lib.kvcf_st_open(path.encode())
            if not self._h:
                raise OSError(f"cannot map {path}")
            self._mm = None
        else:
            import mmap as _mmap
            self._f = open(path, "rb")
            self._mm = _mmap.mmap(self._f.fileno(), 0, access=_mmap.ACCESS_READ)
            self._h = None

        header_len = int.from_bytes(self._read(0, 8), "little")
        self.header = json.loads(self._read(8, header_len).decode())
        self._data_off = 8 + header_len
        self.tensors = {k: v for k, v in self.header.items()
                        if k != "__metadata__"}

    def _read(self, off: int, n: int) -> bytes:
        if self._h is not None:
            buf = ctypes.create_string_buffer(n)
            rc = self._lib.kvcf_st_read(self._h, off, n, buf, 1)
            if rc != 0:
                raise OSError("read out of range")
            return buf.raw
        return self._mm[off:off + n]

    def keys(self):
        return self.tensors.keys()

    def tensor(self, name: str):
        import numpy as np

        info = self.tensors[name]
        dt, _ = _ST_DTYPES[info["dtype"]]
        begin, end = info["data_offsets"]
        n = end - begin
        out = np.empty(n, np.uint8)
        if self._h is not None:
            rc = self._lib.kvcf_st_read(
                self._h, self._data_off + begin, n,
                out.ctypes.data_as(ctypes.c_void_p), self.threads)
            if rc != 0:
                raise OSError("tensor read out of range")
        else:
            # Single copy: slicing the mmap first materializes an n-byte
            # bytes object (a second full copy for multi-GB shards).
            out[:] = np.frombuffer(self._mm, np.uint8, count=n,
                                   offset=self._data_off + begin)
        if dt == "bfloat16":
            import ml_dtypes
            arr = out.view(ml_dtypes.bfloat16)
        else:
            arr = out.view(np.dtype(dt))
        return arr.reshape(info["shape"])

    def close(self):
        if self._h is not None:
            self._lib.kvcf_st_close(self._h)
            self._h = None
        elif self._mm is not None:
            self._mm.close()
            self._f.close()
            self._mm = None
