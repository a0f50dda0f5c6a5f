"""Small numpy helpers for host-side batch assembly."""

from __future__ import annotations

from collections import OrderedDict

import numpy as np


class ByteLRU:
    """Byte-budgeted LRU cache for device-resident arrays.

    The reference keeps no device caches at all (it re-uploads every
    window's conditions, pipeline_diffuman4d.py:521-539); the pipeline's
    per-frame condition caches need a closed memory loop so a 7,200-cell
    demo_4d grid cannot OOM the chip by insertion alone. The axon backend
    exposes no ``device.memory_stats()``, so residency is self-tracked:
    every insert evicts least-recently-used entries until the configured
    byte budget holds. Evicted device buffers free once the last JAX
    reference drops, so in-flight consumers are never invalidated.
    """

    def __init__(self, budget_bytes: int):
        self.budget = int(budget_bytes)
        self.nbytes = 0
        self._d: OrderedDict = OrderedDict()

    def get(self, key):
        v = self._d.get(key)
        if v is not None:
            self._d.move_to_end(key)
        return v

    def put(self, key, value, nbytes: int) -> None:
        if key in self._d:
            self._d.move_to_end(key)
            return
        if nbytes > self.budget:
            return  # single entry over budget: never cache
        self._d[key] = (value, nbytes)
        self.nbytes += nbytes
        while self.nbytes > self.budget:
            _, (_, freed) = self._d.popitem(last=False)
            self.nbytes -= freed

    def __contains__(self, key) -> bool:
        return key in self._d

    def __len__(self) -> int:
        return len(self._d)

    def value(self, key):
        v = self.get(key)
        return None if v is None else v[0]

    def clear(self) -> None:
        self._d.clear()
        self.nbytes = 0


def fast_stack(arrays, dtype=None) -> np.ndarray:
    """``np.stack`` via a preallocated buffer + per-element assignment.

    np.stack routes through np.concatenate, which on some hosts (observed
    on this VM's slow memory) runs ~10x slower than strided memcpy for
    multi-MB image arrays (41 s vs 4.5 s for 48 x 1024^2 x 3 fp16).
    """
    arrays = list(arrays)
    a0 = np.asarray(arrays[0])
    out = np.empty((len(arrays),) + a0.shape, dtype or a0.dtype)
    for i, a in enumerate(arrays):
        out[i] = a
    return out
