"""Small numpy helpers for host-side batch assembly."""

from __future__ import annotations

import numpy as np


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
