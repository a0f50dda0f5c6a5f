"""Raw-container grid-state serialization for sampling checkpoints.

Replaces np.savez for the sampler's latent-grid checkpoints: the zip
container (crc32 + buffered member copies through cold heap pages) wrote
a 1.8 GB demo_4d grid at ~6.4 MB/s on this host (prefix_r4 phase table:
save_state 280 s). This format is a JSON header + raw array blobs
written with single large writes — disk-speed — and it stores bf16
arrays as their uint16 bit patterns (callers bitcast on device), halving
both the device->host transfer and the file size versus the old
fp32-cast path.

The reference has no counterpart: a killed sampling run loses the whole
in-memory latent grid (sliding_iterative_sampler.py:90-96, SURVEY §5).
Cheap checkpoints are what make the rebuild's long chained demo_4d runs
restartable at wave granularity.

File layout::

    b"D4DGRID1" | u64-le header_len | header json | blob_0 | blob_1 ...

Header: ``{"meta": {...}, "arrays": [{"name", "dtype", "shape",
"offset", "nbytes"}, ...]}``; offsets are relative to the end of the
header. Writes go to ``path + ".tmp"`` then ``os.replace`` (atomic —
same crash contract as the old npz path).
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

MAGIC = b"D4DGRID1"


def write_state(path: str, meta: dict, arrays: dict[str, np.ndarray]) -> None:
    entries = []
    blobs = []
    off = 0
    for name, a in arrays.items():
        a = np.ascontiguousarray(a)
        entries.append(
            {
                "name": name,
                "dtype": a.dtype.str,
                "shape": list(a.shape),
                "offset": off,
                "nbytes": int(a.nbytes),
            }
        )
        blobs.append(a)
        off += a.nbytes
    header = json.dumps({"meta": meta, "arrays": entries}).encode()
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        for a in blobs:
            # one large write per array — no zip members, no crc, no
            # small-buffer copies through cold pages
            f.write(memoryview(a).cast("B"))
    os.replace(tmp, path)


def read_state(path: str, mmap: bool = True) -> tuple[dict, dict[str, np.ndarray]]:
    """Returns (meta, {name: array}). Arrays are read-only memmap views
    by default (zero host copies; the device upload streams from the
    page cache)."""
    with open(path, "rb") as f:
        if f.read(len(MAGIC)) != MAGIC:
            raise ValueError(f"{path}: not a D4DGRID1 state file")
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        base = f.tell()
    out = {}
    for e in header["arrays"]:
        if mmap:
            a = np.memmap(
                path,
                dtype=np.dtype(e["dtype"]),
                mode="r",
                offset=base + e["offset"],
                shape=tuple(e["shape"]),
            )
        else:
            with open(path, "rb") as f:
                f.seek(base + e["offset"])
                a = np.fromfile(
                    f, dtype=np.dtype(e["dtype"]),
                    count=int(np.prod(e["shape"])) if e["shape"] else 1,
                ).reshape(e["shape"])
        out[e["name"]] = a
    return header["meta"], out
