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

import jax
import jax.numpy as jnp


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
    """
    if implementation == "xla":
        return _xla_attention(q, k, v)

    if implementation in ("auto", "pallas", "bundled"):
        from diffuman4d_tpu.ops.flash_attention import (
            flash_attention,
            flash_attention_bundled,
            flash_supported,
        )

        on_accel = jax.default_backend() != "cpu"
        if implementation == "pallas":
            return flash_attention(q, k, v)
        if implementation == "bundled":
            return flash_attention_bundled(q, k, v)
        if flash_supported(q, k, v) and on_accel:
            # measured on v5e (scripts/profile_window.py @ d=64):
            #   seq 4096:  XLA 36 TF/s > local pallas 24 TF/s (XLA's
            #              attention rewriter fuses at this size)
            #   seq 16384: local 28 TF/s; bundled jax kernel ~2x local
            #   seq 65536: bundled 62 TF/s > local 31 TF/s
            s = q.shape[1]
            if s <= 4096 and s == k.shape[1]:
                return _xla_attention(q, k, v)
            if s >= 16384 and q.shape[-1] <= 128 and s % 1024 == 0:
                return flash_attention_bundled(q, k, v)
            return flash_attention(q, k, v)
        return _xla_attention(q, k, v)

    raise ValueError(f"Unknown attention implementation: {implementation}")


@functools.partial(jax.jit, static_argnames=("implementation",))
def attention_jit(q, k, v, implementation="auto"):
    return dot_product_attention(q, k, v, implementation=implementation)
