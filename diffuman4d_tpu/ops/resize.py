"""Device-side resizes with PyTorch ``F.interpolate`` semantics — pure JAX.

The reference resizes condition maps on the GPU with torch bilinear
(no antialias) and nearest modes (pipeline_diffuman4d.py:90-100, 218-249).
``jax.image.resize`` uses anti-aliased kernels for downsampling, which does
NOT match; these gather-based implementations are exact.

Layout: channels-last (..., H, W, C). Separable; two gathers + lerps.
"""

from __future__ import annotations

import jax.numpy as jnp


def _linear_taps(in_size: int, out_size: int):
    o = jnp.arange(out_size, dtype=jnp.float32)
    src = (o + 0.5) * (in_size / out_size) - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    i0 = jnp.floor(src)
    w1 = src - i0
    idx0 = i0.astype(jnp.int32)
    idx1 = jnp.minimum(idx0 + 1, in_size - 1)
    return idx0, idx1, w1


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False,
    antialias=False) on a channels-last array (..., H, W, C)."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    i0, i1, wi = _linear_taps(h, out_h)
    j0, j1, wj = _linear_taps(w, out_w)
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    # rows
    top = jnp.take(xf, i0, axis=-3)
    bot = jnp.take(xf, i1, axis=-3)
    xf = top + (bot - top) * wi[:, None, None]
    # cols
    lef = jnp.take(xf, j0, axis=-2)
    rig = jnp.take(xf, j1, axis=-2)
    xf = lef + (rig - lef) * wj[:, None]
    return xf.astype(dtype)


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest'): src index = floor(o * in/out)."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    ii = jnp.floor(jnp.arange(out_h, dtype=jnp.float32) * (h / out_h)).astype(jnp.int32)
    jj = jnp.floor(jnp.arange(out_w, dtype=jnp.float32) * (w / out_w)).astype(jnp.int32)
    ii = jnp.minimum(ii, h - 1)
    jj = jnp.minimum(jj, w - 1)
    x = jnp.take(x, ii, axis=-3)
    x = jnp.take(x, jj, axis=-2)
    return x


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsample (UNet Upsample2D, diffusers upsampling.py).

    (..., H, W, C) -> (..., 2H, 2W, C) via repeat — cheap on TPU."""
    x = jnp.repeat(x, 2, axis=-3)
    x = jnp.repeat(x, 2, axis=-2)
    return x
