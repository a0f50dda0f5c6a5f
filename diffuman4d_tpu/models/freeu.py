"""FreeU (arXiv 2309.11497) — free-lunch quality tweak for diffusion UNets.

The reference preserves diffusers' FreeU hook in its up blocks
(unet_multiview_blocks.py:643-665): at the first two up stages the backbone
hidden states' first half-channels are scaled (b1/b2) and the skip
connections are low-pass-attenuated in Fourier space (s1/s2).

Channels-last JAX implementation; enabled via ``UNetConfig.freeu``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class FreeUConfig(NamedTuple):
    b1: float = 1.5
    b2: float = 1.6
    s1: float = 0.9
    s2: float = 0.2


def fourier_filter(x: jnp.ndarray, threshold: int, scale: float) -> jnp.ndarray:
    """Scale the lowest-frequency box of a (B, H, W, C) feature map."""
    dtype = x.dtype
    xf = jnp.fft.fftn(x.astype(jnp.float32), axes=(1, 2))
    xf = jnp.fft.fftshift(xf, axes=(1, 2))
    b, h, w, c = x.shape
    cy, cx = h // 2, w // 2
    mask = jnp.ones((1, h, w, 1), jnp.float32)
    mask = mask.at[
        :, cy - threshold : cy + threshold, cx - threshold : cx + threshold, :
    ].set(scale)
    xf = xf * mask
    xf = jnp.fft.ifftshift(xf, axes=(1, 2))
    out = jnp.fft.ifftn(xf, axes=(1, 2)).real
    return out.astype(dtype)


def apply_freeu(
    resolution_idx: int,
    hidden: jnp.ndarray,  # (B, H, W, C) backbone features
    skip: jnp.ndarray,  # (B, H, W, C') skip connection
    cfg: Optional[FreeUConfig],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scale backbone half-channels and low-pass the skip at up stages 0/1."""
    if cfg is None:
        return hidden, skip
    if resolution_idx == 0:
        half = hidden.shape[-1] // 2
        hidden = jnp.concatenate([hidden[..., :half] * cfg.b1, hidden[..., half:]], -1)
        skip = fourier_filter(skip, threshold=1, scale=cfg.s1)
    elif resolution_idx == 1:
        half = hidden.shape[-1] // 2
        hidden = jnp.concatenate([hidden[..., :half] * cfg.b2, hidden[..., half:]], -1)
        skip = fourier_filter(skip, threshold=1, scale=cfg.s2)
    return hidden, skip
