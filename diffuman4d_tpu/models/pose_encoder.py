"""Skeleton-map pose encoder (reference: src/diffusers/models/unets/
pose_encoder.py:11-54, itself MimicMotion-style).

Consumes the full-resolution skeleton image (B, H, W, 3) and produces a
(B, H/8, W/8, out_channels) feature added to ``conv_in``'s output
(unet_multiview_condition.py:552-554). The final projection is zero-init
with a learnable scalar scale (init 2.0) so an untrained head is a no-op.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _he_normal_torch(key, shape, dtype):
    """torch-style init: normal(0, sqrt(2 / (kh*kw*in_ch)))
    (pose_encoder.py:40-46; flax kernels are (kh, kw, in, out))."""
    import jax

    kh, kw, cin, _ = shape
    std = np.sqrt(2.0 / (kh * kw * cin))
    return jax.random.normal(key, shape, dtype) * std


class PoseEncoder(nn.Module):
    out_channels: int = 320
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # (channels, kernel, stride): three stride-2 stages -> /8 (VAE ratio)
        plan = [
            (3, 3, 1),
            (16, 4, 2),
            (16, 3, 1),
            (32, 4, 2),
            (32, 3, 1),
            (64, 4, 2),
            (64, 3, 1),
            (128, 3, 1),
        ]
        for i, (ch, k, s) in enumerate(plan):
            pad = (k - 1) // 2 if k % 2 == 1 else 1  # torch padding=1 for k=4
            x = nn.Conv(
                ch,
                (k, k),
                strides=s,
                padding=pad,
                dtype=self.dtype,
                kernel_init=_he_normal_torch,
                bias_init=nn.initializers.zeros,
                name=f"conv_{i}",
            )(x)
            x = nn.silu(x)
        x = nn.Conv(
            self.out_channels,
            (1, 1),
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="final_proj",
        )(x)
        scale = self.param("scale", lambda _: jnp.full((1,), 2.0, jnp.float32))
        return x * scale.astype(x.dtype)
