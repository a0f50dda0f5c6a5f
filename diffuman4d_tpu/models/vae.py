"""AutoencoderKL VAE — SD-shape, channels-last flax.

The reference consumes this through the diffusers pip package
(pipeline_diffuman4d.py:27, 47-72): encode to a 4-channel latent at /8 with
``latent_dist.sample() * scaling_factor``, decode back. Structure mirrored
from diffusers' AutoencoderKL (block_out_channels (128, 256, 512, 512),
two encoder resnets per stage, three decoder resnets, single-head
full-channel mid attention, GroupNorm eps 1e-6).

TPU notes: the encoder downsample convs use the VAE's asymmetric (0,1)
bottom/right padding; attention funnels through the shared
:func:`diffuman4d_tpu.ops.attention.dot_product_attention` so the Pallas
kernel serves here too (16,384 tokens at 1024^2 inputs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffuman4d_tpu.models.layers import GroupNorm, ResnetBlock2D, Upsample2D


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_eps: float = 1e-6
    scaling_factor: float = 0.18215

    @property
    def downscale_factor(self) -> int:
        # vae_scale_factor = 2 ** (len(block_out_channels) - 1)
        # (pipeline_diffuman4d.py:139)
        return 2 ** (len(self.block_out_channels) - 1)


class VAEAttention(nn.Module):
    """Mid-block attention: single head over full channels, qkv+out with
    bias, GroupNorm in front, residual connection."""

    channels: int
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(32, self.norm_eps, name="group_norm")(x)
        x = x.reshape(b, h * w, c)

        inner = self.channels
        q = nn.Dense(inner, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, dtype=self.dtype, name="to_v")(x)
        from diffuman4d_tpu.ops.attention import dot_product_attention

        out = dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(self.channels, dtype=self.dtype, name="to_out")(out)
        return out.reshape(b, h, w, c) + residual


class VAEDownsample(nn.Module):
    """Stride-2 conv with asymmetric (0,1,0,1) padding (diffusers VAE)."""

    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.out_channels, (3, 3), strides=2, padding=0, dtype=self.dtype, name="conv"
        )(x)


class MidBlock(nn.Module):
    channels: int
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ResnetBlock2D(
            self.channels, use_temb=False, eps=self.norm_eps, dtype=self.dtype, name="resnets_0"
        )(x)
        x = VAEAttention(self.channels, self.norm_eps, dtype=self.dtype, name="attention")(x)
        x = ResnetBlock2D(
            self.channels, use_temb=False, eps=self.norm_eps, dtype=self.dtype, name="resnets_1"
        )(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(
                    ch, use_temb=False, eps=cfg.norm_eps, dtype=self.dtype,
                    name=f"down_{i}_resnets_{j}",
                )(x)
            if i < len(cfg.block_out_channels) - 1:
                x = VAEDownsample(ch, dtype=self.dtype, name=f"down_{i}_downsample")(x)
        x = MidBlock(cfg.block_out_channels[-1], cfg.norm_eps, dtype=self.dtype, name="mid_block")(x)
        x = GroupNorm(32, cfg.norm_eps, name="conv_norm_out")(x)
        x = nn.silu(x)
        # 2x latent channels: mean and logvar moments
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        rev = list(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = MidBlock(rev[0], cfg.norm_eps, dtype=self.dtype, name="mid_block")(x)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock2D(
                    ch, use_temb=False, eps=cfg.norm_eps, dtype=self.dtype,
                    name=f"up_{i}_resnets_{j}",
                )(x)
            if i < len(rev) - 1:
                x = Upsample2D(ch, dtype=self.dtype, name=f"up_{i}_upsample")(x)
        x = GroupNorm(32, cfg.norm_eps, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x


class AutoencoderKL(nn.Module):
    config: VAEConfig = field(default_factory=VAEConfig)
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        # 1x1 moment/latent projections (diffusers quant_conv/post_quant_conv)
        self.quant_conv = nn.Conv(
            2 * self.config.latent_channels, (1, 1), dtype=self.dtype
        )
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=self.dtype)

    def moments(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        m = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(m, 2, axis=-1)
        logvar = jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)
        return mean, logvar

    def encode(
        self, x: jnp.ndarray, rng: Optional[jax.Array] = None, sample: bool = True
    ) -> jnp.ndarray:
        """Pixels (B,H,W,3) in [-1,1] -> scaled latents (B,H/8,W/8,4).

        ``sample=True`` draws from the diagonal Gaussian like the reference's
        ``latent_dist.sample()`` (pipeline_diffuman4d.py:52); ``False`` is
        the distribution mode."""
        mean, logvar = self.moments(x)
        z = mean.astype(jnp.float32)
        if sample:
            if rng is None:
                raise ValueError("encode(sample=True) requires an rng key")
            std = jnp.exp(0.5 * logvar)
            z = z + std * jax.random.normal(rng, z.shape, jnp.float32)
        return (z * self.config.scaling_factor).astype(self.dtype)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """Scaled latents -> pixels in [-1,1] (pipeline_diffuman4d.py:59-72)."""
        z = z / self.config.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, rng: Optional[jax.Array] = None):
        z = self.encode(x, rng=rng, sample=rng is not None)
        return self.decode(z)
