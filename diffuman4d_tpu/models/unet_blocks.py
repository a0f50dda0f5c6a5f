"""UNet down/mid/up blocks (reference: src/diffusers/models/unets/
unet_multiview_blocks.py). Channels-last flax.

Structure (SD2.1 shapes):
  CrossAttnDownBlockMultiview: [resnet, transformer] x L (+ downsample)
  DownBlock2D:                 [resnet] x L (+ downsample)
  UNetMidBlockMultiviewCrossAttn: resnet, [transformer, resnet] x L
  UpBlock2D / CrossAttnUpBlockMultiview: L+1 layers, each consuming one
    skip connection concatenated on the channel axis (+ upsample)

Skip-connection bookkeeping matches unet_multiview_condition.py:557-587:
down blocks emit one residual per layer plus one per downsampler; up
blocks pop them in reverse.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from diffuman4d_tpu.models.freeu import FreeUConfig, apply_freeu
from diffuman4d_tpu.models.layers import Downsample2D, ResnetBlock2D, Upsample2D
from diffuman4d_tpu.models.transformer import TransformerMultiview


class DownBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray):
        output_states = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, groups=self.norm_groups, dtype=self.dtype, name=f"resnets_{i}")(
                x, temb
            )
            output_states.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, name="downsample")(x)
            output_states.append(x)
        return x, output_states


class CrossAttnDownBlockMultiview(nn.Module):
    out_channels: int
    num_heads: int
    num_layers: int = 2
    transformer_layers: int = 1
    add_downsample: bool = True
    norm_groups: int = 32
    use_linear_projection: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    attn_implementation: str = "auto"
    cp_groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray, num_frames: int = 1):
        head_dim = self.out_channels // self.num_heads
        output_states = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, groups=self.norm_groups, dtype=self.dtype, name=f"resnets_{i}")(
                x, temb
            )
            x = TransformerMultiview(
                self.num_heads,
                head_dim,
                num_layers=self.transformer_layers,
                norm_groups=self.norm_groups,
                use_linear_projection=self.use_linear_projection,
                dtype=self.dtype,
                attn_implementation=self.attn_implementation,
                cp_groups=self.cp_groups,
                name=f"attentions_{i}",
            )(x, num_frames=num_frames)
            output_states.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, name="downsample")(x)
            output_states.append(x)
        return x, output_states


class UNetMidBlockMultiviewCrossAttn(nn.Module):
    out_channels: int
    num_heads: int
    num_layers: int = 1
    transformer_layers: int = 1
    norm_groups: int = 32
    use_linear_projection: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    attn_implementation: str = "auto"
    cp_groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray, num_frames: int = 1):
        head_dim = self.out_channels // self.num_heads
        x = ResnetBlock2D(self.out_channels, groups=self.norm_groups, dtype=self.dtype, name="resnets_0")(x, temb)
        for i in range(self.num_layers):
            x = TransformerMultiview(
                self.num_heads,
                head_dim,
                num_layers=self.transformer_layers,
                norm_groups=self.norm_groups,
                use_linear_projection=self.use_linear_projection,
                dtype=self.dtype,
                attn_implementation=self.attn_implementation,
                cp_groups=self.cp_groups,
                name=f"attentions_{i}",
            )(x, num_frames=num_frames)
            x = ResnetBlock2D(
                self.out_channels, groups=self.norm_groups, dtype=self.dtype,
                name=f"resnets_{i + 1}",
            )(x, temb)
        return x


class UpBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    norm_groups: int = 32
    resolution_idx: int = 0
    freeu: Optional[FreeUConfig] = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, res_states: list, temb: jnp.ndarray):
        for i in range(self.num_layers):
            res = res_states.pop()
            x, res = apply_freeu(self.resolution_idx, x, res, self.freeu)
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock2D(self.out_channels, groups=self.norm_groups, dtype=self.dtype, name=f"resnets_{i}")(
                x, temb
            )
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsample")(x)
        return x


class CrossAttnUpBlockMultiview(nn.Module):
    out_channels: int
    num_heads: int
    num_layers: int = 3
    transformer_layers: int = 1
    add_upsample: bool = True
    norm_groups: int = 32
    resolution_idx: int = 0
    freeu: Optional[FreeUConfig] = None
    use_linear_projection: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    attn_implementation: str = "auto"
    cp_groups: int = 1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        res_states: list,
        temb: jnp.ndarray,
        num_frames: int = 1,
    ):
        head_dim = self.out_channels // self.num_heads
        for i in range(self.num_layers):
            res = res_states.pop()
            x, res = apply_freeu(self.resolution_idx, x, res, self.freeu)
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock2D(self.out_channels, groups=self.norm_groups, dtype=self.dtype, name=f"resnets_{i}")(
                x, temb
            )
            x = TransformerMultiview(
                self.num_heads,
                head_dim,
                num_layers=self.transformer_layers,
                norm_groups=self.norm_groups,
                use_linear_projection=self.use_linear_projection,
                dtype=self.dtype,
                attn_implementation=self.attn_implementation,
                cp_groups=self.cp_groups,
                name=f"attentions_{i}",
            )(x, num_frames=num_frames)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsample")(x)
        return x
