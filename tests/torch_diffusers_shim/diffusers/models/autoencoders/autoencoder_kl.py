"""diffusers.models.autoencoders shim: AutoencoderKL.

Surface consumed by the reference pipeline (pipeline_diffuman4d.py:47-72):
``encode(x).latent_dist.sample()``, ``decode(z, return_dict=False,
generator=g)[0]``, ``config.scaling_factor``, ``config.block_out_channels``,
``dtype`` / ``device``. State-dict layout matches the HF AutoencoderKL key
schema handled by diffuman4d_tpu/io/checkpoints.py:convert_vae_torch_keys
(encoder/decoder conv_in, down_blocks.i.resnets.j, mid_block, quant_conv…).
"""

from typing import Optional, Tuple

import torch
import torch.nn as nn

from ...configuration_utils import ConfigMixin, register_to_config
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from ..resnet import _group_norm
from ..unets.unet_2d_blocks import DownEncoderBlock2D, UNetMidBlock2D, UpDecoderBlock2D


class DiagonalGaussianDistribution:
    def __init__(self, parameters: torch.Tensor, deterministic: bool = False):
        self.parameters = parameters
        self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)
        self.logvar = torch.clamp(self.logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = torch.exp(0.5 * self.logvar)

    def sample(self, generator: Optional[torch.Generator] = None) -> torch.Tensor:
        if self.deterministic:
            return self.mean
        noise = torch.randn(
            self.mean.shape, generator=generator, dtype=self.parameters.dtype
        )
        return self.mean + self.std * noise

    def mode(self) -> torch.Tensor:
        return self.mean


class AutoencoderKLOutput(BaseOutput):
    def __init__(self, latent_dist):
        super().__init__()
        self["latent_dist"] = latent_dist
        object.__setattr__(self, "latent_dist", latent_dist)


class DecoderOutput(BaseOutput):
    def __init__(self, sample):
        super().__init__()
        self["sample"] = sample
        object.__setattr__(self, "sample", sample)


class Encoder(nn.Module):
    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        down_block_types,
        block_out_channels,
        layers_per_block: int,
        norm_num_groups: int,
        act_fn: str = "silu",
        double_z: bool = True,
    ):
        super().__init__()
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        ch = block_out_channels[0]
        for i, _ in enumerate(down_block_types):
            out_ch = block_out_channels[i]
            self.down_blocks.append(
                DownEncoderBlock2D(
                    in_channels=ch,
                    out_channels=out_ch,
                    num_layers=layers_per_block,
                    resnet_groups=norm_num_groups,
                    resnet_act_fn=act_fn,
                    add_downsample=i < len(block_out_channels) - 1,
                    downsample_padding=0,
                )
            )
            ch = out_ch
        self.mid_block = UNetMidBlock2D(
            in_channels=ch, resnet_groups=norm_num_groups, resnet_act_fn=act_fn
        )
        self.conv_norm_out = _group_norm(norm_num_groups, ch, 1e-6)
        self.conv_act = nn.SiLU()
        conv_out_channels = 2 * out_channels if double_z else out_channels
        self.conv_out = nn.Conv2d(ch, conv_out_channels, 3, padding=1)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = self.conv_in(x)
        for block in self.down_blocks:
            x = block(x)
        x = self.mid_block(x)
        x = self.conv_norm_out(x)
        x = self.conv_act(x)
        return self.conv_out(x)


class Decoder(nn.Module):
    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        up_block_types,
        block_out_channels,
        layers_per_block: int,
        norm_num_groups: int,
        act_fn: str = "silu",
    ):
        super().__init__()
        rev = list(reversed(block_out_channels))
        self.conv_in = nn.Conv2d(in_channels, rev[0], 3, padding=1)
        self.mid_block = UNetMidBlock2D(
            in_channels=rev[0], resnet_groups=norm_num_groups, resnet_act_fn=act_fn
        )
        self.up_blocks = nn.ModuleList()
        ch = rev[0]
        for i, _ in enumerate(up_block_types):
            out_ch = rev[i]
            self.up_blocks.append(
                UpDecoderBlock2D(
                    in_channels=ch,
                    out_channels=out_ch,
                    num_layers=layers_per_block + 1,
                    resnet_groups=norm_num_groups,
                    resnet_act_fn=act_fn,
                    add_upsample=i < len(block_out_channels) - 1,
                )
            )
            ch = out_ch
        self.conv_norm_out = _group_norm(norm_num_groups, ch, 1e-6)
        self.conv_act = nn.SiLU()
        self.conv_out = nn.Conv2d(ch, out_channels, 3, padding=1)

    def forward(self, z: torch.Tensor) -> torch.Tensor:
        z = self.conv_in(z)
        z = self.mid_block(z)
        for block in self.up_blocks:
            z = block(z)
        z = self.conv_norm_out(z)
        z = self.conv_act(z)
        return self.conv_out(z)


class AutoencoderKL(ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        down_block_types: Tuple[str, ...] = ("DownEncoderBlock2D",),
        up_block_types: Tuple[str, ...] = ("UpDecoderBlock2D",),
        block_out_channels: Tuple[int, ...] = (64,),
        layers_per_block: int = 1,
        act_fn: str = "silu",
        latent_channels: int = 4,
        norm_num_groups: int = 32,
        sample_size: int = 32,
        scaling_factor: float = 0.18215,
        shift_factor: Optional[float] = None,
        force_upcast: bool = True,
    ):
        super().__init__()
        self.encoder = Encoder(
            in_channels=in_channels,
            out_channels=latent_channels,
            down_block_types=down_block_types,
            block_out_channels=block_out_channels,
            layers_per_block=layers_per_block,
            norm_num_groups=norm_num_groups,
            act_fn=act_fn,
        )
        self.decoder = Decoder(
            in_channels=latent_channels,
            out_channels=out_channels,
            up_block_types=up_block_types,
            block_out_channels=block_out_channels,
            layers_per_block=layers_per_block,
            norm_num_groups=norm_num_groups,
            act_fn=act_fn,
        )
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)

    def encode(self, x: torch.Tensor, return_dict: bool = True):
        moments = self.quant_conv(self.encoder(x))
        posterior = DiagonalGaussianDistribution(moments)
        if not return_dict:
            return (posterior,)
        return AutoencoderKLOutput(latent_dist=posterior)

    def decode(self, z: torch.Tensor, return_dict: bool = True, generator=None):
        decoded = self.decoder(self.post_quant_conv(z))
        if not return_dict:
            return (decoded,)
        return DecoderOutput(sample=decoded)
