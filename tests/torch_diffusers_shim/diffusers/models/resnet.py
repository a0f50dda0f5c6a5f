"""diffusers.models.resnet shim: ResnetBlock2D / Downsample2D / Upsample2D.

Written to the diffusers==0.33.1 semantics and state-dict layout
(norm1/conv1/time_emb_proj/norm2/conv2/conv_shortcut; downsamplers use a
stride-2 conv — with asymmetric (0,1,0,1) padding when constructed with
padding=0 as in the VAE encoder; upsamplers are nearest-2x + conv).
Consumed by the reference's multiview blocks (unet_multiview_blocks.py:26)
and the UNet's DownBlock2D/UpBlock2D stages.


Divergences vs real diffusers 0.33.1: see docs/SHIM_DIVERGENCES.md.
"""

import math
from typing import Optional

import torch
import torch.nn as nn
import torch.nn.functional as F

from .activations import get_activation


def _group_norm(num_groups: int, num_channels: int, eps: float) -> nn.GroupNorm:
    # tiny-config accommodation (see attention_processor.py): real
    # checkpoints always divide evenly
    g = math.gcd(num_groups, num_channels)
    return nn.GroupNorm(num_groups=g, num_channels=num_channels, eps=eps, affine=True)


class ResnetBlock2D(nn.Module):
    def __init__(
        self,
        *,
        in_channels: int,
        out_channels: Optional[int] = None,
        conv_shortcut: bool = False,
        dropout: float = 0.0,
        temb_channels: int = 512,
        groups: int = 32,
        groups_out: Optional[int] = None,
        pre_norm: bool = True,
        eps: float = 1e-6,
        non_linearity: str = "swish",
        skip_time_act: bool = False,
        time_embedding_norm: str = "default",
        output_scale_factor: float = 1.0,
        use_in_shortcut: Optional[bool] = None,
        up: bool = False,
        down: bool = False,
        conv_shortcut_bias: bool = True,
        conv_2d_out_channels: Optional[int] = None,
    ):
        super().__init__()
        if time_embedding_norm not in ("default", "scale_shift"):
            raise NotImplementedError(time_embedding_norm)
        out_channels = in_channels if out_channels is None else out_channels
        groups_out = groups if groups_out is None else groups_out
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.time_embedding_norm = time_embedding_norm
        self.output_scale_factor = output_scale_factor
        self.skip_time_act = skip_time_act

        self.norm1 = _group_norm(groups, in_channels, eps)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, padding=1)
        if temb_channels is not None:
            temb_out = (
                2 * out_channels if time_embedding_norm == "scale_shift" else out_channels
            )
            self.time_emb_proj = nn.Linear(temb_channels, temb_out)
        else:
            self.time_emb_proj = None
        self.norm2 = _group_norm(groups_out, out_channels, eps)
        self.dropout = nn.Dropout(dropout)
        conv_2d_out_channels = conv_2d_out_channels or out_channels
        self.conv2 = nn.Conv2d(out_channels, conv_2d_out_channels, 3, padding=1)
        self.nonlinearity = get_activation(non_linearity)

        self.use_in_shortcut = (
            in_channels != conv_2d_out_channels
            if use_in_shortcut is None
            else use_in_shortcut
        )
        self.conv_shortcut = (
            nn.Conv2d(in_channels, conv_2d_out_channels, 1, bias=conv_shortcut_bias)
            if self.use_in_shortcut
            else None
        )

    def forward(self, input_tensor: torch.Tensor, temb: Optional[torch.Tensor] = None):
        hidden_states = input_tensor
        hidden_states = self.norm1(hidden_states)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.conv1(hidden_states)

        if self.time_emb_proj is not None and temb is not None:
            if not self.skip_time_act:
                temb = self.nonlinearity(temb)
            temb = self.time_emb_proj(temb)[:, :, None, None]
            if self.time_embedding_norm == "default":
                hidden_states = hidden_states + temb

        hidden_states = self.norm2(hidden_states)
        if self.time_embedding_norm == "scale_shift" and temb is not None:
            scale, shift = torch.chunk(temb, 2, dim=1)
            hidden_states = hidden_states * (1 + scale) + shift
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.dropout(hidden_states)
        hidden_states = self.conv2(hidden_states)

        if self.conv_shortcut is not None:
            input_tensor = self.conv_shortcut(input_tensor)
        return (input_tensor + hidden_states) / self.output_scale_factor


class Downsample2D(nn.Module):
    def __init__(
        self,
        channels: int,
        use_conv: bool = False,
        out_channels: Optional[int] = None,
        padding: int = 1,
        name: str = "conv",
        kernel_size: int = 3,
        bias: bool = True,
    ):
        super().__init__()
        self.channels = channels
        self.out_channels = out_channels or channels
        self.use_conv = use_conv
        self.padding = padding
        self.name = name
        if use_conv:
            self.conv = nn.Conv2d(
                channels, self.out_channels, kernel_size, stride=2,
                padding=padding, bias=bias,
            )
        else:
            self.conv = nn.AvgPool2d(kernel_size=2, stride=2)

    def forward(self, hidden_states: torch.Tensor) -> torch.Tensor:
        if self.use_conv and self.padding == 0:
            # VAE encoder: asymmetric pad right/bottom before stride-2 conv
            hidden_states = F.pad(hidden_states, (0, 1, 0, 1), mode="constant", value=0)
        return self.conv(hidden_states)


class Upsample2D(nn.Module):
    def __init__(
        self,
        channels: int,
        use_conv: bool = False,
        use_conv_transpose: bool = False,
        out_channels: Optional[int] = None,
        name: str = "conv",
        kernel_size: Optional[int] = None,
        bias: bool = True,
        interpolate: bool = True,
    ):
        super().__init__()
        self.channels = channels
        self.out_channels = out_channels or channels
        self.use_conv = use_conv
        self.interpolate = interpolate
        if use_conv:
            self.conv = nn.Conv2d(
                channels, self.out_channels, kernel_size or 3, padding=1, bias=bias
            )
        else:
            self.conv = None

    def forward(self, hidden_states: torch.Tensor, output_size=None) -> torch.Tensor:
        if self.interpolate:
            if output_size is None:
                hidden_states = F.interpolate(
                    hidden_states, scale_factor=2.0, mode="nearest"
                )
            else:
                hidden_states = F.interpolate(
                    hidden_states, size=output_size, mode="nearest"
                )
        if self.conv is not None:
            hidden_states = self.conv(hidden_states)
        return hidden_states
