"""diffusers.models.attention_processor shim: the ``Attention`` module.

Written from the diffusers==0.33.1 public semantics (param layout
``to_q/to_k/to_v`` bias-free Linears + ``to_out.0`` Linear with bias for
transformer blocks; ``group_norm`` + biased qkv + residual for the VAE
mid-block configuration). Consumed by BasicTransformerBlock (attn1/attn2,
reference attention.py:76-121) and the VAE mid block.

AttnAddedKVProcessor/AttnAddedKVProcessor2_0 are imported by the
reference (unet_multiview_blocks.py:23) but never configured by the
Diffuman4D model — stubs.


Divergences vs real diffusers 0.33.1: see docs/SHIM_DIVERGENCES.md.
"""

from typing import Optional

import torch
import torch.nn as nn
import torch.nn.functional as F


class Attention(nn.Module):
    def __init__(
        self,
        query_dim: int,
        cross_attention_dim: Optional[int] = None,
        heads: int = 8,
        dim_head: int = 64,
        dropout: float = 0.0,
        bias: bool = False,
        upcast_attention: bool = False,
        upcast_softmax: bool = False,
        cross_attention_norm: Optional[str] = None,
        added_kv_proj_dim: Optional[int] = None,
        norm_num_groups: Optional[int] = None,
        spatial_norm_dim: Optional[int] = None,
        out_bias: bool = True,
        scale_qk: bool = True,
        only_cross_attention: bool = False,
        eps: float = 1e-5,
        rescale_output_factor: float = 1.0,
        residual_connection: bool = False,
        _from_deprecated_attn_block: bool = False,
        processor=None,
        out_dim: Optional[int] = None,
    ):
        super().__init__()
        self.inner_dim = out_dim if out_dim is not None else dim_head * heads
        self.query_dim = query_dim
        self.cross_attention_dim = (
            cross_attention_dim if cross_attention_dim is not None else query_dim
        )
        self.heads = heads
        self.rescale_output_factor = rescale_output_factor
        self.residual_connection = residual_connection
        self.upcast_attention = upcast_attention
        self.upcast_softmax = upcast_softmax
        self.scale = dim_head**-0.5 if scale_qk else 1.0
        self.only_cross_attention = only_cross_attention

        if norm_num_groups is not None:
            # tiny-config accommodation: diffusers always uses the given
            # group count (32 with every real checkpoint); gcd keeps the
            # shim constructible when C < 32 in oracle tests
            import math

            g = math.gcd(norm_num_groups, query_dim)
            self.group_norm = nn.GroupNorm(
                num_channels=query_dim, num_groups=g, eps=eps, affine=True
            )
        else:
            self.group_norm = None

        self.to_q = nn.Linear(query_dim, self.inner_dim, bias=bias)
        self.to_k = nn.Linear(self.cross_attention_dim, self.inner_dim, bias=bias)
        self.to_v = nn.Linear(self.cross_attention_dim, self.inner_dim, bias=bias)
        self.to_out = nn.ModuleList(
            [nn.Linear(self.inner_dim, query_dim, bias=out_bias), nn.Dropout(dropout)]
        )

    def forward(
        self,
        hidden_states: torch.Tensor,
        encoder_hidden_states: Optional[torch.Tensor] = None,
        attention_mask: Optional[torch.Tensor] = None,
        **cross_attention_kwargs,
    ) -> torch.Tensor:
        residual = hidden_states

        input_ndim = hidden_states.ndim
        if input_ndim == 4:  # VAE mid-block path: (B, C, H, W)
            batch, channel, height, width = hidden_states.shape
            hidden_states = hidden_states.view(
                batch, channel, height * width
            ).transpose(1, 2)

        if self.group_norm is not None:
            hidden_states = self.group_norm(
                hidden_states.transpose(1, 2)
            ).transpose(1, 2)

        if encoder_hidden_states is None:
            encoder_hidden_states = hidden_states

        query = self.to_q(hidden_states)
        key = self.to_k(encoder_hidden_states)
        value = self.to_v(encoder_hidden_states)

        B, S, _ = query.shape
        hd = self.inner_dim // self.heads
        query = query.view(B, -1, self.heads, hd).transpose(1, 2)
        key = key.view(B, -1, self.heads, hd).transpose(1, 2)
        value = value.view(B, -1, self.heads, hd).transpose(1, 2)

        if self.upcast_attention:
            query, key = query.float(), key.float()

        hidden_states = F.scaled_dot_product_attention(
            query, key, value, attn_mask=attention_mask, scale=self.scale
        ).to(value.dtype)
        hidden_states = hidden_states.transpose(1, 2).reshape(B, S, self.inner_dim)

        hidden_states = self.to_out[0](hidden_states)
        hidden_states = self.to_out[1](hidden_states)

        if input_ndim == 4:
            hidden_states = hidden_states.transpose(-1, -2).reshape(
                batch, channel, height, width
            )
        if self.residual_connection:
            hidden_states = hidden_states + residual
        return hidden_states / self.rescale_output_factor


class AttnAddedKVProcessor:  # pragma: no cover - imported, never configured
    pass


class AttnAddedKVProcessor2_0:  # pragma: no cover - imported, never configured
    pass
