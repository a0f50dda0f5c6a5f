"""diffusers.models.transformers.transformer_2d shim: Transformer2DModel,
the continuous-input variant only (what SD2.1 / Diffuman4D uses).

The reference subclasses it and overrides ``_init_continuous_input`` +
``forward`` (transformer_multiview.py:34-77), so the base must: expose
``config`` via register_to_config, set ``is_input_continuous`` /
``inner_dim`` / ``in_channels`` / ``out_channels`` /
``use_linear_projection``, call ``self._init_continuous_input(norm_type)``
from __init__, and provide ``_operate_on_continuous_inputs`` /
``_get_output_for_continuous_inputs`` used by the subclass forward.
"""

from typing import Optional

import torch
import torch.nn as nn

from ...configuration_utils import ConfigMixin, register_to_config
from ..modeling_outputs import Transformer2DModelOutput  # noqa: F401 (re-export)
from ..modeling_utils import ModelMixin
from ..attention import BasicTransformerBlock


class Transformer2DModel(ModelMixin, ConfigMixin):
    _supports_gradient_checkpointing = True

    @register_to_config
    def __init__(
        self,
        num_attention_heads: int = 16,
        attention_head_dim: int = 88,
        in_channels: Optional[int] = None,
        out_channels: Optional[int] = None,
        num_layers: int = 1,
        dropout: float = 0.0,
        norm_num_groups: int = 32,
        cross_attention_dim: Optional[int] = None,
        attention_bias: bool = False,
        sample_size: Optional[int] = None,
        num_vector_embeds: Optional[int] = None,
        patch_size: Optional[int] = None,
        activation_fn: str = "geglu",
        num_embeds_ada_norm: Optional[int] = None,
        use_linear_projection: bool = False,
        only_cross_attention: bool = False,
        double_self_attention: bool = False,
        upcast_attention: bool = False,
        norm_type: str = "layer_norm",
        norm_elementwise_affine: bool = True,
        norm_eps: float = 1e-5,
        attention_type: str = "default",
        caption_channels: Optional[int] = None,
        interpolation_scale: Optional[float] = None,
        use_additional_conditions: Optional[bool] = None,
    ):
        super().__init__()
        if num_vector_embeds is not None or patch_size is not None:
            raise NotImplementedError("shim supports continuous inputs only")
        self.is_input_continuous = in_channels is not None
        self.is_input_vectorized = False
        self.is_input_patches = False
        self.use_linear_projection = use_linear_projection
        self.inner_dim = num_attention_heads * attention_head_dim
        self.in_channels = in_channels
        self.out_channels = in_channels if out_channels is None else out_channels
        self.gradient_checkpointing = False
        self._init_continuous_input(norm_type=norm_type)

    def _init_continuous_input(self, norm_type):
        import math

        g = math.gcd(self.config.norm_num_groups, self.in_channels)
        self.norm = torch.nn.GroupNorm(
            num_groups=g, num_channels=self.in_channels, eps=1e-6, affine=True
        )
        if self.use_linear_projection:
            self.proj_in = torch.nn.Linear(self.in_channels, self.inner_dim)
        else:
            self.proj_in = torch.nn.Conv2d(self.in_channels, self.inner_dim, 1)
        self.transformer_blocks = nn.ModuleList(
            [
                BasicTransformerBlock(
                    self.inner_dim,
                    self.config.num_attention_heads,
                    self.config.attention_head_dim,
                    dropout=self.config.dropout,
                    cross_attention_dim=self.config.cross_attention_dim,
                    activation_fn=self.config.activation_fn,
                    num_embeds_ada_norm=self.config.num_embeds_ada_norm,
                    attention_bias=self.config.attention_bias,
                    only_cross_attention=self.config.only_cross_attention,
                    double_self_attention=self.config.double_self_attention,
                    upcast_attention=self.config.upcast_attention,
                    norm_type=norm_type,
                    norm_elementwise_affine=self.config.norm_elementwise_affine,
                    norm_eps=self.config.norm_eps,
                    attention_type=self.config.attention_type,
                )
                for _ in range(self.config.num_layers)
            ]
        )
        if self.use_linear_projection:
            self.proj_out = torch.nn.Linear(self.inner_dim, self.out_channels)
        else:
            self.proj_out = torch.nn.Conv2d(self.inner_dim, self.out_channels, 1)

    def _operate_on_continuous_inputs(self, hidden_states: torch.Tensor):
        batch, _, height, width = hidden_states.shape
        hidden_states = self.norm(hidden_states)
        if not self.use_linear_projection:
            hidden_states = self.proj_in(hidden_states)
            inner_dim = hidden_states.shape[1]
            hidden_states = hidden_states.permute(0, 2, 3, 1).reshape(
                batch, height * width, inner_dim
            )
        else:
            inner_dim = self.inner_dim
            hidden_states = hidden_states.permute(0, 2, 3, 1).reshape(
                batch, height * width, self.in_channels
            )
            hidden_states = self.proj_in(hidden_states)
        return hidden_states, inner_dim

    def _get_output_for_continuous_inputs(
        self, hidden_states, residual, batch_size, height, width, inner_dim
    ):
        if not self.use_linear_projection:
            hidden_states = (
                hidden_states.reshape(batch_size, height, width, inner_dim)
                .permute(0, 3, 1, 2)
                .contiguous()
            )
            hidden_states = self.proj_out(hidden_states)
        else:
            hidden_states = self.proj_out(hidden_states)
            hidden_states = (
                hidden_states.reshape(batch_size, height, width, -1)
                .permute(0, 3, 1, 2)
                .contiguous()
            )
        return hidden_states + residual

    def forward(
        self,
        hidden_states: torch.Tensor,
        encoder_hidden_states: Optional[torch.Tensor] = None,
        return_dict: bool = True,
        **kwargs,
    ):
        batch_size, _, height, width = hidden_states.shape
        residual = hidden_states
        hidden_states, inner_dim = self._operate_on_continuous_inputs(hidden_states)
        for block in self.transformer_blocks:
            hidden_states = block(
                hidden_states, encoder_hidden_states=encoder_hidden_states
            )
        output = self._get_output_for_continuous_inputs(
            hidden_states, residual, batch_size, height, width, inner_dim
        )
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)
