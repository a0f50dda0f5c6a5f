"""diffusers.models.normalization shim. AdaGroupNorm is only *imported*
by the reference (unet_multiview_blocks.py:25, used solely by the
``time_embedding_norm="ada_group"`` resnet branch which the model never
configures); implemented anyway for completeness."""

from typing import Optional

import torch
import torch.nn as nn
import torch.nn.functional as F

from .activations import get_activation


class AdaGroupNorm(nn.Module):
    def __init__(self, embedding_dim: int, out_dim: int, num_groups: int,
                 act_fn: Optional[str] = None, eps: float = 1e-5):
        super().__init__()
        self.num_groups = num_groups
        self.eps = eps
        self.act = get_activation(act_fn) if act_fn else None
        self.linear = nn.Linear(embedding_dim, out_dim * 2)

    def forward(self, x: torch.Tensor, emb: torch.Tensor) -> torch.Tensor:
        if self.act:
            emb = self.act(emb)
        emb = self.linear(emb)[:, :, None, None]
        scale, shift = emb.chunk(2, dim=1)
        x = F.group_norm(x, self.num_groups, eps=self.eps)
        return x * (1 + scale) + shift
