"""diffusers.models.activations shim: get_activation + GEGLU (the SD2.1
feed-forward gate used by BasicTransformerBlock's ``ff.net.0``)."""

import torch
import torch.nn as nn
import torch.nn.functional as F


def get_activation(act_fn: str) -> nn.Module:
    acts = {
        "silu": nn.SiLU(),
        "swish": nn.SiLU(),
        "mish": nn.Mish(),
        "gelu": nn.GELU(),
        "relu": nn.ReLU(),
    }
    return acts[act_fn.lower()]


class GEGLU(nn.Module):
    """x -> proj -> split(h, gate) -> h * gelu(gate); key name ``proj``."""

    def __init__(self, dim_in: int, dim_out: int, bias: bool = True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2, bias=bias)

    def forward(self, hidden_states: torch.Tensor) -> torch.Tensor:
        hidden_states, gate = self.proj(hidden_states).chunk(2, dim=-1)
        return hidden_states * F.gelu(gate)
