"""diffusers.utils.torch_utils shim."""

from typing import List, Optional, Tuple, Union

import torch


def maybe_allow_in_graph(cls):
    return cls


def randn_tensor(
    shape: Union[Tuple, List],
    generator: Optional[Union[List[torch.Generator], torch.Generator]] = None,
    device: Optional[torch.device] = None,
    dtype: Optional[torch.dtype] = None,
    layout: Optional[torch.layout] = None,
):
    """Per-sample generator list draws on the generator's device then moves
    (diffusers.utils.torch_utils.randn_tensor semantics)."""
    if isinstance(generator, list):
        shape = (1,) + tuple(shape[1:])
        latents = [
            torch.randn(shape, generator=g, dtype=dtype) for g in generator
        ]
        return torch.cat(latents, dim=0).to(device)
    return torch.randn(shape, generator=generator, dtype=dtype).to(device)


def apply_freeu(resolution_idx, hidden_states, res_hidden_states, **freeu_kwargs):
    """FreeU (arXiv 2309.11497): scale the first half of the backbone
    channels by b, attenuate skip connections' low frequencies by s.
    Matches diffusers' apply_freeu: only stages 0 and 1 are touched."""
    if resolution_idx == 0:
        num_half = hidden_states.shape[1] // 2
        hidden_states[:, :num_half] = hidden_states[:, :num_half] * freeu_kwargs["b1"]
        res_hidden_states = fourier_filter(res_hidden_states, threshold=1, scale=freeu_kwargs["s1"])
    if resolution_idx == 1:
        num_half = hidden_states.shape[1] // 2
        hidden_states[:, :num_half] = hidden_states[:, :num_half] * freeu_kwargs["b2"]
        res_hidden_states = fourier_filter(res_hidden_states, threshold=1, scale=freeu_kwargs["s2"])
    return hidden_states, res_hidden_states


def fourier_filter(x_in: torch.Tensor, threshold: int, scale: float) -> torch.Tensor:
    """Low-frequency rescale in Fourier space (FreeU eq. 6)."""
    x = x_in.to(torch.float32)
    B, C, H, W = x.shape
    x_freq = torch.fft.fftshift(torch.fft.fftn(x, dim=(-2, -1)), dim=(-2, -1))
    mask = torch.ones((B, C, H, W), device=x.device)
    crow, ccol = H // 2, W // 2
    mask[..., crow - threshold : crow + threshold, ccol - threshold : ccol + threshold] = scale
    x_freq = x_freq * mask
    x_filtered = torch.fft.ifftn(torch.fft.ifftshift(x_freq, dim=(-2, -1)), dim=(-2, -1)).real
    return x_filtered.to(x_in.dtype)
