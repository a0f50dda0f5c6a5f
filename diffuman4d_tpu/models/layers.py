"""Shared building blocks: embeddings, norms, attention, feed-forward.

These rebuild the diffusers primitives the reference composes
(SURVEY §2.3): ``Timesteps``/``TimestepEmbedding`` (sinusoidal + MLP),
``Attention`` (multi-head, qkv no-bias / out bias), GEGLU ``FeedForward``,
``ResnetBlock2D``, ``Downsample2D``/``Upsample2D`` — in channels-last
flax.linen with bf16 compute / fp32 params and fp32 norm statistics.

Parameter names deliberately track the diffusers checkpoint layout
(``linear_1``, ``to_q`` …) so the safetensors converter is a plain rename.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffuman4d_tpu.ops.attention import dot_product_attention
from diffuman4d_tpu.ops.resize import upsample_nearest_2x


def _use_pallas_conv(shape, cout: int) -> bool:
    """Static gate for the fused Pallas conv path (ops/conv.py): measured
    2x over XLA at the VAE decoder's large-spatial shapes on v5e
    (scripts/profile_vae_conv.py). D4D_PALLAS_CONV=0 disables."""
    flag = os.environ.get("D4D_PALLAS_CONV", "1")
    if flag == "0":
        return False
    if flag != "force" and jax.default_backend() != "tpu":
        return False
    from diffuman4d_tpu.ops.conv import pallas_conv3x3_ok

    return pallas_conv3x3_ok(shape, cout)


def timestep_sinusoidal(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep features (diffusers ``Timesteps``/
    ``get_timestep_embedding``; used at unet_multiview_condition.py:464,
    255). Always fp32 — cast at the consumer."""
    half_dim = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer MLP over sinusoidal features (diffusers TimestepEmbedding)."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        sample = nn.silu(sample)
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(sample)
        return sample


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics, output cast back to input dtype."""

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype
        # full configs always divide by 32; gcd only matters for tiny test
        # configs whose channel counts aren't multiples of num_groups
        groups = math.gcd(self.num_groups, x.shape[-1])
        out = nn.GroupNorm(
            num_groups=groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return out.astype(dtype)


class Attention(nn.Module):
    """Multi-head attention (diffusers ``Attention``): qkv without bias,
    output projection with bias. Self-attention when ``context`` is None —
    which is the only mode this model ever uses (attention.py:73-78,
    116-121 of the reference pass encoder_hidden_states=None)."""

    num_heads: int
    head_dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.bfloat16
    implementation: str = "auto"
    # context-parallel mode ("cp"): runs inside shard_map with the token
    # sequence sharded over mesh axis `cp_axis`; `cp_groups` = number of
    # independent sequences in the global batch (2 under CFG)
    cp_axis: str = "model"
    cp_groups: int = 1

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        # x: (B, S, C)
        inner = self.num_heads * self.head_dim
        out_dim = self.out_dim or x.shape[-1]
        ctx = x if context is None else context

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.num_heads, self.head_dim)
        k = k.reshape(b, sk, self.num_heads, self.head_dim)
        v = v.reshape(b, sk, self.num_heads, self.head_dim)

        if self.implementation == "cp":
            from diffuman4d_tpu.ops.context_parallel import cp_attention_grouped

            out = cp_attention_grouped(
                q, k, v, axis=self.cp_axis, groups=self.cp_groups
            )
        else:
            out = dot_product_attention(q, k, v, implementation=self.implementation)
        out = out.reshape(b, sq, inner)
        return nn.Dense(out_dim, dtype=self.dtype, name="to_out")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers FeedForward, activation_fn='geglu')."""

    mult: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        inner = dim * self.mult
        proj = nn.Dense(inner * 2, dtype=self.dtype, name="proj_geglu")(x)
        hidden, gate = jnp.split(proj, 2, axis=-1)
        hidden = hidden * nn.gelu(gate.astype(jnp.float32), approximate=False).astype(
            self.dtype
        )
        return nn.Dense(dim, dtype=self.dtype, name="proj_out")(hidden)


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D: GN-silu-conv ×2 with additive time embedding
    and a 1x1 shortcut when channels change. Channels-last."""

    out_channels: int
    use_temb: bool = True
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        in_channels = x.shape[-1]
        norm1 = GroupNorm(self.groups, self.eps, name="norm1")
        conv1 = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1"
        )
        norm2 = GroupNorm(self.groups, self.eps, name="norm2")
        conv2 = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2"
        )

        if _use_pallas_conv(x.shape, self.out_channels) and _use_pallas_conv(
            x.shape[:3] + (self.out_channels,), self.out_channels
        ):
            return self._fused(x, temb, norm1, conv1, norm2, conv2)

        h = norm1(x)
        h = nn.silu(h)
        h = conv1(h)

        if self.use_temb and temb is not None:
            temb_proj = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + temb_proj[:, None, None, :]

        h = norm2(h)
        h = nn.silu(h)
        h = conv2(h)

        if in_channels != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h

    def _fused(self, x, temb, norm1, conv1, norm2, conv2):
        """GN -> silu -> conv chains via the fused Pallas conv
        (ops/conv.py): GroupNorm folds to a per-(batch,channel) affine
        prologue and the skip-add rides conv2's epilogue, so the only
        full-tensor passes are two stats reductions and two convs.
        Submodules are invoked on tiny slices solely to materialize their
        parameters under the standard names (identical checkpoint tree)."""
        from diffuman4d_tpu.ops.conv import conv3x3, groupnorm_affine

        in_channels = x.shape[-1]
        tiny = x[:1, :2, :2, :]
        _ = norm1(tiny)
        _ = conv1(tiny)
        gcount = math.gcd(self.groups, in_channels)

        def gn_params(mod):
            p = mod.variables["params"]["GroupNorm_0"]
            return p["scale"], p["bias"]

        def conv_params(mod):
            p = mod.variables["params"]
            return p["kernel"], p["bias"]

        g1, b1 = gn_params(norm1)
        k1, c1 = conv_params(conv1)
        s1, sh1 = groupnorm_affine(x, g1, b1, gcount, self.eps)
        h = conv3x3(x, k1.astype(self.dtype), c1, s1, sh1, silu=True)

        if self.use_temb and temb is not None:
            temb_proj = nn.Dense(
                self.out_channels, dtype=self.dtype, name="time_emb_proj"
            )(nn.silu(temb))
            h = h + temb_proj[:, None, None, :]

        _ = norm2(h[:1, :2, :2, :])
        _ = conv2(h[:1, :2, :2, :])
        g2, b2 = gn_params(norm2)
        k2, c2 = conv_params(conv2)
        gcount2 = math.gcd(self.groups, self.out_channels)

        res = x
        if in_channels != self.out_channels:
            res = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        s2, sh2 = groupnorm_affine(h, g2, b2, gcount2, self.eps)
        return conv3x3(
            h, k2.astype(self.dtype), c2, s2, sh2, residual=res, silu=True
        )


class Downsample2D(nn.Module):
    """Stride-2 3x3 conv (diffusers Downsample2D with use_conv=True)."""

    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.out_channels, (3, 3), strides=2, padding=1, dtype=self.dtype, name="conv"
        )(x)


class Upsample2D(nn.Module):
    """Nearest 2x + 3x3 conv (diffusers Upsample2D)."""

    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = upsample_nearest_2x(x)
        conv = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv"
        )
        if _use_pallas_conv(x.shape, self.out_channels):
            from diffuman4d_tpu.ops.conv import conv3x3

            _ = conv(x[:1, :2, :2, :])
            p = conv.variables["params"]
            return conv3x3(x, p["kernel"].astype(self.dtype), p["bias"])
        return conv(x)
