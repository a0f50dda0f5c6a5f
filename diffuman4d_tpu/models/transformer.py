"""Multiview transformer: the model's core novel op.

Rebuilds the reference's ``MultiviewTransformerBlock``
(src/diffusers/models/attention.py:17-153) and ``TransformerMultiviewModel``
(src/diffusers/models/transformers/transformer_multiview.py:34-232)
channels-last in flax.

The "3D attention" is one axis regroup: tokens (B*T, HW, C) are reshaped to
(B, T*HW, C) before self-attention so it spans all frames of the window
jointly (attention.py:69-83). Whether that attends across *views* or across
*time* is decided purely by which labels vary in the window (the spatial /
temporal domains of the sampler) — the kernel is identical.

Per block (norm_type='layer_norm', the only mode the model uses):
  norm1 -> 3D self-attention -> +residual
  norm2 -> per-frame 2D self-attention -> +residual
      (the reference calls attn2 with encoder_hidden_states=None,
       attention.py:116-121 — i.e. a second self-attention)
  norm3 -> GEGLU feed-forward -> +residual
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from diffuman4d_tpu.models.layers import Attention, FeedForward, GroupNorm


class LayerNorm32(nn.Module):
    """LayerNorm with fp32 statistics (torch computes LN in fp32 for bf16)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype
        out = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32, param_dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return out.astype(dtype)


class MultiviewTransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    attn_implementation: str = "auto"
    # "cp" mode: module runs inside shard_map with frames sharded over the
    # mesh `model` axis; only attn1's 3D regrouped path communicates
    cp_groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int = 1) -> jnp.ndarray:
        # x: (B*T, HW, C) where T == num_frames
        bt, hw, c = x.shape

        cp = self.attn_implementation == "cp"
        # in cp mode, per-frame (2D) attention is shard-local — only the
        # 3D regrouped attention needs the K/V all-gather
        local_impl = "auto" if cp else self.attn_implementation
        impl_3d = "cp" if (cp and num_frames > 1) else local_impl

        # 1. 3D self-attention over (t hw) tokens
        norm_x = LayerNorm32(name="norm1")(x)
        if num_frames > 1:
            norm_x = norm_x.reshape(bt // num_frames, num_frames * hw, c)
        attn_out = Attention(
            self.num_heads,
            self.head_dim,
            dtype=self.dtype,
            implementation=impl_3d,
            cp_groups=self.cp_groups,
            name="attn1",
        )(norm_x)
        if num_frames > 1:
            attn_out = attn_out.reshape(bt, hw, c)
        x = x + attn_out

        # 2. per-frame 2D self-attention (reference attn2 with
        #    encoder_hidden_states=None)
        norm_x = LayerNorm32(name="norm2")(x)
        attn_out = Attention(
            self.num_heads,
            self.head_dim,
            dtype=self.dtype,
            implementation=local_impl,
            name="attn2",
        )(norm_x)
        x = x + attn_out

        # 3. feed-forward
        norm_x = LayerNorm32(name="norm3")(x)
        x = x + FeedForward(dtype=self.dtype, name="ff")(norm_x)
        return x


class TransformerMultiview(nn.Module):
    """GroupNorm -> proj_in -> N blocks -> proj_out -> +residual
    (transformer_multiview.py:42-77, 156-216). ``use_linear_projection``
    matches SD2.1 checkpoints (linear, applied after flattening)."""

    num_heads: int
    head_dim: int
    num_layers: int = 1
    norm_groups: int = 32
    use_linear_projection: bool = True
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16
    attn_implementation: str = "auto"
    cp_groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int = 1) -> jnp.ndarray:
        # x: (B, H, W, C) channels-last
        b, h, w, c = x.shape
        inner = self.num_heads * self.head_dim
        residual = x

        x = GroupNorm(self.norm_groups, self.norm_eps, name="norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, inner)

        for i in range(self.num_layers):
            x = MultiviewTransformerBlock(
                self.num_heads,
                self.head_dim,
                dtype=self.dtype,
                attn_implementation=self.attn_implementation,
                cp_groups=self.cp_groups,
                name=f"blocks_{i}",
            )(x, num_frames=num_frames)

        if self.use_linear_projection:
            x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, inner)
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)

        return x + residual
