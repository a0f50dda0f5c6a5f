"""Numerical parity: flax model + converter vs an independent torch
implementation of the same architecture spec.

A diffusers-style torch state dict is generated with random values, run
through a from-scratch torch forward (written from the architecture spec,
SURVEY §2.2/§3.3 — NOT from the reference code), then converted with
io/checkpoints.py and run through the flax model. Agreement validates the
converter's name mapping, kernel transposes, and the model's numerics in
one shot — the property needed to load the real ``krahets/Diffuman4D``
checkpoint bit-comparably.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from diffuman4d_tpu.io.checkpoints import convert_unet_torch_keys
from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition

CH = (8, 16, 16, 16)
HEADS = (1, 2, 2, 2)
GROUPS = 4
EPS = 1e-5


# ---------------------------------------------------------------------------
# independent torch reference (from the architecture spec)
# ---------------------------------------------------------------------------

def t_groupnorm(x, w, b, groups=GROUPS, eps=EPS):
    return F.group_norm(x, groups, w, b, eps)


def t_layernorm(x, w, b, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), w, b, eps)


def t_resnet(sd, pfx, x, temb):
    h = t_groupnorm(x, sd[f"{pfx}.norm1.weight"], sd[f"{pfx}.norm1.bias"])
    h = F.silu(h)
    h = F.conv2d(h, sd[f"{pfx}.conv1.weight"], sd[f"{pfx}.conv1.bias"], padding=1)
    tp = F.linear(F.silu(temb), sd[f"{pfx}.time_emb_proj.weight"], sd[f"{pfx}.time_emb_proj.bias"])
    h = h + tp[:, :, None, None]
    h = t_groupnorm(h, sd[f"{pfx}.norm2.weight"], sd[f"{pfx}.norm2.bias"])
    h = F.silu(h)
    h = F.conv2d(h, sd[f"{pfx}.conv2.weight"], sd[f"{pfx}.conv2.bias"], padding=1)
    if f"{pfx}.conv_shortcut.weight" in sd:
        x = F.conv2d(x, sd[f"{pfx}.conv_shortcut.weight"], sd[f"{pfx}.conv_shortcut.bias"])
    return x + h


def t_attention(sd, pfx, x, heads):
    # x: (B, S, C); qkv no bias, out bias
    q = F.linear(x, sd[f"{pfx}.to_q.weight"])
    k = F.linear(x, sd[f"{pfx}.to_k.weight"])
    v = F.linear(x, sd[f"{pfx}.to_v.weight"])
    B, S, C = q.shape
    hd = C // heads
    q = q.view(B, S, heads, hd).transpose(1, 2)
    k = k.view(B, S, heads, hd).transpose(1, 2)
    v = v.view(B, S, heads, hd).transpose(1, 2)
    a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1)
    o = (a @ v).transpose(1, 2).reshape(B, S, C)
    return F.linear(o, sd[f"{pfx}.to_out.0.weight"], sd[f"{pfx}.to_out.0.bias"])


def t_transformer_block(sd, pfx, x, heads, num_frames):
    n = t_layernorm(x, sd[f"{pfx}.norm1.weight"], sd[f"{pfx}.norm1.bias"])
    if num_frames > 1:
        bt, hw, c = n.shape
        n = n.reshape(bt // num_frames, num_frames * hw, c)
    a = t_attention(sd, f"{pfx}.attn1", n, heads)
    if num_frames > 1:
        a = a.reshape(x.shape)
    x = x + a
    n = t_layernorm(x, sd[f"{pfx}.norm2.weight"], sd[f"{pfx}.norm2.bias"])
    x = x + t_attention(sd, f"{pfx}.attn2", n, heads)
    n = t_layernorm(x, sd[f"{pfx}.norm3.weight"], sd[f"{pfx}.norm3.bias"])
    proj = F.linear(n, sd[f"{pfx}.ff.net.0.proj.weight"], sd[f"{pfx}.ff.net.0.proj.bias"])
    h, gate = proj.chunk(2, dim=-1)
    ff = F.linear(h * F.gelu(gate), sd[f"{pfx}.ff.net.2.weight"], sd[f"{pfx}.ff.net.2.bias"])
    return x + ff


def t_transformer_model(sd, pfx, x, heads, num_frames):
    B, C, H, W = x.shape
    res = x
    h = F.group_norm(x, GROUPS, sd[f"{pfx}.norm.weight"], sd[f"{pfx}.norm.bias"], 1e-6)
    h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
    h = F.linear(h, sd[f"{pfx}.proj_in.weight"], sd[f"{pfx}.proj_in.bias"])
    h = t_transformer_block(sd, f"{pfx}.transformer_blocks.0", h, heads, num_frames)
    h = F.linear(h, sd[f"{pfx}.proj_out.weight"], sd[f"{pfx}.proj_out.bias"])
    return h.reshape(B, H, W, C).permute(0, 3, 1, 2) + res


def t_sinusoidal(t, dim):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float64) / half
    emb = t.double()[:, None] * exponent.exp()[None]
    return torch.cat([emb.cos(), emb.sin()], dim=-1).float()  # flip_sin_to_cos


def t_unet(sd, sample, timestep, num_frames):
    temb0 = t_sinusoidal(timestep, CH[0])
    temb = F.linear(temb0, sd["time_embedding.linear_1.weight"], sd["time_embedding.linear_1.bias"])
    temb = F.linear(F.silu(temb), sd["time_embedding.linear_2.weight"], sd["time_embedding.linear_2.bias"])

    x = F.conv2d(sample, sd["conv_in.weight"], sd["conv_in.bias"], padding=1)
    res_stack = [x]

    for i in range(4):
        is_final = i == 3
        if is_final:
            x = t_resnet(sd, f"down_blocks.{i}.resnets.0", x, temb)
            res_stack.append(x)
        else:
            nf = num_frames if (4 - i - 1) < 3 else 1
            x = t_resnet(sd, f"down_blocks.{i}.resnets.0", x, temb)
            x = t_transformer_model(sd, f"down_blocks.{i}.attentions.0", x, HEADS[i], nf)
            res_stack.append(x)
            x = F.conv2d(x, sd[f"down_blocks.{i}.downsamplers.0.conv.weight"],
                         sd[f"down_blocks.{i}.downsamplers.0.conv.bias"], stride=2, padding=1)
            res_stack.append(x)

    x = t_resnet(sd, "mid_block.resnets.0", x, temb)
    x = t_transformer_model(sd, "mid_block.attentions.0", x, HEADS[3], num_frames)
    x = t_resnet(sd, "mid_block.resnets.1", x, temb)

    rev_ch = list(reversed(CH))
    rev_heads = list(reversed(HEADS))
    for i in range(4):
        is_final = i == 3
        for j in range(2):  # layers_per_block(1) + 1
            res = res_stack.pop()
            x = torch.cat([x, res], dim=1)
            x = t_resnet(sd, f"up_blocks.{i}.resnets.{j}", x, temb)
            if i != 0:
                nf = num_frames if i < 3 else 1
                x = t_transformer_model(sd, f"up_blocks.{i}.attentions.{j}", x, rev_heads[i], nf)
        if not is_final:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = F.conv2d(x, sd[f"up_blocks.{i}.upsamplers.0.conv.weight"],
                         sd[f"up_blocks.{i}.upsamplers.0.conv.bias"], padding=1)

    x = t_groupnorm(x, sd["conv_norm_out.weight"], sd["conv_norm_out.bias"])
    x = F.silu(x)
    return F.conv2d(x, sd["conv_out.weight"], sd["conv_out.bias"], padding=1)


# ---------------------------------------------------------------------------

def _random_state_dict(rng):
    """Diffusers-style torch keys for the tiny config (no pose encoder /
    temporal embeds)."""
    sd = {}

    def add(name, shape, std=0.2):
        sd[name] = torch.from_numpy(rng.normal(0, std, shape).astype(np.float32))

    def add_norm(pfx, c):
        add(f"{pfx}.weight", (c,), 0.05)
        sd[f"{pfx}.weight"] += 1.0
        add(f"{pfx}.bias", (c,), 0.05)

    def add_conv(pfx, cin, cout, k=3):
        add(f"{pfx}.weight", (cout, cin, k, k), 0.2 / math.sqrt(cin * k * k))
        add(f"{pfx}.bias", (cout,), 0.02)

    def add_linear(pfx, cin, cout, bias=True):
        add(f"{pfx}.weight", (cout, cin), 0.2 / math.sqrt(cin))
        if bias:
            add(f"{pfx}.bias", (cout,), 0.02)

    def add_resnet(pfx, cin, cout, temb_dim):
        add_norm(f"{pfx}.norm1", cin)
        add_conv(f"{pfx}.conv1", cin, cout)
        add_linear(f"{pfx}.time_emb_proj", temb_dim, cout)
        add_norm(f"{pfx}.norm2", cout)
        add_conv(f"{pfx}.conv2", cout, cout)
        if cin != cout:
            add_conv(f"{pfx}.conv_shortcut", cin, cout, k=1)

    def add_attention(pfx, c):
        add_linear(f"{pfx}.to_q", c, c, bias=False)
        add_linear(f"{pfx}.to_k", c, c, bias=False)
        add_linear(f"{pfx}.to_v", c, c, bias=False)
        add_linear(f"{pfx}.to_out.0", c, c)

    def add_transformer(pfx, c):
        add_norm(f"{pfx}.norm", c)
        add_linear(f"{pfx}.proj_in", c, c)
        blk = f"{pfx}.transformer_blocks.0"
        for n in ("norm1", "norm2", "norm3"):
            add_norm(f"{blk}.{n}", c)
        add_attention(f"{blk}.attn1", c)
        add_attention(f"{blk}.attn2", c)
        add_linear(f"{blk}.ff.net.0.proj", c, c * 8)
        add_linear(f"{blk}.ff.net.2", c * 4, c)
        add_linear(f"{pfx}.proj_out", c, c)

    temb_dim = CH[0] * 4
    add_conv("conv_in", 11, CH[0])
    add_linear("time_embedding.linear_1", CH[0], temb_dim)
    add_linear("time_embedding.linear_2", temb_dim, temb_dim)

    in_ch = CH[0]
    for i in range(4):
        out_ch = CH[i]
        add_resnet(f"down_blocks.{i}.resnets.0", in_ch, out_ch, temb_dim)
        if i != 3:
            add_transformer(f"down_blocks.{i}.attentions.0", out_ch)
            add_conv(f"down_blocks.{i}.downsamplers.0.conv", out_ch, out_ch)
        in_ch = out_ch

    add_resnet("mid_block.resnets.0", CH[3], CH[3], temb_dim)
    add_transformer("mid_block.attentions.0", CH[3])
    add_resnet("mid_block.resnets.1", CH[3], CH[3], temb_dim)

    rev = list(reversed(CH))
    prev = rev[0]
    for i in range(4):
        out_ch = rev[i]
        skip_ch_in = rev[min(i + 1, 3)]
        skips = [rev[i] if i > 0 else CH[3], skip_ch_in]
        # up block j=0 consumes the deepest remaining skip, j=1 the next
        # determine skip channels the same way the forward pops them
        pass
    # Easier: replicate the forward's pop order to size the resnets.
    # Recompute res_stack channel sizes:
    stack = [CH[0]]
    for i in range(4):
        stack.append(CH[i])
        if i != 3:
            stack.append(CH[i])
    x_ch = CH[3]
    for i in range(4):
        out_ch = rev[i]
        for j in range(2):
            skip = stack.pop()
            add_resnet(f"up_blocks.{i}.resnets.{j}", x_ch + skip, out_ch, temb_dim)
            x_ch = out_ch
            if i != 0:
                add_transformer(f"up_blocks.{i}.attentions.{j}", out_ch)
        if i != 3:
            add_conv(f"up_blocks.{i}.upsamplers.0.conv", out_ch, out_ch)

    add_norm("conv_norm_out", CH[0])
    add_conv("conv_out", CH[0], 4)
    return sd


def test_unet_matches_independent_torch_forward():
    rng = np.random.default_rng(0)
    sd = _random_state_dict(rng)

    B, hw = 4, 16
    sample = rng.normal(0, 0.5, (B, 11, hw, hw)).astype(np.float32)
    timestep = np.array([10, 500, 750, 999], np.int64)

    with torch.no_grad():
        ref = t_unet(sd, torch.from_numpy(sample), torch.from_numpy(timestep), num_frames=B)
    ref = ref.numpy().transpose(0, 2, 3, 1)

    # convert + run flax
    np_sd = {k: v.numpy() for k, v in sd.items()}
    params = {"params": convert_unet_torch_keys(np_sd)}
    cfg = UNetConfig(
        in_channels=11,
        block_out_channels=CH,
        num_attention_heads=HEADS,
        layers_per_block=1,
        norm_num_groups=GROUPS,
        enable_pose_encoder=False,
        enable_tem_embeds=False,
    )
    model = UNetMultiviewCondition(cfg, dtype=jnp.float32, attn_implementation="xla")
    out = model.apply(
        jax.tree.map(jnp.asarray, params),
        jnp.asarray(sample.transpose(0, 2, 3, 1)),
        jnp.asarray(timestep),
        num_frames=B,
    )
    got = np.asarray(out)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_converter_roundtrip():
    """torch sd -> flax -> torch must be the identity (up to dict order)."""
    from diffuman4d_tpu.io.checkpoints import export_unet_torch_keys

    rng = np.random.default_rng(3)
    sd = {k: v.numpy() for k, v in _random_state_dict(rng).items()}
    flax_params = convert_unet_torch_keys(sd)
    back = export_unet_torch_keys(flax_params)
    assert set(back) == set(sd), (
        sorted(set(sd) - set(back))[:5], sorted(set(back) - set(sd))[:5]
    )
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)
