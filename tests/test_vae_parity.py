"""VAE parity: flax AutoencoderKL + converter vs an independent torch
forward of the same spec (SURVEY §2.3: encoder 2 resnets/stage +
asymmetric-pad downsample, single-head mid attention, decoder 3
resnets/stage + nearest-2x upsample, quant/post_quant 1x1)."""

import math

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from diffuman4d_tpu.io.checkpoints import convert_vae_torch_keys
from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig

CH = (4, 8, 8, 8)
EPS = 1e-6


def _groups(c):
    # the flax GroupNorm uses gcd(32, C) so tiny test configs divide evenly
    import math as _m

    return _m.gcd(32, c)


def t_gn(x, sd, pfx):
    return F.group_norm(x, _groups(x.shape[1]), sd[f"{pfx}.weight"], sd[f"{pfx}.bias"], EPS)


def t_resnet(sd, pfx, x):
    h = F.silu(t_gn(x, sd, f"{pfx}.norm1"))
    h = F.conv2d(h, sd[f"{pfx}.conv1.weight"], sd[f"{pfx}.conv1.bias"], padding=1)
    h = F.silu(t_gn(h, sd, f"{pfx}.norm2"))
    h = F.conv2d(h, sd[f"{pfx}.conv2.weight"], sd[f"{pfx}.conv2.bias"], padding=1)
    if f"{pfx}.conv_shortcut.weight" in sd:
        x = F.conv2d(x, sd[f"{pfx}.conv_shortcut.weight"], sd[f"{pfx}.conv_shortcut.bias"])
    return x + h


def t_mid_attn(sd, pfx, x):
    B, C, H, W = x.shape
    res = x
    h = F.group_norm(x, _groups(C), sd[f"{pfx}.group_norm.weight"], sd[f"{pfx}.group_norm.bias"], EPS)
    h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
    q = F.linear(h, sd[f"{pfx}.to_q.weight"], sd[f"{pfx}.to_q.bias"])
    k = F.linear(h, sd[f"{pfx}.to_k.weight"], sd[f"{pfx}.to_k.bias"])
    v = F.linear(h, sd[f"{pfx}.to_v.weight"], sd[f"{pfx}.to_v.bias"])
    a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(C), dim=-1)
    o = F.linear(a @ v, sd[f"{pfx}.to_out.0.weight"], sd[f"{pfx}.to_out.0.bias"])
    return o.reshape(B, H, W, C).permute(0, 3, 1, 2) + res


def t_encode_moments(sd, x):
    h = F.conv2d(x, sd["encoder.conv_in.weight"], sd["encoder.conv_in.bias"], padding=1)
    for i in range(4):
        h = t_resnet(sd, f"encoder.down_blocks.{i}.resnets.0", h)
        if i != 3:
            h = F.pad(h, (0, 1, 0, 1))
            h = F.conv2d(h, sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"],
                         sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"], stride=2)
    h = t_resnet(sd, "encoder.mid_block.resnets.0", h)
    h = t_mid_attn(sd, "encoder.mid_block.attentions.0", h)
    h = t_resnet(sd, "encoder.mid_block.resnets.1", h)
    h = F.silu(t_gn(h, sd, "encoder.conv_norm_out"))
    h = F.conv2d(h, sd["encoder.conv_out.weight"], sd["encoder.conv_out.bias"], padding=1)
    return F.conv2d(h, sd["quant_conv.weight"], sd["quant_conv.bias"])


def t_decode(sd, z):
    h = F.conv2d(z, sd["post_quant_conv.weight"], sd["post_quant_conv.bias"])
    h = F.conv2d(h, sd["decoder.conv_in.weight"], sd["decoder.conv_in.bias"], padding=1)
    h = t_resnet(sd, "decoder.mid_block.resnets.0", h)
    h = t_mid_attn(sd, "decoder.mid_block.attentions.0", h)
    h = t_resnet(sd, "decoder.mid_block.resnets.1", h)
    for i in range(4):
        for j in range(2):  # layers_per_block(1) + 1
            h = t_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", h)
        if i != 3:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = F.conv2d(h, sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"],
                         sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"], padding=1)
    h = F.silu(t_gn(h, sd, "decoder.conv_norm_out"))
    return F.conv2d(h, sd["decoder.conv_out.weight"], sd["decoder.conv_out.bias"], padding=1)


def _state_dict(rng):
    sd = {}

    def add(name, shape, std):
        sd[name] = torch.from_numpy(rng.normal(0, std, shape).astype(np.float32))

    def norm(pfx, c):
        add(f"{pfx}.weight", (c,), 0.05)
        sd[f"{pfx}.weight"] += 1.0
        add(f"{pfx}.bias", (c,), 0.05)

    def conv(pfx, cin, cout, k=3):
        add(f"{pfx}.weight", (cout, cin, k, k), 0.3 / math.sqrt(cin * k * k))
        add(f"{pfx}.bias", (cout,), 0.02)

    def linear(pfx, cin, cout):
        add(f"{pfx}.weight", (cout, cin), 0.3 / math.sqrt(cin))
        add(f"{pfx}.bias", (cout,), 0.02)

    def resnet(pfx, cin, cout):
        norm(f"{pfx}.norm1", cin)
        conv(f"{pfx}.conv1", cin, cout)
        norm(f"{pfx}.norm2", cout)
        conv(f"{pfx}.conv2", cout, cout)
        if cin != cout:
            conv(f"{pfx}.conv_shortcut", cin, cout, k=1)

    def mid(pfx, c):
        resnet(f"{pfx}.resnets.0", c, c)
        norm(f"{pfx}.attentions.0.group_norm", c)
        for n in ("to_q", "to_k", "to_v"):
            linear(f"{pfx}.attentions.0.{n}", c, c)
        linear(f"{pfx}.attentions.0.to_out.0", c, c)
        resnet(f"{pfx}.resnets.1", c, c)

    conv("encoder.conv_in", 3, CH[0])
    cin = CH[0]
    for i in range(4):
        resnet(f"encoder.down_blocks.{i}.resnets.0", cin, CH[i])
        cin = CH[i]
        if i != 3:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", CH[i], CH[i])
    mid("encoder.mid_block", CH[3])
    norm("encoder.conv_norm_out", CH[3])
    conv("encoder.conv_out", CH[3], 8)
    conv("quant_conv", 8, 8, k=1)

    conv("post_quant_conv", 4, 4, k=1)
    rev = list(reversed(CH))
    conv("decoder.conv_in", 4, rev[0])
    mid("decoder.mid_block", rev[0])
    cin = rev[0]
    for i in range(4):
        for j in range(2):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin, rev[i])
            cin = rev[i]
        if i != 3:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", rev[i], rev[i])
    norm("decoder.conv_norm_out", rev[3])
    conv("decoder.conv_out", rev[3], 3)
    return sd


def test_vae_matches_independent_torch_forward():
    rng = np.random.default_rng(0)
    sd = _state_dict(rng)
    x = rng.normal(0, 0.5, (2, 3, 32, 32)).astype(np.float32)
    z = rng.normal(0, 1.0, (2, 4, 4, 4)).astype(np.float32)

    with torch.no_grad():
        mom_ref = t_encode_moments(sd, torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
        dec_ref = t_decode(sd, torch.from_numpy(z)).numpy().transpose(0, 2, 3, 1)

    params = {"params": convert_vae_torch_keys({k: v.numpy() for k, v in sd.items()})}
    params = jax.tree.map(jnp.asarray, params)
    vae = AutoencoderKL(
        VAEConfig(block_out_channels=CH, layers_per_block=1), dtype=jnp.float32
    )
    mean, logvar = vae.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), method="moments"
    )
    got_mom = np.concatenate([np.asarray(mean), np.asarray(logvar)], axis=-1)
    np.testing.assert_allclose(got_mom, mom_ref, atol=5e-4, rtol=1e-3)

    # decode path: our decode() also divides by scaling factor — call the
    # decoder pieces directly through apply to compare raw transforms
    scaled = z.transpose(0, 2, 3, 1) * vae.config.scaling_factor
    dec = vae.apply(params, jnp.asarray(scaled), method="decode")
    np.testing.assert_allclose(np.asarray(dec), dec_ref, atol=5e-4, rtol=1e-3)


def test_vae_export_roundtrip():
    from diffuman4d_tpu.io.checkpoints import export_vae_torch_keys

    rng = np.random.default_rng(5)
    sd = {k: v.numpy() for k, v in _state_dict(rng).items()}
    back = export_vae_torch_keys(convert_vae_torch_keys(sd))
    assert set(back) == set(sd), (
        sorted(set(sd) - set(back))[:5], sorted(set(back) - set(sd))[:5]
    )
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_save_and_reload_hf_checkpoint(tmp_path):
    """Full circle: random flax params -> HF directory -> load_hf_checkpoint
    -> identical pytree."""
    import jax

    from diffuman4d_tpu.io.checkpoints import load_hf_checkpoint, save_hf_checkpoint
    from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition

    ucfg = UNetConfig(
        in_channels=11, block_out_channels=(8, 16, 16, 16),
        num_attention_heads=(1, 2, 2, 2), layers_per_block=1, norm_num_groups=4,
        enable_pose_encoder=True, enable_tem_embeds=True,
    )
    vcfg = VAEConfig(block_out_channels=CH, layers_per_block=1)
    unet = UNetMultiviewCondition(ucfg, dtype=jnp.float32)
    vae = AutoencoderKL(vcfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params = {
        "unet": unet.init(key, jnp.zeros((2, 8, 8, 11)), jnp.zeros((2,), jnp.int32),
                          jnp.zeros((2, 64, 64, 3)), num_frames=2),
        "vae": vae.init(key, jnp.zeros((1, 32, 32, 3))),
    }
    d = str(tmp_path / "ckpt")
    save_hf_checkpoint(d, params, ucfg, vcfg, {"_class_name": "DDIMScheduler"})
    ucfg2, vcfg2, sched, params2 = load_hf_checkpoint(d, dtype=jnp.float32)
    assert ucfg2 == ucfg
    assert vcfg2 == vcfg
    assert sched["_class_name"] == "DDIMScheduler"
    flat1 = jax.tree_util.tree_leaves_with_path(params["unet"]["params"])
    p2 = params2["unet"]["params"]

    def get(tree, path):
        for k in path:
            tree = tree[k.key]
        return tree

    for path, val in flat1:
        np.testing.assert_allclose(np.asarray(get(p2, path)), np.asarray(val),
                                   atol=1e-6, err_msg=str(path))


def test_param_storage_dtype_knob(tmp_path):
    """The ``dtype`` arg of load_hf_checkpoint is the *storage* dtype only:
    for a bf16-valued checkpoint (like the reference's bf16 variant),
    bf16-storage and fp32-storage must produce bit-identical outputs at
    fp32 compute — flax casts params to the module dtype at apply time
    (VERDICT r1 item 9: fp32-param knob for PSNR-parity debugging)."""
    import jax

    from diffuman4d_tpu.io.checkpoints import load_hf_checkpoint, save_hf_checkpoint
    from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition

    ucfg = UNetConfig(
        in_channels=11, block_out_channels=(8, 16, 16, 16),
        num_attention_heads=(1, 2, 2, 2), layers_per_block=1, norm_num_groups=4,
        enable_pose_encoder=True, enable_tem_embeds=True,
    )
    vcfg = VAEConfig(block_out_channels=CH, layers_per_block=1)
    unet = UNetMultiviewCondition(ucfg, dtype=jnp.float32)
    vae = AutoencoderKL(vcfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(3)
    params = {
        "unet": unet.init(key, jnp.zeros((2, 8, 8, 11)), jnp.zeros((2,), jnp.int32),
                          jnp.zeros((2, 64, 64, 3)), num_frames=2),
        "vae": vae.init(key, jnp.zeros((1, 32, 32, 3))),
    }
    # round values to bf16 so both storage dtypes represent them exactly
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.bfloat16).astype(jnp.float32), params
    )
    d = str(tmp_path / "ckpt_bf16vals")
    save_hf_checkpoint(d, params, ucfg, vcfg, {"_class_name": "DDIMScheduler"})

    _, _, _, p_bf16 = load_hf_checkpoint(d, dtype=jnp.bfloat16)
    _, _, _, p_fp32 = load_hf_checkpoint(d, dtype=jnp.float32)
    assert p_bf16["unet"]["params"]["conv_in"]["kernel"].dtype == jnp.bfloat16
    assert p_fp32["unet"]["params"]["conv_in"]["kernel"].dtype == jnp.float32

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 11), jnp.float32)
    sk = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3), jnp.float32)
    t = jnp.full((2,), 500, jnp.int32)
    out_a = unet.apply(p_bf16["unet"], x, t, skeletons=sk, num_frames=2)
    out_b = unet.apply(p_fp32["unet"], x, t, skeletons=sk, num_frames=2)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
