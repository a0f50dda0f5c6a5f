"""Checkpoint loading and conversion.

Two formats:
  * **HF diffusers layout** (the reference's shipped checkpoint
    ``krahets/Diffuman4D``: ``unet/diffusion_pytorch_model.safetensors`` +
    ``config.json``, ``vae/...``, ``scheduler/scheduler_config.json`` —
    loaded via ``from_pretrained`` at sampling_utils.py:46): converted
    key-by-key into this framework's flax pytrees, with conv kernels
    transposed OIHW -> HWIO and linear weights transposed.
  * **native orbax** checkpoints of the converted pytree (fast reload,
    sharded-friendly).

The converter is pure renaming + transposition — model parity lives in the
module structure, so any failure here is a loud KeyError, not silent drift.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import re

import jax.numpy as jnp
import numpy as np

from diffuman4d_tpu.models.unet import UNetConfig
from diffuman4d_tpu.models.vae import VAEConfig


# ---------------------------------------------------------------------------
# torch -> flax key mapping
# ---------------------------------------------------------------------------

def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    # torch OIHW -> flax HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


_NORM_WRAP = {"scale": "scale", "bias": "bias"}


def _convert_common(name: str, parts: list[str], tensor: np.ndarray, out: dict) -> bool:
    """Handle leaf param names shared by UNet and VAE submodules.

    ``parts`` is the flax-side path prefix; returns True if consumed."""
    leaf = name.rsplit(".", 1)[-1]
    mod = name.split(".")[-2] if "." in name else ""
    if leaf == "weight" and tensor.ndim == 4:
        _set(out, parts + ["kernel"], _conv_kernel(tensor))
        return True
    if leaf == "weight" and tensor.ndim == 2:
        _set(out, parts + ["kernel"], _linear_kernel(tensor))
        return True
    if leaf == "weight" and tensor.ndim == 1:
        # norm scale (GroupNorm/LayerNorm)
        _set(out, parts + ["scale"], tensor)
        return True
    if leaf == "bias":
        _set(out, parts + ["bias"], tensor)
        return True
    return False


def _map_resnet(key: str) -> list[str]:
    """'resnets.0.norm1.weight'-style suffix -> flax path inside a block."""
    m = re.match(r"resnets\.(\d+)\.(.+)", key)
    idx, rest = m.group(1), m.group(2)
    head = rest.split(".")[0]
    path = [f"resnets_{idx}"]
    if head in ("norm1", "norm2"):
        path += [head, "GroupNorm_0"]
    elif head in ("conv1", "conv2", "conv_shortcut", "time_emb_proj"):
        path += [head]
    else:
        raise KeyError(f"unknown resnet param: {key}")
    return path


def _map_transformer_block(rest: str) -> list[str]:
    """diffusers 'transformer_blocks.N.<...>' suffix -> ours 'blocks_N.<...>'."""
    m = re.match(r"transformer_blocks\.(\d+)\.(.+)", rest)
    n, sub = m.group(1), m.group(2)
    path = [f"blocks_{n}"]
    head = sub.split(".")[0]
    if head in ("norm1", "norm2", "norm3"):
        path += [head, "LayerNorm_0"]
    elif head in ("attn1", "attn2"):
        proj = sub.split(".")[1]
        if proj == "to_out":
            path += [head, "to_out"]
        else:
            path += [head, proj]
    elif head == "ff":
        if sub.startswith("ff.net.0.proj"):
            path += ["ff", "proj_geglu"]
        elif sub.startswith("ff.net.2"):
            path += ["ff", "proj_out"]
        else:
            raise KeyError(f"unknown ff param: {sub}")
    else:
        raise KeyError(f"unknown transformer param: {sub}")
    return path


def _map_attention_module(key: str) -> list[str]:
    """'attentions.N.<...>' (a TransformerMultiview) -> flax path."""
    m = re.match(r"attentions\.(\d+)\.(.+)", key)
    n, rest = m.group(1), m.group(2)
    path = [f"attentions_{n}"]
    head = rest.split(".")[0]
    if head == "norm":
        path += ["norm", "GroupNorm_0"]
    elif head in ("proj_in", "proj_out"):
        path += [head]
    elif head == "transformer_blocks":
        path += _map_transformer_block(rest)
    else:
        raise KeyError(f"unknown attention param: {key}")
    return path


def convert_unet_torch_keys(state: dict[str, np.ndarray]) -> dict:
    """HF UNetMultiviewConditionModel safetensors -> flax params dict."""
    out: dict = {}
    pose_conv_map = {0: 0, 2: 1, 4: 2, 6: 3, 8: 4, 10: 5, 12: 6, 14: 7}
    for name, tensor in state.items():
        parts: list[str]
        if name.startswith("conv_in."):
            parts = ["conv_in"]
        elif name.startswith("conv_out."):
            parts = ["conv_out"]
        elif name.startswith("conv_norm_out."):
            parts = ["conv_norm_out", "GroupNorm_0"]
        elif name.startswith("time_embedding."):
            parts = ["time_embedding", name.split(".")[1]]
        elif name.startswith("temporal_pos_embed."):
            parts = ["temporal_pos_embed", name.split(".")[1]]
        elif name.startswith("pose_encoder."):
            sub = name.split(".", 1)[1]
            if sub.startswith("conv_layers."):
                torch_idx = int(sub.split(".")[1])
                parts = ["pose_encoder", f"conv_{pose_conv_map[torch_idx]}"]
            elif sub.startswith("final_proj."):
                parts = ["pose_encoder", "final_proj"]
            elif sub == "scale":
                _set(out, ["pose_encoder", "scale"], tensor)
                continue
            else:
                raise KeyError(f"unknown pose encoder param: {name}")
        elif name.startswith(("down_blocks.", "up_blocks.")):
            m = re.match(r"(down|up)_blocks\.(\d+)\.(.+)", name)
            kind, idx, rest = m.group(1), m.group(2), m.group(3)
            parts = [f"{kind}_blocks_{idx}"]
            head = rest.split(".")[0]
            if head == "resnets":
                parts += _map_resnet(rest)
            elif head == "attentions":
                parts += _map_attention_module(rest)
            elif head == "downsamplers":
                parts += ["downsample", "conv"]
            elif head == "upsamplers":
                parts += ["upsample", "conv"]
            else:
                raise KeyError(f"unknown block param: {name}")
        elif name.startswith("mid_block."):
            rest = name.split(".", 1)[1]
            head = rest.split(".")[0]
            parts = ["mid_block"]
            if head == "resnets":
                parts += _map_resnet(rest)
            elif head == "attentions":
                parts += _map_attention_module(rest)
            else:
                raise KeyError(f"unknown mid param: {name}")
        else:
            raise KeyError(f"unmapped UNet param: {name}")

        if not _convert_common(name, parts, tensor, out):
            raise KeyError(f"unhandled tensor for {name} (shape {tensor.shape})")
    return out


def convert_vae_torch_keys(state: dict[str, np.ndarray]) -> dict:
    """HF AutoencoderKL safetensors -> flax params dict."""
    out: dict = {}
    for name, tensor in state.items():
        if name.startswith(("quant_conv.", "post_quant_conv.")):
            parts = [name.split(".")[0]]
        elif name.startswith(("encoder.", "decoder.")):
            side, rest = name.split(".", 1)
            parts = [side]
            head = rest.split(".")[0]
            if head == "conv_in" or head == "conv_out":
                parts += [head]
            elif head == "conv_norm_out":
                parts += ["conv_norm_out", "GroupNorm_0"]
            elif head in ("down_blocks", "up_blocks"):
                m = re.match(r"(down|up)_blocks\.(\d+)\.(.+)", rest)
                kind, idx, sub = m.group(1), m.group(2), m.group(3)
                subhead = sub.split(".")[0]
                if subhead == "resnets":
                    rparts = _map_resnet(sub)
                    parts += [f"{kind}_{idx}_{rparts[0]}"] + rparts[1:]
                elif subhead in ("downsamplers", "upsamplers"):
                    parts += [f"{kind}_{idx}_{subhead[:-1].replace('rs','r')}"]
                    parts[-1] = f"{kind}_{idx}_downsample" if "down" in subhead else f"{kind}_{idx}_upsample"
                    parts += ["conv"]
                else:
                    raise KeyError(f"unknown vae block param: {name}")
            elif head == "mid_block":
                sub = rest.split(".", 1)[1]
                subhead = sub.split(".")[0]
                parts += ["mid_block"]
                if subhead == "resnets":
                    parts += _map_resnet(sub)
                elif subhead == "attentions":
                    m = re.match(r"attentions\.0\.(.+)", sub)
                    aname = m.group(1).split(".")[0]
                    amap = {
                        "group_norm": ["attention", "group_norm", "GroupNorm_0"],
                        "to_q": ["attention", "to_q"],
                        "to_k": ["attention", "to_k"],
                        "to_v": ["attention", "to_v"],
                        "to_out": ["attention", "to_out"],
                    }
                    parts += amap[aname]
                else:
                    raise KeyError(f"unknown vae mid param: {name}")
            else:
                raise KeyError(f"unknown vae param: {name}")
        else:
            raise KeyError(f"unmapped VAE param: {name}")

        if not _convert_common(name, parts, tensor, out):
            raise KeyError(f"unhandled tensor for {name} (shape {tensor.shape})")
    return out


# ---------------------------------------------------------------------------
# flax -> torch (inverse) conversion for interop
# ---------------------------------------------------------------------------

def _flatten(tree: dict, prefix="") -> dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unmap_block_path(parts: list[str]) -> str:
    """Invert the flax-side path of one UNet down/mid/up block param."""
    out = []
    in_ff = False
    for p in parts:
        if p.startswith("resnets_"):
            out.append(f"resnets.{p.split('_')[1]}")
        elif p.startswith("attentions_"):
            out.append(f"attentions.{p.split('_')[1]}")
        elif p.startswith("blocks_"):
            out.append(f"transformer_blocks.{p.split('_')[1]}")
        elif p == "downsample":
            out.append("downsamplers.0")
        elif p == "upsample":
            out.append("upsamplers.0")
        elif p in ("GroupNorm_0", "LayerNorm_0"):
            pass  # flax wrapper level, no torch analog
        elif p == "to_out":
            out.append("to_out.0")
        elif p == "ff":
            in_ff = True  # children carry the full torch prefix
        elif p == "proj_geglu":
            out.append("ff.net.0.proj")
        elif p == "proj_out" and in_ff:
            out.append("ff.net.2")
        else:
            out.append(p)
    return ".".join(out)


def export_unet_torch_keys(params: dict) -> dict[str, np.ndarray]:
    """flax UNet params -> diffusers-style torch state dict (numpy values).
    Inverse of :func:`convert_unet_torch_keys` — enables writing checkpoints
    the reference implementation can load."""
    flat = _flatten(params)
    pose_conv_inv = {0: 0, 1: 2, 2: 4, 3: 6, 4: 8, 5: 10, 6: 12, 7: 14}
    out = {}
    for path, val in flat.items():
        parts = path.split("/")
        leaf = parts[-1]
        body = parts[:-1]

        if body and body[0] == "pose_encoder":
            if body[-1] == "final_proj":
                name = "pose_encoder.final_proj"
            elif leaf == "scale":
                out["pose_encoder.scale"] = val
                continue
            else:
                idx = int(body[-1].split("_")[1])
                name = f"pose_encoder.conv_layers.{pose_conv_inv[idx]}"
        elif body and body[0].startswith(("down_blocks_", "up_blocks_")):
            kind, idx = body[0].rsplit("_", 1)
            name = f"{kind}.{idx}." + _unmap_block_path(body[1:])
        elif body and body[0] == "mid_block":
            name = "mid_block." + _unmap_block_path(body[1:])
        elif body and body[0] in ("time_embedding", "temporal_pos_embed"):
            name = ".".join(body)
        elif body and body[0] in ("conv_in", "conv_out", "conv_norm_out"):
            name = body[0]
        else:
            raise KeyError(f"unmapped flax param: {path}")

        if leaf == "kernel":
            if val.ndim == 4:
                out[f"{name}.weight"] = np.transpose(val, (3, 2, 0, 1))
            else:
                out[f"{name}.weight"] = np.transpose(val, (1, 0))
        elif leaf == "scale":
            out[f"{name}.weight"] = val
        elif leaf == "bias":
            out[f"{name}.bias"] = val
        else:
            raise KeyError(f"unknown leaf {leaf} at {path}")
    return out


def export_vae_torch_keys(params: dict) -> dict[str, np.ndarray]:
    """flax VAE params -> diffusers AutoencoderKL state dict (numpy)."""
    flat = _flatten(params)
    out = {}
    for path, val in flat.items():
        parts = path.split("/")
        leaf = parts[-1]
        body = parts[:-1]

        if body[0] in ("quant_conv", "post_quant_conv"):
            name = body[0]
        elif body[0] in ("encoder", "decoder"):
            side = body[0]
            head = body[1]
            if head in ("conv_in", "conv_out"):
                name = f"{side}.{head}"
            elif head == "conv_norm_out":
                name = f"{side}.conv_norm_out"
            elif head == "mid_block":
                sub = body[2]
                if sub.startswith("resnets_"):
                    rest = _unmap_block_path(body[2:])
                    name = f"{side}.mid_block.{rest}"
                elif sub == "attention":
                    amap = {
                        "group_norm": "group_norm",
                        "to_q": "to_q", "to_k": "to_k", "to_v": "to_v",
                        "to_out": "to_out.0",
                    }
                    name = f"{side}.mid_block.attentions.0.{amap[body[3]]}"
                else:
                    raise KeyError(f"unmapped vae mid param: {path}")
            elif head.startswith(("down_", "up_")):
                # down_{i}_resnets_{j} | down_{i}_downsample | up_{i}_upsample
                bits = head.split("_")
                kind, idx = bits[0], bits[1]
                if "resnets" in head:
                    j = bits[-1]
                    name = f"{side}.{kind}_blocks.{idx}.resnets.{j}"
                elif head.endswith("downsample"):
                    name = f"{side}.{kind}_blocks.{idx}.downsamplers.0"
                elif head.endswith("upsample"):
                    name = f"{side}.{kind}_blocks.{idx}.upsamplers.0"
                else:
                    raise KeyError(f"unmapped vae block param: {path}")
                name += "." + _unmap_block_path(body[2:]) if len(body) > 2 else ""
            else:
                raise KeyError(f"unmapped vae param: {path}")
        else:
            raise KeyError(f"unmapped vae param: {path}")

        name = name.rstrip(".")
        if leaf == "kernel":
            if val.ndim == 4:
                out[f"{name}.weight"] = np.transpose(val, (3, 2, 0, 1))
            else:
                out[f"{name}.weight"] = np.transpose(val, (1, 0))
        elif leaf == "scale":
            out[f"{name}.weight"] = val
        elif leaf == "bias":
            out[f"{name}.bias"] = val
        else:
            raise KeyError(f"unknown leaf {leaf} at {path}")
    return out


def save_hf_checkpoint(
    model_dir: str,
    params: dict,
    unet_config,
    vae_config,
    scheduler_config: dict | None = None,
) -> str:
    """Write a diffusers-layout checkpoint directory loadable by both this
    framework and the reference implementation."""
    import dataclasses

    from safetensors.numpy import save_file

    def to_np32(t):
        # ascontiguousarray: the exporters return transposed views, and
        # safetensors serializes the raw buffer without honoring strides
        return {k: np.ascontiguousarray(v, np.float32) for k, v in t.items()}

    unet_sd = to_np32(export_unet_torch_keys(params["unet"]["params"]))
    vae_sd = to_np32(export_vae_torch_keys(params["vae"]["params"]))

    os.makedirs(osp.join(model_dir, "unet"), exist_ok=True)
    os.makedirs(osp.join(model_dir, "vae"), exist_ok=True)
    os.makedirs(osp.join(model_dir, "scheduler"), exist_ok=True)
    save_file(unet_sd, osp.join(model_dir, "unet", "diffusion_pytorch_model.safetensors"))
    save_file(vae_sd, osp.join(model_dir, "vae", "diffusion_pytorch_model.safetensors"))

    ucfg = dataclasses.asdict(unet_config)
    ucfg["_class_name"] = "UNetMultiviewConditionModel"
    # invert the diffusers naming-bug mapping on the way out
    ucfg["attention_head_dim"] = list(ucfg.pop("num_attention_heads"))
    with open(osp.join(model_dir, "unet", "config.json"), "w") as f:
        json.dump(ucfg, f, indent=2)
    vcfg = dataclasses.asdict(vae_config)
    vcfg["_class_name"] = "AutoencoderKL"
    with open(osp.join(model_dir, "vae", "config.json"), "w") as f:
        json.dump(vcfg, f, indent=2)
    sched = scheduler_config or {"_class_name": "DDIMScheduler"}
    with open(osp.join(model_dir, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump(sched, f, indent=2)
    return model_dir


# ---------------------------------------------------------------------------
# HF directory loading
# ---------------------------------------------------------------------------

def _load_safetensors(path: str) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            t = f.get_tensor(k)
            if t.dtype == np.float16 or str(t.dtype) == "bfloat16":
                t = t.astype(np.float32)
            out[k] = t
    return out


def unet_config_from_hf(cfg: dict) -> UNetConfig:
    """diffusers config.json -> UNetConfig (diffusers naming-bug note:
    attention_head_dim there is the per-stage head *count*)."""
    heads = cfg.get("num_attention_heads") or cfg.get("attention_head_dim", 8)
    if isinstance(heads, int):
        heads = (heads,) * len(cfg.get("block_out_channels", (320, 640, 1280, 1280)))
    return UNetConfig(
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels", (320, 640, 1280, 1280))),
        layers_per_block=cfg.get("layers_per_block", 2),
        num_attention_heads=tuple(heads),
        transformer_layers_per_block=cfg.get("transformer_layers_per_block", 1),
        use_linear_projection=cfg.get("use_linear_projection", False),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        norm_eps=cfg.get("norm_eps", 1e-5),
        freq_shift=cfg.get("freq_shift", 0),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
        num_3d_attn_blocks=cfg.get("num_3d_attn_blocks", 3),
        enable_tem_embeds=cfg.get("enable_tem_embeds", False),
        enable_pose_encoder=cfg.get("enable_pose_encoder", False),
    )


def vae_config_from_hf(cfg: dict) -> VAEConfig:
    return VAEConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=cfg.get("layers_per_block", 2),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
    )


def load_hf_checkpoint(model_dir: str, dtype=jnp.bfloat16):
    """Load a diffusers-layout checkpoint directory.

    ``dtype`` is the *storage* dtype for all params (bf16 default matches
    the reference's bf16 ``from_pretrained``, sampling_utils.py:28-35).
    Pass ``jnp.float32`` to keep full-precision weights; the model's
    compute dtype is applied at apply-time by flax, so fp32 storage + bf16
    compute follows the repo's "fp32 params, bf16 compute" convention.

    Returns (unet_config, vae_config, scheduler_config_dict, params)."""
    def read_json(p):
        with open(p) as f:
            return json.load(f)

    unet_cfg = unet_config_from_hf(read_json(osp.join(model_dir, "unet", "config.json")))
    vae_cfg = vae_config_from_hf(read_json(osp.join(model_dir, "vae", "config.json")))
    sched_cfg = read_json(osp.join(model_dir, "scheduler", "scheduler_config.json"))

    def find_st(sub):
        for cand in (
            "diffusion_pytorch_model.safetensors",
            "diffusion_pytorch_model.fp16.safetensors",
        ):
            p = osp.join(model_dir, sub, cand)
            if osp.isfile(p):
                return p
        raise FileNotFoundError(f"no safetensors found under {model_dir}/{sub}")

    unet_params = convert_unet_torch_keys(_load_safetensors(find_st("unet")))
    vae_params = convert_vae_torch_keys(_load_safetensors(find_st("vae")))

    import jax

    cast = lambda t: jax.tree.map(lambda x: jnp.asarray(x, dtype), t)
    params = {
        "unet": {"params": cast(unet_params)},
        "vae": {"params": cast(vae_params)},
    }
    return unet_cfg, vae_cfg, sched_cfg, params


# ---------------------------------------------------------------------------
# native checkpoints (orbax)
# ---------------------------------------------------------------------------

def save_native(path: str, params: dict) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_native(path: str) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(osp.abspath(path))
