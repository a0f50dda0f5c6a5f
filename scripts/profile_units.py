"""Per-unit microbenchmarks at the model's REAL shapes on the real chip:
conv / GroupNorm / ResnetBlock / transformer block / VAE stages, with
achieved TFLOP/s (or GB/s for memory-bound ops) against v5e peaks
(197 bf16 TFLOP/s, ~819 GB/s HBM).

Pinpoints where the non-attention 2.5 s of the 4.32 s window step goes
(reference hot loop being beaten: src/diffusers/models/attention.py:69-83
plus the conv stack of unet_multiview_condition.py).

Usage: python scripts/profile_units.py [--section unet|vae|all]
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import json
import time


def timed(fn, *args, n=5, warmup=2):
    import jax

    def sync(x):
        import jax.numpy as jnp

        leaf = jax.tree.leaves(x)[0]
        float(leaf.astype(jnp.float32).sum())

    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--section", default="all")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from diffuman4d_tpu.utils.jax_setup import setup

    setup()
    results = {}

    def report(name, dt, flops=None, bytes_moved=None, extra=""):
        row = {"ms": round(dt * 1e3, 2)}
        if flops:
            row["tflops"] = round(flops / dt / 1e12, 1)
        if bytes_moved:
            row["gbps"] = round(bytes_moved / dt / 1e9, 1)
        results[name] = row
        print(name, row, extra, flush=True)

    key = jax.random.PRNGKey(0)

    if args.section in ("unet", "all"):
        # UNet stage shapes: (CFG batch 32, hw, hw, C) per SURVEY §3.3
        stages = [(32, 128, 320), (32, 64, 640), (32, 32, 1280), (32, 16, 1280)]

        for b, hw, c in stages:
            x = jax.random.normal(key, (b, hw, hw, c), jnp.bfloat16)

            # 3x3 conv, same channels
            conv = nn.Conv(c, (3, 3), padding=1, dtype=jnp.bfloat16)
            cp = conv.init(key, x)
            f = jax.jit(lambda p, x: conv.apply(p, x))
            dt = timed(f, cp, x)
            flops = 2 * b * hw * hw * c * c * 9
            report(f"conv3x3_{hw}x{c}", dt, flops=flops)

            # GroupNorm (fp32 stats) + SiLU, as the model runs it
            from diffuman4d_tpu.models.layers import GroupNorm

            gn = GroupNorm()
            gp = gn.init(key, x)
            f = jax.jit(lambda p, x: nn.silu(gn.apply(p, x).astype(jnp.float32)).astype(jnp.bfloat16))
            dt = timed(f, gp, x)
            nbytes = 2 * x.size * 2  # read + write bf16 (ideal)
            report(f"gn_silu_{hw}x{c}", dt, bytes_moved=nbytes)

            # Full ResnetBlock2D (GN-silu-conv x2 + temb + residual)
            from diffuman4d_tpu.models.layers import ResnetBlock2D

            rb = ResnetBlock2D(out_channels=c)
            temb = jax.random.normal(key, (b, 1280), jnp.bfloat16)
            rp = rb.init(key, x, temb)
            f = jax.jit(lambda p, x, t: rb.apply(p, x, t))
            dt = timed(f, rp, x, temb)
            flops = 2 * (2 * b * hw * hw * c * c * 9)
            report(f"resnet_{hw}x{c}", dt, flops=flops)

        # Full multiview transformer block at the real window shapes:
        # (B*T, HW, C) with T=16 frames (spatial domain, CFG batch 32)
        from diffuman4d_tpu.models.transformer import MultiviewTransformerBlock

        # num_frames mirrors the real gating: 3D regroup only at <=64^2
        # (num_3d_attn_blocks=3 leaves the 128^2 stage per-frame 2D;
        # 16 frames x 128^2 would be a 262k-token attention that OOMs and
        # never occurs in the model)
        for hw, c, heads, nf in ((128, 320, 5, 1), (64, 640, 10, 16),
                                 (32, 1280, 20, 16)):
            tokens = hw * hw
            xt = jax.random.normal(key, (32, tokens, c), jnp.bfloat16)
            blk = MultiviewTransformerBlock(num_heads=heads, head_dim=64,
                                            dtype=jnp.bfloat16)
            bp = blk.init(key, xt, num_frames=nf)
            f = jax.jit(lambda p, x: blk.apply(p, x, num_frames=nf))
            dt = timed(f, bp, xt, n=3)
            s3d = nf * tokens  # attn1 seq len (3D when nf>1)
            flops = (
                4 * (32 // nf) * s3d * s3d * c           # attn1
                + 32 * 4 * tokens * tokens * c           # attn2 per frame
                + 32 * tokens * (8 * c * c + 16 * c * c)  # qkv/proj + FF
            )
            report(f"mvblock_{hw}x{c}", dt, flops=flops)

    if args.section in ("vae", "all"):
        from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig

        vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
        img = jax.random.normal(key, (2, 1024, 1024, 3), jnp.bfloat16)
        vp = vae.init(key, img)
        lat = jax.random.normal(key, (2, 128, 128, 4), jnp.bfloat16)

        f_enc = jax.jit(lambda p, x: vae.apply(p, x, jax.random.PRNGKey(1), method="encode"))
        dt = timed(f_enc, vp, img, n=3)
        report("vae_encode_b2", dt, flops=2 * 560e9 * 2, extra="(~560 GFLOP/img)")

        f_dec = jax.jit(lambda p, z: vae.apply(p, z, method="decode"))
        dt = timed(f_dec, vp, lat, n=3)
        report("vae_decode_b2", dt, flops=2 * 2.5e12, extra="(~2.5 TFLOP/img)")

        # decoder stage convs standalone: where does decode time go?
        for hw, c in ((256, 512), (512, 512), (512, 256), (1024, 128)):
            x = jax.random.normal(key, (2, hw, hw, c), jnp.bfloat16)
            conv = nn.Conv(c, (3, 3), padding=1, dtype=jnp.bfloat16)
            cp = conv.init(key, x)
            f = jax.jit(lambda p, x: conv.apply(p, x))
            dt = timed(f, cp, x)
            flops = 2 * 2 * hw * hw * c * c * 9
            report(f"vae_conv3x3_{hw}x{c}", dt, flops=flops)

            from diffuman4d_tpu.models.layers import GroupNorm

            gn = GroupNorm()
            gp = gn.init(key, x)
            f = jax.jit(lambda p, x: nn.silu(gn.apply(p, x).astype(jnp.float32)).astype(jnp.bfloat16))
            dt = timed(f, gp, x)
            report(f"vae_gn_silu_{hw}x{c}", dt, bytes_moved=2 * x.size * 2)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
