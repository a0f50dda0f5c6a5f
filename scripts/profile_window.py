"""Microbenchmark the hot units on the real chip: one UNet window step
(spatial/temporal, CFG), the Pallas 3D attention kernels in isolation
(vs XLA attention), and VAE encode/decode at 1024^2.

Usage: python scripts/profile_window.py [--domain spatial|temporal]
                                        [--latent 128] [--steps 5]
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def timed(fn, *args, n=3, warmup=1):
    # NOTE: under this environment's axon relay, block_until_ready can
    # return before execution finishes; fetching a scalar forces completion.
    def sync(x):
        import jax

        leaf = jax.tree.leaves(x)[0]
        float(leaf.sum())

    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--domain", default="spatial")
    p.add_argument("--latent", type=int, default=128)
    p.add_argument("--window", type=int, default=12)
    p.add_argument("--attn-only", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from diffuman4d_tpu.ops.attention import _xla_attention
    from diffuman4d_tpu.ops.flash_attention import flash_attention

    results = {}

    # --- attention kernels at the model's 3D shapes -----------------------
    L = args.window + (4 if args.domain == "spatial" else args.window)
    shapes = [
        ("3d@64^2", 2, L * (args.latent // 2) ** 2, 10, 64),
        ("3d@32^2", 2, L * (args.latent // 4) ** 2, 20, 64),
        ("2d@64^2", 2 * L, (args.latent // 2) ** 2, 10, 64),
    ]
    for name, b, s, h, d in shapes:
        q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d), jnp.bfloat16)
        flops = 4 * b * h * s * s * d
        t_flash = timed(jax.jit(flash_attention), q, k, v)
        results[name] = {
            "batch": b, "seq": s, "heads": h,
            "flash_ms": round(t_flash * 1e3, 2),
            "flash_tflops": round(flops / t_flash / 1e12, 1),
        }
        if s <= 8192:  # XLA materializes the (s, s) scores — OOM above
            t_xla = timed(jax.jit(_xla_attention), q, k, v)
            results[name]["xla_ms"] = round(t_xla * 1e3, 2)
            results[name]["xla_tflops"] = round(flops / t_xla / 1e12, 1)
        print(name, results[name])

    if args.attn_only:
        print(json.dumps(results, indent=2))
        return

    # --- one full UNet window step ----------------------------------------
    from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition

    cfg = UNetConfig()
    unet = UNetMultiviewCondition(cfg, dtype=jnp.bfloat16)
    B = 2 * L  # CFG
    hw = args.latent
    sample = jnp.zeros((B, hw, hw, cfg.in_channels), jnp.bfloat16)
    skel = jnp.zeros((B, hw * 8, hw * 8, 3), jnp.bfloat16)
    pose_feat = jnp.zeros((B, hw, hw, cfg.block_out_channels[0]), jnp.bfloat16)
    t = jnp.zeros((B,), jnp.int32)
    params = unet.init(jax.random.PRNGKey(0), sample, t, skel, num_frames=L)

    fwd = jax.jit(
        lambda p, x, t, pf: unet.apply(p, x, t, num_frames=L, pose_features=pf)
    )
    dt = timed(fwd, params, sample, t, pose_feat, n=3)
    results["unet_window_step"] = {
        "batch": B, "latent": hw, "ms": round(dt * 1e3, 1),
        "steps_per_s": round(1 / dt, 3),
    }
    print("unet_window_step", results["unet_window_step"])

    # --- VAE ---------------------------------------------------------------
    from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig

    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
    img = jnp.zeros((4, hw * 8, hw * 8, 3), jnp.bfloat16)
    vp = vae.init(jax.random.PRNGKey(0), img)
    t_enc = timed(
        jax.jit(lambda p, x: vae.apply(p, x, jax.random.PRNGKey(1), method="encode")),
        vp, img,
    )
    lat = jnp.zeros((4, hw, hw, 4), jnp.bfloat16)
    t_dec = timed(jax.jit(lambda p, z: vae.apply(p, z, method="decode")), vp, lat)
    results["vae"] = {
        "encode4_ms": round(t_enc * 1e3, 1),
        "decode4_ms": round(t_dec * 1e3, 1),
    }
    print("vae", results["vae"])
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
