"""In-graph per-unit profile of the production window step's building
blocks on the real chip.

Round-3's per-unit attribution used per-dispatch timing, which the r4
in-graph work showed floors small ops at the relay latency
(docs/ATTN_SHORT_SEQ.md). This measures each unit the way the jitted
window step actually runs it — N executions inside one fori_loop
(scripts/tune_attention.py::timed) — so the window-step time budget
(bench: 3.32 s/CFG-window-step at r3) decomposes on real numbers:

- ResnetBlock2D at each UNet stage's (batch, res, channels)
- raw 3x3 conv at the same shapes (isolates norm/elementwise overhead)
- GroupNorm(32) standalone at the hot shapes
- transformer FF + qkv/proj matmuls at stage widths
- VAE decoder stages at 1024^2 (the 0.204 s/img decode: which stage eats
  it, conv MFU vs bandwidth-bound norm passes)

Usage: python scripts/profile_unet_units.py [--iters 10]
Prints one line per unit + a JSON blob.
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="/tmp/unet_units.json")
    args = ap.parse_args()

    from diffuman4d_tpu.utils.jax_setup import setup

    setup()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from diffuman4d_tpu.models.layers import (
        GroupNorm,
        ResnetBlock2D,
        Upsample2D,
    )
    from tune_attention import timed  # in-graph fori_loop timer

    report = {}

    def module_fn(mod, x, extra=None):
        params = mod.init(jax.random.PRNGKey(0), x, *(extra or ()))

        def fn(q):
            return mod.apply(params, q, *(extra or ()))

        return fn

    def run(name, fn, x, flops, bytes_moved):
        dt = timed(fn, x, n=args.iters)
        tf = flops / dt / 1e12
        gbs = bytes_moved / dt / 1e9
        report[name] = {
            "ms": round(dt * 1e3, 3),
            "tflops": round(tf, 1),
            "gb_s": round(gbs, 1),
        }
        print(f"{name:36s} {dt * 1e3:8.2f} ms  {tf:6.1f} TF/s  "
              f"{gbs:6.0f} GB/s", flush=True)

    # ---- UNet stages: window batch 32 (16 frames CFG-doubled) ----------
    # (res, channels) per SD2.1-shaped stage at 128^2 latents
    B = 32
    stages = [(128, 320), (64, 640), (32, 1280), (16, 1280)]

    class RawConv(nn.Module):
        ch: int

        @nn.compact
        def __call__(self, x):
            return nn.Conv(self.ch, (3, 3), padding=1, dtype=jnp.bfloat16)(x)

    for res, ch in stages:
        x = jax.random.normal(jax.random.PRNGKey(1), (B, res, res, ch),
                              jnp.bfloat16)
        act_bytes = x.size * 2
        cflops = 2.0 * B * res * res * 9 * ch * ch
        run(f"conv3x3 {res}^2x{ch}", module_fn(RawConv(ch), x), x,
            cflops, 3 * act_bytes)
        temb = jnp.zeros((B, 1280), jnp.bfloat16)
        rb = ResnetBlock2D(ch, eps=1e-5, dtype=jnp.bfloat16)
        params = rb.init(jax.random.PRNGKey(0), x, temb)
        run(f"resnet {res}^2x{ch}",
            lambda q, params=params, rb=rb, temb=temb: rb.apply(params, q, temb),
            x, 2 * cflops, 10 * act_bytes)
        gn = GroupNorm(32, 1e-5)
        gp = gn.init(jax.random.PRNGKey(0), x)
        run(f"groupnorm {res}^2x{ch}",
            lambda q, gp=gp, gn=gn: gn.apply(gp, q), x,
            0.0, 2 * act_bytes)

    # transformer FF (up+down pair — shape-preserving so the in-graph
    # fori_loop timer can chain iterations) at stage widths
    for res, ch in stages[:3]:
        tok = B * res * res
        x = jax.random.normal(jax.random.PRNGKey(2), (tok, ch), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(3), (ch, 4 * ch), jnp.bfloat16)
        w2 = jax.random.normal(jax.random.PRNGKey(5), (4 * ch, ch), jnp.bfloat16)

        def ff(q, w=w, w2=w2):
            return (q @ w) @ w2

        run(f"ff_updown {tok}x{ch}x{4 * ch}", ff, x,
            2.0 * tok * ch * 4 * ch * 2,
            (x.size * 2 + w.size + w2.size + tok * 4 * ch) * 2)

    # ---- VAE decoder stages at 1024^2 (batch 4 = vae_batch) ------------
    vb = 4
    # decoder stage shapes: mid+up_0 512ch@128^2, up_1 512ch@256^2,
    # up_2 256ch@512^2, up_3 128ch@1024^2 (the r3-flagged tail)
    vae_stages = [(128, 512), (256, 512), (512, 256), (1024, 128)]
    for res, ch in vae_stages:
        x = jax.random.normal(jax.random.PRNGKey(4), (vb, res, res, ch),
                              jnp.bfloat16)
        act_bytes = x.size * 2
        cflops = 2.0 * vb * res * res * 9 * ch * ch
        run(f"vae_conv3x3 {res}^2x{ch}", module_fn(RawConv(ch), x), x,
            cflops, 3 * act_bytes)
        rb = ResnetBlock2D(ch, use_temb=False, eps=1e-6, dtype=jnp.bfloat16)
        params = rb.init(jax.random.PRNGKey(0), x)
        run(f"vae_resnet {res}^2x{ch}",
            lambda q, params=params, rb=rb: rb.apply(params, q), x,
            2 * cflops, 10 * act_bytes)
        gn = GroupNorm(32, 1e-6)
        gp = gn.init(jax.random.PRNGKey(0), x)
        run(f"vae_groupnorm {res}^2x{ch}",
            lambda q, gp=gp, gn=gn: gn.apply(gp, q), x,
            0.0, 2 * act_bytes)
    x = jax.random.normal(jax.random.PRNGKey(5), (vb, 512, 512, 256),
                          jnp.bfloat16)
    up = Upsample2D(256, dtype=jnp.bfloat16)
    upp = up.init(jax.random.PRNGKey(0), x)

    def up_and_pool(q, upp=upp, up=up):
        # pool back to the input shape so the fori_loop timer can chain;
        # the pool adds ~1 read+write of the 1024^2 tensor (counted).
        y = up.apply(upp, q)
        return y.reshape(vb, 512, 2, 512, 2, 256).mean(axis=(2, 4))

    run("vae_upsample 512->1024x256", up_and_pool, x,
        2.0 * vb * 1024 * 1024 * 9 * 256 * 256, 18 * x.size * 2)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
