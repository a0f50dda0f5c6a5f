"""On-chip A/B of the Pallas fused conv (ops/conv.py) vs XLA at the VAE
decoder shapes, timed in-graph (scripts/tune_attention.py::timed).

Per shape: raw XLA conv3x3, Pallas conv3x3, XLA ResnetBlock2D, and the
fused resnet composition (groupnorm stats + 2x fused conv + residual).
Also asserts pallas-vs-XLA numerics on the real chip (interpret-mode CPU
tests can't catch Mosaic lowering bugs).

Usage: python scripts/profile_vae_conv.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.dirname(_osp.abspath(__file__))), "scripts"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="/tmp/vae_conv.json")
    args = ap.parse_args()

    from diffuman4d_tpu.utils.jax_setup import setup

    setup()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffuman4d_tpu.models.layers import ResnetBlock2D
    from diffuman4d_tpu.ops.conv import conv3x3, groupnorm_affine
    from tune_attention import timed

    report = {}

    def run(name, fn, x, flops):
        dt = timed(fn, x, n=args.iters)
        tf = flops / dt / 1e12
        report[name] = {"ms": round(dt * 1e3, 3), "tflops": round(tf, 1)}
        print(f"{name:36s} {dt * 1e3:8.2f} ms  {tf:6.1f} TF/s", flush=True)

    vb = 4
    shapes = [(1024, 128), (512, 256), (256, 512), (128, 512)]
    for res, ch in shapes:
        k = jax.random.split(jax.random.PRNGKey(res), 8)
        x = jax.random.normal(k[0], (vb, res, res, ch), jnp.bfloat16)
        w = (jax.random.normal(k[1], (3, 3, ch, ch), jnp.float32) * 0.05)
        b = jax.random.normal(k[2], (ch,), jnp.float32) * 0.1
        cflops = 2.0 * vb * res * res * 9 * ch * ch

        # numerics: pallas vs XLA on the chip
        xla = jax.jit(
            lambda q, w=w, b=b: jax.lax.conv_general_dilated(
                q, w.astype(jnp.bfloat16), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(jnp.bfloat16)
        )
        want = np.asarray(xla(x), np.float32)
        got = np.asarray(conv3x3(x, w, b), np.float32)
        err = np.abs(got - want).max()
        scale_ref = np.abs(want).max()
        print(f"numerics {res}^2x{ch}: max|diff|={err:.4f} "
              f"(max|y|={scale_ref:.1f})", flush=True)
        assert err <= 0.1 + 0.02 * scale_ref, (res, ch, err)

        run(f"xla_conv {res}^2x{ch}", xla, x, cflops)
        run(f"pallas_conv {res}^2x{ch}",
            lambda q, w=w, b=b: conv3x3(q, w, b), x, cflops)

        rb = ResnetBlock2D(ch, use_temb=False, eps=1e-6, dtype=jnp.bfloat16)
        params = rb.init(jax.random.PRNGKey(0), x)
        run(f"xla_resnet {res}^2x{ch}",
            lambda q, params=params, rb=rb: rb.apply(params, q),
            x, 2 * cflops)

        g1 = jnp.ones((ch,), jnp.float32)
        b1 = jnp.zeros((ch,), jnp.float32)

        def fused_resnet(q, w=w, b=b, g1=g1, b1=b1, ch=ch):
            s1, sh1 = groupnorm_affine(q, g1, b1, 32, 1e-6)
            h = conv3x3(q, w, b, s1, sh1, silu=True)
            s2, sh2 = groupnorm_affine(h, g1, b1, 32, 1e-6)
            return conv3x3(h, w, b, s2, sh2, residual=q, silu=True)

        run(f"fused_resnet {res}^2x{ch}", fused_resnet, x, 2 * cflops)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
