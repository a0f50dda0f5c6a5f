"""Sweep attention kernels/block sizes at the model's hot shapes on the
real chip; prints a JSON table to feed the dispatcher thresholds in
diffuman4d_tpu/ops/attention.py.

Usage: python scripts/tune_attention.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import time


def sync(x):
    float(x.sum())


def timed(fn, *args, n=3):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from diffuman4d_tpu.ops.flash_attention import (
        flash_attention,
        flash_attention_bundled,
        flash_attention_v2,
    )
    from diffuman4d_tpu.utils.jax_setup import setup

    setup()

    # (name, b, s, h, d) — the model's real attention shapes
    shapes = [
        ("3d_spatial@64sq", 2, 65536, 10, 64),
        ("3d_temporal@64sq", 2, 98304, 10, 64),
        ("3d@32sq", 2, 16384, 20, 64),
        ("2d@128sq", 32, 16384, 5, 64),
        ("2d@64sq", 32, 4096, 10, 64),
        ("vae_mid@128sq", 4, 16384, 1, 512),
    ]
    if args.quick:
        shapes = shapes[:1]

    results = {}
    for name, b, s, h, d in shapes:
        q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d), jnp.bfloat16)
        flops = 4 * b * h * s * s * d
        row = {}

        candidates = {
            "v1_1024x512": lambda: flash_attention(q, q, q, block_q=1024, block_k=512),
            "v2_1024x2048x512": lambda: flash_attention_v2(
                q, q, q, block_q=1024, block_k_major=2048, block_k=512
            ),
        }
        if d <= 128 and s % 1024 == 0:
            candidates["bundled_1024"] = lambda: flash_attention_bundled(
                q, q, q, block_q=1024, block_k=1024
            )
        for cname, fn in candidates.items():
            try:
                dt = timed(fn)
                row[cname] = {
                    "ms": round(dt * 1e3, 1),
                    "tflops": round(flops / dt / 1e12, 1),
                }
            except Exception as e:
                row[cname] = {"error": str(e)[:120]}
            print(name, cname, row[cname], flush=True)
        results[name] = row
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
