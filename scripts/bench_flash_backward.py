"""In-graph A/B of the differentiable flash-attention families at the
TRAINING hot shapes (VERDICT r4 #4): the local trainable kernels
(ops/flash_backward.py — tuned v4-style forward + hand-written Pallas
dq/dk/dv) vs jax's bundled kernel (the r4 train-step fallback).

Times value_and_grad (forward + full backward, ~3.5x forward FLOPs)
inside a jitted fori_loop — the same methodology as
scripts/tune_attention.py::timed (async-dispatch loops floor sub-35 ms
measurements at the relay latency, docs/ATTN_SHORT_SEQ.md).

Usage: python scripts/bench_flash_backward.py [--out docs/FLASH_BWD_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from diffuman4d_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp

from diffuman4d_tpu.ops.flash_attention import flash_attention_bundled
from diffuman4d_tpu.ops.flash_backward import flash_attention_train

# training window shapes (no CFG): f12 @128^2 latents
# 3D attention regroups to (1, L*hw, h, d); 2D runs per frame
SHAPES = [
    ("train_3d@64sq_f12", 1, 49152, 10, 64),
    ("train_3d@32sq_f12", 1, 12288, 20, 64),
    ("train_2d@128sq_f12", 12, 16384, 5, 64),
    ("train_2d@64sq_f12", 12, 4096, 10, 64),
]


def timed_grad(fn, q, n=6):
    """Seconds per value_and_grad(fn) call, in-graph (fori_loop chained
    through dq so XLA cannot hoist)."""

    def loss(q, k, v):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) * 1e-3)

    gf = jax.grad(loss, argnums=0)

    @jax.jit
    def run(q, k, v):
        def body(_, carry):
            delta, _ = carry
            g = gf(q + delta.astype(q.dtype), k, v)
            return (
                g.reshape(-1)[0].astype(jnp.float32) * jnp.float32(1e-30),
                g,
            )

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), q))[1]

    @jax.jit
    def base(q, k, v):
        def body(_, carry):
            delta, _ = carry
            out = q + delta.astype(q.dtype)
            return (
                out.reshape(-1)[0].astype(jnp.float32) * jnp.float32(1e-30),
                out,
            )

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), q))[1]

    def clock(f):
        float(f(q, q, q).astype(jnp.float32).sum())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(q, q, q).astype(jnp.float32).sum())
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    return max(clock(run) - clock(base), 1e-9)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/FLASH_BWD_r05.json")
    ap.add_argument("--shapes", default="")
    args = ap.parse_args()

    results = {}
    shapes = [
        s for s in SHAPES
        if not args.shapes or any(k in s[0] for k in args.shapes.split(","))
    ]
    for name, b, s, h, d in shapes:
        q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d), jnp.bfloat16)
        # fwd (2 matmuls) + bwd (5 matmuls) = 3.5x the 4*b*h*s^2*d fwd cost
        flops = 3.5 * 4 * b * h * s * s * d
        row = {}
        for tag, fn in (
            ("train", lambda qq, kk, vv: flash_attention_train(
                qq, kk, vv, 1024, 512, False)),
            ("bundled", lambda qq, kk, vv: flash_attention_bundled(
                qq, kk, vv)),
        ):
            try:
                dt = timed_grad(fn, q)
                row[tag] = {
                    "ms": round(dt * 1e3, 2),
                    "tflops": round(flops / dt / 1e12, 1),
                }
            except Exception as e:  # noqa: BLE001
                row[tag] = {"error": str(e)[:150]}
            print(name, tag, row[tag], flush=True)
        results[name] = row
        with open(args.out, "w") as f:
            json.dump(
                {"method": "in_graph_fori_min3(value_and_grad)",
                 "flops_model": "3.5 * 4*b*h*s^2*d",
                 "results": results},
                f, indent=2,
            )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
