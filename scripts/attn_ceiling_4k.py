"""Measured ceiling accounting for the short-sequence attention shapes.

VERDICT r3 next-item #2: the 4k-token regime (2d@64sq at 55 TF/s table
number vs 103 at 65k tokens) needs either a >=70 TF/s kernel or a
written, measured ceiling case. This script produces the measurements
for that case, with the one methodological fix the dispatch-table sweep
cannot apply: timing INSIDE one jitted program.

The tuner (scripts/tune_attention.py::timed) dispatches 3 async calls
and syncs once — correct for the big shapes, but each dispatch through
the axon relay costs ~10-35 ms, so shapes whose true kernel time is
1-10 ms measure as relay latency (observed: every 3d@16sq_mid candidate
"took" 11-12 ms regardless of block config). In the real pipeline these
kernels run inside the sliding-denoise jit with zero per-call overhead,
so the in-loop numbers here are what the model actually sees.

Method: run each kernel N times inside ``lax.fori_loop`` with a scalar
data dependence between iterations (carry perturbs q, preventing XLA
from collapsing the loop); separately time the perturbation alone and
subtract. Alongside each attention shape, time the two matmuls that
bound it — QK^T (M=s, K=d, N=s) and PV (M=s, K=s, N=d) as batched bf16
``dot_general``s — plus an exp2 pass over the score-matrix footprint.
The composed lower bound

    t_ceiling = t_QK + t_PV + t_exp2

is what a perfectly-fused kernel could hit if softmax cost nothing extra
(no running-max bookkeeping, no normalizer divide); attention TF/s vs
FLOPs/t_ceiling is the honest efficiency number.

Output: one JSON blob (also appended to docs/ATTN_4K_CEILING.md by hand)
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import functools
import json
import time

# (name, b, s, h, d, impl, block_q, block_k) — current table winners at
# the short shapes, plus the 65k flagship as a sanity anchor (its in-loop
# number should match the table's 103.1 within noise, validating the
# method against the async-dispatch numbers).
CASES = [
    ("2d@64sq", 32, 4096, 10, 64, "pallas_v3", 4096, 2048),
    ("3d@16sq_mid", 2, 4096, 20, 64, "pallas_v4", 2048, 1024),
    ("2d@32sq", 32, 1024, 20, 64, "pallas_v3", 1024, 1024),
    ("3d_spatial@64sq", 2, 65536, 10, 64, "pallas_v4", 4096, 2048),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="/tmp/attn_ceiling_4k.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from diffuman4d_tpu.ops import flash_attention as fa
    from diffuman4d_tpu.utils.jax_setup import setup

    setup()
    n = args.iters

    def inloop(fn, *arrs, key_shape=None):
        """Mean seconds/call for fn(*arrs) run n times inside one jit,
        chained by a scalar perturbation of the first operand."""

        @jax.jit
        def run(*arrs):
            def body(_, carry):
                delta, _ = carry
                out = fn(arrs[0] + delta.astype(arrs[0].dtype), *arrs[1:])
                # cheap scalar tap: keeps iterations sequential
                return (out.reshape(-1)[0] * 0.0).astype(jnp.float32), out

            zero = jnp.float32(0.0)
            # init with the first output: costs one extra (untimed-target)
            # execution, so reported times are ~(n+1)/n conservative
            return jax.lax.fori_loop(0, n, body, (zero, fn(*arrs)))[1]

        @jax.jit
        def base(*arrs):
            # the perturbation alone, to subtract its cost
            def body(_, carry):
                delta, _ = carry
                out = arrs[0] + delta.astype(arrs[0].dtype)
                return (out.reshape(-1)[0] * 0.0).astype(jnp.float32), out

            zero = jnp.float32(0.0)
            return jax.lax.fori_loop(0, n, body, (zero, arrs[0]))[1]

        def clock(f):
            r = f(*arrs)
            float(r.astype(jnp.float32).sum())  # compile+sync
            t0 = time.perf_counter()
            r = f(*arrs)
            float(r.astype(jnp.float32).sum())
            return (time.perf_counter() - t0) / n

        return max(clock(run) - clock(base), 1e-9)

    impls = {
        "pallas_v3": fa.flash_attention_v3,
        "pallas_v4": fa.flash_attention_v4,
    }
    report = {}
    for name, b, s, h, d, impl, bq, bk in CASES:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
        flops = 4.0 * b * h * s * s * d

        attn = functools.partial(impls[impl], block_q=bq, block_k=bk)
        t_attn = inloop(lambda q, k, v: attn(q, k, v), q, q, q)

        # The materialized (s, s) score matrix doesn't fit HBM at full
        # batch (that's why flash exists): proxy on the largest batch
        # subset whose fp32 score block stays under 2 GB and scale time
        # linearly — MXU throughput per batch element is constant here
        # (each batch entry is its own serialized grid step).
        bh = b * h
        bsub = max(1, min(bh, (2 << 30) // (s * s * 4)))
        scale = bh / bsub

        def qk_mm(a, bmat):
            return jax.lax.dot_general(
                a, bmat, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        if s * s * 4 <= 2 << 30:
            qk = q.transpose(0, 2, 1, 3).reshape(bh, s, d)[:bsub]
            kt = q.transpose(0, 2, 3, 1).reshape(bh, d, s)[:bsub]
            t_qk = inloop(qk_mm, qk, kt) * scale

            p = jax.random.normal(key, (bsub, s, s), jnp.bfloat16)
            vv = jax.random.normal(key, (bsub, s, d), jnp.bfloat16)
            t_pv = inloop(qk_mm, p, vv) * scale

            # exp2 over the score footprint (fp32, like the softmax)
            sc = jax.random.normal(key, (bsub, s, s), jnp.float32)
            t_exp = inloop(jnp.exp2, sc) * scale
        else:  # 65k anchor: attention-only sanity check vs the table
            t_qk = t_pv = t_exp = float("nan")

        t_ceil = t_qk + t_pv + t_exp

        def rnd(x, k=3):
            return None if x != x else round(x, k)  # NaN -> null

        half = 2.0 * b * h * s * s * d  # FLOPs of one of the two matmuls
        report[name] = {
            "b": b, "s": s, "h": h, "d": d, "impl": impl,
            "block_q": bq, "block_k": bk, "iters": n,
            "attn_ms": round(t_attn * 1e3, 3),
            "attn_tflops": round(flops / t_attn / 1e12, 1),
            "proxy_batch": bsub,
            "qk_matmul_ms": rnd(t_qk * 1e3),
            "qk_matmul_tflops": rnd(half / t_qk / 1e12, 1),
            "pv_matmul_ms": rnd(t_pv * 1e3),
            "pv_matmul_tflops": rnd(half / t_pv / 1e12, 1),
            "exp2_ms": rnd(t_exp * 1e3),
            "ceiling_ms": rnd(t_ceil * 1e3),
            "ceiling_tflops": rnd(flops / t_ceil / 1e12, 1),
            "attn_vs_ceiling_pct": rnd(100.0 * t_ceil / t_attn, 1),
        }
        print(name, json.dumps(report[name]), flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
