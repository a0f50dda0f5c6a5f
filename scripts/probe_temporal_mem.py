"""Abstract (AOT) HBM accounting for the wave-path denoise programs.

The r5 demo_4d chain OOMed (RESOURCE_EXHAUSTED) at the first TEMPORAL wave
dispatch — a program never run on chip before (the r4 full-size temporal
proof used the single-task path, which streams skeletons per chunk from
host; the wave path devices the full 300-row uint8 skeleton stack). This
probe lowers the exact wave-path programs with ShapeDtypeStruct inputs
(zero HBM) and prints the compiler's memory analysis per program, so fixes
can be A/B'd without burning 10-minute OOM attempts on the chip.

Runs concurrently with chip work: compilation happens on the remote
compile service and allocates nothing on the device.

Usage: python scripts/probe_temporal_mem.py [--variant base|chunk3|chunk1]
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
import numpy as np

from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig
from diffuman4d_tpu.sampling.loader import init_random_params
from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline, SlidingConfig
from diffuman4d_tpu.sampling.windows import build_windows
from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig

S = jax.ShapeDtypeStruct
BF = jnp.bfloat16


def mem_report(name: str, compiled) -> dict:
    m = compiled.memory_analysis()
    rep = {
        "program": name,
        "temp_gb": round(m.temp_size_in_bytes / 2**30, 3),
        "arg_gb": round(m.argument_size_in_bytes / 2**30, 3),
        "out_gb": round(m.output_size_in_bytes / 2**30, 3),
        "alias_gb": round(m.alias_size_in_bytes / 2**30, 3),
        "peak_gb": round(
            (
                m.temp_size_in_bytes
                + m.argument_size_in_bytes
                + m.output_size_in_bytes
                - m.alias_size_in_bytes
            )
            / 2**30,
            3,
        ),
    }
    print(json.dumps(rep), flush=True)
    return rep


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--domains", default="temporal,spatial")
    ap.add_argument("--window-chunk", type=int, default=8)
    ap.add_argument("--skip-chunk-cond", action="store_true")
    ap.add_argument("--split", default="",
                    help="comma list of domains to run with split CFG "
                    "(SlidingConfig.split_cfg_domains)")
    args = ap.parse_args()

    unet = UNetMultiviewCondition(UNetConfig(), dtype=BF)
    vae = AutoencoderKL(VAEConfig(), dtype=BF)
    # abstract params: correct shapes/dtypes, zero device bytes
    params = jax.eval_shape(lambda: init_random_params(unet, vae, 1024, seed=0))
    pipe = Diffuman4DPipeline(
        unet, vae, Scheduler(SchedulerConfig(kind="ddim")), params,
        sliding=SlidingConfig(
            sliding_stride=2,
            split_cfg_domains=tuple(
                d for d in args.split.split(",") if d
            ),
        ),
        image_size=1024,
        window_chunk=args.window_chunk,
    )
    lat, ch0 = pipe.latent_size, unet.config.block_out_channels[0]

    for domain in args.domains.split(","):
        if domain == "temporal":
            n = 300  # demo_4d temporal task: 150 cond + 150 target rows
            windows = build_windows(
                np.arange(150, 300), np.arange(0, 150), "temporal", 12, 2
            )
        else:
            n = 48  # spatial task: 4 inputs + 44 targets
            windows = build_windows(
                np.setdiff1d(np.arange(48), [1, 13, 25, 37]),
                np.array([1, 13, 25, 37]), "spatial", 12, 2,
            )
        c = pipe._window_chunk_size(windows.shape[0])
        pad_u = pipe._chunk_pad_u(windows, c)
        print(json.dumps({"domain": domain, "rows": n,
                          "windows": int(windows.shape[0]),
                          "chunk": c, "pad_u": int(pad_u)}), flush=True)

        dense = {
            "pix_latents": S((1, n, lat, lat, 4), BF),
            "plucker": S((1, n, lat, lat, 6), BF),
            "is_cond": S((1, n), jnp.bool_),
        }
        skel_u8 = S((1, n, 1024, 1024, 3), jnp.uint8)
        U = S((pad_u,), jnp.int64)

        t0 = time.perf_counter()
        if not args.skip_chunk_cond:
            cc = jax.jit(pipe._chunk_cond_batch_impl).lower(
                params["unet"], dense, skel_u8, U
            ).compile()
            mem_report(f"{domain}/chunk_cond(c={c},pad_u={pad_u})", cc)
            print(f"  compile {time.perf_counter() - t0:.0f}s", flush=True)

        cond_c = {
            "pix_latents": S((1, pad_u, lat, lat, 4), BF),
            "plucker": S((1, pad_u, lat, lat, 6), BF),
            "is_cond": S((1, pad_u), jnp.bool_),
            "pose_features": S((1, pad_u, lat, lat, ch0), BF),
            "neg_pose_feature": S((1, 1, lat, lat, ch0), BF),
        }
        t0 = time.perf_counter()
        sl = jax.jit(
            pipe._sliding_batch_impl,
            static_argnames=("domain", "num_denoising_steps"),
        ).lower(
            params["unet"], cond_c,
            S((1, n, lat, lat, 4), BF),          # latents_b
            S((1, n), jnp.int32),                # t_idx_b
            S((c, windows.shape[1]), jnp.int32), # windows chunk
            None,                                # aux_b (ddim: no aux)
            S((c, windows.shape[1]), jnp.int32), # cond_windows (chunk rows)
            domain=domain, num_denoising_steps=1,
        ).compile()
        mem_report(f"{domain}/sliding_chunk(c={c})", sl)
        print(f"  compile {time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
