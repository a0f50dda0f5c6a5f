"""Print the sliding-window schedule facts for a sampler preset — task
counts, windows per task, steps per target (SURVEY §3.4 verification).

Usage: python scripts/show_schedule.py [preset] [--cams 48] [--frames 150]
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("preset", nargs="?", default="sliding_fast")
    p.add_argument("--cams", type=int, default=48)
    p.add_argument("--frames", type=int, default=150)
    p.add_argument("--inputs", type=int, default=4)
    args = p.parse_args()

    from diffuman4d_tpu.configs.presets import SAMPLER_PRESETS, SamplerConfig
    from diffuman4d_tpu.sampling.windows import build_windows, step_counts

    cfg = SamplerConfig()
    for k, v in SAMPLER_PRESETS[args.preset].items():
        setattr(cfg, k, v)

    peralt, total = step_counts(
        cfg.window_size, cfg.sliding_stride, cfg.num_denoising_steps,
        cfg.bidirectional, cfg.alternation_rounds,
    )
    n_targets = args.cams - args.inputs
    domains = (["spatial", "temporal"] * cfg.alternation_rounds)[: cfg.alternation_rounds]
    print(f"preset {args.preset}: window={cfg.window_size} stride={cfg.sliding_stride} "
          f"rounds={cfg.alternation_rounds} cfg={cfg.guidance_scale}")
    print(f"steps per target latent: {total}  (per alternation: {peralt})")
    total_windows = 0
    for i, d in enumerate(domains):
        if d == "spatial":
            tasks = args.frames
            w = build_windows(np.arange(n_targets), np.arange(args.inputs), "spatial",
                              cfg.window_size, cfg.sliding_stride, cfg.sliding_shift,
                              cfg.bidirectional)
            batch = 2 * w.shape[1] if cfg.guidance_scale > 1 else w.shape[1]
        else:
            tasks = n_targets
            w = build_windows(np.arange(args.frames, 2 * args.frames),
                              np.arange(args.frames), "temporal",
                              cfg.window_size, cfg.sliding_stride, cfg.sliding_shift,
                              cfg.bidirectional)
            batch = 2 * w.shape[1] if cfg.guidance_scale > 1 else w.shape[1]
        total_windows += tasks * w.shape[0]
        print(f"round {i+1} ({d}): {tasks} tasks x {w.shape[0]} windows "
              f"(UNet batch {batch}/step)")
    print(f"total UNet window-steps for the run: {total_windows}")


if __name__ == "__main__":
    main()
