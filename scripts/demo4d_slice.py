"""demo_4d-scale validation slice on the real chip.

Builds the FULL demo_4d grid (48 cameras x 150 frames => 7,200 latent
cells, ~945 MB device-resident at 128^2 bf16; configs/exp/demo_4d.yaml:
16-19) and executes one task of each domain at production shapes:

- one spatial task (48-frame sequence @1024^2, window 12, stride 2), and
- one temporal task (the demo_4d novelty: 300-row sequence = cond camera
  + target camera x 150 frames, window roll over 150 targets — the
  program shape demo_4d_tiny's 16-frame grid never reached),

then checkpoints the grid state and proves resume reload at this scale.
The full 3-round 48x150 alternation is ~20+ h on one v5e (BENCH_r02:
0.24 cf/s); this slice exercises every scale-dependent mechanism of that
run (grid memory, 150-frame temporal program, 7,200-frame cache budgets,
state checkpoint size) in ~15 min of chip time.

Usage: python scripts/demo4d_slice.py [--scene /tmp/d4d_4d_scene]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None,
                    help="scene dir (default: /tmp/d4d_4d_scene_{size} — "
                    "size-keyed so a --size change can't silently reuse a "
                    "scene rendered at another resolution)")
    ap.add_argument("--out", default="/tmp/d4d_4d_slice_out")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: tiny models, same 48x150 grid logic")
    args = ap.parse_args()
    if args.scene is None:
        args.scene = f"/tmp/d4d_4d_scene_{args.size}"

    if args.tiny:
        import os

        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from diffuman4d_tpu.utils.jax_setup import setup

        setup()
        import jax
    import numpy as np

    from diffuman4d_tpu.data.dataset import SpaTemDataset
    from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
    from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffuman4d_tpu.sampling.loader import init_random_params
    from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline, SlidingConfig
    from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler
    from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig

    t0 = time.perf_counter()

    def mark(what):
        print(f"[slice] {what}: {time.perf_counter() - t0:.1f}s cumulative",
              flush=True)

    if args.tiny:
        args.size = 64
        ucfg = UNetConfig(
            block_out_channels=(8, 16), num_attention_heads=(1, 2),
            layers_per_block=1, norm_num_groups=4, num_3d_attn_blocks=1,
        )
        vcfg = VAEConfig(block_out_channels=(4, 4, 8, 8), layers_per_block=1)
        unet = UNetMultiviewCondition(
            ucfg, dtype=jax.numpy.float32, attn_implementation="xla"
        )
        vae = AutoencoderKL(vcfg, dtype=jax.numpy.float32)
    else:
        unet = UNetMultiviewCondition(UNetConfig(), dtype=jax.numpy.bfloat16)
        vae = AutoencoderKL(VAEConfig(), dtype=jax.numpy.bfloat16)
    params = init_random_params(unet, vae, args.size, seed=0)
    mark("params init")

    from diffuman4d_tpu.data.synthetic import make_synthetic_scene

    if args.tiny:
        args.scene = "/tmp/d4d_4d_scene_tiny"
        if not osp.isfile(osp.join(args.scene, "0811_06", "transforms.json")):
            make_synthetic_scene(
                args.scene, "0811_06", num_cams=48, num_frames=150,
                image_size=64, unique_frames=2,
            )
        mark("tiny scene ready")
    elif not osp.isfile(osp.join(args.scene, "0811_06", "transforms.json")):
        # full-size scene: 4 rendered frames/camera, rest hardlinked — the
        # pipeline is content-independent, so IO/decode/cache paths are
        # exercised at real per-frame cost without hours of 1-core rendering
        make_synthetic_scene(
            args.scene, "0811_06", num_cams=48, num_frames=150,
            image_size=args.size, unique_frames=4,
        )
        mark("full-size scene rendered (4 unique frames/cam, rest hardlinked)")
    dataset = SpaTemDataset(
        data_dir=args.scene, scene_label="0811_06",
        height=args.size, width=args.size,
        target_pixels=False,  # generation never reads target images
        skeletons_uint8=True,  # device-side [-1,1] normalize
    )
    # demo_4d: sliding_fast preset = stride 2 (configs/exp/demo_4d.yaml)
    pipeline = Diffuman4DPipeline(
        unet, vae, Scheduler(SchedulerConfig(kind="ddim")), params,
        sliding=SlidingConfig(sliding_stride=2), image_size=args.size,
    )
    sampler = SlidingIterativeSampler(
        dataset, pipeline, output_dir=args.out,
        spa_label_range=(0, 48, 1), tem_label_range=(0, 150, 1),
        input_spa_labels=[1, 13, 25, 37],
    )
    ncells = sampler.grid_latents.shape[0] * sampler.grid_latents.shape[1]
    mark(f"grid init: {ncells} cells, "
         f"{sampler.grid_latents.nbytes / (1 << 20):.0f} MB device-resident")

    report = {"grid": list(sampler.grid_latents.shape),
              "total_steps": pipeline.sliding.total_steps, "tasks": {}}
    key = jax.random.PRNGKey(7)
    # One task of each domain, each on a fresh grid: executing a round-2
    # temporal task on a grid where round 1 is only partially done would
    # (correctly) trip the target-uniformity invariant
    # (pipeline_diffuman4d.py:480-487 parity) — the slice validates the
    # production program shapes, not the alternation math, which
    # test_sampling.py pins end-to-end at small scale.
    spatial_task = sampler.all_tasks[0][0]
    temporal_task = sampler.all_tasks[1][0]
    for task in (spatial_task, temporal_task):
        if task is temporal_task:  # fresh grid for the second domain
            sampler = SlidingIterativeSampler(
                dataset, pipeline, output_dir=args.out,
                spa_label_range=(0, 48, 1), tem_label_range=(0, 150, 1),
                input_spa_labels=[1, 13, 25, 37], resume=False,
            )
        tt = time.perf_counter()
        k, key = jax.random.split(key)
        # per-phase breakdown (same stages as bench.run_once) so slice-vs-
        # bench divergence is explained by data, not guessed: the slice's
        # first visit pays host IO/decode for every frame at 1024^2 plus
        # per-shape compiles the bench amortizes across its warmup tier
        phases = {}
        tp = time.perf_counter()

        def pmark(name):
            nonlocal tp
            jax.block_until_ready(jax.numpy.zeros(()))
            phases[name] = round(time.perf_counter() - tp, 1)
            tp = time.perf_counter()

        sample = sampler.load_sample(task)
        pmark("load_sample")
        spa, tem = sampler._grid_cells(sample.labels)
        cond = pipeline.prepare_conditions(sample, k)
        jax.block_until_ready(cond)
        pmark("prepare_conditions")
        latents = sampler.grid_latents[spa, tem]
        t_idx = sampler.grid_t_idx[spa, tem]
        windows = sampler._windows_for(task, len(sample.labels))
        aux = None
        latents, t_idx, aux = pipeline.sliding_denoise(
            cond, latents, t_idx, windows, task.domain, aux=aux
        )
        jax.block_until_ready(latents)
        pmark("denoise")
        sampler.grid_latents = sampler.grid_latents.at[spa, tem].set(latents)
        sampler.grid_t_idx[spa, tem] = np.asarray(t_idx)
        sampler._save_task_outputs(task, sample, latents, np.asarray(t_idx))
        jax.block_until_ready(sampler.grid_latents)
        pmark("decode_save")
        dt = time.perf_counter() - tt
        done = int((sampler.grid_t_idx > 0).sum())
        report["tasks"][task.domain] = {
            "label": task.domain_label, "sec": round(dt, 1),
            "cells_touched": done, "phases": phases,
        }
        mark(f"{task.domain} task {task.domain_label}: {dt:.1f}s "
             f"({done} grid cells now in flight) phases={phases}")

    tt = time.perf_counter()
    sampler.save_state()
    st = osp.join(args.out, "state", "grid_state.d4d")
    sz = osp.getsize(st) / (1 << 20)
    mark(f"grid_state checkpoint: {sz:.0f} MB, {time.perf_counter() - tt:.1f}s")

    # resume proof: a fresh sampler over the same grid reloads the state
    tt = time.perf_counter()
    sampler2 = SlidingIterativeSampler(
        dataset, pipeline, output_dir=args.out,
        spa_label_range=(0, 48, 1), tem_label_range=(0, 150, 1),
        input_spa_labels=[1, 13, 25, 37],
    )
    assert np.array_equal(sampler2.grid_t_idx, sampler.grid_t_idx), "resume t_idx"
    assert np.allclose(
        np.asarray(sampler2.grid_latents[:2, :2]).astype(np.float32),
        np.asarray(sampler.grid_latents[:2, :2]).astype(np.float32),
    ), "resume latents"
    report["resume_reload_s"] = round(time.perf_counter() - tt, 1)
    report["checkpoint_mb"] = round(sz, 1)
    mark("resume reload verified")
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
