"""demo_4d spatial-round prefix on the real chip, resumable across
process restarts (VERDICT r3 next-item #4).

Runs the production 48x150 demo_4d schedule (window 12, stride 2 —
configs/exp/demo_4d.yaml) through the sampler's OWN wave executor with a
per-invocation task budget: each run continues from the last intra-round
grid-state checkpoint, executes up to ``--task-budget`` tasks with
prefetch overlap and periodic checkpoints, then stops cleanly. Re-running
the script IS the deliberate-restart resume proof — a fresh process, a
fresh sampler, the same grid.

    python scripts/demo4d_prefix.py --task-budget 24   # session 1
    python scripts/demo4d_prefix.py --task-budget 40   # restart + resume
    python scripts/demo4d_prefix.py --report           # phases + artifacts

``--report`` additionally runs the evaluate/export stages over whatever
outputs exist so far (a spatial-round prefix fully denoises no target —
demo_4d needs all alternation rounds — so metrics/manifest cover the
saved intermediate outputs; the export manifest is the artifact VERDICT
asks to path-check).
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import logging

    # the sampler reports per-wave progress at INFO — without this a
    # multi-hour prefix run is silent until the end-of-budget summary
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s: %(message)s",
        datefmt="%H:%M:%S",
    )
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None)
    ap.add_argument("--out", default=osp.join(REPO, "runs", "d4d_4d_prefix_out"))
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--task-budget", type=int, default=24)
    ap.add_argument("--time-budget", type=float, default=None,
                    help="wall-clock budget in seconds: stop cleanly after "
                    "the first task that finishes past it (single-process)")
    ap.add_argument("--checkpoint-every", type=int, default=24,
                    help="intra-round grid-state cadence in tasks")
    ap.add_argument("--report", action="store_true",
                    help="skip sampling; dump progress + run metrics/export")
    args = ap.parse_args()
    if args.scene is None:
        args.scene = osp.join(REPO, "runs", f"d4d_4d_scene_{args.size}")

    from diffuman4d_tpu.utils.jax_setup import setup

    setup()
    import jax
    import numpy as np

    from diffuman4d_tpu.data.dataset import SpaTemDataset
    from diffuman4d_tpu.data.synthetic import make_synthetic_scene
    from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
    from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffuman4d_tpu.parallel.mesh import make_mesh
    from diffuman4d_tpu.sampling.loader import init_random_params
    from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline, SlidingConfig
    from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler
    from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig

    t0 = time.perf_counter()

    def mark(what):
        print(f"[prefix] {what}: {time.perf_counter() - t0:.1f}s", flush=True)

    if not osp.isfile(osp.join(args.scene, "0811_06", "transforms.json")):
        make_synthetic_scene(
            args.scene, "0811_06", num_cams=48, num_frames=150,
            image_size=args.size, unique_frames=4,
        )
        mark("scene rendered")

    unet = UNetMultiviewCondition(UNetConfig(), dtype=jax.numpy.bfloat16)
    vae = AutoencoderKL(VAEConfig(), dtype=jax.numpy.bfloat16)
    params = init_random_params(unet, vae, args.size, seed=0)
    mark("params init")

    dataset = SpaTemDataset(
        data_dir=args.scene, scene_label="0811_06",
        height=args.size, width=args.size,
        target_pixels=False,  # generation never reads target images
        skeletons_uint8=True,  # device-side [-1,1] normalize
    )
    # Cache budgets sized for THIS workload's reuse, not the defaults
    # (3072/512/1536 MB): within a spatial round every (cam, frame) cell
    # is visited exactly once, so big skeleton/pixel caches are pure HBM
    # pressure that fills over ~20 tasks and OOMed the first >16-task
    # session (r5, task ~30: RESOURCE_EXHAUSTED in wave prep). Temporal
    # rounds reuse only the 4 input-camera tracks (pix cache) and stream
    # skeletons per chunk anyway. pose_cache stays >= one spatial task's
    # whole-sequence features (48 rows x 10.5 MB) so the materialize
    # path keeps serving the spatial rounds.
    pipeline = Diffuman4DPipeline(
        unet, vae, Scheduler(SchedulerConfig(kind="ddim")), params,
        # temporal CFG halves run sequentially (lax.map): the fused
        # batch-48 wave program is temp 12.43 GB + args 2.07 GB and OOMs a
        # single v5e next to params + the 300-row skeleton stack (measured,
        # scripts/probe_temporal_mem.py; r5 chain session 5 failure)
        sliding=SlidingConfig(
            sliding_stride=2, split_cfg_domains=("temporal",)
        ),
        image_size=args.size,
        skel_cache_mb=512, pix_cache_mb=192, pose_cache_mb=640,
    )
    sampler = SlidingIterativeSampler(
        dataset, pipeline, output_dir=args.out,
        spa_label_range=(0, 48, 1), tem_label_range=(0, 150, 1),
        input_spa_labels=[1, 13, 25, 37],
        task_budget=None if args.report else args.task_budget,
        time_budget_s=None if args.report else args.time_budget,
        checkpoint_every_tasks=args.checkpoint_every,
    )
    done_rounds = sampler._completed_rounds
    done_tasks = sampler._resume_tasks_done
    mark(
        f"sampler ready: resume at round {done_rounds} + {done_tasks} tasks "
        f"({int((sampler.grid_t_idx > 0).sum())} grid cells in flight)"
    )

    if args.report:
        from diffuman4d_tpu.io.nerfstudio import export_to_nerfstudio

        rep = {
            "completed_rounds": done_rounds,
            "tasks_done_in_round": done_tasks,
            "cells_in_flight": int((sampler.grid_t_idx > 0).sum()),
            "cells_total": int(sampler.grid_t_idx.size),
            "state_path": sampler._state_path,
            "state_mb": round(osp.getsize(sampler._state_path) / 2**20, 1)
            if osp.isfile(sampler._state_path) else None,
        }
        try:
            ns = export_to_nerfstudio(
                scene_dir=osp.join(args.scene, "0811_06"),
                output_dir=args.out,
                input_spa_labels=sampler.input_spa_labels,
            )
            rep["nerfstudio_manifest"] = ns
        except Exception as e:  # prefix run: outputs may be partial
            rep["nerfstudio_manifest_error"] = str(e)[:200]
        print(json.dumps(rep), flush=True)
        return

    mesh = make_mesh()
    tt = time.perf_counter()
    sampler.execute_tasks_parallel(mesh, key=jax.random.PRNGKey(7))
    ran = sampler._tasks_run
    dt = time.perf_counter() - tt
    mark(
        f"executed {ran} tasks in {dt:.1f}s ({dt / max(ran, 1):.1f}s/task); "
        f"now at round {sampler._completed_rounds} "
        f"+ {int((sampler.grid_t_idx > 0).sum())} cells in flight"
    )
    if sampler._completed_rounds == len(sampler.all_tasks):
        # execute_tasks_parallel ran (and passed) the 7,200-image
        # completeness check before returning (sampling_utils.py:117-129)
        print("[prefix] SAMPLING COMPLETE: all rounds done, "
              "output grid complete", flush=True)
    from diffuman4d_tpu.utils.tracing import dump_report, report

    if report():
        dump_report(osp.join(args.out, "phases.json"))
        print(json.dumps({"phases": report()}), flush=True)


if __name__ == "__main__":
    main()
