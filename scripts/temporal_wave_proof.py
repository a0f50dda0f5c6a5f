"""On-chip proof that the demo_4d temporal WAVE program fits and runs
after the r5 OOM fix (split CFG halves + domain-boundary cache drop).

Context: r5 chain session 5 completed the full spatial round 1 (150/150
tasks, docs/chain_r5a/session_05.log) and then OOMed at the FIRST
temporal wave dispatch — the fused CFG batch-48 temporal sliding program
needs temp 12.43 GB + args 2.07 GB next to params and the skeleton stack
(scripts/probe_temporal_mem.py). The fix landed
(SlidingConfig.split_cfg_domains + cache drop at the domain switch,
commit 4d22eca) and the post-fix temporal round was observed running at
~360 s/task — but the machine was reset before that session's log was
committed, and the round-1 grid state lived in /tmp (gone).

This script re-proves the fix WITHOUT re-running the 3-hour spatial
round: it seeds a synthetic "round 1 complete" grid state — every target
cell at t_idx = steps_per_alt with its init noise as the latent, inputs
at 0, exactly the invariant the sampler checks at a round boundary
(sampler.py::_validate, mirroring pipeline_diffuman4d.py:480-487) — and
then executes N real temporal tasks through the production wave executor
on the chip. Latent VALUES are not the round-1 values (those are
unrecoverable), so outputs are numerically meaningless; what this proves
is the thing that failed: the temporal wave program's memory fit and its
per-task wall time at the production 48x150 shape.

State + outputs persist under runs/ (inside the repo checkout, which
survives machine resets; /tmp does not — learned r5).

    python scripts/temporal_wave_proof.py --task-budget 2
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def main() -> None:
    import logging

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s: %(message)s",
        datefmt="%H:%M:%S",
    )
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=osp.join(REPO, "runs", "d4d_4d_scene_1024"))
    ap.add_argument("--out", default=osp.join(REPO, "runs", "temporal_wave_proof"))
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--task-budget", type=int, default=2)
    ap.add_argument("--time-budget", type=float, default=None)
    args = ap.parse_args()

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

    def mark(what: str) -> None:
        print(f"[tproof] {what}: {time.perf_counter() - t0:.1f}s", flush=True)

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
        target_pixels=False, skeletons_uint8=True,
    )
    # identical pipeline config to scripts/demo4d_prefix.py (the chain)
    pipeline = Diffuman4DPipeline(
        unet, vae, Scheduler(SchedulerConfig(kind="ddim")), params,
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
        task_budget=args.task_budget,
        time_budget_s=args.time_budget,
        checkpoint_every_tasks=8,
    )

    if sampler._completed_rounds == 0 and sampler._resume_tasks_done == 0:
        # seed the synthetic round-1-complete state (see module docstring)
        spa = pipeline.sliding.steps_per_alt
        input_rows = [sampler._spa_index[s] for s in sampler.input_spa_labels]
        t_idx = np.full(sampler.grid_t_idx.shape, spa, np.int32)
        t_idx[input_rows, :] = 0
        sampler.grid_t_idx = t_idx
        sampler._completed_rounds = 1
        mark(
            f"seeded synthetic round-1 state: {int((t_idx > 0).sum())} "
            f"target cells at t_idx={spa}"
        )
    else:
        mark(
            f"resuming real proof state: round {sampler._completed_rounds}"
            f" + {sampler._resume_tasks_done} tasks"
        )

    mesh = make_mesh()
    tt = time.perf_counter()
    sampler.execute_tasks_parallel(mesh, key=jax.random.PRNGKey(7))
    ran = sampler._tasks_run
    dt = time.perf_counter() - tt
    mark(
        f"TEMPORAL WAVES OK: {ran} temporal tasks in {dt:.1f}s "
        f"({dt / max(ran, 1):.1f}s/task) at the production 48x150 shape"
    )
    from diffuman4d_tpu.utils.tracing import report

    print(json.dumps({"tasks": ran, "wall_s": round(dt, 1),
                      "phases": report()}), flush=True)


if __name__ == "__main__":
    main()
