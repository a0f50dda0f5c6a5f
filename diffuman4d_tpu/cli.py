"""CLI entry point (reference: inference.py:18-47).

Usage mirrors the reference's Hydra surface:

    python -m diffuman4d_tpu.cli exp=demo_4d data.scene_label=0811_06 \
        data.data_dir=./data/dna_rendering model.model_dir=./models/diffuman4d

Flags ``sampling`` / ``to_nerfstudio`` / ``evaluating`` select the stages
(configs/test.yaml:18-20)."""

from __future__ import annotations

import logging
import os
import os.path as osp
import sys
import time

from diffuman4d_tpu.configs.presets import build_config, config_tree

log = logging.getLogger("diffuman4d_tpu")


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(
        level=logging.INFO, format="[%(asctime)s][%(name)s][%(levelname)s] %(message)s"
    )
    argv = sys.argv[1:] if argv is None else argv
    # platform=cpu|tpu must be applied before any backend initializes (this
    # image's sitecustomize pins JAX_PLATFORMS=axon, so env vars don't work)
    platform = [a.split("=", 1)[1] for a in argv if a.startswith("platform=")]
    argv = [a for a in argv if not a.startswith("platform=")]
    if platform:
        import jax

        jax.config.update("jax_platforms", platform[0])
    from diffuman4d_tpu.utils.jax_setup import setup as _jax_setup

    _jax_setup()
    # multi-host (TPU pod) runs: env-driven, no-op on a single host
    from diffuman4d_tpu.parallel.distributed import initialize as _dist_init

    _dist_init()
    cfg = build_config(argv)
    print(config_tree(cfg))

    os.makedirs(cfg.sampler.output_dir, exist_ok=True)
    with open(osp.join(cfg.sampler.output_dir, "config_tree.log"), "w") as f:
        f.write(config_tree(cfg))
    # per-run job.log (reference: hydra colorlog job.log, configs/hydra/
    # default.yaml:4-19)
    fh = logging.FileHandler(osp.join(cfg.sampler.output_dir, "job.log"))
    fh.setFormatter(
        logging.Formatter("[%(asctime)s][%(name)s][%(levelname)s] %(message)s")
    )
    logging.getLogger().addHandler(fh)

    from diffuman4d_tpu.data.dataset import SpaTemDataset
    from diffuman4d_tpu.sampling.loader import load_pipeline
    from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler

    dataset = SpaTemDataset(
        data_dir=cfg.data.data_dir,
        camera_path_pat=cfg.data.camera_path_pat,
        image_path_pat=cfg.data.image_path_pat,
        fmask_path_pat=cfg.data.fmask_path_pat,
        skeleton_path_pat=cfg.data.skeleton_path_pat,
        scene_label=cfg.data.scene_label,
        height=cfg.data.height,
        width=cfg.data.width,
        has_gt_target=cfg.data.has_gt_target,
        # generation consumes skeletons as u8 on device either way
        # (pipeline._skel_norm_j); skip the host fp round-trip
        skeletons_uint8=True,
    )
    pipeline = load_pipeline(cfg.model, cfg.sampler, cfg.data)
    sampler = SlidingIterativeSampler(
        dataset,
        pipeline,
        output_dir=cfg.sampler.output_dir,
        spa_label_range=cfg.sampler.spa_label_range,
        tem_label_range=cfg.sampler.tem_label_range,
        spa_labels=cfg.sampler.spa_labels,
        tem_labels=cfg.sampler.tem_labels,
        input_spa_labels=cfg.sampler.input_spa_labels,
        seed=cfg.sampler.seed,
        save_debug_grids=cfg.sampler.save_debug_grids,
    )

    from diffuman4d_tpu.sampling.runner import SamplingRunner

    runner = SamplingRunner(sampler)

    if cfg.sampling:
        t0 = time.time()
        runner.inference()
        log.info("sampling finished in %.1fs", time.time() - t0)

    if cfg.to_nerfstudio:
        runner.to_nerfstudio(
            osp.join(osp.expandvars(cfg.data.data_dir), cfg.data.scene_label)
        )

    if cfg.evaluating:
        metrics = runner.evaluate(
            data_dir=osp.expandvars(cfg.data.data_dir),
            scene_label=cfg.data.scene_label,
        )
        log.info("metrics mean: %s", metrics["mean"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
