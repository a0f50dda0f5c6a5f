"""Training loop driver: steps, checkpointing, metrics.

Completes the training subsystem (the reference ships none): alternating
spatial/temporal window batches from :class:`WindowBatcher`, the jitted
train step from :mod:`trainer`, orbax parameter checkpoints every
``checkpoint_every`` steps, and a JSONL metrics log.

Usage::

    python -m diffuman4d_tpu.training.loop data_dir=<scene tree> \
        scene_label=<scene> steps=1000 batch_size=2
"""

from __future__ import annotations

import json
import logging
import os
import os.path as osp
import time
from dataclasses import dataclass

import numpy as np

log = logging.getLogger(__name__)


@dataclass
class LoopConfig:
    steps: int = 1000
    batch_size: int = 1
    window_size: int = 12
    checkpoint_every: int = 500
    log_every: int = 10
    out_dir: str = "./runs/train"
    seed: int = 0
    # alternate spatial/temporal batches like the sampler's rounds
    domains: tuple[str, ...] = ("spatial", "temporal")


def train(pipeline, batcher, loop_cfg: LoopConfig, train_cfg=None, mesh=None):
    """Run the loop. ``pipeline`` provides VAE encoding + the UNet module;
    gradients update the UNet only (the VAE stays frozen, as in SD
    fine-tuning)."""
    import jax

    from diffuman4d_tpu.training.data import encode_training_batch
    from diffuman4d_tpu.training.trainer import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    train_cfg = train_cfg or TrainConfig()
    os.makedirs(loop_cfg.out_dir, exist_ok=True)
    metrics_path = osp.join(loop_cfg.out_dir, "metrics.jsonl")

    steps = {
        d: jax.jit(make_train_step(pipeline.unet, pipeline.base_scheduler, train_cfg, d))
        for d in loop_cfg.domains
    }
    state = create_train_state(pipeline.params["unet"], train_cfg)

    # host-offloaded EMA: the single-chip fit when the fp32 shadow does
    # not fit HBM next to the step (TRAIN_r04.json ema tier OOM)
    host_ema = None
    if train_cfg.ema_decay and train_cfg.ema_host:
        from diffuman4d_tpu.training.ema import HostEMA

        host_ema = HostEMA(
            state.params["params"], train_cfg.ema_decay,
            update_every=getattr(train_cfg, "ema_update_every", 1),
        )

    # resume: restore the FULL train state (params + optimizer moments +
    # step + EMA) from the newest state checkpoint, if any
    start_step = 0
    latest = _latest_state_dir(loop_cfg.out_dir)
    if latest is not None:
        state = _restore_state(latest, state, host_ema)
        start_step = int(state.step)
        log.info("resumed train state at step %d from %s", start_step, latest)

    rng = np.random.default_rng(loop_cfg.seed + start_step)
    key = jax.random.fold_in(jax.random.PRNGKey(loop_cfg.seed), start_step)
    t0 = time.time()
    with open(metrics_path, "a") as mf:
        for step_i in range(start_step, loop_cfg.steps):
            domain = loop_cfg.domains[step_i % len(loop_cfg.domains)]
            raw = batcher.make_batch(rng, loop_cfg.batch_size, domain)
            key, k_enc, k_step = jax.random.split(key, 3)
            batch = encode_training_batch(pipeline, raw, k_enc)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                shard = NamedSharding(mesh, P("data"))
                batch = jax.tree.map(lambda x: jax.device_put(x, shard), batch)
            state, metrics = steps[domain](state, batch, k_step)
            if host_ema is not None:
                # dispatch first (async), THEN fold the params staged after
                # the previous step — the multi-GB fp32 host fold overlaps
                # device compute. Safe because these steps don't donate
                # their input state; a donating step (train_step_chip.py)
                # must fold before dispatch instead (see ema.py docstring).
                host_ema.fold()
                if host_ema.should_update(step_i):
                    host_ema.stage(state.params["params"])

            if step_i % loop_cfg.log_every == 0:
                rec = {
                    "step": int(metrics["step"]),
                    "domain": domain,
                    "loss": float(metrics["loss"]),
                    "grad_norm": float(metrics["grad_norm"]),
                    "elapsed_s": round(time.time() - t0, 1),
                }
                mf.write(json.dumps(rec) + "\n")
                mf.flush()
                log.info("train %s", rec)

            if (step_i + 1) % loop_cfg.checkpoint_every == 0 or step_i == loop_cfg.steps - 1:
                from diffuman4d_tpu.io.checkpoints import save_native

                if host_ema is not None:
                    host_ema.fold()  # include this step's staged params
                n = int(metrics["step"])
                # inference-ready params (EMA when enabled, like SD releases)
                if host_ema is not None:
                    infer = {"params": host_ema.materialize()}
                elif state.ema_params is not None:
                    infer = {"params": state.ema_params}
                else:
                    infer = state.params
                save_native(osp.join(loop_cfg.out_dir, f"ckpt_{n:07d}"),
                            {"unet": infer})
                # full resumable state
                save_native(osp.join(loop_cfg.out_dir, f"state_{n:07d}"),
                            _state_to_tree(state, host_ema))
                log.info("checkpoint written at step %d", n)
    if host_ema is not None:
        host_ema.fold()
    return state


def _state_to_tree(state, host_ema=None) -> dict:
    tree = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if host_ema is not None:
        tree["ema_params"] = host_ema.materialize()
    elif state.ema_params is not None:
        tree["ema_params"] = state.ema_params
    return tree


def _latest_state_dir(out_dir: str):
    if not osp.isdir(out_dir):
        return None
    cands = sorted(d for d in os.listdir(out_dir) if d.startswith("state_"))
    return osp.join(out_dir, cands[-1]) if cands else None


def _restore_state(path: str, template, host_ema=None):
    """Orbax restore with the live state as the structure/sharding target.
    With a host EMA, the shadow restores into it (host numpy) and the
    device TrainState carries no EMA."""
    import orbax.checkpoint as ocp

    from diffuman4d_tpu.training.trainer import TrainState

    ckptr = ocp.StandardCheckpointer()
    tree = _state_to_tree(template, host_ema)
    try:
        restored = ckptr.restore(osp.abspath(path), tree)
    except Exception:
        # a checkpoint written before EMA was enabled has no ema_params;
        # restore without it and seed the shadow from the params instead
        # (otherwise orbax raises an opaque structure-mismatch error)
        if "ema_params" not in tree:
            raise
        tree.pop("ema_params")
        restored = ckptr.restore(osp.abspath(path), tree)
        restored["ema_params"] = None
        log.info(
            "state checkpoint %s lacks ema_params — seeding the EMA "
            "shadow from the restored params", path,
        )
    if host_ema is not None:
        host_ema.load(
            restored["ema_params"]
            if restored.get("ema_params") is not None
            else restored["params"]["params"]
        )
    return TrainState(
        restored["params"], restored["opt_state"], restored["step"],
        None if host_ema is not None else restored.get("ema_params"),
    )


def main(argv=None) -> int:
    import sys

    logging.basicConfig(level=logging.INFO)
    kv = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))

    from diffuman4d_tpu.configs.presets import DataConfig, ModelConfig, SamplerConfig
    from diffuman4d_tpu.data.dataset import SpaTemDataset
    from diffuman4d_tpu.sampling.loader import load_pipeline
    from diffuman4d_tpu.training.data import WindowBatcher, WindowBatcherConfig
    from diffuman4d_tpu.utils.jax_setup import setup

    setup()
    data_cfg = DataConfig(
        data_dir=kv.get("data_dir", "./data"),
        scene_label=kv.get("scene_label", ""),
        height=int(kv.get("height", 1024)),
        width=int(kv.get("width", 1024)),
    )
    model_cfg = ModelConfig(
        model_dir=kv.get("model_dir", "./models/diffuman4d"),
        arch=kv.get("arch", "full"),
        dtype=kv.get("dtype", "bf16"),
    )
    dataset = SpaTemDataset(
        data_dir=data_cfg.data_dir,
        scene_label=data_cfg.scene_label,
        height=data_cfg.height,
        width=data_cfg.width,
    )
    pipeline = load_pipeline(model_cfg, SamplerConfig(), data_cfg)
    loop_cfg = LoopConfig(
        steps=int(kv.get("steps", 1000)),
        batch_size=int(kv.get("batch_size", 1)),
        window_size=int(kv.get("window_size", 12)),
        out_dir=kv.get("out_dir", "./runs/train"),
    )
    batcher = WindowBatcher(
        dataset,
        WindowBatcherConfig(
            window_size=loop_cfg.window_size,
            tem_labels=sorted(
                set(
                    f.split(".")[0]
                    for d in os.listdir(osp.join(dataset.data_dir, dataset.scene_label, "images"))
                    for f in os.listdir(
                        osp.join(dataset.data_dir, dataset.scene_label, "images", d)
                    )
                )
            ),
            input_spa_labels=kv.get("input_spa_labels", "01,13,25,37").split(","),
        ),
    )
    train(pipeline, batcher, loop_cfg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
