"""Real training-run evidence on the chip (VERDICT r4 next-item #5).

Not a step timing: a multi-hundred-step run of the production training
loop (training/loop.py — the same code path users get) on the full
0.87B UNet with the synthetic window batcher, demonstrating
  * a decreasing loss curve (metrics.jsonl),
  * the host-offloaded fp32 EMA tier active on-chip (staged D2H folds
    overlapped with compute),
  * a process restart mid-run resuming from the orbax full-state
    checkpoint (params + optimizer moments + step + EMA shadow).

The restart is a clean two-session resume, not a SIGKILL: killing a
python process mid-TPU-compile/execute wedges this environment's shared
compile relay for a long time (CLAUDE.md), so the kill-while-idle
equivalent — exit after a checkpoint, fresh process, resume — is the
safe restart proof here (the orbax state it restores is byte-identical
either way).

Usage:
    python scripts/train_run_chip.py --steps 120            # session 1
    python scripts/train_run_chip.py --steps 300            # resume + finish
    python scripts/train_run_chip.py --report               # summarize

Defaults keep step time ~1-2 s (full-width 0.87B UNet, window 6 at
512^2 images -> 64^2 latents) so a loss curve costs minutes, not hours;
the full 12-frame @128^2 step timing tiers live in TRAIN_r0*.json
(scripts/train_step_chip.py).
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def summarize(out_dir: str) -> dict:
    path = osp.join(out_dir, "metrics.jsonl")
    recs = []
    if osp.isfile(path):
        with open(path) as f:
            recs = [json.loads(ln) for ln in f if ln.strip()]
    if not recs:
        return {"error": "no metrics yet"}
    first, last = recs[0], recs[-1]
    k = max(1, len(recs) // 5)
    head = sum(r["loss"] for r in recs[:k]) / k
    tail = sum(r["loss"] for r in recs[-k:]) / k
    import os

    states = sorted(
        d for d in os.listdir(out_dir) if d.startswith("state_")
    ) if osp.isdir(out_dir) else []
    return {
        "steps_logged": len(recs),
        "first_step": first["step"],
        "last_step": last["step"],
        "loss_first5th_mean": round(head, 4),
        "loss_last5th_mean": round(tail, 4),
        "loss_decreased": tail < head,
        "loss_series_every10": [
            round(r["loss"], 4) for r in recs if r["step"] % 10 == 0
        ][:60],
        "domains_logged": sorted({r.get("domain", "?") for r in recs}),
        "state_checkpoints": states,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--checkpoint-every", type=int, default=60)
    ap.add_argument("--out", default=osp.join(REPO, "runs", "d4d_train_run"))
    ap.add_argument("--scene", default=None)
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args()
    if args.report:
        print(json.dumps(summarize(args.out)))
        return
    if args.scene is None:
        args.scene = osp.join(REPO, "runs", f"d4d_train_scene_{args.size}")

    import logging

    logging.basicConfig(level=logging.INFO)

    from diffuman4d_tpu.utils.jax_setup import setup

    setup()
    import jax

    from diffuman4d_tpu.data.dataset import SpaTemDataset
    from diffuman4d_tpu.data.synthetic import make_synthetic_scene
    from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
    from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffuman4d_tpu.sampling.loader import init_random_params
    from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline, SlidingConfig
    from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig
    from diffuman4d_tpu.training.data import WindowBatcher, WindowBatcherConfig
    from diffuman4d_tpu.training.loop import LoopConfig, train
    from diffuman4d_tpu.training.trainer import TrainConfig

    t0 = time.perf_counter()
    if not osp.isfile(osp.join(args.scene, "0811_06", "transforms.json")):
        make_synthetic_scene(
            args.scene, "0811_06", num_cams=12, num_frames=8,
            image_size=args.size, unique_frames=4,
        )
        print(f"[train_run] scene rendered: {time.perf_counter()-t0:.1f}s")

    # full-width 0.87B UNet (production config); bf16 compute
    unet = UNetMultiviewCondition(UNetConfig(), dtype=jax.numpy.bfloat16)
    vae = AutoencoderKL(VAEConfig(), dtype=jax.numpy.bfloat16)
    params = init_random_params(unet, vae, args.size, seed=0)
    print(f"[train_run] params init: {time.perf_counter()-t0:.1f}s")

    dataset = SpaTemDataset(
        data_dir=args.scene, scene_label="0811_06",
        height=args.size, width=args.size, skeletons_uint8=True,
    )
    pipeline = Diffuman4DPipeline(
        unet, vae, Scheduler(SchedulerConfig(kind="ddim")), params,
        sliding=SlidingConfig(), image_size=args.size,
    )
    batcher = WindowBatcher(
        dataset,
        WindowBatcherConfig(
            window_size=args.frames,
            tem_labels=[f"{i:06d}" for i in range(8)],
            input_spa_labels=["01", "05", "09"],
        ),
    )
    tcfg = TrainConfig(
        learning_rate=args.lr,
        optimizer="adafactor",
        ema_decay=0.999,
        ema_host=True,  # the single-chip EMA tier (training/ema.py)
        # spaced staging: this environment's relay moves the 3.23 GB fp32
        # shadow at ~20 MB/s, so per-step staging costs ~160 s/step
        # (measured, /tmp/train_block/loss_run1.log r5) — the d^k-corrected
        # every-25 update keeps EMA active at ~0.26 s/step amortized
        ema_update_every=25,
        remat=True,
    )
    lcfg = LoopConfig(
        steps=args.steps,
        batch_size=1,
        window_size=args.frames,
        checkpoint_every=args.checkpoint_every,
        # odd stride: an even log_every aliases with the 2-domain
        # alternation and only ever logs spatial steps (r5 loss run 1)
        log_every=3,
        out_dir=args.out,
    )
    t1 = time.perf_counter()
    train(pipeline, batcher, lcfg, tcfg)
    dt = time.perf_counter() - t1
    rep = summarize(args.out)
    rep["session_wall_s"] = round(dt, 1)
    print("[train_run] " + json.dumps(rep))


if __name__ == "__main__":
    main()
