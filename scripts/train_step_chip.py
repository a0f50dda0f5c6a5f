"""Production-scale training step on the real chip (VERDICT r2 item 5).

One optimizer step of the FULL 0.87B UNet (bf16 compute, fp32 Adam
state, remat on) at the reference's training shape — window of 12 frames
at 128^2 latents with skeleton conditioning — measuring compile time,
per-step wall time, and device HBM. This is the measurement that backs
the README's training claim; toy-shape tests cover correctness, this
covers fit + speed.

Usage: python scripts/train_step_chip.py [--frames 12] [--steps 3]
Prints one JSON line.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from diffuman4d_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp
import numpy as np


def hbm_gb():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats.get("bytes_in_use", 0) / 2**30, 2), round(
            stats.get("peak_bytes_in_use", 0) / 2**30, 2
        )
    except Exception:
        return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--steps", type=int, default=3)
    # adafactor: Adam's fp32 p+g+m+v is 13.9 GB for 0.87B params — more
    # than one v5e's HBM before activations; pods shard Adam over dp
    ap.add_argument("--optimizer", default="adafactor")
    ap.add_argument("--ema", nargs="?", const="device", default="",
                    choices=["", "device", "host"],
                    help="fp32 EMA shadow: 'device' keeps it in HBM "
                    "(+3.5 GB at 0.87B — proven NOT to fit the 12-frame "
                    "window, TRAIN_r04.json); 'host' offloads it to host "
                    "memory with async D2H staging (training/ema.py)")
    ap.add_argument("--out", default="TRAIN_r04.json",
                    help="append the JSON record to this file as a tier "
                    "list ('' to skip)")
    ap.add_argument("--tag", default="",
                    help="tier name in the --out list (replaces an "
                    "existing record with the same tag)")
    # The fused Pallas conv (ops/conv.py) is an inference kernel; its
    # custom-VJP backward adds ~0.4 GB of HLO temps at the 12-frame
    # window (16.1 GB > the 15.75 GB HBM that the pure-XLA-conv train
    # step fits in). Training perf is conv-light anyway (attention
    # dominates), so default it off here; pass --pallas-conv to A/B.
    ap.add_argument("--pallas-conv", action="store_true")
    ap.add_argument("--attn", default="train", choices=["train", "bundled"],
                    help="'train' = the differentiable local Pallas flash "
                    "family (ops/flash_backward.py, tuned fwd + hand-written "
                    "dq/dk/dv); 'bundled' = jax's kernel (the r4 baseline)")
    args = ap.parse_args()
    if not args.pallas_conv:
        import os

        os.environ["D4D_PALLAS_CONV"] = "0"

    from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
    from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig
    from diffuman4d_tpu.training.trainer import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    L, hw = args.frames, 128
    # "train": the differentiable local Pallas flash family (r5 — the
    # tuned forwards finally have a hand-written backward); "bundled"
    # (jax's kernel, ~70 TF/s fwd) remains the A/B baseline. The plain
    # XLA path materializes 343 GB of scores at the 3D shapes.
    unet = UNetMultiviewCondition(
        UNetConfig(), dtype=jnp.bfloat16, attn_implementation=args.attn
    )
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    params = unet.init(
        key,
        jnp.zeros((2, hw, hw, 11), jnp.bfloat16),
        jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, hw * 8, hw * 8, 3), jnp.bfloat16),
        num_frames=2,
    )
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"init: {n_params/1e9:.3f}B params, {time.perf_counter()-t0:.1f}s",
          flush=True)

    tcfg = TrainConfig(learning_rate=1e-5, remat=True,
                       ema_decay=0.999 if args.ema else 0.0,
                       ema_host=args.ema == "host",
                       optimizer=args.optimizer,
                       attn_implementation=args.attn)
    state = create_train_state(params, tcfg)
    host_ema = None
    if args.ema == "host":
        from diffuman4d_tpu.training.ema import HostEMA

        t_ema = time.perf_counter()
        host_ema = HostEMA(state.params["params"], tcfg.ema_decay)
        print(f"host EMA shadow: {host_ema.nbytes/2**30:.2f} GB on host, "
              f"init pull {time.perf_counter()-t_ema:.1f}s", flush=True)
    step = jax.jit(make_train_step(unet, Scheduler(SchedulerConfig()), tcfg),
                   donate_argnums=0)

    rng = np.random.default_rng(0)
    B = 1
    batch = {
        "latents_x0": jnp.asarray(
            rng.normal(size=(B, L, hw, hw, 4)) * 0.2, jnp.bfloat16
        ),
        "plucker": jnp.asarray(
            rng.uniform(-1, 1, (B, L, hw, hw, 6)), jnp.bfloat16
        ),
        "skeletons": jnp.asarray(
            rng.uniform(-1, 1, (B, L, hw * 8, hw * 8, 3)), jnp.bfloat16
        ),
        "is_cond": jnp.asarray([[True] * (L // 3) + [False] * (L - L // 3)] * B),
    }

    ema_suffix = {"": "", "device": "_ema", "host": "_emahost"}[args.ema]
    attn_suffix = "" if args.attn == "train" else f"_{args.attn}"
    tier = args.tag or f"{args.optimizer}{ema_suffix}{attn_suffix}_f{args.frames}"

    def emit(record):
        record = {"tier": tier, **record}
        print(json.dumps(record), flush=True)
        if args.out:
            try:
                with open(args.out) as f:
                    existing = json.load(f)
                tiers = existing if isinstance(existing, list) else [existing]
            except (OSError, ValueError):
                tiers = []
            tiers = [t for t in tiers if t.get("tier") != tier] + [record]
            with open(args.out, "w") as f:
                json.dump(tiers, f, indent=2)

    ema_desc = {"": "", "device": "+fp32-ema", "host": "+host-ema"}[args.ema]
    t0 = time.perf_counter()
    try:
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        if host_ema is not None:
            host_ema.stage(state.params["params"])
        loss0 = float(metrics["loss"])  # blocks
    except Exception as e:  # noqa: BLE001 — record HBM OOM as a result
        msg = str(e)
        if "memory" not in msg.lower() and "hbm" not in msg.lower():
            raise
        import re

        m = re.search(r"Used ([0-9.]+)G of ([0-9.]+)G hbm", msg)
        emit({
            "metric": "train_step_sec",
            "value": None,
            "oom": True,
            "unit": f"0.87B UNet bf16 remat, {args.optimizer}"
            f"{ema_desc}, batch {B}x{L}@128^2"
            " latents — does NOT fit one 16 GB v5e",
            "hbm_required_gb": float(m.group(1)) if m else None,
            "hbm_capacity_gb": float(m.group(2)) if m else None,
            "params_b": round(n_params / 1e9, 3),
        })
        return
    compile_s = time.perf_counter() - t0
    used0, peak0 = hbm_gb()
    print(f"compile+first step: {compile_s:.1f}s, loss {loss0:.4f}, "
          f"hbm used/peak {used0}/{peak0} GB", flush=True)

    times = []
    fold_times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        if host_ema is not None:
            # fold the previous step's staged params; its D2H has been in
            # flight since that step completed, and blocking here makes the
            # subsequent donation of the staged buffers safe
            tf = time.perf_counter()
            host_ema.fold()
            fold_times.append(time.perf_counter() - tf)
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
        if host_ema is not None:
            host_ema.stage(state.params["params"])
        loss = float(metrics["loss"])  # forces completion
        times.append(time.perf_counter() - t0)
    if host_ema is not None:
        host_ema.fold()
    used, peak = hbm_gb()
    step_s = min(times)

    # MFU from the compiler's own cost model (AOT cost analysis of the
    # exact executable, remat recompute included), against the v5e bf16
    # peak of 197 TF/s.
    flops = None
    mfu = None
    try:
        ca = step.lower(state, batch, jax.random.PRNGKey(1)).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            mfu = flops / step_s / 197e12
    except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
        print(f"cost_analysis unavailable: {e}", flush=True)

    record = {
        "metric": "train_step_sec",
        "value": round(step_s, 3),
        "unit": f"sec/step, 0.87B UNet bf16 remat, {args.optimizer}"
        f"{ema_desc}, batch {B}x{L}@128^2 latents",
        "params_b": round(n_params / 1e9, 3),
        "loss": loss,
        "compile_s": round(compile_s, 1),
        "hbm_used_gb": used,
        "hbm_peak_gb": peak,
        "all_steps_s": [round(t, 3) for t in times],
        "cost_model_tflop_per_step": round(flops / 1e12, 1) if flops else None,
        "mfu_vs_197tf_bf16": round(mfu, 3) if mfu else None,
    }
    if host_ema is not None:
        record["ema_host_gb"] = round(host_ema.nbytes / 2**30, 2)
        # fold blocks on the staged D2H + does the fp32 host accumulate;
        # this is the EMA's serialized cost per step (the transfer itself
        # overlaps whatever host work runs between stage and fold)
        record["ema_fold_s"] = [round(t, 3) for t in fold_times]
    emit(record)


if __name__ == "__main__":
    main()
