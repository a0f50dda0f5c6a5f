"""Pre-warm the persistent compile cache for the training-block programs
while the chip runs sampling: lowering uses abstract ShapeDtypeStructs
(zero HBM) and compilation happens on the remote compile service, so
this can run concurrently with a sampling chain without stealing the
device. The later real runs (scripts/train_step_chip.py,
scripts/train_run_chip.py) then hit the cache instead of paying a
multi-minute compile inside their measured windows.

Usage: python scripts/precompile_train.py [--which f12,loss]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from diffuman4d_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp

from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig
from diffuman4d_tpu.training.trainer import (
    TrainConfig,
    create_train_state,
    make_train_step,
)


def _sds(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
    )


def precompile_step(frames: int, hw: int, optimizer: str, ema_host: bool,
                    domains=("spatial",), donate: bool = True) -> None:
    L = frames
    unet = UNetMultiviewCondition(
        UNetConfig(), dtype=jnp.bfloat16, attn_implementation="train"
    )
    key = jax.random.PRNGKey(0)
    params_shape = jax.eval_shape(
        lambda: unet.init(
            key,
            jnp.zeros((2, hw, hw, 11), jnp.bfloat16),
            jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, hw * 8, hw * 8, 3), jnp.bfloat16),
            num_frames=2,
        )
    )
    tcfg = TrainConfig(
        learning_rate=1e-5, remat=True,
        ema_decay=0.999 if ema_host else 0.0, ema_host=ema_host,
        optimizer=optimizer,
    )
    state_shape = jax.eval_shape(lambda p: create_train_state(p, tcfg),
                                 params_shape)
    B = 1
    batch_shape = {
        "latents_x0": jax.ShapeDtypeStruct((B, L, hw, hw, 4), jnp.bfloat16),
        "plucker": jax.ShapeDtypeStruct((B, L, hw, hw, 6), jnp.bfloat16),
        "skeletons": jax.ShapeDtypeStruct(
            (B, L, hw * 8, hw * 8, 3), jnp.bfloat16
        ),
        "is_cond": jax.ShapeDtypeStruct((B, L), jnp.bool_),
    }
    key_shape = jax.ShapeDtypeStruct((2,), jnp.uint32)
    for domain in domains:
        step = make_train_step(unet, Scheduler(SchedulerConfig()), tcfg, domain)
        t0 = time.perf_counter()
        jax.jit(step, donate_argnums=0 if donate else ()).lower(
            state_shape, batch_shape, key_shape
        ).compile()
        print(
            f"compiled train step f{L}@{hw}^2 {optimizer}"
            f"{'+ema_host' if ema_host else ''} {domain} "
            f"(donate={donate}): {time.perf_counter() - t0:.1f}s",
            flush=True,
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="f12,f12ema,loss")
    args = ap.parse_args()
    which = set(args.which.split(","))
    if "f12" in which:
        # train_step_chip.py: full production shape, donated state
        precompile_step(12, 128, "adafactor", ema_host=False)
    if "f12ema" in which:
        precompile_step(12, 128, "adafactor", ema_host=True)
    if "loss" in which:
        # train_run_chip.py: loop steps are NOT donated; both domains
        precompile_step(6, 64, "adafactor", ema_host=True,
                        domains=("spatial", "temporal"), donate=False)
    print("precompile done")


if __name__ == "__main__":
    main()
