"""Training: denoising-loss train step for the spatio-temporal UNet.

The reference is inference-only — no training loop ships with it
(SURVEY §1: "inference-only"). This module makes training a first-class
capability of the TPU framework: fine-tuning / warm-up training of the
multiview UNet with the paper's conditioning scheme.

Objective: standard diffusion noise prediction on window sequences.
A batch element is one window (inputs + targets, like inference):
  * one timestep per element, shared by its target frames (matching the
    inference contract where a window's targets share a timestep)
  * conditional rows are fed clean latents at t=0 (the "cond-row
    replacement" of pipeline_diffuman4d.py:378-379)
  * loss is MSE on target rows only, for epsilon or v-prediction targets

Parallelism: pjit over a ("data", "model") mesh — batch on data
(dp), large kernels sharded on model (tp via GSPMD). The zero-init
temporal head and pose encoder keep their warm-up semantics
(unet_multiview_condition.py:253-270).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from diffuman4d_tpu.models.unet import UNetMultiviewCondition
from diffuman4d_tpu.schedulers.diffusion import Scheduler


@dataclass
class TrainConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 1e-2
    b1: float = 0.9
    b2: float = 0.999
    grad_clip: float = 1.0
    prediction_type: str = "epsilon"  # epsilon | v_prediction
    remat: bool = True  # rematerialize the UNet to trade FLOPs for HBM
    # adamw | adafactor — adafactor's factored state fits the 0.87B model
    # on ONE 16 GB chip (Adam's fp32 p+g+m+v alone is 13.9 GB); adamw is
    # the default for pods where dp shards the optimizer state
    optimizer: str = "adamw"
    # LR schedule: constant | cosine (linear warmup in both cases)
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    total_steps: int = 100_000  # cosine horizon
    # exponential moving average of params; 0 disables (SD fine-tunes
    # conventionally sample from the EMA weights)
    ema_decay: float = 0.0
    # the shadow is deliberately fp32-only: at decay 0.999 the per-step
    # delta 0.001*(p - e) sits far below a bf16 shadow's ulp, so a
    # low-precision EMA silently freezes. At 0.87B that is +3.5 GB —
    # fits one 16 GB v5e up to ~8-frame windows (TRAIN_r04.json); the
    # 12-frame window with EMA needs dp-sharded state (pods)
    # ema_host: keep the fp32 shadow in HOST memory instead of HBM
    # (training.ema.HostEMA) — the single-chip fit for ema_decay>0 at the
    # 12-frame window; the device train step then carries no EMA state
    ema_host: bool = False
    # spaced host-EMA updates: stage/fold every k-th step with the
    # d^k-corrected decay (training.ema.HostEMA update_every). On hosts
    # with slow D2H (this environment's relay moves the 3.23 GB shadow at
    # ~20 MB/s => ~160 s/step per-step staging, TRAIN_r05 ema tier) this
    # is the difference between EMA costing ~0 and dominating the step
    ema_update_every: int = 1
    # attention implementation for the training forward/backward. "train"
    # = the differentiable Pallas kernel family (ops/flash_backward.py:
    # tuned transposed-score forward + hand-written dq/dk/dv — the
    # inference-tuned kernels have no VJP, and jax's bundled kernel runs
    # ~70 TF/s fwd vs 103-112 tuned); falls back to XLA off-TPU. None
    # keeps the UNet module's own setting.
    attn_implementation: str | None = "train"


class TrainState:
    """Minimal pytree train state (params, optimizer, step, optional EMA)."""

    def __init__(self, params, opt_state, step, ema_params=None):
        self.params = params
        self.opt_state = opt_state
        self.step = step
        self.ema_params = ema_params

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step, self.ema_params), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


jax.tree_util.register_pytree_node_class(TrainState)


def make_lr_schedule(cfg: TrainConfig):
    if cfg.lr_schedule == "constant":
        if cfg.warmup_steps:
            return optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
        return cfg.learning_rate
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, max(cfg.warmup_steps, 1), cfg.total_steps
        )
    raise ValueError(f"unknown lr_schedule: {cfg.lr_schedule}")


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.optimizer == "adamw":
        opt = optax.adamw(
            make_lr_schedule(cfg), b1=cfg.b1, b2=cfg.b2,
            weight_decay=cfg.weight_decay,
        )
    elif cfg.optimizer == "adafactor":
        # factored second moment: optimizer state ~ O(rows+cols) instead of
        # 2x fp32 per param. Adam's full state for the 0.87B UNet is
        # 13.9 GB (fp32 p+g+m+v) — more than one v5e's 15.75 GB HBM before
        # activations; Adafactor is the standard TPU answer on one chip
        # (multi-chip dp shards Adam state instead).
        opt = optax.adafactor(
            make_lr_schedule(cfg), weight_decay_rate=cfg.weight_decay or None
        )
    else:
        raise ValueError(cfg.optimizer)
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)


def create_train_state(params, cfg: TrainConfig) -> TrainState:
    opt = make_optimizer(cfg)
    ema = (
        jax.tree.map(jnp.copy, params["params"])
        if cfg.ema_decay and not cfg.ema_host
        else None
    )
    return TrainState(
        params, opt.init(params["params"]), jnp.zeros((), jnp.int32), ema
    )


def diffusion_loss(
    unet: UNetMultiviewCondition,
    scheduler: Scheduler,
    cfg: TrainConfig,
    params,
    batch: dict,
    key: jax.Array,
    domain: str,
):
    """One forward + loss on a batch of windows.

    batch:
      latents_x0     (B, L, h, w, C)  clean VAE latents
      plucker        (B, L, h, w, 6)
      skeletons      (B, L, H, W, 3)  full-res (pose-encoder path)
      is_cond        (B, L) bool
    """
    x0 = batch["latents_x0"].astype(jnp.float32)
    B, L = x0.shape[:2]
    h, w, c = x0.shape[2:]
    is_cond = batch["is_cond"]

    k_t, k_eps = jax.random.split(key)
    t = jax.random.randint(
        k_t, (B,), 0, scheduler.config.num_train_timesteps, jnp.int32
    )
    t_frames = jnp.repeat(t, L)  # (B*L,)
    cond_flat = is_cond.reshape(-1)
    t_frames = jnp.where(cond_flat, 0, t_frames)

    eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
    x_flat = x0.reshape(B * L, h, w, c)
    eps_flat = eps.reshape(B * L, h, w, c)
    x_t = scheduler.add_noise(x_flat, eps_flat, t_frames)
    # conditional rows: clean latents (cond-row replacement)
    sel = cond_flat[:, None, None, None]
    x_t = jnp.where(sel, x_flat, x_t)

    dtype = unet.dtype
    mask_plane = jnp.broadcast_to(
        (~cond_flat).astype(dtype)[:, None, None, None], (B * L, h, w, 1)
    )
    plucker = batch["plucker"].reshape(B * L, h, w, -1).astype(dtype)
    net_in = jnp.concatenate([x_t.astype(dtype), plucker, mask_plane], axis=-1)

    if domain == "temporal":
        tem = jnp.tile(jnp.arange(L // 2, dtype=jnp.int32), (B, 2)).reshape(-1)
    else:
        tem = jnp.zeros((B * L,), jnp.int32)

    skel = batch["skeletons"].astype(dtype)
    skel = skel.reshape((B * L,) + skel.shape[2:])

    if cfg.remat and not unet.remat:
        # per-BLOCK remat (unet.py): recompute each block in backward so
        # peak HBM holds block boundaries only. (The previous whole-forward
        # jax.checkpoint saved nothing at peak: the recomputation itself
        # materializes every activation — measured 44.9 GB for the 0.87B
        # model at batch 12@128^2; per-block fits.)
        unet = unet.clone(remat=True)

    pred = unet.apply(
        params, net_in, t_frames, skeletons=skel, tem_indices=tem, num_frames=L
    ).astype(jnp.float32)

    if cfg.prediction_type == "epsilon":
        target = eps_flat
    elif cfg.prediction_type == "v_prediction":
        target = scheduler.velocity(x_flat, eps_flat, t_frames)
    else:
        raise ValueError(cfg.prediction_type)

    # loss on target rows only
    weight = (~cond_flat).astype(jnp.float32)[:, None, None, None]
    se = (pred - target) ** 2 * weight
    return jnp.sum(se) / (jnp.sum(weight) * h * w * c)


def make_train_step(
    unet: UNetMultiviewCondition,
    scheduler: Scheduler,
    cfg: TrainConfig,
    domain: str = "spatial",
):
    """Returns train_step(state, batch, key) -> (state, metrics), jittable
    and shardable (batch leading axis = dp)."""
    opt = make_optimizer(cfg)
    if (
        cfg.attn_implementation
        and unet.attn_implementation != cfg.attn_implementation
    ):
        unet = unet.clone(attn_implementation=cfg.attn_implementation)

    def train_step(state: TrainState, batch: dict, key: jax.Array):
        def loss_fn(p):
            return diffusion_loss(
                unet, scheduler, cfg, {"params": p}, batch, key, domain
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params["params"])
        updates, opt_state = opt.update(
            grads, state.opt_state, state.params["params"]
        )
        new_params = optax.apply_updates(state.params["params"], updates)
        ema = state.ema_params
        if ema is not None:
            d = cfg.ema_decay
            ema = jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                ema, new_params,
            )
        new_state = TrainState(
            {"params": new_params}, opt_state, state.step + 1, ema
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "step": state.step + 1,
        }
        return new_state, metrics

    return train_step
