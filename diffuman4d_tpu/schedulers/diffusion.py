"""Diffusion schedulers — functional, vectorized over per-latent step state.

The reference deep-copies one stateful diffusers scheduler object per grid
latent so every latent can sit at its own timestep
(pipeline_diffuman4d.py:265-271) and then steps them one-by-one in a Python
loop (:413-423). TPU-native replacement: schedulers are immutable table
pytrees; the per-latent state is just an int32 ``timestep_indices`` array,
and :meth:`step` is batched — each sample indexes its own row of the
precomputed tables. The Python loop becomes one vectorized op.

Implemented (covering the diffusers ``KarrasDiffusionSchedulers`` union
members an SD2.1-derived checkpoint realistically ships): DDIM, DDPM,
EulerDiscrete. Config fields mirror the checkpoint's
``scheduler_config.json`` so :func:`from_config` can consume it directly.

All tables are fp32; ``step`` computes in fp32 and casts back.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SchedulerConfig:
    kind: str = "ddim"  # ddim | ddpm | euler | dpm++ (2M multistep)
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # linear | scaled_linear | squaredcos_cap_v2
    prediction_type: str = "epsilon"  # epsilon | v_prediction | sample
    timestep_spacing: str = "leading"  # leading | trailing | linspace
    steps_offset: int = 1
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    set_alpha_to_one: bool = False
    ddim_eta: float = 0.0
    # ddpm
    variance_type: str = "fixed_small"


def from_config(cfg: dict) -> "Scheduler":
    """Build from a diffusers ``scheduler_config.json`` dict."""
    class_name = cfg.get("_class_name", "DDIMScheduler")
    kind = {
        "DDIMScheduler": "ddim",
        "DDPMScheduler": "ddpm",
        "EulerDiscreteScheduler": "euler",
        "DPMSolverMultistepScheduler": "dpm++",
    }.get(class_name)
    if kind is None:
        raise NotImplementedError(f"Scheduler {class_name} not supported")
    fields = {f.name for f in dataclasses.fields(SchedulerConfig)}
    kwargs = {k: v for k, v in cfg.items() if k in fields}
    return Scheduler(SchedulerConfig(kind=kind, **kwargs))


def _make_betas(cfg: SchedulerConfig) -> np.ndarray:
    t = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        return np.linspace(cfg.beta_start, cfg.beta_end, t, dtype=np.float64)
    if cfg.beta_schedule == "scaled_linear":
        return (
            np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, t, dtype=np.float64) ** 2
        )
    if cfg.beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(x):
            return np.cos((x + 0.008) / 1.008 * np.pi / 2) ** 2

        betas = [
            min(1 - alpha_bar((i + 1) / t) / alpha_bar(i / t), 0.999) for i in range(t)
        ]
        return np.array(betas, dtype=np.float64)
    raise ValueError(f"Unknown beta schedule: {cfg.beta_schedule}")


def _spaced_timesteps(cfg: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """Descending inference timesteps (diffusers set_timesteps semantics).

    DPMSolverMultistep divides the range into ``n + 1`` segments and drops
    the last timestep (its final step lands on sigma=0 instead) — a
    different spacing from the DDIM family for the same config."""
    t, n = cfg.num_train_timesteps, num_inference_steps
    if cfg.kind == "dpm++":
        if cfg.timestep_spacing == "linspace":
            ts = np.linspace(0, t - 1, n + 1).round()[::-1][:-1].astype(np.int64)
        elif cfg.timestep_spacing == "leading":
            ratio = t // (n + 1)
            ts = (np.arange(n + 1) * ratio).round()[::-1][:-1].astype(np.int64)
            ts = ts + cfg.steps_offset
        elif cfg.timestep_spacing == "trailing":
            ratio = t / n
            ts = np.round(np.arange(t, 0, -ratio)).astype(np.int64) - 1
        else:
            raise ValueError(f"Unknown timestep spacing: {cfg.timestep_spacing}")
        return ts
    if cfg.timestep_spacing == "linspace":
        ts = np.linspace(0, t - 1, n).round()[::-1].astype(np.int64)
    elif cfg.timestep_spacing == "leading":
        ratio = t // n
        ts = (np.arange(n) * ratio).round()[::-1].astype(np.int64) + cfg.steps_offset
    elif cfg.timestep_spacing == "trailing":
        ratio = t / n
        ts = np.round(np.arange(t, 0, -ratio)).astype(np.int64) - 1
    else:
        raise ValueError(f"Unknown timestep spacing: {cfg.timestep_spacing}")
    return ts


class Scheduler:
    """Immutable scheduler: config + fp32 tables after ``set_timesteps``.

    Usage::

        sched = Scheduler(SchedulerConfig(kind="ddim")).set_timesteps(36)
        t = sched.timestep_of(timestep_indices, is_cond)   # (B,)
        x_in = sched.scale_model_input(x, timestep_indices)
        x = sched.step(eps, timestep_indices, x, key=key, mask=~is_cond)
    """

    def __init__(self, config: SchedulerConfig):
        self.config = config
        betas = _make_betas(config)
        alphas_cumprod = np.cumprod(1.0 - betas)
        self.alphas_cumprod = jnp.asarray(alphas_cumprod, jnp.float32)
        self.final_alpha_cumprod = jnp.float32(
            1.0 if config.set_alpha_to_one else alphas_cumprod[0]
        )
        self.num_inference_steps: Optional[int] = None
        self.timesteps: Optional[jnp.ndarray] = None
        self.sigmas: Optional[jnp.ndarray] = None

    # ------------------------------------------------------------------
    def set_timesteps(self, num_inference_steps: int) -> "Scheduler":
        new = Scheduler(self.config)
        new.num_inference_steps = num_inference_steps
        if self.config.kind == "euler":
            # diffusers EulerDiscrete keeps FLOAT timesteps (fractional
            # under linspace spacing) and interpolates sigmas at them
            cfg, t, n = self.config, self.config.num_train_timesteps, num_inference_steps
            if cfg.timestep_spacing == "linspace":
                ts = np.linspace(0, t - 1, n, dtype=np.float64)[::-1].copy()
            elif cfg.timestep_spacing == "leading":
                ratio = t // n
                ts = (np.arange(n) * ratio).round()[::-1].copy() + cfg.steps_offset
            elif cfg.timestep_spacing == "trailing":
                ratio = t / n
                ts = np.round(np.arange(t, 0, -ratio)).astype(np.float64) - 1
            else:
                raise ValueError(f"Unknown timestep spacing: {cfg.timestep_spacing}")
            new.timesteps = jnp.asarray(ts, jnp.float32)
            ac = np.cumprod(1.0 - _make_betas(self.config))
            sig_all = np.sqrt((1 - ac) / ac)
            sig = np.interp(ts, np.arange(len(sig_all)), sig_all)
            new.sigmas = jnp.asarray(np.concatenate([sig, [0.0]]), jnp.float32)
        else:
            ts = _spaced_timesteps(self.config, num_inference_steps)
            new.timesteps = jnp.asarray(ts, jnp.int32)
        return new

    @property
    def init_noise_sigma(self) -> jnp.ndarray:
        """Initial noise scale (scheduler.init_noise_sigma,
        pipeline_diffuman4d.py:190)."""
        if self.config.kind == "euler":
            m = jnp.max(self.sigmas)
            if self.config.timestep_spacing in ("linspace", "trailing"):
                return m
            return jnp.sqrt(m**2 + 1)
        return jnp.float32(1.0)

    # ------------------------------------------------------------------
    def timestep_of(self, t_index: jnp.ndarray, is_cond: jnp.ndarray) -> jnp.ndarray:
        """Per-sample training timestep; conditional rows forced to 0
        (pipeline_diffuman4d.py:273-278)."""
        idx = jnp.where(is_cond, 0, t_index)
        t = jnp.take(self.timesteps, jnp.clip(idx, 0, self.num_inference_steps - 1))
        return jnp.where(is_cond, 0, t)

    def scale_model_input(self, sample: jnp.ndarray, t_index: jnp.ndarray) -> jnp.ndarray:
        """Euler divides by sqrt(sigma^2+1); DDIM/DDPM are identity."""
        if self.config.kind != "euler":
            return sample
        sigma = jnp.take(self.sigmas, jnp.clip(t_index, 0, self.num_inference_steps - 1))
        scale = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        return (sample.astype(jnp.float32) * _bcast(scale, sample)).astype(sample.dtype)

    def add_noise(
        self, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        """q(x_t | x_0) forward noising (training)."""
        a = jnp.take(self.alphas_cumprod, timesteps)
        sa = _bcast(jnp.sqrt(a), sample)
        sb = _bcast(jnp.sqrt(1.0 - a), sample)
        return (sa * sample.astype(jnp.float32) + sb * noise.astype(jnp.float32)).astype(
            sample.dtype
        )

    def velocity(self, sample, noise, timesteps):
        """v-prediction target: v = sqrt(a) eps - sqrt(1-a) x0."""
        a = jnp.take(self.alphas_cumprod, timesteps)
        sa = _bcast(jnp.sqrt(a), sample)
        sb = _bcast(jnp.sqrt(1.0 - a), sample)
        return (sa * noise.astype(jnp.float32) - sb * sample.astype(jnp.float32)).astype(
            sample.dtype
        )

    # ------------------------------------------------------------------
    def step(
        self,
        model_output: jnp.ndarray,  # (B, ...) network prediction
        t_index: jnp.ndarray,  # (B,) int32 index into self.timesteps
        sample: jnp.ndarray,  # (B, ...) current latents
        key: Optional[jax.Array] = None,
        mask: Optional[jnp.ndarray] = None,  # (B,) True = step this row
        noise: Optional[jnp.ndarray] = None,  # explicit ddpm variance noise
    ) -> jnp.ndarray:
        """One reverse step per sample at its own timestep. Rows with
        ``mask == False`` (conditional latents) pass through unchanged —
        replacing the reference's per-sample Python loop
        (pipeline_diffuman4d.py:413-423)."""
        if self.num_inference_steps is None:
            raise ValueError("call set_timesteps first")
        dtype = sample.dtype
        x = sample.astype(jnp.float32)
        eps = model_output.astype(jnp.float32)
        idx = jnp.clip(t_index, 0, self.num_inference_steps - 1)

        if self.config.kind == "dpm++":
            raise ValueError("dpm++ is multistep: use step_with_aux")
        if self.config.kind == "euler":
            out = self._euler_step(eps, idx, x)
        elif self.config.kind == "ddim":
            out = self._ddim_step(eps, idx, x, key)
        elif self.config.kind == "ddpm":
            out = self._ddpm_step(eps, idx, x, key, noise=noise)
        else:
            raise ValueError(self.config.kind)

        if mask is not None:
            out = jnp.where(_bcast(mask, out), out, x)
        return out.astype(dtype)

    # ------------------------------------------------------------------
    def _pred_x0(self, model_output, x, alpha_prod):
        sa = jnp.sqrt(alpha_prod)
        sb = jnp.sqrt(1.0 - alpha_prod)
        p = self.config.prediction_type
        if p == "epsilon":
            x0 = (x - sb * model_output) / sa
            eps = model_output
        elif p == "v_prediction":
            x0 = sa * x - sb * model_output
            eps = sa * model_output + sb * x
        elif p == "sample":
            x0 = model_output
            eps = (x - sa * x0) / sb
        else:
            raise ValueError(p)
        if self.config.clip_sample:
            r = self.config.clip_sample_range
            x0 = jnp.clip(x0, -r, r)
            eps = (x - sa * x0) / sb
        return x0, eps

    def _alpha_pair(self, idx, x):
        t = jnp.take(self.timesteps, idx)
        step_ratio = self.config.num_train_timesteps // self.num_inference_steps
        prev_t = t - step_ratio
        a_t = jnp.take(self.alphas_cumprod, t)
        a_prev = jnp.where(
            prev_t >= 0,
            jnp.take(self.alphas_cumprod, jnp.maximum(prev_t, 0)),
            self.final_alpha_cumprod,
        )
        return _bcast(a_t, x), _bcast(a_prev, x), t, prev_t

    def _ddim_step(self, model_output, idx, x, key):
        a_t, a_prev, _, _ = self._alpha_pair(idx, x)
        x0, eps = self._pred_x0(model_output, x, a_t)
        eta = self.config.ddim_eta
        if eta > 0:
            var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
            std = eta * jnp.sqrt(var)
            if key is None:
                raise ValueError("ddim with eta > 0 requires a key")
            noise = jax.random.normal(key, x.shape, jnp.float32)
        else:
            std = 0.0
            noise = 0.0
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - std**2, 0.0)) * eps
        return jnp.sqrt(a_prev) * x0 + dir_xt + std * noise

    def _ddpm_step(self, model_output, idx, x, key, noise=None):
        a_t, a_prev, t, prev_t = self._alpha_pair(idx, x)
        # diffusers DDPMScheduler uses alpha_prev = 1.0 ("one") past the
        # schedule end, unlike DDIM's final_alpha_cumprod
        a_prev = jnp.where(_bcast(prev_t >= 0, x), a_prev, 1.0)
        x0, eps = self._pred_x0(model_output, x, a_t)
        current_alpha = a_t / a_prev
        current_beta = 1.0 - current_alpha
        coef_x0 = jnp.sqrt(a_prev) * current_beta / (1.0 - a_t)
        coef_xt = jnp.sqrt(current_alpha) * (1.0 - a_prev) / (1.0 - a_t)
        mean = coef_x0 * x0 + coef_xt * x
        vt = self.config.variance_type
        if vt == "fixed_small":
            var = (1.0 - a_prev) / (1.0 - a_t) * current_beta
        elif vt == "fixed_large":
            var = current_beta
        else:
            raise NotImplementedError(f"ddpm variance_type {vt}")
        var = jnp.clip(var, 1e-20, None)
        if noise is None:
            if key is None:
                raise ValueError("ddpm step requires a key (or explicit noise)")
            noise = jax.random.normal(key, x.shape, jnp.float32)
        # diffusers adds variance noise only while t > 0
        has_noise = _bcast(t > 0, x)
        return mean + jnp.where(has_noise, jnp.sqrt(var) * noise, 0.0)

    # -- DPM-Solver++ (2M): multistep with explicit per-latent history -----
    @property
    def has_aux(self) -> bool:
        return self.config.kind == "dpm++"

    def init_aux(self, sample_shape) -> dict:
        """Per-latent multistep history: previous x0 prediction + validity.
        Replaces the hidden state the reference's per-latent deepcopied
        schedulers carry (pipeline_diffuman4d.py:269)."""
        return {
            "prev_x0": jnp.zeros(sample_shape, jnp.float32),
            "has_prev": jnp.zeros(sample_shape[:1], bool),
        }

    def _lambda(self, t):
        a = jnp.take(self.alphas_cumprod, t)
        alpha = jnp.sqrt(a)
        sigma = jnp.sqrt(1.0 - a)
        return jnp.log(alpha / sigma), alpha, sigma

    def step_with_aux(
        self,
        model_output: jnp.ndarray,
        t_index: jnp.ndarray,
        sample: jnp.ndarray,
        aux: dict,
        mask: Optional[jnp.ndarray] = None,
    ) -> tuple[jnp.ndarray, dict]:
        """DPM-Solver++(2M) step, vectorized per latent. First step per
        latent falls back to first order; subsequent steps use the stored
        previous x0 prediction."""
        if self.config.kind != "dpm++":
            # aux passes through untouched for single-step schedulers
            return self.step(model_output, t_index, sample, mask=mask), aux
        dtype = sample.dtype
        x = sample.astype(jnp.float32)
        idx = jnp.clip(t_index, 0, self.num_inference_steps - 1)

        n = self.num_inference_steps
        t = jnp.take(self.timesteps, idx)
        # schedule-indexed neighbors (diffusers DPMSolverMultistep uses
        # sigmas[step_index - 1] / [step_index + 1], NOT t -+ train_ratio)
        t_prev2 = jnp.take(self.timesteps, jnp.maximum(idx - 1, 0))
        t_next = jnp.take(self.timesteps, jnp.minimum(idx + 1, n - 1))
        is_last = idx == n - 1

        a_t = _bcast(jnp.take(self.alphas_cumprod, t), x)
        x0, _ = self._pred_x0(model_output.astype(jnp.float32), x, a_t)

        lam_t, _, sig_t = self._lambda(t)
        lam_s, alp_s, sig_s = self._lambda(t_next)
        lam_p, _, _ = self._lambda(t_prev2)
        h = lam_s - lam_t
        h_prev = lam_t - lam_p
        r = h_prev / jnp.where(h == 0, 1.0, h)

        # 2M correction when history exists
        has_prev = aux["has_prev"]
        coef = 1.0 / (2.0 * jnp.maximum(r, 1e-8))
        d = jnp.where(
            _bcast(has_prev, x),
            (1 + coef)[..., None, None, None] * x0
            - coef[..., None, None, None] * aux["prev_x0"],
            x0,
        )
        sig_ratio = _bcast(sig_s / sig_t, x)
        phi = _bcast(jnp.expm1(-h), x)
        out = sig_ratio * x - _bcast(alp_s, x) * phi * d
        # final step returns the clean prediction
        out = jnp.where(_bcast(is_last, x), x0, out)

        new_aux = {
            "prev_x0": x0,
            "has_prev": jnp.ones_like(has_prev),
        }
        if mask is not None:
            out = jnp.where(_bcast(mask, out), out, x)
            new_aux = {
                "prev_x0": jnp.where(_bcast(mask, x0), x0, aux["prev_x0"]),
                "has_prev": jnp.where(mask, new_aux["has_prev"], has_prev),
            }
        return out.astype(dtype), new_aux

    def _euler_step(self, model_output, idx, x):
        sigma = _bcast(jnp.take(self.sigmas, idx), x)
        sigma_next = _bcast(jnp.take(self.sigmas, idx + 1), x)
        p = self.config.prediction_type
        if p == "epsilon":
            x0 = x - sigma * model_output
        elif p == "v_prediction":
            x0 = model_output * (-sigma / jnp.sqrt(sigma**2 + 1)) + x / (sigma**2 + 1)
        elif p == "sample":
            x0 = model_output
        else:
            raise ValueError(p)
        derivative = (x - x0) / sigma
        return x + derivative * (sigma_next - sigma)


def _bcast(v: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """(B,) -> (B, 1, 1, ...) matching ``like``'s rank."""
    return jnp.reshape(v, v.shape + (1,) * (like.ndim - v.ndim))
