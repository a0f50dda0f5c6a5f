"""diffusers.schedulers shim: DDIM / DDPM / EulerDiscrete /
DPMSolverMultistep, written from the published diffusers==0.33.1
semantics (not its source). Each implements the surface the reference
pipeline exercises (pipeline_diffuman4d.py:190,268,376,420):
``set_timesteps(n, device=)``, ``timesteps``, ``init_noise_sigma``,
``scale_model_input(sample, timestep)``,
``step(model_output, timestep, sample, return_dict=False)`` — with
deepcopy-able per-instance state (one clone per grid latent, :269).

``step`` addresses the schedule BY TIMESTEP VALUE (the pipeline passes
``timesteps[timestep_indices][j].item()``); internal step indices are
recovered by value lookup.


Divergences vs real diffusers 0.33.1: see docs/SHIM_DIVERGENCES.md.
"""

import math
from typing import Optional, Union

import numpy as np
import torch


class KarrasDiffusionSchedulers:  # type alias target used in annotations only
    pass


def betas_for_alpha_bar(num_diffusion_timesteps: int) -> torch.Tensor:
    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = [
        min(
            1 - alpha_bar((i + 1) / num_diffusion_timesteps)
            / alpha_bar(i / num_diffusion_timesteps),
            0.999,
        )
        for i in range(num_diffusion_timesteps)
    ]
    return torch.tensor(betas, dtype=torch.float32)


class _SchedulerBase:
    """Shared beta/alpha tables + config dict."""

    order = 1

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        prediction_type: str = "epsilon",
        timestep_spacing: str = "leading",
        steps_offset: int = 0,
        **kwargs,
    ):
        self.config = _Cfg(
            num_train_timesteps=num_train_timesteps,
            beta_start=beta_start,
            beta_end=beta_end,
            beta_schedule=beta_schedule,
            prediction_type=prediction_type,
            timestep_spacing=timestep_spacing,
            steps_offset=steps_offset,
            **kwargs,
        )
        if beta_schedule == "linear":
            self.betas = torch.linspace(
                beta_start, beta_end, num_train_timesteps, dtype=torch.float32
            )
        elif beta_schedule == "scaled_linear":
            self.betas = (
                torch.linspace(
                    beta_start**0.5, beta_end**0.5, num_train_timesteps,
                    dtype=torch.float32,
                )
                ** 2
            )
        elif beta_schedule == "squaredcos_cap_v2":
            self.betas = betas_for_alpha_bar(num_train_timesteps)
        else:
            raise NotImplementedError(beta_schedule)
        self.alphas = 1.0 - self.betas
        self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
        self.num_inference_steps: Optional[int] = None
        self.timesteps = torch.arange(num_train_timesteps - 1, -1, -1)

    # -- helpers --------------------------------------------------------
    def _spaced_timesteps_int(self, num_inference_steps: int) -> np.ndarray:
        """DDIM/DDPM-family descending integer timesteps."""
        t, n = self.config.num_train_timesteps, num_inference_steps
        spacing = self.config.timestep_spacing
        if spacing == "linspace":
            return (
                np.linspace(0, t - 1, n).round()[::-1].copy().astype(np.int64)
            )
        if spacing == "leading":
            ratio = t // n
            return (
                (np.arange(0, n) * ratio).round()[::-1].copy().astype(np.int64)
                + self.config.steps_offset
            )
        if spacing == "trailing":
            ratio = t / n
            return np.round(np.arange(t, 0, -ratio)).astype(np.int64) - 1
        raise NotImplementedError(spacing)

    def _index_of_timestep(self, timestep) -> int:
        ts = self.timesteps
        if torch.is_tensor(timestep):
            timestep = timestep.item()
        hits = (ts == timestep).nonzero()
        if len(hits) == 0:
            raise ValueError(f"timestep {timestep} not in schedule")
        return int(hits[0].item())

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def scale_model_input(self, sample: torch.Tensor, timestep=None) -> torch.Tensor:
        return sample

    def set_timesteps(self, num_inference_steps: int, device=None):
        self.num_inference_steps = num_inference_steps
        self.timesteps = torch.from_numpy(
            self._spaced_timesteps_int(num_inference_steps)
        ).to(device)


class _Cfg(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e


class DDIMScheduler(_SchedulerBase):
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        clip_sample: bool = True,
        set_alpha_to_one: bool = True,
        steps_offset: int = 0,
        prediction_type: str = "epsilon",
        clip_sample_range: float = 1.0,
        timestep_spacing: str = "leading",
        **kwargs,
    ):
        super().__init__(
            num_train_timesteps=num_train_timesteps,
            beta_start=beta_start,
            beta_end=beta_end,
            beta_schedule=beta_schedule,
            prediction_type=prediction_type,
            timestep_spacing=timestep_spacing,
            steps_offset=steps_offset,
            clip_sample=clip_sample,
            set_alpha_to_one=set_alpha_to_one,
            clip_sample_range=clip_sample_range,
        )
        self.final_alpha_cumprod = (
            torch.tensor(1.0) if set_alpha_to_one else self.alphas_cumprod[0]
        )

    def _pred_x0_eps(self, model_output, sample, alpha_prod_t):
        beta_prod_t = 1 - alpha_prod_t
        p = self.config.prediction_type
        if p == "epsilon":
            x0 = (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
            eps = model_output
        elif p == "v_prediction":
            x0 = alpha_prod_t**0.5 * sample - beta_prod_t**0.5 * model_output
            eps = alpha_prod_t**0.5 * model_output + beta_prod_t**0.5 * sample
        elif p == "sample":
            x0 = model_output
            eps = (sample - alpha_prod_t**0.5 * x0) / beta_prod_t**0.5
        else:
            raise NotImplementedError(p)
        if self.config.clip_sample:
            r = self.config.clip_sample_range
            x0 = x0.clamp(-r, r)
            eps = (sample - alpha_prod_t**0.5 * x0) / beta_prod_t**0.5
        return x0, eps

    def step(
        self,
        model_output: torch.Tensor,
        timestep: Union[int, torch.Tensor],
        sample: torch.Tensor,
        eta: float = 0.0,
        generator=None,
        variance_noise: Optional[torch.Tensor] = None,
        return_dict: bool = True,
    ):
        if torch.is_tensor(timestep):
            timestep = int(timestep.item())
        prev_timestep = (
            timestep
            - self.config.num_train_timesteps // self.num_inference_steps
        )
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = (
            self.alphas_cumprod[prev_timestep]
            if prev_timestep >= 0
            else self.final_alpha_cumprod
        )
        x0, eps = self._pred_x0_eps(model_output, sample, alpha_prod_t)

        variance = (
            (1 - alpha_prod_t_prev)
            / (1 - alpha_prod_t)
            * (1 - alpha_prod_t / alpha_prod_t_prev)
        )
        std_dev_t = eta * variance**0.5
        pred_sample_direction = (1 - alpha_prod_t_prev - std_dev_t**2) ** 0.5 * eps
        prev_sample = alpha_prod_t_prev**0.5 * x0 + pred_sample_direction
        if eta > 0:
            if variance_noise is None:
                variance_noise = torch.randn(
                    sample.shape, generator=generator, dtype=sample.dtype
                )
            prev_sample = prev_sample + std_dev_t * variance_noise
        if not return_dict:
            return (prev_sample,)
        return _StepOut(prev_sample)


class DDPMScheduler(_SchedulerBase):
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        variance_type: str = "fixed_small",
        clip_sample: bool = True,
        prediction_type: str = "epsilon",
        clip_sample_range: float = 1.0,
        timestep_spacing: str = "leading",
        steps_offset: int = 0,
        **kwargs,
    ):
        super().__init__(
            num_train_timesteps=num_train_timesteps,
            beta_start=beta_start,
            beta_end=beta_end,
            beta_schedule=beta_schedule,
            prediction_type=prediction_type,
            timestep_spacing=timestep_spacing,
            steps_offset=steps_offset,
            clip_sample=clip_sample,
            clip_sample_range=clip_sample_range,
            variance_type=variance_type,
        )
        self.one = torch.tensor(1.0)

    def previous_timestep(self, timestep: int) -> int:
        if self.num_inference_steps:
            return (
                timestep
                - self.config.num_train_timesteps // self.num_inference_steps
            )
        return timestep - 1

    def step(
        self,
        model_output: torch.Tensor,
        timestep: Union[int, torch.Tensor],
        sample: torch.Tensor,
        generator=None,
        variance_noise: Optional[torch.Tensor] = None,
        return_dict: bool = True,
    ):
        if torch.is_tensor(timestep):
            timestep = int(timestep.item())
        t = timestep
        prev_t = self.previous_timestep(t)
        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_t_prev = (
            self.alphas_cumprod[prev_t] if prev_t >= 0 else self.one
        )
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        current_alpha_t = alpha_prod_t / alpha_prod_t_prev
        current_beta_t = 1 - current_alpha_t

        p = self.config.prediction_type
        if p == "epsilon":
            x0 = (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
        elif p == "v_prediction":
            x0 = alpha_prod_t**0.5 * sample - beta_prod_t**0.5 * model_output
        elif p == "sample":
            x0 = model_output
        else:
            raise NotImplementedError(p)
        if self.config.clip_sample:
            r = self.config.clip_sample_range
            x0 = x0.clamp(-r, r)

        pred_original_sample_coeff = (
            alpha_prod_t_prev**0.5 * current_beta_t
        ) / beta_prod_t
        current_sample_coeff = current_alpha_t**0.5 * beta_prod_t_prev / beta_prod_t
        pred_prev_sample = pred_original_sample_coeff * x0 + current_sample_coeff * sample

        variance = 0
        if t > 0:
            vt = self.config.variance_type
            var = (
                beta_prod_t_prev / beta_prod_t * current_beta_t
            ).clamp(min=1e-20)
            if vt == "fixed_small":
                pass
            elif vt == "fixed_large":
                var = current_beta_t
            else:
                raise NotImplementedError(vt)
            if variance_noise is None:
                variance_noise = torch.randn(
                    model_output.shape, generator=generator, dtype=model_output.dtype
                )
            variance = (var**0.5) * variance_noise
        pred_prev_sample = pred_prev_sample + variance
        if not return_dict:
            return (pred_prev_sample,)
        return _StepOut(pred_prev_sample)


class EulerDiscreteScheduler(_SchedulerBase):
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        prediction_type: str = "epsilon",
        timestep_spacing: str = "linspace",
        steps_offset: int = 0,
        **kwargs,
    ):
        super().__init__(
            num_train_timesteps=num_train_timesteps,
            beta_start=beta_start,
            beta_end=beta_end,
            beta_schedule=beta_schedule,
            prediction_type=prediction_type,
            timestep_spacing=timestep_spacing,
            steps_offset=steps_offset,
        )
        sigmas = ((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5
        self.sigmas = torch.cat([sigmas.flip(0), torch.zeros(1)])
        self.timesteps = torch.arange(num_train_timesteps - 1, -1, -1).float()
        self._sig_table = sigmas.numpy()

    @property
    def init_noise_sigma(self) -> float:
        m = float(self.sigmas.max())
        if self.config.timestep_spacing in ("linspace", "trailing"):
            return m
        return (m**2 + 1) ** 0.5

    def set_timesteps(self, num_inference_steps: int, device=None):
        self.num_inference_steps = num_inference_steps
        t, n = self.config.num_train_timesteps, num_inference_steps
        spacing = self.config.timestep_spacing
        if spacing == "linspace":
            timesteps = np.linspace(0, t - 1, n, dtype=np.float32)[::-1].copy()
        elif spacing == "leading":
            ratio = t // n
            timesteps = (
                (np.arange(0, n) * ratio).round()[::-1].copy().astype(np.float32)
            )
            timesteps += self.config.steps_offset
        elif spacing == "trailing":
            ratio = t / n
            timesteps = (
                np.arange(t, 0, -ratio).round().astype(np.float32) - 1
            )
        else:
            raise NotImplementedError(spacing)
        sigmas = np.interp(timesteps, np.arange(0, len(self._sig_table)), self._sig_table)
        self.sigmas = torch.from_numpy(
            np.concatenate([sigmas, [0.0]]).astype(np.float32)
        ).to(device)
        self.timesteps = torch.from_numpy(timesteps).to(device)

    def _sigma_at(self, timestep) -> tuple:
        idx = self._index_of_timestep(timestep)
        return self.sigmas[idx], self.sigmas[idx + 1]

    def scale_model_input(self, sample: torch.Tensor, timestep=None) -> torch.Tensor:
        if torch.is_tensor(timestep) and timestep.ndim > 0:
            sigma = torch.stack(
                [self._sigma_at(t)[0] for t in timestep]
            ).reshape((-1,) + (1,) * (sample.ndim - 1))
        else:
            sigma = self._sigma_at(timestep)[0]
        return sample / ((sigma**2 + 1) ** 0.5)

    def step(
        self,
        model_output: torch.Tensor,
        timestep,
        sample: torch.Tensor,
        generator=None,
        return_dict: bool = True,
    ):
        sigma, sigma_next = self._sigma_at(timestep)
        p = self.config.prediction_type
        if p == "epsilon":
            x0 = sample - sigma * model_output
        elif p == "v_prediction":
            x0 = model_output * (-sigma / (sigma**2 + 1) ** 0.5) + sample / (
                sigma**2 + 1
            )
        elif p == "sample":
            x0 = model_output
        else:
            raise NotImplementedError(p)
        derivative = (sample - x0) / sigma
        prev_sample = sample + derivative * (sigma_next - sigma)
        if not return_dict:
            return (prev_sample,)
        return _StepOut(prev_sample)


class DPMSolverMultistepScheduler(_SchedulerBase):
    order = 1

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        prediction_type: str = "epsilon",
        solver_order: int = 2,
        thresholding: bool = False,
        algorithm_type: str = "dpmsolver++",
        solver_type: str = "midpoint",
        lower_order_final: bool = True,
        timestep_spacing: str = "linspace",
        steps_offset: int = 0,
        final_sigmas_type: str = "zero",
        **kwargs,
    ):
        if algorithm_type != "dpmsolver++" or thresholding:
            raise NotImplementedError("shim supports plain dpmsolver++ only")
        super().__init__(
            num_train_timesteps=num_train_timesteps,
            beta_start=beta_start,
            beta_end=beta_end,
            beta_schedule=beta_schedule,
            prediction_type=prediction_type,
            timestep_spacing=timestep_spacing,
            steps_offset=steps_offset,
            solver_order=solver_order,
            algorithm_type=algorithm_type,
            solver_type=solver_type,
            lower_order_final=lower_order_final,
            final_sigmas_type=final_sigmas_type,
        )
        self._sig_table = (
            ((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5
        ).numpy()
        self.model_outputs = [None] * solver_order
        self.lower_order_nums = 0

    def set_timesteps(self, num_inference_steps: int, device=None):
        self.num_inference_steps = num_inference_steps
        t, n = self.config.num_train_timesteps, num_inference_steps
        spacing = self.config.timestep_spacing
        # DPMSolverMultistep divides into n+1 segments and drops the last
        # (diffusers semantics — differs from the DDIM-family spacing)
        if spacing == "linspace":
            timesteps = (
                np.linspace(0, t - 1, n + 1).round()[::-1][:-1].copy().astype(np.int64)
            )
        elif spacing == "leading":
            ratio = t // (n + 1)
            timesteps = (
                (np.arange(0, n + 1) * ratio).round()[::-1][:-1].copy().astype(np.int64)
            )
            timesteps += self.config.steps_offset
        elif spacing == "trailing":
            ratio = t / n
            timesteps = np.arange(t, 0, -ratio).round().astype(np.int64) - 1
        else:
            raise NotImplementedError(spacing)
        sigmas = np.interp(timesteps, np.arange(0, len(self._sig_table)), self._sig_table)
        if self.config.final_sigmas_type == "zero":
            sigma_last = 0.0
        else:
            sigma_last = float(self._sig_table[0])
        self.sigmas = torch.from_numpy(
            np.concatenate([sigmas, [sigma_last]]).astype(np.float32)
        ).to(device)
        self.timesteps = torch.from_numpy(timesteps).to(device)
        self.model_outputs = [None] * self.config.solver_order
        self.lower_order_nums = 0

    @staticmethod
    def _sigma_to_alpha_sigma_t(sigma):
        alpha_t = 1 / (sigma**2 + 1) ** 0.5
        return alpha_t, sigma * alpha_t

    def convert_model_output(self, model_output, sample, step_index):
        sigma = self.sigmas[step_index]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma)
        p = self.config.prediction_type
        if p == "epsilon":
            return (sample - sigma_t * model_output) / alpha_t
        if p == "v_prediction":
            return alpha_t * sample - sigma_t * model_output
        if p == "sample":
            return model_output
        raise NotImplementedError(p)

    def step(
        self,
        model_output: torch.Tensor,
        timestep,
        sample: torch.Tensor,
        generator=None,
        return_dict: bool = True,
    ):
        step_index = self._index_of_timestep(timestep)
        x0 = self.convert_model_output(model_output, sample, step_index)
        for i in range(self.config.solver_order - 1):
            self.model_outputs[i] = self.model_outputs[i + 1]
        self.model_outputs[-1] = x0

        lower_order_final = (
            step_index == len(self.timesteps) - 1
            and self.config.lower_order_final
            and len(self.timesteps) < 15
        )
        use_first = (
            self.lower_order_nums < 1
            or self.config.solver_order == 1
            or lower_order_final
        )

        def lam(sigma):
            alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma)
            return torch.log(alpha_t) - torch.log(sigma_t)

        sigma_t = self.sigmas[step_index + 1]
        sigma_s0 = self.sigmas[step_index]
        alpha_t, sigma_t_ = self._sigma_to_alpha_sigma_t(sigma_t)
        if use_first:
            if float(sigma_t) == 0.0:
                prev_sample = x0
            else:
                h = lam(sigma_t) - lam(sigma_s0)
                prev_sample = (sigma_t_ / (sigma_s0 * self._sigma_to_alpha_sigma_t(sigma_s0)[0])) * sample - alpha_t * (
                    torch.exp(-h) - 1.0
                ) * x0
        else:
            sigma_s1 = self.sigmas[step_index - 1]
            m0, m1 = self.model_outputs[-1], self.model_outputs[-2]
            if float(sigma_t) == 0.0:
                prev_sample = x0
            else:
                lam_t, lam_s0, lam_s1 = lam(sigma_t), lam(sigma_s0), lam(sigma_s1)
                h = lam_t - lam_s0
                h_0 = lam_s0 - lam_s1
                r0 = h_0 / h
                D0 = m0
                D1 = (1.0 / r0) * (m0 - m1)
                alpha_s0 = self._sigma_to_alpha_sigma_t(sigma_s0)[0]
                prev_sample = (
                    (sigma_t_ / (sigma_s0 * alpha_s0)) * sample
                    - alpha_t * (torch.exp(-h) - 1.0) * D0
                    - 0.5 * alpha_t * (torch.exp(-h) - 1.0) * D1
                )
        if self.lower_order_nums < self.config.solver_order:
            self.lower_order_nums += 1
        if not return_dict:
            return (prev_sample,)
        return _StepOut(prev_sample)


class _StepOut:
    def __init__(self, prev_sample):
        self.prev_sample = prev_sample

    def __getitem__(self, i):
        return (self.prev_sample,)[i]
