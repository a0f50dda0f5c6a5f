"""Per-step scheduler A/B against diffusers semantics.

diffusers itself is not installed on this host; the oracle is
tests/torch_diffusers_shim — torch implementations written from the
published diffusers==0.33.1 semantics that also back the golden-oracle
e2e test (the reference pipeline runs over them unmodified). Each test
drives a full reverse chain on both sides with IDENTICAL random "model
outputs" and asserts the trajectories stay glued step by step.

Covers what the e2e test's single config cannot: every family
(ddim/ddpm/euler/dpm++), all three timestep spacings, epsilon vs
v_prediction, clip_sample, ddpm variance types, and step counts around
the dpm++ lower_order_final threshold. Reference step loop:
pipeline_diffuman4d.py:413-423 (schedule addressed by timestep VALUE).
"""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, "tests/torch_diffusers_shim")

from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig  # noqa: E402

SHAPE = (3, 4, 4, 2)  # (B, h, w, c) jax side; torch gets (B, 2, 4, 4)


def _chain(shim_sched, jax_sched, n_steps, seed=0, ddpm=False):
    """Run both schedulers down the full schedule with shared eps draws.

    Returns (torch_trajectory, jax_trajectory): lists of (B,h,w,c) arrays,
    one per step."""
    rng = np.random.default_rng(seed)
    shim_sched.set_timesteps(n_steps)
    js = jax_sched.set_timesteps(n_steps)

    ts_t = shim_sched.timesteps.numpy()
    ts_j = np.asarray(js.timesteps)
    np.testing.assert_allclose(ts_j, ts_t.astype(ts_j.dtype), atol=0)
    np.testing.assert_allclose(
        float(js.init_noise_sigma), float(shim_sched.init_noise_sigma), rtol=1e-6
    )

    x = rng.normal(0, 1, SHAPE).astype(np.float32) * float(shim_sched.init_noise_sigma)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    xj = jnp.asarray(x)
    aux = js.init_aux(SHAPE) if js.has_aux else None

    traj_t, traj_j = [], []
    for i in range(n_steps):
        eps = rng.normal(0, 1, SHAPE).astype(np.float32)
        var_noise = rng.normal(0, 1, SHAPE).astype(np.float32) if ddpm else None
        t_val = shim_sched.timesteps[i]

        inp_t = shim_sched.scale_model_input(xt, t_val)
        # model "sees" the scaled input; keep outputs identical anyway
        del inp_t
        kw = {"variance_noise": torch.from_numpy(var_noise.transpose(0, 3, 1, 2).copy())} if ddpm else {}
        xt = shim_sched.step(
            torch.from_numpy(eps.transpose(0, 3, 1, 2).copy()), t_val, xt,
            return_dict=False, **kw,
        )[0]

        idx = jnp.full((SHAPE[0],), i, jnp.int32)
        ej = jnp.asarray(eps)
        if js.has_aux:
            xj, aux = js.step_with_aux(ej, idx, xj, aux)
        elif ddpm:
            xj = js.step(ej, idx, xj, noise=jnp.asarray(var_noise))
        else:
            xj = js.step(ej, idx, xj)

        traj_t.append(xt.numpy().transpose(0, 2, 3, 1))
        traj_j.append(np.asarray(xj))
    return traj_t, traj_j


def _assert_glued(traj_t, traj_j, atol=3e-5):
    for i, (a, b) in enumerate(zip(traj_t, traj_j)):
        np.testing.assert_allclose(
            b, a, atol=atol, rtol=1e-5, err_msg=f"diverged at step {i}"
        )


SD = dict(
    num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
    beta_schedule="scaled_linear",
)


@pytest.mark.parametrize("spacing", ["leading", "trailing", "linspace"])
@pytest.mark.parametrize("pred", ["epsilon", "v_prediction"])
def test_ddim_ab(spacing, pred):
    import diffusers as shim

    offs = 1 if spacing == "leading" else 0
    t = shim.DDIMScheduler(
        clip_sample=False, set_alpha_to_one=False, prediction_type=pred,
        timestep_spacing=spacing, steps_offset=offs, **SD,
    )
    j = Scheduler(SchedulerConfig(
        kind="ddim", clip_sample=False, set_alpha_to_one=False,
        prediction_type=pred, timestep_spacing=spacing, steps_offset=offs,
        **SD,
    ))
    _assert_glued(*_chain(t, j, 12))


def test_ddim_clip_sample_and_alpha_to_one():
    import diffusers as shim

    t = shim.DDIMScheduler(
        clip_sample=True, clip_sample_range=1.0, set_alpha_to_one=True,
        timestep_spacing="leading", steps_offset=1, **SD,
    )
    j = Scheduler(SchedulerConfig(
        kind="ddim", clip_sample=True, set_alpha_to_one=True,
        timestep_spacing="leading", steps_offset=1, **SD,
    ))
    _assert_glued(*_chain(t, j, 9, seed=3))


@pytest.mark.parametrize("vt", ["fixed_small", "fixed_large"])
def test_ddpm_ab(vt):
    import diffusers as shim

    t = shim.DDPMScheduler(
        clip_sample=False, variance_type=vt, timestep_spacing="leading",
        steps_offset=1, **SD,
    )
    j = Scheduler(SchedulerConfig(
        kind="ddpm", clip_sample=False, variance_type=vt,
        timestep_spacing="leading", steps_offset=1, **SD,
    ))
    _assert_glued(*_chain(t, j, 11, seed=5, ddpm=True))


@pytest.mark.parametrize("spacing", ["linspace", "leading", "trailing"])
def test_euler_ab(spacing):
    import diffusers as shim

    offs = 1 if spacing == "leading" else 0
    t = shim.EulerDiscreteScheduler(
        timestep_spacing=spacing, steps_offset=offs, **SD
    )
    j = Scheduler(SchedulerConfig(
        kind="euler", timestep_spacing=spacing, steps_offset=offs, **SD
    ))
    # euler trajectories run at sigma scale (up to ~157); loosen atol
    traj_t, traj_j = _chain(t, j, 10, seed=7)
    _assert_glued(traj_t, traj_j, atol=2e-3)


def test_euler_scale_model_input_matches():
    import diffusers as shim

    t = shim.EulerDiscreteScheduler(timestep_spacing="linspace", **SD)
    j = Scheduler(SchedulerConfig(kind="euler", timestep_spacing="linspace", **SD))
    t.set_timesteps(10)
    js = j.set_timesteps(10)
    rng = np.random.default_rng(11)
    x = rng.normal(0, 50, SHAPE).astype(np.float32)
    for i in [0, 3, 9]:
        a = t.scale_model_input(
            torch.from_numpy(x.transpose(0, 3, 1, 2).copy()), t.timesteps[i]
        ).numpy().transpose(0, 2, 3, 1)
        b = np.asarray(js.scale_model_input(jnp.asarray(x), jnp.full((SHAPE[0],), i, jnp.int32)))
        np.testing.assert_allclose(b, a, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("spacing,n", [
    ("leading", 12),   # reference sampler presets run 12-18 steps
    ("leading", 18),   # above the lower_order_final len<15 threshold
    ("linspace", 10),
])
def test_dpmpp_ab(spacing, n):
    import diffusers as shim

    offs = 1 if spacing == "leading" else 0
    t = shim.DPMSolverMultistepScheduler(
        solver_order=2, algorithm_type="dpmsolver++", lower_order_final=True,
        final_sigmas_type="zero", timestep_spacing=spacing,
        steps_offset=offs, **SD,
    )
    j = Scheduler(SchedulerConfig(
        kind="dpm++", timestep_spacing=spacing, steps_offset=offs, **SD
    ))
    _assert_glued(*_chain(t, j, n, seed=13), atol=1e-4)
