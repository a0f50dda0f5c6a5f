"""Analytic integration test of the sliding scheme (SURVEY §4: "a fake
denoiser ... to integration-test the sliding/alternation scheduler").

With a UNet that predicts epsilon = 0, every DDIM step multiplies a target
latent by sqrt(a_prev/a_t), so after the full schedule the grid latent
telescopes to  x_final = x_init * sqrt(a_end / a_start)  — a closed form
that checks the window overlap accounting, per-latent indexing, cond-row
skipping, and CFG combination (0 + g*(0-0) = 0) all at once."""

import numpy as np

import jax
import jax.numpy as jnp

from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline, SlidingConfig
from diffuman4d_tpu.sampling.windows import build_windows
from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig


class _ZeroUNet:
    dtype = jnp.float32

    class config:
        enable_pose_encoder = False
        block_out_channels = (8,)

    def apply(self, params, x, t, tem_indices=None, num_frames=1, pose_features=None):
        return jnp.zeros(x.shape[:-1] + (4,), x.dtype)


class _StubVAE:
    class config:
        downscale_factor = 8
        latent_channels = 4


def test_zero_eps_telescopes_to_closed_form():
    sliding = SlidingConfig(
        window_size=4, sliding_stride=2, bidirectional=True,
        num_denoising_steps=1, alternation_rounds=1, guidance_scale=2.0,
    )
    pipe = Diffuman4DPipeline(
        _ZeroUNet(), _StubVAE(), Scheduler(SchedulerConfig(kind="ddim")),
        params={"unet": {}, "vae": {}}, sliding=sliding, image_size=64,
    )
    total = sliding.total_steps  # 4*1/2*2 = 4

    n, hw = 12, 8
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.normal(size=(n, hw, hw, 4)), jnp.float32)
    is_cond = np.zeros(n, bool)
    is_cond[:4] = True
    cond = {
        "pix_latents": jnp.asarray(rng.normal(size=(n, hw, hw, 4)), jnp.float32),
        "plucker": jnp.zeros((n, hw, hw, 6), jnp.float32),
        "is_cond": jnp.asarray(is_cond),
    }
    windows = build_windows(
        np.arange(4, 12), np.arange(4), "spatial",
        sliding.window_size, sliding.sliding_stride, 0, sliding.bidirectional,
    )
    t_idx = np.zeros(n, np.int32)

    out, t_after, _ = pipe.sliding_denoise(cond, latents, t_idx, windows, "spatial")

    sched = pipe.scheduler
    ts = np.asarray(sched.timesteps)
    ac = np.asarray(sched.alphas_cumprod)
    ratio = sched.config.num_train_timesteps // total
    factor = 1.0
    for i in range(total):
        t = ts[i]
        prev_t = t - ratio
        a_t = ac[t]
        a_prev = ac[prev_t] if prev_t >= 0 else float(np.asarray(sched.final_alpha_cumprod))
        factor *= np.sqrt(a_prev / a_t)

    got = np.asarray(out)
    exp_targets = np.asarray(latents[4:]) * factor
    np.testing.assert_allclose(got[4:], exp_targets, rtol=1e-4, atol=1e-5)
    # cond rows pass through untouched
    np.testing.assert_allclose(got[:4], np.asarray(latents[:4]))
    assert (np.asarray(t_after)[4:] == total).all()
