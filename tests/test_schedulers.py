"""Schedulers: table construction, spacing, vectorized per-latent stepping.

The key property under test is the reference-replacement contract: stepping
a batch where every latent sits at its *own* timestep index must equal
stepping each latent individually (the reference's per-sample Python loop,
pipeline_diffuman4d.py:413-423)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig, from_config


def _oracle_eps(x, x0, alpha_prod):
    return (x - np.sqrt(alpha_prod) * x0) / np.sqrt(1 - alpha_prod)


class TestTables:
    def test_leading_spacing(self):
        s = Scheduler(SchedulerConfig(timestep_spacing="leading", steps_offset=1))
        s = s.set_timesteps(10)
        ts = np.asarray(s.timesteps)
        assert ts[0] == 901 and ts[-1] == 1
        assert np.all(np.diff(ts) == -100)

    def test_trailing_spacing(self):
        s = Scheduler(SchedulerConfig(timestep_spacing="trailing")).set_timesteps(10)
        ts = np.asarray(s.timesteps)
        assert ts[0] == 999
        assert len(ts) == 10

    def test_scaled_linear_betas(self):
        s = Scheduler(SchedulerConfig())
        ac = np.asarray(s.alphas_cumprod)
        assert ac.shape == (1000,)
        assert 0 < ac[-1] < ac[0] < 1
        np.testing.assert_allclose(ac[0], 1 - 0.00085, rtol=1e-5)

    def test_from_config(self):
        s = from_config(
            {
                "_class_name": "DDIMScheduler",
                "num_train_timesteps": 1000,
                "beta_start": 0.00085,
                "beta_end": 0.012,
                "beta_schedule": "scaled_linear",
                "prediction_type": "v_prediction",
                "timestep_spacing": "leading",
                "steps_offset": 1,
                "unknown_field_is_ignored": 42,
            }
        )
        assert s.config.kind == "ddim"
        assert s.config.prediction_type == "v_prediction"

    def test_unsupported_class_raises(self):
        with pytest.raises(NotImplementedError):
            from_config({"_class_name": "FancyNewScheduler"})


class TestDDIM:
    def test_perfect_denoising_recovers_x0(self):
        cfg = SchedulerConfig(kind="ddim", set_alpha_to_one=True)
        s = Scheduler(cfg).set_timesteps(20)
        rng = np.random.default_rng(0)
        x0 = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
        eps0 = rng.normal(size=x0.shape).astype(np.float32)
        ac = np.asarray(s.alphas_cumprod)
        t0 = int(np.asarray(s.timesteps)[0])
        x = np.sqrt(ac[t0]) * x0 + np.sqrt(1 - ac[t0]) * eps0
        x = jnp.asarray(x)
        for i in range(20):
            idx = jnp.full((1,), i, jnp.int32)
            t = int(np.asarray(s.timestep_of(idx, jnp.zeros(1, bool)))[0])
            eps = jnp.asarray(_oracle_eps(np.asarray(x), x0, ac[t]))
            x = s.step(eps, idx, x)
        np.testing.assert_allclose(np.asarray(x), x0, atol=1e-4)

    def test_vectorized_equals_individual(self):
        s = Scheduler(SchedulerConfig(kind="ddim")).set_timesteps(12)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(3, 4, 4, 2)), jnp.float32)
        eps = jnp.asarray(rng.normal(size=(3, 4, 4, 2)), jnp.float32)
        idx = jnp.asarray([0, 5, 11], jnp.int32)
        batched = s.step(eps, idx, x)
        for j in range(3):
            single = s.step(eps[j : j + 1], idx[j : j + 1], x[j : j + 1])
            np.testing.assert_allclose(
                np.asarray(batched[j]), np.asarray(single[0]), atol=1e-6
            )

    def test_mask_passthrough(self):
        s = Scheduler(SchedulerConfig(kind="ddim")).set_timesteps(12)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 2)), jnp.float32)
        eps = jnp.asarray(rng.normal(size=(2, 4, 4, 2)), jnp.float32)
        idx = jnp.zeros((2,), jnp.int32)
        out = s.step(eps, idx, x, mask=jnp.asarray([False, True]))
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x[0]))
        assert np.abs(np.asarray(out[1] - x[1])).max() > 1e-3

    def test_v_prediction_roundtrip(self):
        cfg = SchedulerConfig(kind="ddim", prediction_type="v_prediction", set_alpha_to_one=True)
        s = Scheduler(cfg).set_timesteps(20)
        rng = np.random.default_rng(3)
        x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 2)), jnp.float32)
        noise = jnp.asarray(rng.normal(size=(1, 4, 4, 2)), jnp.float32)
        ac = np.asarray(s.alphas_cumprod)
        x = None
        for i in range(20):
            idx = jnp.full((1,), i, jnp.int32)
            t = s.timestep_of(idx, jnp.zeros(1, bool))
            if x is None:
                x = s.add_noise(x0, noise, t)
            # oracle epsilon at current t, converted to v
            a = ac[int(np.asarray(t)[0])]
            eps = (np.asarray(x) - np.sqrt(a) * np.asarray(x0)) / np.sqrt(1 - a)
            v = np.sqrt(a) * eps - np.sqrt(1 - a) * np.asarray(x0)
            x = s.step(jnp.asarray(v), idx, x)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


class TestDDPMEuler:
    def test_ddpm_reduces_error(self):
        s = Scheduler(SchedulerConfig(kind="ddpm", set_alpha_to_one=True)).set_timesteps(50)
        rng = np.random.default_rng(4)
        x0 = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)
        ac = np.asarray(s.alphas_cumprod)
        t0 = int(np.asarray(s.timesteps)[0])
        x = jnp.asarray(np.sqrt(ac[t0]) * x0 + np.sqrt(1 - ac[t0]) * rng.normal(size=x0.shape))
        key = jax.random.PRNGKey(0)
        for i in range(50):
            idx = jnp.full((1,), i, jnp.int32)
            t = int(np.asarray(s.timestep_of(idx, jnp.zeros(1, bool)))[0])
            eps = jnp.asarray(_oracle_eps(np.asarray(x), x0, ac[t]))
            key, sub = jax.random.split(key)
            x = s.step(eps, idx, x, key=sub)
        err = np.abs(np.asarray(x) - x0).mean()
        assert err < 0.05, err

    def test_euler_perfect_denoising(self):
        s = Scheduler(
            SchedulerConfig(kind="euler", timestep_spacing="linspace")
        ).set_timesteps(30)
        rng = np.random.default_rng(5)
        x0 = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)
        sig = np.asarray(s.sigmas)
        noise = rng.normal(size=x0.shape).astype(np.float32)
        x = jnp.asarray(x0 + sig[0] * noise)  # euler latent space: x = x0 + sigma*eps
        for i in range(30):
            idx = jnp.full((1,), i, jnp.int32)
            eps = (np.asarray(x) - x0) / sig[i]
            x = s.step(jnp.asarray(eps), idx, x)
        np.testing.assert_allclose(np.asarray(x), x0, atol=1e-3)

    def test_euler_scale_model_input(self):
        s = Scheduler(SchedulerConfig(kind="euler")).set_timesteps(10)
        x = jnp.ones((1, 2, 2, 1), jnp.float32)
        scaled = s.scale_model_input(x, jnp.zeros((1,), jnp.int32))
        sig = float(np.asarray(s.sigmas)[0])
        np.testing.assert_allclose(np.asarray(scaled)[0, 0, 0, 0], 1 / np.sqrt(sig**2 + 1), rtol=1e-5)

    def test_ddim_scale_model_input_identity(self):
        s = Scheduler(SchedulerConfig(kind="ddim")).set_timesteps(10)
        x = jnp.ones((1, 2, 2, 1), jnp.float32) * 3
        np.testing.assert_allclose(
            np.asarray(s.scale_model_input(x, jnp.zeros((1,), jnp.int32))), 3.0
        )


class TestDPMSolver:
    def test_perfect_denoising_recovers_x0(self):
        cfg = SchedulerConfig(kind="dpm++", set_alpha_to_one=True)
        s = Scheduler(cfg).set_timesteps(15)
        rng = np.random.default_rng(7)
        x0 = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
        ac = np.asarray(s.alphas_cumprod)
        t0 = int(np.asarray(s.timesteps)[0])
        x = jnp.asarray(np.sqrt(ac[t0]) * x0 + np.sqrt(1 - ac[t0]) * rng.normal(size=x0.shape))
        aux = s.init_aux(x.shape)
        for i in range(15):
            idx = jnp.full((1,), i, jnp.int32)
            t = int(np.asarray(s.timestep_of(idx, jnp.zeros(1, bool)))[0])
            eps = jnp.asarray(_oracle_eps(np.asarray(x), x0, ac[t]))
            x, aux = s.step_with_aux(eps, idx, x, aux)
        np.testing.assert_allclose(np.asarray(x), x0, atol=5e-3)

    def test_vectorized_equals_individual_with_history(self):
        s = Scheduler(SchedulerConfig(kind="dpm++")).set_timesteps(12)
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(3, 4, 4, 2)), jnp.float32)
        eps = jnp.asarray(rng.normal(size=(3, 4, 4, 2)), jnp.float32)
        prev = jnp.asarray(rng.normal(size=(3, 4, 4, 2)), jnp.float32)
        idx = jnp.asarray([2, 5, 9], jnp.int32)
        aux = {"prev_x0": prev, "has_prev": jnp.asarray([True, False, True])}
        out, new_aux = s.step_with_aux(eps, idx, x, aux)
        for j in range(3):
            aj = {"prev_x0": prev[j:j+1], "has_prev": aux["has_prev"][j:j+1]}
            oj, _ = s.step_with_aux(eps[j:j+1], idx[j:j+1], x[j:j+1], aj)
            np.testing.assert_allclose(np.asarray(out[j]), np.asarray(oj[0]), atol=1e-6)

    def test_mask_preserves_history(self):
        s = Scheduler(SchedulerConfig(kind="dpm++")).set_timesteps(12)
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 2)), jnp.float32)
        eps = jnp.asarray(rng.normal(size=(2, 4, 4, 2)), jnp.float32)
        aux = s.init_aux(x.shape)
        out, new_aux = s.step_with_aux(eps, jnp.zeros((2,), jnp.int32), x, aux,
                                       mask=jnp.asarray([False, True]))
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x[0]))
        assert not bool(new_aux["has_prev"][0])
        assert bool(new_aux["has_prev"][1])

    def test_single_step_schedulers_pass_aux_through(self):
        s = Scheduler(SchedulerConfig(kind="ddim")).set_timesteps(12)
        x = jnp.zeros((1, 2, 2, 1))
        aux = {"anything": 1}
        out, aux2 = s.step_with_aux(jnp.zeros_like(x), jnp.zeros((1,), jnp.int32), x, aux)
        assert aux2 is aux

    def test_from_config_dpm(self):
        s = from_config({"_class_name": "DPMSolverMultistepScheduler"})
        assert s.config.kind == "dpm++"
        assert s.has_aux
