"""Sliding-window schedule and end-to-end sampling on a tiny synthetic scene.

The step-count algebra (SURVEY §3.4) is fully deterministic — assertable
without a trained model. The end-to-end test runs the real (random-init)
tiny UNet through all alternation rounds and checks the reference's
schedule invariants plus output completeness.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from diffuman4d_tpu.sampling.windows import build_windows, step_counts


class TestWindows:
    def test_step_counts_match_shipped_configs(self):
        # SURVEY §3.4 ground truth per sampler preset
        assert step_counts(12, 1, 1, False, 3) == (12, 36)  # sliding_default
        assert step_counts(12, 2, 1, False, 3) == (6, 18)  # sliding_fast
        assert step_counts(12, 1, 1, False, 1) == (12, 12)  # sliding_3d
        assert step_counts(12, 1, 1, False, 5) == (12, 60)  # sliding_premium
        assert step_counts(4, 1, 1, False, 3) == (4, 12)  # sliding_low_mem

    def test_divisibility_guard(self):
        with pytest.raises(ValueError, match="divisible"):
            step_counts(12, 5, 1, False, 3)

    def test_roll_matches_torch(self):
        # window schedule bit-parity vs reference torch.roll construction
        # (pipeline_diffuman4d.py:504-518)
        targets = np.asarray([1, 3, 4, 6, 7, 9])
        inputs = np.asarray([0, 2, 5, 8])
        for bidir in (False, True):
            for stride in (1, 2, 3):
                got = build_windows(targets, inputs, "spatial", 4, stride, 0, bidir)
                rows = []
                t = torch.tensor(targets)
                for direction in ((-1, 1) if bidir else (-1,)):
                    for shift in range(0, len(targets), stride):
                        tw = t.roll(shifts=shift * direction)[:4]
                        rows.append(np.concatenate([inputs, tw.numpy()]))
                np.testing.assert_array_equal(got, np.stack(rows))

    def test_temporal_windows_align_condition_track(self):
        # temporal: inputs [0, T), targets [T, 2T); window's input half must
        # be target - T (same frame of the condition camera)
        T = 6
        targets = np.arange(T, 2 * T)
        inputs = np.arange(T)
        w = build_windows(targets, inputs, "temporal", 3, 1, 0, False)
        assert w.shape == (T, 6)
        np.testing.assert_array_equal(w[:, :3], w[:, 3:] - T)

    def test_every_target_stepped_equally(self):
        # each full sweep steps every target exactly window/stride times
        targets = np.arange(4, 16)
        inputs = np.arange(4)
        w = build_windows(targets, inputs, "spatial", 6, 2, 0, False)
        stepped = w[:, 4:].reshape(-1)
        counts = np.bincount(stepped, minlength=16)[4:]
        assert (counts == 3).all()  # window 6 / stride 2


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    from diffuman4d_tpu.data.dataset import SpaTemDataset
    from diffuman4d_tpu.data.synthetic import make_synthetic_scene
    from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
    from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline, SlidingConfig
    from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig

    data_dir = str(tmp_path_factory.mktemp("synth"))
    make_synthetic_scene(data_dir, "scene0", num_cams=6, num_frames=4, image_size=64)
    dataset = SpaTemDataset(
        data_dir=data_dir, scene_label="scene0", height=64, width=64
    )

    unet_cfg = UNetConfig(
        in_channels=11,
        block_out_channels=(8, 16, 16, 16),
        num_attention_heads=(1, 2, 2, 2),
        layers_per_block=1,
        norm_num_groups=4,
    )
    unet = UNetMultiviewCondition(unet_cfg, dtype=jnp.float32, attn_implementation="xla")
    vae = AutoencoderKL(
        VAEConfig(block_out_channels=(4, 4, 8, 8), layers_per_block=1),
        dtype=jnp.float32,
    )

    key = jax.random.PRNGKey(0)
    lat = 64 // 8
    sample = jnp.zeros((2, lat, lat, 11))
    skel = jnp.zeros((2, 64, 64, 3))
    unet_params = unet.init(key, sample, jnp.zeros((2,), jnp.int32), skel, num_frames=2)
    vae_params = vae.init(key, jnp.zeros((1, 64, 64, 3)))

    def make_pipeline(sliding):
        return Diffuman4DPipeline(
            unet,
            vae,
            Scheduler(SchedulerConfig(kind="ddim")),
            {"unet": unet_params, "vae": vae_params},
            sliding=sliding,
            image_size=64,
            vae_batch=4,
        )

    return dataset, make_pipeline, SlidingConfig


class TestEndToEnd:
    def test_full_sampling_run(self, tiny_setup, tmp_path):
        from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler

        dataset, make_pipeline, SlidingConfig = tiny_setup
        sliding = SlidingConfig(
            window_size=2,
            sliding_stride=1,
            bidirectional=False,
            num_denoising_steps=1,
            alternation_rounds=2,
            guidance_scale=2.0,
        )
        sampler = SlidingIterativeSampler(
            dataset,
            make_pipeline(sliding),
            output_dir=str(tmp_path / "out"),
            spa_label_range=(0, 6, 1),
            tem_label_range=(0, 4, 1),
            input_spa_labels=[0, 3],
        )
        assert [t[0].domain for t in sampler.all_tasks] == ["spatial", "temporal"]
        assert len(sampler.all_tasks[0]) == 4  # frames
        assert len(sampler.all_tasks[1]) == 4  # target cameras

        sampler.execute_tasks()

        # all targets fully denoised; inputs untouched (reference invariants
        # pipeline_diffuman4d.py:546-551 + completeness check)
        total = sliding.total_steps
        t_idx = sampler.grid_t_idx
        input_rows = [0, 3]
        target_rows = [1, 2, 4, 5]
        assert (t_idx[target_rows] == total).all()
        assert (t_idx[input_rows] == 0).all()

        # completeness: |cams| x |frames| images on disk, inputs included as
        # clean GT (sampling_utils.py:96-129)
        import glob

        files = glob.glob(str(tmp_path / "out" / "images" / "**" / "*.jpg"))
        assert len(files) == 6 * 4

    def test_split_cfg_matches_fused(self, tiny_setup, tmp_path):
        """split_cfg_domains runs the CFG halves as a sequential lax.map
        (one batch-L UNet live-set at a time — the demo_4d temporal wave
        needs this to fit a single v5e, scripts/probe_temporal_mem.py);
        the math is identical to the fused batch-2L call, so the final
        grids must match."""
        from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler

        dataset, make_pipeline, SlidingConfig = tiny_setup

        def run(split, out):
            sliding = SlidingConfig(
                window_size=2, alternation_rounds=2, guidance_scale=2.0,
                split_cfg_domains=(
                    ("spatial", "temporal") if split else ()
                ),
            )
            s = SlidingIterativeSampler(
                dataset, make_pipeline(sliding), output_dir=str(out),
                spa_label_range=(0, 6, 1), tem_label_range=(0, 4, 1),
                input_spa_labels=[0, 3],
            )
            s.execute_tasks()
            return np.asarray(s.grid_latents)

        fused = run(False, tmp_path / "fused")
        split = run(True, tmp_path / "split")
        np.testing.assert_allclose(fused, split, atol=1e-5, rtol=1e-5)

    def test_schedule_invariant_violation_raises(self, tiny_setup, tmp_path):
        from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler

        dataset, make_pipeline, SlidingConfig = tiny_setup
        sliding = SlidingConfig(
            window_size=2, alternation_rounds=1, guidance_scale=1.0
        )
        sampler = SlidingIterativeSampler(
            dataset,
            make_pipeline(sliding),
            output_dir=str(tmp_path / "out2"),
            spa_label_range=(0, 6, 1),
            tem_label_range=(0, 1, 1),
            input_spa_labels=[0, 3],
        )
        # corrupt the grid state: one target mid-way, others at 0
        sampler.grid_t_idx[1, 0] = 1
        with pytest.raises(ValueError, match="timestep"):
            sampler.execute_one_task(sampler.all_tasks[0][0], jax.random.PRNGKey(0))

    def test_no_cfg_mode(self, tiny_setup, tmp_path):
        # guidance_scale 1.0 disables CFG (sliding_low_mem preset)
        from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler

        dataset, make_pipeline, SlidingConfig = tiny_setup
        sliding = SlidingConfig(
            window_size=2, alternation_rounds=1, guidance_scale=1.0
        )
        sampler = SlidingIterativeSampler(
            dataset,
            make_pipeline(sliding),
            output_dir=str(tmp_path / "out3"),
            spa_label_range=(0, 6, 1),
            tem_label_range=(0, 1, 1),
            input_spa_labels=[0, 3],
        )
        sampler.execute_one_task(sampler.all_tasks[0][0], jax.random.PRNGKey(0))
        assert (sampler.grid_t_idx[[1, 2, 4, 5], 0] == sliding.steps_per_alt).all()

    def test_dpm_solver_multistep_end_to_end(self, tiny_setup, tmp_path):
        # exercises the per-latent multistep history (aux) through the grid
        from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline
        from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler
        from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig

        dataset, make_pipeline, SlidingConfig = tiny_setup
        base = make_pipeline(SlidingConfig(window_size=2, alternation_rounds=2,
                                           guidance_scale=1.0))
        pipe = Diffuman4DPipeline(
            base.unet, base.vae,
            Scheduler(SchedulerConfig(kind="dpm++")),
            base.params,
            sliding=base.sliding, image_size=64, vae_batch=4,
        )
        sampler = SlidingIterativeSampler(
            dataset, pipe,
            output_dir=str(tmp_path / "dpm"),
            spa_label_range=(0, 6, 1),
            tem_label_range=(0, 4, 1),
            input_spa_labels=[0, 3],
        )
        assert sampler.grid_aux is not None
        sampler.execute_tasks()
        t_idx = sampler.grid_t_idx
        assert (t_idx[[1, 2, 4, 5]] == pipe.sliding.total_steps).all()
        # history was populated for target latents
        has_prev = np.asarray(sampler.grid_aux["has_prev"])
        assert has_prev[[1, 2, 4, 5]].all()
        assert not has_prev[[0, 3]].any()

    def test_has_gt_target_false(self, tiny_setup, tmp_path):
        # targets have no GT: skeleton maps stand in (spatem_dataset.py:124-127)
        from diffuman4d_tpu.data.dataset import SpaTemDataset
        from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler

        dataset, make_pipeline, SlidingConfig = tiny_setup
        ds2 = SpaTemDataset(
            data_dir=dataset.data_dir, scene_label="scene0",
            height=64, width=64, has_gt_target=False,
        )
        sliding = SlidingConfig(window_size=2, alternation_rounds=1, guidance_scale=1.0)
        sampler = SlidingIterativeSampler(
            ds2, make_pipeline(sliding),
            output_dir=str(tmp_path / "nogt"),
            spa_label_range=(0, 6, 1),
            tem_label_range=(0, 1, 1),
            input_spa_labels=[0, 3],
        )
        sampler.execute_one_task(sampler.all_tasks[0][0], jax.random.PRNGKey(0))
        assert (sampler.grid_t_idx[[1, 2, 4, 5], 0] == sliding.steps_per_alt).all()

    def test_target_pixels_false_parity(self, tiny_setup, tmp_path):
        """target_pixels=False skips target-image decode: zero pixels on
        target rows, everything generation consumes bit-identical."""
        import numpy as np

        from diffuman4d_tpu.data.dataset import SpaTemDataset
        from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler

        dataset, make_pipeline, SlidingConfig = tiny_setup
        ds2 = SpaTemDataset(
            data_dir=dataset.data_dir, scene_label="scene0",
            height=64, width=64, target_pixels=False,
        )
        kw = dict(
            scene_label="scene0",
            spa_labels=[f"{i:02d}" for i in range(6)],
            tem_labels=["000000"],
            input_spa_labels=["00", "03"],
        )
        a = dataset.get_item(**kw)
        b = ds2.get_item(**kw)
        inp = np.nonzero(a.cond_masks == 0.0)[0]
        tgt = np.nonzero(a.cond_masks != 0.0)[0]
        np.testing.assert_array_equal(
            b.pixel_values[inp], a.pixel_values[inp]
        )
        assert (b.pixel_values[tgt] == 0).all()
        np.testing.assert_array_equal(b.skeletons, a.skeletons)
        np.testing.assert_array_equal(b.Ks, a.Ks)
        np.testing.assert_array_equal(b.poses, a.poses)
        assert b.crops == a.crops

        import jax as _jax

        pipe = make_pipeline(SlidingConfig(window_size=2, alternation_rounds=1))
        ca = pipe.prepare_conditions(a, _jax.random.PRNGKey(0))
        pipe.clear_condition_caches()
        cb = pipe.prepare_conditions(b, _jax.random.PRNGKey(0))
        for k in ca:
            la, lb = _jax.tree.leaves(ca[k]), _jax.tree.leaves(cb[k])
            for xa, xb in zip(la, lb):
                np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))

        with pytest.raises(ValueError, match="target_pixels"):
            SlidingIterativeSampler(
                ds2, pipe, output_dir=str(tmp_path / "g"),
                spa_label_range=(0, 6, 1), tem_label_range=(0, 1, 1),
                input_spa_labels=[0, 3], save_debug_grids=True,
            )

    def test_skeletons_uint8_parity(self, tiny_setup):
        """skeletons_uint8=True ships skeletons as u8 and normalizes on
        device; conditions must be bit-identical to the fp path (whose
        u8 -> fp32 -> fp16-cache -> re-quantize chain is an exact u8
        round-trip)."""
        import numpy as np

        from diffuman4d_tpu.data.dataset import SpaTemDataset
        from diffuman4d_tpu.sampling.pipeline import _skel_u8

        dataset, make_pipeline, SlidingConfig = tiny_setup
        ds_u8 = SpaTemDataset(
            data_dir=dataset.data_dir, scene_label="scene0",
            height=64, width=64, skeletons_uint8=True,
        )
        kw = dict(
            scene_label="scene0",
            spa_labels=[f"{i:02d}" for i in range(6)],
            tem_labels=["000000"],
            input_spa_labels=["00", "03"],
        )
        a = dataset.get_item(**kw)   # fp skeletons
        b = ds_u8.get_item(**kw)     # u8 skeletons
        assert b.skeletons.dtype == np.uint8
        # the u8 wire bytes agree, including through the fp16 frame cache
        np.testing.assert_array_equal(
            np.stack([_skel_u8(sk) for sk in a.skeletons]), b.skeletons
        )
        np.testing.assert_array_equal(b.pixel_values, a.pixel_values)

        import jax as _jax

        def conds(pipe, sample):
            pipe.clear_condition_caches()
            return pipe.prepare_conditions(sample, _jax.random.PRNGKey(0))

        def assert_same(ca, cb):
            assert ca.keys() == cb.keys()
            for k in ca:
                for xa, xb in zip(
                    _jax.tree.leaves(ca[k]), _jax.tree.leaves(cb[k])
                ):
                    np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))

        # fp vs u8 datasets, cached path (production config): exact —
        # both re-quantize to the same u8 before the device normalize
        pipe = make_pipeline(SlidingConfig(window_size=2, alternation_rounds=1))
        cb = conds(pipe, b)
        assert_same(conds(pipe, a), cb)
        # u8 uncached branch vs u8 cached, skeleton-derived leaf only:
        # exact (same u8, same device normalize). pix_latents differs by
        # design uncached (encode_images' single-key draw vs the cache's
        # per-frame keys), and the fp UNCACHED branch keeps host
        # fp16-rounded skeleton values (only ulp-close) — both are the
        # pre-existing cache-vs-no-cache contract, not u8-mode behavior.
        pipe.cond_cache = False
        cu = conds(pipe, b)
        pipe.cond_cache = True
        np.testing.assert_array_equal(
            np.asarray(cu["pose_features"]), np.asarray(cb["pose_features"])
        )

    def test_explicit_label_lists(self, tiny_setup, tmp_path):
        # spa_labels/tem_labels given as explicit lists instead of ranges
        # (sliding_iterative_sampler.py:49-63)
        from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler

        dataset, make_pipeline, SlidingConfig = tiny_setup
        sliding = SlidingConfig(window_size=2, alternation_rounds=1, guidance_scale=1.0)
        sampler = SlidingIterativeSampler(
            dataset, make_pipeline(sliding),
            output_dir=str(tmp_path / "lists"),
            spa_label_range=None, tem_label_range=None,
            spa_labels=[0, 1, 2, 3, 4, 5],
            tem_labels=[0, 2],
            input_spa_labels=[0, 3],
        )
        assert sampler.spa_labels == ["00", "01", "02", "03", "04", "05"]
        assert sampler.tem_labels == ["000000", "000002"]
        assert len(sampler.all_tasks[0]) == 2  # one spatial task per frame


class TestWindowChunking:
    def test_chunk_size_divides_evenly(self, tiny_setup):
        dataset, make_pipeline, SlidingConfig = tiny_setup
        pipe = make_pipeline(SlidingConfig(window_size=2, alternation_rounds=1))
        pipe.window_chunk = 8
        assert pipe._window_chunk_size(44) == 4  # 44 % 8 != 0 -> largest divisor
        assert pipe._window_chunk_size(16) == 8
        assert pipe._window_chunk_size(3) == 3
        pipe.window_chunk = None
        assert pipe._window_chunk_size(44) == 44

    def test_chunked_equals_monolithic_multistep(self, tiny_setup, tmp_path):
        """Chunking the window loop (multiple device executions instead of
        one long fori_loop) must be bit-identical, including DPM++ multistep
        history carried across chunk boundaries."""
        from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline
        from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler
        from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig

        dataset, make_pipeline, SlidingConfig = tiny_setup
        sliding = SlidingConfig(window_size=2, alternation_rounds=1,
                                guidance_scale=2.0)

        def run(chunk, out):
            pipe = make_pipeline(sliding)
            pipe.base_scheduler = Scheduler(SchedulerConfig(kind="dpm++"))
            pipe.scheduler = pipe.base_scheduler.set_timesteps(sliding.total_steps)
            pipe.window_chunk = chunk
            s = SlidingIterativeSampler(
                dataset, pipe, output_dir=str(out),
                spa_label_range=(0, 6, 1), tem_label_range=(0, 1, 1),
                input_spa_labels=[0, 3],
            )
            s.execute_one_task(s.all_tasks[0][0], jax.random.PRNGKey(0))
            return np.asarray(s.grid_latents), s.grid_t_idx.copy()

        lat_mono, ti_mono = run(None, tmp_path / "mono")
        lat_chunk, ti_chunk = run(1, tmp_path / "chunk1")
        np.testing.assert_array_equal(ti_mono, ti_chunk)
        np.testing.assert_allclose(lat_mono, lat_chunk, atol=1e-6)


class TestPoseFeatureResidency:
    """pose_cache_mb gates whole-task materialization vs per-window-chunk
    streaming; both must produce identical grids (the encoder is
    deterministic, so chunk-local recompute == precompute bit-for-bit
    up to float addition order, here exactly: same micro-batches)."""

    def _run(self, tiny_setup, tmp_path, tag, **pipe_kw):
        from diffuman4d_tpu.sampling.pipeline import (
            Diffuman4DPipeline,
            SlidingConfig,
        )
        from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler
        from diffuman4d_tpu.schedulers.diffusion import (
            Scheduler,
            SchedulerConfig,
        )

        dataset, make_pipeline, _ = tiny_setup
        sliding = SlidingConfig(
            window_size=2, sliding_stride=1, bidirectional=False,
            num_denoising_steps=1, alternation_rounds=2, guidance_scale=2.0,
        )
        base = make_pipeline(sliding)
        pipe = Diffuman4DPipeline(
            base.unet, base.vae, Scheduler(SchedulerConfig(kind="ddim")),
            base.params, sliding=sliding, image_size=64, vae_batch=4,
            **pipe_kw,
        )
        sampler = SlidingIterativeSampler(
            dataset, pipe, output_dir=str(tmp_path / tag),
            spa_label_range=(0, 6, 1), tem_label_range=(0, 4, 1),
            input_spa_labels=[0, 3],
        )
        sampler.execute_tasks()
        return sampler

    def test_stream_matches_materialize(self, tiny_setup, tmp_path):
        import numpy as np

        mat = self._run(tiny_setup, tmp_path, "mat")  # default: fits budget
        assert len(mat.pipeline._pose_cache) > 0  # materialize path taken

        strm = self._run(tiny_setup, tmp_path, "strm", pose_cache_mb=0)
        assert len(strm.pipeline._pose_cache) == 0  # streaming path taken

        np.testing.assert_array_equal(mat.grid_t_idx, strm.grid_t_idx)
        np.testing.assert_allclose(
            np.asarray(mat.grid_latents), np.asarray(strm.grid_latents),
            atol=1e-5,
        )
