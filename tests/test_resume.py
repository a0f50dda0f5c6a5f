"""Round-granular sampling-state checkpoint/resume — capability the
reference lacks (a killed run loses the in-memory latent grid, SURVEY §5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from diffuman4d_tpu.data.dataset import SpaTemDataset
    from diffuman4d_tpu.data.synthetic import make_synthetic_scene
    from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
    from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline, SlidingConfig
    from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig

    data_dir = str(tmp_path_factory.mktemp("synthr"))
    make_synthetic_scene(data_dir, "scene0", num_cams=6, num_frames=2, image_size=64)
    dataset = SpaTemDataset(data_dir=data_dir, scene_label="scene0", height=64, width=64)

    cfg = UNetConfig(
        in_channels=11,
        block_out_channels=(8, 16, 16, 16),
        num_attention_heads=(1, 2, 2, 2),
        layers_per_block=1,
        norm_num_groups=4,
    )
    unet = UNetMultiviewCondition(cfg, dtype=jnp.float32, attn_implementation="xla")
    vae = AutoencoderKL(
        VAEConfig(block_out_channels=(4, 4, 8, 8), layers_per_block=1), dtype=jnp.float32
    )
    key = jax.random.PRNGKey(0)
    unet_params = unet.init(
        key, jnp.zeros((2, 8, 8, 11)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 64, 64, 3)), num_frames=2,
    )
    vae_params = vae.init(key, jnp.zeros((1, 64, 64, 3)))
    pipeline = Diffuman4DPipeline(
        unet, vae, Scheduler(SchedulerConfig(kind="ddim")),
        {"unet": unet_params, "vae": vae_params},
        sliding=SlidingConfig(window_size=2, alternation_rounds=2, guidance_scale=1.0),
        image_size=64, vae_batch=4,
    )
    return dataset, pipeline


def _make_sampler(dataset, pipeline, out):
    from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler

    return SlidingIterativeSampler(
        dataset, pipeline,
        output_dir=str(out),
        spa_label_range=(0, 6, 1),
        tem_label_range=(0, 2, 1),
        input_spa_labels=[0, 3],
    )


def test_resume_after_partial_run(setup, tmp_path):
    dataset, pipeline = setup
    out = tmp_path / "run"

    # full run: reference result
    ref = _make_sampler(dataset, pipeline, tmp_path / "full")
    ref.execute_tasks()

    # partial run: only round 1, then "crash"
    part = _make_sampler(dataset, pipeline, out)
    round0 = part.all_tasks[0]
    for i, task in enumerate(round0):
        part.execute_one_task(task, part._task_key(0, i))
    part._completed_rounds = 1
    part.save_state()
    del part

    # new process: resumes and completes rounds 2..N
    resumed = _make_sampler(dataset, pipeline, out)
    assert resumed._completed_rounds == 1
    resumed.execute_tasks()

    np.testing.assert_array_equal(ref.grid_t_idx, resumed.grid_t_idx)
    np.testing.assert_allclose(
        np.asarray(ref.grid_latents), np.asarray(resumed.grid_latents), atol=1e-5
    )


def test_mismatched_state_ignored(setup, tmp_path):
    dataset, pipeline = setup
    out = tmp_path / "run2"
    s = _make_sampler(dataset, pipeline, out)
    s.save_state()
    # different seed must not resume from that state
    from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler

    s2 = SlidingIterativeSampler(
        dataset, pipeline, output_dir=str(out),
        spa_label_range=(0, 6, 1), tem_label_range=(0, 2, 1),
        input_spa_labels=[0, 3], seed=99,
    )
    assert s2._completed_rounds == 0


def test_dpm_resume_preserves_history(setup, tmp_path):
    from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline
    from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler
    from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig

    dataset, base_pipe = setup
    pipe = Diffuman4DPipeline(
        base_pipe.unet, base_pipe.vae,
        Scheduler(SchedulerConfig(kind="dpm++")),
        base_pipe.params, sliding=base_pipe.sliding, image_size=64, vae_batch=4,
    )
    out = tmp_path / "dpmres"
    s1 = _make_sampler(dataset, pipe, out)
    # run round 1 only, save
    for i, task in enumerate(s1.all_tasks[0]):
        s1.execute_one_task(task, s1._task_key(0, i))
    s1._completed_rounds = 1
    s1.save_state()
    prev = np.asarray(s1.grid_aux["prev_x0"])
    has = np.asarray(s1.grid_aux["has_prev"])

    s2 = _make_sampler(dataset, pipe, out)
    assert s2._completed_rounds == 1
    np.testing.assert_allclose(np.asarray(s2.grid_aux["prev_x0"]), prev, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s2.grid_aux["has_prev"]), has)


def test_intra_round_resume(setup, tmp_path):
    """Wave-granular checkpointing: kill mid-round, resume skips exactly
    the tasks already scattered into the grid — bit-identical to an
    uninterrupted run (disjoint cells + per-(round, task) keys)."""
    dataset, pipeline = setup

    ref = _make_sampler(dataset, pipeline, tmp_path / "full_ir")
    ref.execute_tasks()

    # partial: 1 of round 1's 2 tasks, then "crash" mid-round
    out = tmp_path / "run_ir"
    part = _make_sampler(dataset, pipeline, out)
    round0 = part.all_tasks[0]
    assert len(round0) >= 2
    part.execute_one_task(round0[0], part._task_key(0, 0))
    part.save_state(tasks_done=1)
    del part

    resumed = _make_sampler(dataset, pipeline, out)
    assert resumed._completed_rounds == 0
    assert resumed._resume_tasks_done == 1
    resumed.execute_tasks()

    np.testing.assert_array_equal(ref.grid_t_idx, resumed.grid_t_idx)
    np.testing.assert_allclose(
        np.asarray(ref.grid_latents), np.asarray(resumed.grid_latents), atol=1e-5
    )

    # the parallel wave path honors the same intra-round offset
    out2 = tmp_path / "run_ir_par"
    part2 = _make_sampler(dataset, pipeline, out2)
    part2.execute_one_task(part2.all_tasks[0][0], part2._task_key(0, 0))
    part2.save_state(tasks_done=1)
    del part2

    from diffuman4d_tpu.parallel.mesh import make_mesh

    resumed2 = _make_sampler(dataset, pipeline, out2)
    assert resumed2._resume_tasks_done == 1
    resumed2.execute_tasks_parallel(make_mesh(data=2, model=1))
    np.testing.assert_array_equal(ref.grid_t_idx, resumed2.grid_t_idx)
    np.testing.assert_allclose(
        np.asarray(ref.grid_latents), np.asarray(resumed2.grid_latents), atol=2e-5
    )


def test_task_budget_stop_and_resume(setup, tmp_path):
    """task_budget stops cleanly with an intra-round checkpoint; a chain
    of budgeted invocations (deliberate restarts, scripts/demo4d_prefix.py)
    reproduces an uninterrupted run bit-for-bit."""
    from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler

    dataset, pipeline = setup
    ref = _make_sampler(dataset, pipeline, tmp_path / "full_tb")
    ref.execute_tasks()
    total = sum(len(r) for r in ref.all_tasks)

    out = tmp_path / "run_tb"

    def budgeted(n):
        return SlidingIterativeSampler(
            dataset, pipeline, output_dir=str(out),
            spa_label_range=(0, 6, 1), tem_label_range=(0, 2, 1),
            input_spa_labels=[0, 3], task_budget=n,
        )

    s = budgeted(1)  # stops mid-round 1
    s.execute_tasks()
    assert s._tasks_run == 1
    del s

    s = budgeted(2)  # resumes at task 2, crosses the round boundary
    assert s._resume_tasks_done == 1
    s.execute_tasks()
    del s

    s = budgeted(total)  # finishes the schedule
    s.execute_tasks()

    np.testing.assert_array_equal(ref.grid_t_idx, s.grid_t_idx)
    np.testing.assert_allclose(
        np.asarray(ref.grid_latents), np.asarray(s.grid_latents), atol=1e-5
    )

    # wave path: budget of 1 wave's worth stops with state saved
    out2 = tmp_path / "run_tb_par"
    from diffuman4d_tpu.parallel.mesh import make_mesh

    s2 = SlidingIterativeSampler(
        dataset, pipeline, output_dir=str(out2),
        spa_label_range=(0, 6, 1), tem_label_range=(0, 2, 1),
        input_spa_labels=[0, 3], task_budget=1,
    )
    s2.execute_tasks_parallel(make_mesh(data=1, model=1))
    assert s2._tasks_run >= 1
    s3 = SlidingIterativeSampler(
        dataset, pipeline, output_dir=str(out2),
        spa_label_range=(0, 6, 1), tem_label_range=(0, 2, 1),
        input_spa_labels=[0, 3],
    )
    s3.execute_tasks_parallel(make_mesh(data=1, model=1))
    np.testing.assert_array_equal(ref.grid_t_idx, s3.grid_t_idx)
    np.testing.assert_allclose(
        np.asarray(ref.grid_latents), np.asarray(s3.grid_latents), atol=2e-5
    )


def test_time_budget_stop_and_resume(setup, tmp_path):
    """time_budget_s stops cleanly after the first task past the wall
    budget (0.0 => after the very first task), state saved; an unbudgeted
    resume reproduces the full run bit-for-bit. Single-process only —
    multi-host sessions must use task_budget (clock branches diverge)."""
    from diffuman4d_tpu.parallel.mesh import make_mesh
    from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler

    dataset, pipeline = setup
    ref = _make_sampler(dataset, pipeline, tmp_path / "full_wb")
    ref.execute_tasks()

    out = tmp_path / "run_wb"

    def make(**kw):
        return SlidingIterativeSampler(
            dataset, pipeline, output_dir=str(out),
            spa_label_range=(0, 6, 1), tem_label_range=(0, 2, 1),
            input_spa_labels=[0, 3], **kw,
        )

    s = make(time_budget_s=0.0)  # out of time after the first task
    s.execute_tasks()
    assert s._tasks_run == 1
    del s

    s = make(time_budget_s=0.0)
    s.execute_tasks_parallel(make_mesh(data=1, model=1))  # one wave, then stop
    assert s._tasks_run >= 1
    first_stop = s._tasks_run
    total = sum(len(r) for r in ref.all_tasks)
    assert first_stop < total
    del s

    s = make()  # no budget: finish
    s.execute_tasks_parallel(make_mesh(data=1, model=1))
    np.testing.assert_array_equal(ref.grid_t_idx, s.grid_t_idx)
    np.testing.assert_allclose(
        np.asarray(ref.grid_latents), np.asarray(s.grid_latents), atol=2e-5
    )


def test_condition_caches_cleared_on_domain_switch(setup, tmp_path):
    """Round boundaries that switch domain must drop the device condition
    caches: the next domain's first program is the HBM peak (temporal CFG
    batch 48 vs spatial 32) and ~1.3 GB of stale spatial entries OOMed the
    real chip at the first temporal dispatch (r5 chain session 5)."""
    from diffuman4d_tpu.parallel.mesh import make_mesh

    dataset, pipeline = setup
    calls = []
    orig = pipeline.clear_condition_caches
    pipeline.clear_condition_caches = lambda: (calls.append(1), orig())[1]
    try:
        # alternation_rounds=2: spatial -> temporal, exactly 1 domain switch
        s = _make_sampler(dataset, pipeline, tmp_path / "sw_seq")
        s.execute_tasks()
        assert len(calls) == 1
        calls.clear()
        s = _make_sampler(dataset, pipeline, tmp_path / "sw_par")
        s.execute_tasks_parallel(make_mesh(data=1, model=1))
        assert len(calls) == 1
    finally:
        pipeline.clear_condition_caches = orig


def test_host_mirror_matches_device_grid(setup, tmp_path):
    """The incrementally maintained host mirror (cheap-checkpoint path,
    r5: the relay D2H runs ~18 MB/s so full-grid fetches cost ~50 s) must
    stay bit-identical to the device grid across waves, resumes, and both
    execution paths."""
    from diffuman4d_tpu.io.gridstate import read_state
    from diffuman4d_tpu.parallel.mesh import make_mesh
    from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler

    dataset, pipeline = setup
    out = tmp_path / "mirror"

    def make(budget=None):
        return SlidingIterativeSampler(
            dataset, pipeline, output_dir=str(out),
            spa_label_range=(0, 6, 1), tem_label_range=(0, 2, 1),
            input_spa_labels=[0, 3], task_budget=budget,
            checkpoint_every_tasks=1,
        )

    s = make(budget=1)
    s.execute_tasks_parallel(make_mesh(data=1, model=1))
    # first checkpoint seeded the mirror from device; it must now match
    assert s._host_mirror is not None
    np.testing.assert_array_equal(
        s._host_mirror["latents"], np.asarray(s.grid_latents)
    )

    # resume: mirror seeds for free from the state file, then waves keep
    # it fresh; the final round-boundary checkpoint must equal the grid
    s2 = make()
    assert s2._host_mirror is not None  # seeded from file bytes
    s2.execute_tasks_parallel(make_mesh(data=1, model=1))
    np.testing.assert_array_equal(
        s2._host_mirror["latents"], np.asarray(s2.grid_latents)
    )
    meta, data = read_state(s2._state_path)
    np.testing.assert_array_equal(
        np.asarray(data["latents"]), np.asarray(s2.grid_latents)
    )
    np.testing.assert_array_equal(np.asarray(data["t_idx"]), s2.grid_t_idx)

    # single-device path keeps the mirror fresh too
    out2 = tmp_path / "mirror_sd"
    s3 = SlidingIterativeSampler(
        dataset, pipeline, output_dir=str(out2),
        spa_label_range=(0, 6, 1), tem_label_range=(0, 2, 1),
        input_spa_labels=[0, 3], checkpoint_every_tasks=1,
    )
    s3.execute_tasks()
    np.testing.assert_array_equal(
        s3._host_mirror["latents"], np.asarray(s3.grid_latents)
    )
