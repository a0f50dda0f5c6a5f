"""Context parallelism: sequence-sharded attention equals single-device
attention, and the training data pipeline feeds the train step."""

import numpy as np

import jax
import jax.numpy as jnp

from diffuman4d_tpu.ops.attention import _xla_attention
from diffuman4d_tpu.ops.context_parallel import shard_attention_over_mesh
from diffuman4d_tpu.parallel.mesh import make_mesh


def test_cp_attention_matches_single_device():
    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 64, 2, 8  # s sharded 8 ways -> 8 per device
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    ref = _xla_attention(q, k, v)
    got = shard_attention_over_mesh(mesh, q, k, v, implementation="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_window_batcher_and_training_encode(tmp_path):
    from diffuman4d_tpu.data.dataset import SpaTemDataset
    from diffuman4d_tpu.data.synthetic import make_synthetic_scene
    from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
    from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline, SlidingConfig
    from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig
    from diffuman4d_tpu.training.data import (
        WindowBatcher,
        WindowBatcherConfig,
        encode_training_batch,
    )
    from diffuman4d_tpu.training.trainer import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    make_synthetic_scene(str(tmp_path), "sc", num_cams=6, num_frames=4, image_size=64)
    dataset = SpaTemDataset(data_dir=str(tmp_path), scene_label="sc", height=64, width=64)

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
    pipe = Diffuman4DPipeline(
        unet, vae, Scheduler(SchedulerConfig()),
        {"unet": unet_params, "vae": vae_params},
        sliding=SlidingConfig(window_size=2), image_size=64, vae_batch=4,
    )

    batcher = WindowBatcher(
        dataset,
        WindowBatcherConfig(
            window_size=2,
            tem_labels=[f"{i:06d}" for i in range(4)],
            input_spa_labels=["00", "03"],
        ),
    )
    rng = np.random.default_rng(0)

    for domain, exp_len in (("spatial", 4), ("temporal", 4)):
        raw = batcher.make_batch(rng, 2, domain)
        assert raw["pixel_values"].shape[0] == 2
        assert raw["pixel_values"].shape[1] == exp_len
        # spatial: 2 inputs flagged cond; temporal: first half cond
        assert raw["is_cond"].sum(axis=1).tolist() == [2, 2]

        batch = encode_training_batch(pipe, raw, jax.random.PRNGKey(1))
        assert batch["latents_x0"].shape == (2, exp_len, 8, 8, 4)
        assert batch["plucker"].shape == (2, exp_len, 8, 8, 6)

        step = jax.jit(
            make_train_step(unet, Scheduler(SchedulerConfig()), TrainConfig(remat=False), domain)
        )
        state = create_train_state(unet_params, TrainConfig())
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))


def test_training_loop_runs_and_checkpoints(tmp_path):
    from diffuman4d_tpu.data.dataset import SpaTemDataset
    from diffuman4d_tpu.data.synthetic import make_synthetic_scene
    from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
    from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline, SlidingConfig
    from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig
    from diffuman4d_tpu.training.data import WindowBatcher, WindowBatcherConfig
    from diffuman4d_tpu.training.loop import LoopConfig, train
    from diffuman4d_tpu.training.trainer import TrainConfig

    make_synthetic_scene(str(tmp_path / "d"), "sc", num_cams=6, num_frames=4, image_size=64)
    dataset = SpaTemDataset(data_dir=str(tmp_path / "d"), scene_label="sc", height=64, width=64)
    cfg = UNetConfig(
        in_channels=11, block_out_channels=(8, 16, 16, 16),
        num_attention_heads=(1, 2, 2, 2), layers_per_block=1, norm_num_groups=4,
    )
    unet = UNetMultiviewCondition(cfg, dtype=jnp.float32, attn_implementation="xla")
    vae = AutoencoderKL(VAEConfig(block_out_channels=(4, 4, 8, 8), layers_per_block=1), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params = {
        "unet": unet.init(key, jnp.zeros((2, 8, 8, 11)), jnp.zeros((2,), jnp.int32),
                          jnp.zeros((2, 64, 64, 3)), num_frames=2),
        "vae": vae.init(key, jnp.zeros((1, 64, 64, 3))),
    }
    pipe = Diffuman4DPipeline(unet, vae, Scheduler(SchedulerConfig()), params,
                              sliding=SlidingConfig(window_size=2), image_size=64, vae_batch=4)
    batcher = WindowBatcher(dataset, WindowBatcherConfig(
        window_size=2, tem_labels=[f"{i:06d}" for i in range(4)],
        input_spa_labels=["00", "03"],
    ))
    out = tmp_path / "run"
    state = train(
        pipe, batcher,
        LoopConfig(steps=4, batch_size=1, window_size=2, checkpoint_every=4,
                   log_every=1, out_dir=str(out)),
        TrainConfig(remat=False),
    )
    assert int(state.step) == 4
    lines = (out / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) >= 4
    import json as _json

    recs = [_json.loads(l) for l in lines]
    assert {r["domain"] for r in recs} == {"spatial", "temporal"}
    assert all(np.isfinite(r["loss"]) for r in recs)
    import os as _os

    assert any(f.startswith("ckpt_") for f in _os.listdir(out))
