"""Worker for the 2-process multi-host sampling test (and shared builder).

Run as a script by tests/test_multiprocess_sampling.py, once per process:

    python tests/mp_sampling_worker.py <data_dir> <out_dir> <proc_id> \
        <n_procs> <port>

Each process sees 4 virtual CPU devices; together they form the 8-device
global mesh (data=4, model=2) the wave executor runs on. Process 0 dumps
the final (replicated) grid for the parent to compare against a
single-process run of the same workload.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(data_dir: str):
    """Tiny-but-real sampling setup, deterministic across processes."""
    import jax
    import jax.numpy as jnp

    from diffuman4d_tpu.utils.jax_setup import setup

    setup()  # persistent compile cache: worker compiles dominate test time

    from diffuman4d_tpu.data.dataset import SpaTemDataset
    from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
    from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline, SlidingConfig
    from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig

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
    unet = UNetMultiviewCondition(
        unet_cfg, dtype=jnp.float32, attn_implementation="xla"
    )
    vae = AutoencoderKL(
        VAEConfig(block_out_channels=(4, 4, 8, 8), layers_per_block=1),
        dtype=jnp.float32,
    )
    key = jax.random.PRNGKey(0)
    unet_params = unet.init(
        key, jnp.zeros((2, 8, 8, 11)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 64, 64, 3)), num_frames=2,
    )
    vae_params = vae.init(key, jnp.zeros((1, 64, 64, 3)))
    sliding = SlidingConfig(
        window_size=2, alternation_rounds=2, guidance_scale=2.0
    )
    pipeline = Diffuman4DPipeline(
        unet, vae, Scheduler(SchedulerConfig(kind="ddim")),
        {"unet": unet_params, "vae": vae_params}, sliding=sliding,
        image_size=64, vae_batch=4,
    )
    return dataset, pipeline


def run_sampler(dataset, pipeline, out_dir: str, mesh):
    import jax

    from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler

    sampler = SlidingIterativeSampler(
        dataset, pipeline,
        output_dir=out_dir,
        spa_label_range=(0, 6, 1),
        tem_label_range=(0, 2, 1),
        input_spa_labels=[0, 3],
    )
    sampler.execute_tasks_parallel(mesh, key=jax.random.PRNGKey(123))
    return sampler


def main():
    import logging

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(name)s %(message)s"
    )
    data_dir, out_dir, proc_id, n_procs, port = sys.argv[1:6]
    # generous collective timeout: both processes compile the same programs
    # concurrently on this 1-core host, so arrival skew at the first
    # collective easily exceeds the default 30 s gloo rendezvous window
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4 "
        "--xla_cpu_collective_timeout_seconds=600"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from diffuman4d_tpu.parallel.distributed import (
        global_mesh,
        initialize,
        replicate_to_host,
    )

    assert initialize(f"127.0.0.1:{port}", int(n_procs), int(proc_id))
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    dataset, pipeline = build(data_dir)
    mesh = global_mesh(data=4, model=2)
    sampler = run_sampler(dataset, pipeline, out_dir, mesh)

    # replicate_to_host reshards on-device — a COLLECTIVE, so every
    # process must execute it (multi-controller SPMD); only rank 0 writes
    lat = replicate_to_host(sampler.grid_latents)
    if jax.process_index() == 0:
        import numpy as np

        np.savez(
            os.path.join(out_dir, "final_grid.npz"),
            latents=lat,
            t_idx=sampler.grid_t_idx,
        )
    print(f"worker {proc_id}: done", flush=True)


if __name__ == "__main__":
    main()
