"""Pipeline construction from config (reference: sampling_utils.load_pipelines,
src/samplers/utils/sampling_utils.py:17-51).

The reference downloads ``krahets/Diffuman4D`` from HF and builds one
pipeline replica per GPU. Here: one pipeline (SPMD handles devices), loaded
from a local diffusers-layout directory, a native orbax checkpoint, or — in
this zero-egress environment — random-initialized demo weights with the
full production architecture."""

from __future__ import annotations

import logging
import os.path as osp

import jax
import jax.numpy as jnp

from diffuman4d_tpu.configs.presets import DataConfig, ModelConfig, SamplerConfig
from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig
from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline, SlidingConfig
from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig, from_config

log = logging.getLogger(__name__)

DTYPES = {"bf16": jnp.bfloat16, "fp32": jnp.float32, "fp16": jnp.float16}


def sliding_from(cfg: SamplerConfig) -> SlidingConfig:
    return SlidingConfig(
        window_size=cfg.window_size,
        sliding_stride=cfg.sliding_stride,
        sliding_shift=cfg.sliding_shift,
        bidirectional=cfg.bidirectional,
        num_denoising_steps=cfg.num_denoising_steps,
        alternation_rounds=cfg.alternation_rounds,
        guidance_scale=cfg.guidance_scale,
        split_cfg_domains=tuple(cfg.split_cfg_domains or ()),
    )


def init_random_params(
    unet: UNetMultiviewCondition,
    vae: AutoencoderKL,
    image_size: int,
    seed: int = 0,
    param_dtype=jnp.bfloat16,
) -> dict:
    """Random-init parameters. Conv/attention parameter shapes are input-
    size independent, so initialization always traces at the smallest legal
    latent (2^num_downsamples) — initializing at the runtime resolution
    would compile a full-size forward just to draw random numbers (~10min
    for the production UNet on this environment's remote-compile path).

    Storage is cast to ``param_dtype`` (default bf16, matching the
    checkpoint loader and the reference's bf16 from_pretrained): flax
    initializes fp32, and fp32 storage costs the 0.87B-param UNet 3.5 GB
    of HBM plus a loop-hoisted bf16 copy of every kernel at apply time —
    the temporal window program OOMs a 16 GB chip that way."""
    del image_size  # param shapes don't depend on it
    min_latent = 2 ** (len(unet.config.block_out_channels) - 1)
    min_image = min_latent * vae.config.downscale_factor

    def cast(tree):
        return jax.tree.map(
            lambda x: x.astype(param_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    # ONE jitted program (persistent-cache friendly): eager flax .init
    # dispatch-compiles thousands of tiny ops through this environment's
    # remote-compile relay — measured 517 s of the full-size slice's
    # startup; jitted + cache-warm it is seconds.
    @jax.jit
    def _init(key):
        sample = jnp.zeros(
            (2, min_latent, min_latent, unet.config.in_channels), unet.dtype
        )
        skel = jnp.zeros((2, min_image, min_image, 3), unet.dtype)
        unet_params = unet.init(
            key, sample, jnp.zeros((2,), jnp.int32), skel, num_frames=2
        )
        vae_params = vae.init(
            key, jnp.zeros((1, min_image, min_image, 3), unet.dtype)
        )
        return {"unet": cast(unet_params), "vae": cast(vae_params)}

    return _init(jax.random.PRNGKey(seed))


def load_pipeline(
    model_cfg: ModelConfig,
    sampler_cfg: SamplerConfig,
    data_cfg: DataConfig,
    unet_config: UNetConfig | None = None,
    vae_config: VAEConfig | None = None,
) -> Diffuman4DPipeline:
    dtype = DTYPES[model_cfg.dtype]
    sliding = sliding_from(sampler_cfg)
    model_dir = osp.expandvars(model_cfg.model_dir)

    if osp.isdir(osp.join(model_dir, "unet")):
        from diffuman4d_tpu.io.checkpoints import load_hf_checkpoint

        log.info("loading diffusers-layout checkpoint from %s", model_dir)
        unet_config, vae_config, sched_cfg, params = load_hf_checkpoint(
            model_dir, dtype=DTYPES[model_cfg.param_dtype]
        )
        scheduler = from_config(sched_cfg)
    else:
        log.warning(
            "model_dir %s has no checkpoint — using RANDOM-INIT weights "
            "(demo/benchmark mode; outputs are not meaningful images)",
            model_dir,
        )
        if unet_config is None:
            if model_cfg.arch == "tiny":
                unet_config = UNetConfig(
                    block_out_channels=(8, 16, 16, 16),
                    num_attention_heads=(1, 2, 2, 2),
                    layers_per_block=1,
                    norm_num_groups=4,
                )
                vae_config = vae_config or VAEConfig(
                    block_out_channels=(4, 4, 8, 8), layers_per_block=1
                )
            else:
                unet_config = UNetConfig()
        vae_config = vae_config or VAEConfig()
        scheduler = Scheduler(SchedulerConfig(kind="ddim"))
        unet = UNetMultiviewCondition(
            unet_config, dtype=dtype, attn_implementation=model_cfg.attn_implementation
        )
        vae = AutoencoderKL(vae_config, dtype=dtype)
        # full-precision compute keeps full-precision storage (tiny/test
        # configs); bf16 compute stores per the param_dtype knob
        pdt = jnp.float32 if dtype == jnp.float32 else DTYPES[model_cfg.param_dtype]
        params = init_random_params(
            unet, vae, data_cfg.height, sampler_cfg.seed, param_dtype=pdt
        )
        return Diffuman4DPipeline(
            unet, vae, scheduler, params, sliding=sliding, image_size=data_cfg.height
        )

    unet = UNetMultiviewCondition(
        unet_config, dtype=dtype, attn_implementation=model_cfg.attn_implementation
    )
    vae = AutoencoderKL(vae_config, dtype=dtype)
    return Diffuman4DPipeline(
        unet, vae, scheduler, params, sliding=sliding, image_size=data_cfg.height
    )
