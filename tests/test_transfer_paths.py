"""Round-2 host-transfer paths: on-device uint8 decode must be bit-equal
to the old host-side float path, and the fp16 upload wire format must be
lossless with respect to the bf16 compute dtype."""

import numpy as np

import jax
import jax.numpy as jnp


def test_decode_u8_matches_host_quantization():
    """pipeline._decode_u8_impl == clip->*255+0.5->truncate of the float
    decode (data/images.to_pil semantics), for the same latents."""
    from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
    from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline, SlidingConfig
    from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig

    unet = UNetMultiviewCondition(
        UNetConfig(
            in_channels=11, block_out_channels=(8, 16),
            num_attention_heads=(1, 2), layers_per_block=1,
            norm_num_groups=4, num_3d_attn_blocks=1,
        ),
        dtype=jnp.float32, attn_implementation="xla",
    )
    vae = AutoencoderKL(
        VAEConfig(block_out_channels=(4, 4, 8, 8), layers_per_block=1),
        dtype=jnp.float32,
    )
    key = jax.random.PRNGKey(0)
    params = {
        "unet": unet.init(
            key, jnp.zeros((2, 8, 8, 11)), jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, 64, 64, 3)), num_frames=2,
        ),
        "vae": vae.init(key, jnp.zeros((1, 64, 64, 3))),
    }
    pipe = Diffuman4DPipeline(
        unet, vae, Scheduler(SchedulerConfig(kind="ddim")), params,
        sliding=SlidingConfig(window_size=2), image_size=64, vae_batch=2,
    )
    lat = jax.random.normal(jax.random.PRNGKey(1), (5, 8, 8, 4), jnp.float32)

    u8 = pipe.decode(lat)
    assert u8.dtype == np.uint8 and u8.shape == (5, 64, 64, 3)

    # old host path
    imgs = pipe.decode_latents(lat)
    f01 = np.clip(np.asarray(imgs, np.float32) * 0.5 + 0.5, 0.0, 1.0)
    ref = (f01 * 255.0 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(u8, ref)


def test_h2d_fp16_wire_lossless_wrt_bf16():
    """_h2d ships host data as uint16 bf16 bit patterns (host-side
    round-to-nearest-even); the result must be BIT-equal to a direct
    fp32->bf16 device cast."""
    from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
    from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline, SlidingConfig
    from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig

    unet = UNetMultiviewCondition(
        UNetConfig(
            in_channels=11, block_out_channels=(8, 16),
            num_attention_heads=(1, 2), layers_per_block=1,
            norm_num_groups=4, num_3d_attn_blocks=1,
        ),
        dtype=jnp.bfloat16,
    )
    vae = AutoencoderKL(
        VAEConfig(block_out_channels=(4, 4, 8, 8), layers_per_block=1),
        dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    params = {
        "unet": unet.init(
            key, jnp.zeros((2, 8, 8, 11), jnp.bfloat16),
            jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, 64, 64, 3), jnp.bfloat16), num_frames=2,
        ),
        "vae": vae.init(key, jnp.zeros((1, 64, 64, 3), jnp.bfloat16)),
    }
    pipe = Diffuman4DPipeline(
        unet, vae, Scheduler(SchedulerConfig(kind="ddim")), params,
        sliding=SlidingConfig(window_size=2), image_size=64, vae_batch=2,
    )
    rng = np.random.default_rng(0)
    x = (rng.random((3, 16, 16, 3)).astype(np.float32) * 2 - 1)

    via_fp16 = pipe._h2d(x)
    assert via_fp16.dtype == jnp.bfloat16
    direct = jnp.asarray(x, jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(via_fp16, np.float32), np.asarray(direct, np.float32)
    )
    # fp16 inputs (the dataset frame cache) carry fp16 rounding; the
    # double-rounded result may differ from the direct cast by at most
    # one bf16 ulp (<= 2^-7 relative) — bf16-noise level, by design
    via_cache = pipe._h2d(x.astype(np.float16))
    np.testing.assert_allclose(
        np.asarray(via_cache, np.float32), np.asarray(direct, np.float32),
        rtol=2**-7, atol=2**-13,
    )
