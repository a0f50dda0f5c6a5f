"""Model stack: UNet, VAE, pose encoder, transformer blocks.

Tiny configs on CPU; checks shapes, the 3D-attention axis regroup, the
zero-init no-op rules the reference relies on for warm-up training, and
attention parity between XLA path and reference einsum math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig
from diffuman4d_tpu.models.transformer import MultiviewTransformerBlock


TINY_UNET = UNetConfig(
    in_channels=11,
    block_out_channels=(8, 16, 32, 32),
    num_attention_heads=(1, 2, 4, 4),
    layers_per_block=1,
    norm_num_groups=4,
)

TINY_VAE = VAEConfig(block_out_channels=(4, 8, 8, 8), layers_per_block=1)


def _init_unet(cfg=TINY_UNET, b=4, hw=16, dtype=jnp.float32):
    model = UNetMultiviewCondition(cfg, dtype=dtype, attn_implementation="xla")
    sample = jnp.zeros((b, hw, hw, cfg.in_channels), dtype)
    skel = jnp.zeros((b, hw * 8, hw * 8, 3), dtype)
    t = jnp.zeros((b,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), sample, t, skel, num_frames=b)
    return model, params, sample, skel, t


class TestUNet:
    def test_output_shape(self):
        model, params, sample, skel, t = _init_unet()
        out = model.apply(params, sample, t, skel, num_frames=4)
        assert out.shape == (4, 16, 16, 4)
        assert np.isfinite(np.asarray(out)).all()

    def test_3d_attention_mixes_frames(self):
        # with num_frames=B, frame 0's output must depend on frame 1's input
        model, params, sample, skel, t = _init_unet()
        rng = np.random.default_rng(0)
        base = jnp.asarray(rng.normal(size=sample.shape), jnp.float32)
        out1 = model.apply(params, base, t, skel, num_frames=4)
        perturbed = base.at[1].add(1.0)
        out2 = model.apply(params, perturbed, t, skel, num_frames=4)
        assert np.abs(np.asarray(out2[0] - out1[0])).max() > 1e-6

    def test_2d_mode_isolates_frames(self):
        # num_frames=1: every frame is independent (pure 2D attention)
        model, params, sample, skel, t = _init_unet()
        rng = np.random.default_rng(1)
        base = jnp.asarray(rng.normal(size=sample.shape), jnp.float32)
        out1 = model.apply(params, base, t, skel, num_frames=1)
        perturbed = base.at[1].add(1.0)
        out2 = model.apply(params, perturbed, t, skel, num_frames=1)
        np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]), atol=1e-6)

    def test_temporal_embedding_zero_init_noop(self):
        # zero-init temporal head: tem_indices must not change a fresh model's
        # output (unet_multiview_condition.py:264-266)
        model, params, sample, skel, t = _init_unet()
        rng = np.random.default_rng(2)
        base = jnp.asarray(rng.normal(size=sample.shape), jnp.float32)
        out_spatial = model.apply(params, base, t, skel, num_frames=4)
        tem = jnp.asarray([0, 1, 0, 1], jnp.int32)
        out_temporal = model.apply(params, base, t, skel, tem_indices=tem, num_frames=4)
        np.testing.assert_allclose(
            np.asarray(out_spatial), np.asarray(out_temporal), atol=1e-6
        )

    def test_pose_encoder_zero_init_noop(self):
        model, params, sample, skel, t = _init_unet()
        rng = np.random.default_rng(3)
        base = jnp.asarray(rng.normal(size=sample.shape), jnp.float32)
        out1 = model.apply(params, base, t, skel, num_frames=4)
        skel2 = jnp.ones_like(skel)
        out2 = model.apply(params, base, t, skel2, num_frames=4)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)

    def test_timestep_changes_output(self):
        model, params, sample, skel, t = _init_unet()
        rng = np.random.default_rng(4)
        base = jnp.asarray(rng.normal(size=sample.shape), jnp.float32)
        out1 = model.apply(params, base, jnp.full((4,), 0), skel, num_frames=4)
        out2 = model.apply(params, base, jnp.full((4,), 500), skel, num_frames=4)
        assert np.abs(np.asarray(out2 - out1)).max() > 1e-4

    def test_full_config_param_count(self):
        # full SD2.1-shaped config: roughly 0.87B UNet params + pose encoder
        cfg = UNetConfig()
        model = UNetMultiviewCondition(cfg, dtype=jnp.bfloat16)
        sample = jnp.zeros((2, 8, 8, 11), jnp.bfloat16)
        skel = jnp.zeros((2, 64, 64, 3), jnp.bfloat16)
        params = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0), sample, jnp.zeros((2,), jnp.int32), skel, num_frames=2
            )
        )
        n = sum(np.prod(x.shape) for x in jax.tree.leaves(params))
        assert 0.8e9 < n < 1.0e9, f"param count {n/1e9:.3f}B out of expected range"


class TestVAE:
    def test_roundtrip_shapes(self):
        vae = AutoencoderKL(TINY_VAE, dtype=jnp.float32)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        params = vae.init(jax.random.PRNGKey(0), x)
        z = vae.apply(params, x, method="encode", sample=False)
        assert z.shape == (2, 4, 4, 4)  # /8
        y = vae.apply(params, z, method="decode")
        assert y.shape == (2, 32, 32, 3)

    def test_encode_sampling_uses_rng(self):
        vae = AutoencoderKL(TINY_VAE, dtype=jnp.float32)
        x = jnp.ones((1, 32, 32, 3), jnp.float32) * 0.3
        params = vae.init(jax.random.PRNGKey(0), x)
        z1 = vae.apply(params, x, jax.random.PRNGKey(1), method="encode")
        z2 = vae.apply(params, x, jax.random.PRNGKey(2), method="encode")
        z3 = vae.apply(params, x, jax.random.PRNGKey(1), method="encode")
        assert np.abs(np.asarray(z1 - z2)).max() > 0
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z3))

    def test_encode_requires_rng_when_sampling(self):
        vae = AutoencoderKL(TINY_VAE, dtype=jnp.float32)
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        params = vae.init(jax.random.PRNGKey(0), x)
        with pytest.raises(ValueError, match="rng"):
            vae.apply(params, x, method="encode", sample=True)


class TestAttentionBlock:
    def test_block_matches_manual_einsum(self):
        """Full golden test: the block's output equals a from-scratch NumPy
        re-derivation of the reference math (attention.py:38-153 with
        norm_type='layer_norm'): LN -> 3D attn over (t hw) -> +res ->
        LN -> per-frame attn -> +res -> LN -> GEGLU FF -> +res."""
        heads, hd, c = 2, 8, 16
        block = MultiviewTransformerBlock(heads, hd, dtype=jnp.float32, attn_implementation="xla")
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(4, 6, c)), jnp.float32)  # (B*T, HW, C)
        variables = block.init(jax.random.PRNGKey(0), x, num_frames=2)
        out = np.asarray(block.apply(variables, x, num_frames=2))

        p = jax.tree.map(np.asarray, variables["params"])

        def ln(v, w):
            mu = v.mean(-1, keepdims=True)
            var = v.var(-1, keepdims=True)
            return (v - mu) / np.sqrt(var + 1e-5) * w["scale"] + w["bias"]

        def attn(v, w):
            q = v @ w["to_q"]["kernel"]
            k = v @ w["to_k"]["kernel"]
            v_ = v @ w["to_v"]["kernel"]
            b, s, _ = q.shape
            q = q.reshape(b, s, heads, hd)
            k = k.reshape(b, s, heads, hd)
            v_ = v_.reshape(b, s, heads, hd)
            logits = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
            probs = np.exp(logits - logits.max(-1, keepdims=True))
            probs = probs / probs.sum(-1, keepdims=True)
            o = np.einsum("bhqk,bkhd->bqhd", probs, v_).reshape(b, s, heads * hd)
            return o @ w["to_out"]["kernel"] + w["to_out"]["bias"]

        h = np.asarray(x)
        n = ln(h, p["norm1"]["LayerNorm_0"])
        n3 = n.reshape(2, 12, c)
        a = attn(n3, p["attn1"]).reshape(4, 6, c)
        h = h + a
        n = ln(h, p["norm2"]["LayerNorm_0"])
        h = h + attn(n, p["attn2"])
        n = ln(h, p["norm3"]["LayerNorm_0"])
        proj = n @ p["ff"]["proj_geglu"]["kernel"] + p["ff"]["proj_geglu"]["bias"]
        hidden, gate = np.split(proj, 2, axis=-1)
        from scipy.stats import norm as _norm

        gelu = gate * _norm.cdf(gate)
        ffo = (hidden * gelu) @ p["ff"]["proj_out"]["kernel"] + p["ff"]["proj_out"]["bias"]
        h = h + ffo

        np.testing.assert_allclose(out, h, atol=1e-4)


class TestFreeU:
    def test_freeu_changes_output_only_when_enabled(self):
        cfg_off = TINY_UNET
        cfg_on = UNetConfig(
            in_channels=11,
            block_out_channels=(8, 16, 32, 32),
            num_attention_heads=(1, 2, 4, 4),
            layers_per_block=1,
            norm_num_groups=4,
            freeu=(1.5, 1.6, 0.9, 0.2),
        )
        m_off = UNetMultiviewCondition(cfg_off, dtype=jnp.float32, attn_implementation="xla")
        m_on = UNetMultiviewCondition(cfg_on, dtype=jnp.float32, attn_implementation="xla")
        sample = jnp.zeros((2, 16, 16, 11))
        skel = jnp.zeros((2, 128, 128, 3))
        t = jnp.zeros((2,), jnp.int32)
        params = m_off.init(jax.random.PRNGKey(0), sample, t, skel, num_frames=2)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=sample.shape), jnp.float32)
        out_off = m_off.apply(params, x, t, skel, num_frames=2)
        out_on = m_on.apply(params, x, t, skel, num_frames=2)  # same params
        assert np.abs(np.asarray(out_on - out_off)).max() > 1e-4

    def test_fourier_filter_identity_at_scale_1(self):
        from diffuman4d_tpu.models.freeu import fourier_filter

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
        out = fourier_filter(x, threshold=1, scale=1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)
