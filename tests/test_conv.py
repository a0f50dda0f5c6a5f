"""Pallas fused conv3x3 (ops/conv.py) vs a plain-JAX reference.

Covers the decoder-resnet fusion surface: plain conv, GN-folded affine
prologue + SiLU, residual epilogue, Cin != Cout, and boundary tiles
(top/bottom halo rows, width edges). Runs the kernel in interpret mode
(CPU) at tiny shapes; on-chip numerics are exercised by
scripts/profile_vae_conv.py and the bench.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffuman4d_tpu.ops.conv import conv3x3, groupnorm_affine, pallas_conv3x3_ok


def _ref_conv(x, w, bias, scale=None, shift=None, residual=None, silu=False):
    xf = x.astype(jnp.float32)
    if scale is not None:
        xf = xf * scale[:, None, None, :] + shift[:, None, None, :]
    if silu:
        xf = xf * jax.nn.sigmoid(xf)
    xf = xf.astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        xf.astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias.astype(jnp.float32)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y


def _rand(key, shape, dtype=jnp.bfloat16):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


@pytest.mark.parametrize("cin,cout", [(8, 8), (16, 8)])
def test_plain_conv_matches_xla(cin, cout):
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 3)
    x = _rand(ks[0], (2, 16, 8, cin))
    w = _rand(ks[1], (3, 3, cin, cout), jnp.float32) * 0.2
    b = _rand(ks[2], (cout,), jnp.float32)
    got = conv3x3(x, w, b, tile_rows=8, interpret=True)
    want = _ref_conv(x, w, b)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=0, atol=0.15
    )


def test_fused_affine_silu_residual():
    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 6)
    B, H, W, C = 2, 24, 8, 8
    x = _rand(ks[0], (B, H, W, C))
    w = _rand(ks[1], (3, 3, C, C), jnp.float32) * 0.2
    b = _rand(ks[2], (C,), jnp.float32)
    scale = 1.0 + 0.3 * jax.random.normal(ks[3], (B, C), jnp.float32)
    shift = 0.3 * jax.random.normal(ks[4], (B, C), jnp.float32)
    res = _rand(ks[5], (B, H, W, C))
    got = conv3x3(
        x, w, b, scale, shift, res, silu=True, tile_rows=8, interpret=True
    )
    want = _ref_conv(x, w, b, scale, shift, res, silu=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=0, atol=0.15
    )


def test_groupnorm_affine_matches_groupnorm():
    """conv3x3(groupnorm_affine-folded prologue) == GN -> silu -> conv."""
    from diffuman4d_tpu.models.layers import GroupNorm

    k = jax.random.PRNGKey(2)
    ks = jax.random.split(k, 3)
    B, H, W, C, G = 2, 16, 8, 16, 4
    x = _rand(ks[0], (B, H, W, C))
    w = _rand(ks[1], (3, 3, C, C), jnp.float32) * 0.2
    b = jnp.zeros((C,), jnp.float32)
    gamma = 1.0 + 0.2 * jax.random.normal(ks[2], (C,), jnp.float32)
    beta = 0.1 * jnp.ones((C,), jnp.float32)

    gn = GroupNorm(G, 1e-6)
    params = {"params": {"GroupNorm_0": {"scale": gamma, "bias": beta}}}
    hn = jax.nn.silu(gn.apply(params, x).astype(jnp.float32))
    want = _ref_conv(hn.astype(jnp.bfloat16), w, b)

    scale, shift = groupnorm_affine(x, gamma, beta, G, 1e-6)
    got = conv3x3(x, w, b, scale, shift, silu=True, tile_rows=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=0, atol=0.15
    )


def test_eligibility_gate():
    assert pallas_conv3x3_ok((4, 1024, 1024, 128), 128)
    assert pallas_conv3x3_ok((4, 512, 512, 256), 256)
    assert pallas_conv3x3_ok((4, 256, 256, 512), 512)
    assert not pallas_conv3x3_ok((32, 128, 128, 320), 320)  # Cin%128
    assert not pallas_conv3x3_ok((32, 128, 128, 128), 128)  # small spatial
    assert not pallas_conv3x3_ok((4, 1024, 1024, 128), 129)


def test_fused_resnet_module_matches_unfused(monkeypatch):
    """ResnetBlock2D's Pallas-fused branch (layers.py::_fused) vs the
    plain flax path, same params, at an eligible shape (interpret mode)."""
    from diffuman4d_tpu.models.layers import ResnetBlock2D

    B, H, W, C = 1, 256, 256, 128
    x = _rand(jax.random.PRNGKey(3), (B, H, W, C))
    rb = ResnetBlock2D(C, use_temb=False, eps=1e-6, dtype=jnp.bfloat16)

    monkeypatch.setenv("D4D_PALLAS_CONV", "0")
    params = rb.init(jax.random.PRNGKey(0), x)
    want = rb.apply(params, x)

    monkeypatch.setenv("D4D_PALLAS_CONV", "force")
    params2 = rb.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params2) == jax.tree_util.tree_structure(
        params
    ), "fused path must create the identical checkpoint tree"
    got = rb.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        rtol=0,
        atol=0.1,
    )


def test_fused_upsample_module_matches_unfused(monkeypatch):
    from diffuman4d_tpu.models.layers import Upsample2D

    B, H, W, C = 1, 128, 128, 128
    x = _rand(jax.random.PRNGKey(4), (B, H, W, C))
    up = Upsample2D(C, dtype=jnp.bfloat16)

    monkeypatch.setenv("D4D_PALLAS_CONV", "0")
    params = up.init(jax.random.PRNGKey(0), x)
    want = up.apply(params, x)

    monkeypatch.setenv("D4D_PALLAS_CONV", "force")
    params2 = up.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params2) == jax.tree_util.tree_structure(
        params
    )
    got = up.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        rtol=0,
        atol=0.1,
    )


def test_grad_through_conv3x3_matches_reference():
    """jax.grad through the Pallas conv (custom_vjp with a hand-written
    bf16-operand backward) vs jax.grad of the fp32 reference — the
    training step differentiates UNet blocks that route through this
    kernel (models/layers.py:239). Covers all six inputs (x, w, bias,
    scale, shift, res); regression for the r4 train-step crash
    (pallas_call has no JVP rule) and for the fp32-backward HBM blowup
    that OOMed the 0.87B train step."""
    from diffuman4d_tpu.ops.conv import _conv3x3_ref

    B, H, W, Cin, Cout = 2, 16, 8, 128, 128
    x = _rand(jax.random.PRNGKey(0), (B, H, W, Cin))
    w = _rand(jax.random.PRNGKey(1), (3, 3, Cin, Cout), jnp.float32) * 0.05
    b = _rand(jax.random.PRNGKey(2), (Cout,), jnp.float32)
    sc = _rand(jax.random.PRNGKey(3), (B, Cin), jnp.float32) * 0.3 + 1.0
    sh = _rand(jax.random.PRNGKey(4), (B, Cin), jnp.float32) * 0.2
    res = _rand(jax.random.PRNGKey(5), (B, H, W, Cout))

    def loss_pallas(w, x, b, sc, sh, res):
        y = conv3x3(x, w, b, sc, sh, res, silu=True, tile_rows=8,
                    interpret=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_ref(w, x, b, sc, sh, res):
        y = _conv3x3_ref(x, w, b, sc, sh, res, True, True, True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    argnums = (0, 1, 2, 3, 4, 5)
    v1, g1 = jax.value_and_grad(loss_pallas, argnums=argnums)(
        w, x, b, sc, sh, res)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=argnums)(
        w, x, b, sc, sh, res)
    # forward identical (same kernel math); grads differ only by bf16
    # cotangent rounding
    assert v1 == v2
    for a, want in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=1e-2 * float(np.abs(np.asarray(want)).max()),
        )
    # plain (no affine/res) variant + remat composition
    def lp(w):
        return jnp.sum(
            conv3x3(x, w, b, tile_rows=8, interpret=True).astype(jnp.float32)
            ** 2
        )

    assert jax.grad(lp)(w).shape == w.shape
    assert jax.grad(jax.checkpoint(lp))(w).shape == w.shape
