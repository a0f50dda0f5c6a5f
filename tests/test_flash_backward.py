"""Golden gradients for the differentiable Pallas flash attention
(ops/flash_backward.py) vs the XLA attention VJP, in interpreter mode
(CPU-runnable). Mirrors the conv VJP test strategy (tests/test_conv.py).

Training is attention-dominated (reference hot loop
src/diffusers/models/attention.py:69-83); these tests pin dq/dk/dv of the
hand-written backward recurrence to XLA's autodiff of the same math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffuman4d_tpu.ops.attention import _xla_attention
from diffuman4d_tpu.ops.flash_backward import flash_attention_train


def _rand_qkv(key, b, s, h, d, dtype):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, h, d), dtype)
    k = jax.random.normal(kk, (b, s, h, d), dtype)
    v = jax.random.normal(kv, (b, s, h, d), dtype)
    return q, k, v


@pytest.mark.parametrize(
    "s,bq,bk",
    [(128, 64, 64), (256, 128, 64), (256, 256, 128), (192, 64, 64)],
)
def test_grads_match_xla_fp32(s, bq, bk):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 2, s, 3, 64, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention_train(q, k, v, bq, bk, True) * w
        )

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v) * w)

    out = flash_attention_train(q, k, v, bq, bk, True)
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(
            gf, gx, atol=3e-4, rtol=3e-4,
            err_msg=f"d{name} mismatch at s={s}",
        )


def test_grads_match_xla_bf16():
    """bf16 inputs (the training dtype): the kernel's fp32 accumulation
    should track an fp32 XLA reference within bf16 resolution."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 256, 2, 64, jnp.float32)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    w = jax.random.normal(jax.random.PRNGKey(3), q.shape, jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention_train(q, k, v, 128, 128, True).astype(jnp.float32)
            * w
        )

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v).astype(jnp.float32) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(qb, kb, vb)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf, np.float32), np.asarray(gx), atol=0.06, rtol=0.06,
            err_msg=f"d{name} bf16 mismatch",
        )


def test_value_matches_tuned_forward():
    """The trainable forward must agree with the inference v4 kernel
    (same math, extra logsumexp output)."""
    from jax.experimental.pallas import tpu as pltpu

    from diffuman4d_tpu.ops.flash_attention import flash_attention_v4

    q, k, v = _rand_qkv(jax.random.PRNGKey(2), 2, 256, 2, 64, jnp.float32)
    out = flash_attention_train(q, k, v, 128, 128, True)
    with pltpu.force_tpu_interpret_mode():
        ref = flash_attention_v4(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_attention_train_implementation_dispatch():
    """implementation='train' falls back to XLA off-TPU but stays
    differentiable end-to-end."""
    from diffuman4d_tpu.ops.attention import dot_product_attention

    q, k, v = _rand_qkv(jax.random.PRNGKey(4), 1, 64, 2, 64, jnp.float32)
    out = dot_product_attention(q, k, v, implementation="train")
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(out, ref, atol=1e-6)
    g = jax.grad(
        lambda q: jnp.sum(
            dot_product_attention(q, k, v, implementation="train")
        )
    )(q)
    assert np.isfinite(np.asarray(g)).all()
