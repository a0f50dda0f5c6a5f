"""Pallas flash-attention correctness in interpreter mode (CPU-runnable).

The real-chip benchmarks live in scripts/profile_window.py; these tests pin
the kernel's numerics (vs the XLA reference path) including under vmap —
the batching path the SPMD wave executor exercises."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interp_flash(q, k, v, block_q=64, block_k=64):
    """Run the kernel body under the pallas interpreter."""
    import functools

    from diffuman4d_tpu.ops import flash_attention as fa

    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / (d**0.5)
    qr = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kr = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vr = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    num_kv = sk // block_k
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        functools.partial(fa._flash_kernel, scale=scale, num_kv=num_kv),
        grid=(b * h, sq // block_q, num_kv),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((None, block_k, d), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda bh, i, j: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=True,
    )(qr, kr, vr)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("seq,block", [(128, 64), (256, 128), (192, 64)])
def test_flash_matches_xla_interpret(seq, block):
    from diffuman4d_tpu.ops.attention import _xla_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, seq, 3, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, seq, 3, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, seq, 3, 32)), jnp.float32)
    ref = _xla_attention(q, k, v)
    got = _interp_flash(q, k, v, block_q=block, block_k=block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_multiblock_softmax_stability():
    # large logits spanning kv blocks: online softmax must stay stable
    from diffuman4d_tpu.ops.attention import _xla_attention

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 128, 1, 32)) * 10, jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 128, 1, 32)) * 10, jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 128, 1, 32)), jnp.float32)
    ref = _xla_attention(q, k, v)
    got = _interp_flash(q, k, v, block_q=32, block_k=32)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def _interp_flash_v2(q, k, v, block_q=64, block_k_major=128, block_k=32):
    import functools

    from jax.experimental.pallas import tpu as pltpu

    from diffuman4d_tpu.ops import flash_attention as fa

    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / (d**0.5)
    qr = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kr = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vr = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    num_kmaj = sk // block_k_major
    out = pl.pallas_call(
        functools.partial(fa._flash_kernel_v2, scale=scale, num_kmaj=num_kmaj,
                          k_inner=block_k),
        grid=(b * h, sq // block_q, num_kmaj),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((None, block_k_major, d), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((None, block_k_major, d), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda bh, i, j: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=True,
    )(qr, kr, vr)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def test_flash_v2_matches_xla_interpret():
    from diffuman4d_tpu.ops.attention import _xla_attention

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(2, 256, 2, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 256, 2, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 256, 2, 32)), jnp.float32)
    ref = _xla_attention(q, k, v)
    got = _interp_flash_v2(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("seq,bq,bk", [(512, 128, 64), (512, 256, 128),
                                       (256, 256, 256)])
def test_flash_v3_matches_xla_interpret(seq, bq, bk):
    """v3 (transposed-PV, skewed pipeline, base-2 softmax) parity incl. the
    num_kv+1 drain step and the odd/even double-buffer schedule."""
    from jax.experimental.pallas import tpu as pltpu

    from diffuman4d_tpu.ops.attention import _xla_attention
    from diffuman4d_tpu.ops.flash_attention import flash_attention_v3

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(2, seq, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, seq, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, seq, 2, 64)), jnp.float32)
    ref = _xla_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_v3(q, k, v, block_q=bq, block_k=bk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("seq,bq,bk", [(512, 128, 64), (256, 256, 256)])
def test_flash_v4_matches_xla_interpret(seq, bq, bk):
    """v4 (normalizer-in-matmul via a ones-row on V^T) parity."""
    from jax.experimental.pallas import tpu as pltpu

    from diffuman4d_tpu.ops.attention import _xla_attention
    from diffuman4d_tpu.ops.flash_attention import flash_attention_v4

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(2, seq, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, seq, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, seq, 2, 64)), jnp.float32)
    ref = _xla_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_v4(q, k, v, block_q=bq, block_k=bk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("seq,bq", [(512, 128), (256, 256), (512, 512)])
def test_flash_v5_matches_xla_interpret(seq, bq):
    """v5 (single-KV-pass: whole key sequence in one block, no online
    softmax) parity, incl. block_q == sq (one grid step per bh)."""
    from jax.experimental.pallas import tpu as pltpu

    from diffuman4d_tpu.ops.attention import _xla_attention
    from diffuman4d_tpu.ops.flash_attention import flash_attention_v5

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(2, seq, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, seq, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, seq, 2, 64)), jnp.float32)
    ref = _xla_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_v5(q, k, v, block_q=bq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_v5_large_logit_stability():
    """exp2 shift keeps huge logits finite with a single softmax pass."""
    from jax.experimental.pallas import tpu as pltpu

    from diffuman4d_tpu.ops.attention import _xla_attention
    from diffuman4d_tpu.ops.flash_attention import flash_attention_v5

    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.normal(size=(1, 256, 1, 64)) * 10, jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 256, 1, 64)) * 10, jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 256, 1, 64)), jnp.float32)
    ref = _xla_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_v5(q, k, v, block_q=128)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_flash_v4_large_logit_stability():
    from jax.experimental.pallas import tpu as pltpu

    from diffuman4d_tpu.ops.attention import _xla_attention
    from diffuman4d_tpu.ops.flash_attention import flash_attention_v4

    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.normal(size=(1, 256, 1, 64)) * 10, jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 256, 1, 64)) * 10, jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 256, 1, 64)), jnp.float32)
    ref = _xla_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_v4(q, k, v, block_q=64, block_k=64)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_flash_v3_large_logit_stability():
    from jax.experimental.pallas import tpu as pltpu

    from diffuman4d_tpu.ops.attention import _xla_attention
    from diffuman4d_tpu.ops.flash_attention import flash_attention_v3

    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(1, 256, 1, 64)) * 10, jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 256, 1, 64)) * 10, jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 256, 1, 64)), jnp.float32)
    ref = _xla_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_v3(q, k, v, block_q=64, block_k=64)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("seq,bq,bb", [(256, 128, 2), (256, 256, 6), (512, 512, 3)])
def test_flash_v6_matches_xla_interpret(seq, bq, bb):
    """v6 (single-pass batched over batch*heads) parity, incl. block_b
    that does not divide b or h individually (only b*h)."""
    from jax.experimental.pallas import tpu as pltpu

    from diffuman4d_tpu.ops.attention import _xla_attention
    from diffuman4d_tpu.ops.flash_attention import flash_attention_v6

    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.normal(size=(2, seq, 3, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, seq, 3, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, seq, 3, 64)), jnp.float32)
    ref = _xla_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_v6(q, k, v, block_q=bq, block_b=bb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_v6_large_logit_stability():
    from jax.experimental.pallas import tpu as pltpu

    from diffuman4d_tpu.ops.attention import _xla_attention
    from diffuman4d_tpu.ops.flash_attention import flash_attention_v6

    rng = np.random.default_rng(10)
    q = jnp.asarray(rng.normal(size=(2, 256, 2, 64)) * 10, jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 256, 2, 64)) * 10, jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 256, 2, 64)), jnp.float32)
    ref = _xla_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_v6(q, k, v, block_q=128, block_b=2)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
