"""Differentiable Pallas flash attention (forward + hand-written backward).

The tuned inference kernels in :mod:`flash_attention` (v3-v6) have no VJP,
so the train step fell back to jax's bundled kernel (~70 TF/s fwd at the
hot shapes vs 103-112 for the tuned family — scripts/train_step_chip.py).
Training is attention-dominated and the backward is ~2.5x the forward
FLOPs, so this module provides ``flash_attention_train``: a v4-style
transposed-score forward that additionally emits the per-query logsumexp,
plus two Pallas backward kernels (dK/dV and dQ) implementing the standard
flash-attention backward recurrence:

    P  = exp(S - L)            dV = P^T  @ dO
    dP = dO @ V^T              dS = P * (dP - rowsum(dO * O))
    dQ = scale * dS @ K        dK = scale * dS^T @ Q

Like the forward family, logits run in base 2 (Q pre-scaled by
``log2(e)/sqrt(d)``) so the VPU pays one exp2 per score element and no
multiply. The base change falls out of the gradients exactly:
``dK = ln(2) * (dS^T @ Qs)`` when ``Qs`` is the pre-scaled Q, and
``dQ = scale * (dS @ K)`` uses the unscaled K directly.

All matmul accumulation is fp32 in VMEM (the P/dS operands are cast to
the input dtype on the MXU, matching the forward's and torch SDPA's
precision). Gradients are golden-tested against the XLA attention VJP in
interpreter mode (tests/test_flash_backward.py).

Reference hot loop these shapes come from: 3D window attention,
src/diffusers/models/attention.py:69-83.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffuman4d_tpu.ops.flash_attention import _COMPILER_PARAMS

_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


# ---------------------------------------------------------------------------
# forward: v4 transposed-score kernel + logsumexp output
# ---------------------------------------------------------------------------
def _fwd_kernel(q_ref, k_ref, vt_ref, o_ref, l2_ref, s_a, s_b, m_s, acc_s,
                *, num_kv):
    """flash_attention_v4's skewed MXU/VPU pipeline (see that docstring),
    with one extra output: the per-query log2-sum-exp ``L2`` the backward
    needs to rematerialize P without storing the score matrix."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, -1e30)
        acc_s[:] = jnp.zeros_like(acc_s)

    @pl.when((j < num_kv) & (j % 2 == 0))
    def _score_a():
        s_a[:] = jax.lax.dot_general(
            k_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when((j < num_kv) & (j % 2 == 1))
    def _score_b():
        s_b[:] = jax.lax.dot_general(
            k_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _process(s_ref):
        st = s_ref[:]  # (bk, bq) fp32, log2 units
        m_prev = m_s[:1, :]
        m_new = jnp.maximum(m_prev, jnp.max(st, axis=0, keepdims=True))
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(st - m_new)
        pv = jax.lax.dot_general(
            vt_ref[:], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # rows 0..d-1: PV; row d: sum_k p (normalizer, ones-row trick)
        acc_s[:] = acc_s[:] * alpha + pv
        m_s[:] = jnp.broadcast_to(m_new, m_s.shape)

    @pl.when((j > 0) & (j % 2 == 1))
    def _process_a():
        _process(s_a)

    @pl.when((j > 0) & (j % 2 == 0))
    def _process_b():
        _process(s_b)

    @pl.when(j == num_kv)
    def _finalize():
        d = o_ref.shape[0]
        norm = acc_s[d : d + 1, :]
        o_ref[:] = (acc_s[:d, :] / norm).astype(o_ref.dtype)
        # logsumexp in log2 units: L2[q] = m[q] + log2(sum_k exp2(s - m))
        l2_ref[:] = jnp.broadcast_to(
            m_s[:1, :] + jnp.log2(norm), l2_ref.shape
        )


def _fwd(qs, k, v, block_q, block_k, interpret):
    """qs: pre-scaled (bh, sq, d); k: (bh, sk, d); v: (bh, sk, d).
    Returns (o_t (bh, d, sq), l2 (bh, 8, sq) fp32)."""
    bh, sq, d = qs.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    if sq % block_q or sk % block_k:
        raise ValueError(f"seq lens ({sq}, {sk}) not divisible by blocks")
    vt = v.transpose(0, 2, 1)  # (bh, d, sk)
    vt1 = jnp.concatenate([vt, jnp.ones((bh, 1, sk), vt.dtype)], axis=1)
    num_kv = sk // block_k

    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_kv=num_kv),
        grid=(bh, sq // block_q, num_kv + 1),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec(
                (None, block_k, d),
                lambda b, i, j, _n=num_kv: (b, jnp.minimum(j, _n - 1), 0),
            ),
            pl.BlockSpec(
                (None, d + 1, block_k),
                lambda b, i, j: (b, 0, jnp.maximum(j - 1, 0)),
            ),
        ],
        out_specs=[
            pl.BlockSpec((None, d, block_q), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((None, 8, block_q), lambda b, i, j: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, d, sq), qs.dtype),
            jax.ShapeDtypeStruct((bh, 8, sq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, block_q), jnp.float32),
            pltpu.VMEM((block_k, block_q), jnp.float32),
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((d + 1, block_q), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=(qs.size + k.size + vt1.size + bh * sq * d)
            * qs.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
    )(qs, k, vt1)


# ---------------------------------------------------------------------------
# backward kernel 1: dK, dV — grid over kv blocks, q streamed innermost
# ---------------------------------------------------------------------------
def _dkdv_kernel(qs_ref, do_ref, k_ref, v_ref, l2_ref, dl_ref,
                 dk_ref, dv_ref, dk_s, dv_s, *, num_q):
    i = pl.program_id(2)  # q block (innermost, sequential)

    @pl.when(i == 0)
    def _init():
        dk_s[:] = jnp.zeros_like(dk_s)
        dv_s[:] = jnp.zeros_like(dv_s)

    # S^T block for (kv j, q i): (bk, bq), log2 units (qs pre-scaled)
    st = jax.lax.dot_general(
        k_ref[:], qs_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pt = jnp.exp2(st - l2_ref[:1, :])  # P^T (bk, bq)
    do = do_ref[:]  # (bq, d)
    # dV_j += P^T @ dO  (contraction over bq: full MXU depth)
    dv_s[:] += jax.lax.dot_general(
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dP^T = V @ dO^T  (bk, bq)
    dpt = jax.lax.dot_general(
        v_ref[:], do, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dst = pt * (dpt - dl_ref[:1, :])  # dS^T (bk, bq), natural units
    # dK_j += dS^T @ Qs  (contraction over bq: full depth); ln2 folded in
    # at the end (Qs carries log2e*scale)
    dk_s[:] += jax.lax.dot_general(
        dst.astype(qs_ref.dtype), qs_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == num_q - 1)
    def _finalize():
        dk_ref[:] = (dk_s[:] * _LN2).astype(dk_ref.dtype)
        dv_ref[:] = dv_s[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernel 2: dQ — grid over q blocks, kv streamed innermost
# ---------------------------------------------------------------------------
def _dq_kernel(qs_ref, do_ref, k_ref, v_ref, l2_ref, dl_ref,
               dq_ref, dq_s, *, num_kv, scale):
    j = pl.program_id(2)  # kv block (innermost, sequential)

    @pl.when(j == 0)
    def _init():
        dq_s[:] = jnp.zeros_like(dq_s)

    # S block for (q i, kv j): (bq, bk), log2 units
    s = jax.lax.dot_general(
        qs_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # l2/dl live as (8, bq) rows; transpose the needed row to (bq, 1)
    l2q = jnp.transpose(l2_ref[:1, :])  # (bq, 1)
    dlq = jnp.transpose(dl_ref[:1, :])
    p = jnp.exp2(s - l2q)  # (bq, bk)
    dp = jax.lax.dot_general(
        do_ref[:], v_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)
    ds = p * (dp - dlq)
    # dQ_i += dS @ K  (contraction over bk: full depth)
    dq_s[:] += jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == num_kv - 1)
    def _finalize():
        dq_ref[:] = (dq_s[:] * scale).astype(dq_ref.dtype)


def _bwd_impl(qs, k, v, do, l2, dl, block_q, block_k, scale, interpret):
    """qs: (bh, sq, d) pre-scaled; do: (bh, sq, d); l2/dl: (bh, 8, sq) fp32.
    Returns (dqs_natural, dk, dv) in (bh, s, d)."""
    bh, sq, d = qs.shape
    sk = k.shape[1]
    num_q = sq // block_q
    num_kv = sk // block_k

    dk, dv = pl.pallas_call(
        functools.partial(_dkdv_kernel, num_q=num_q),
        grid=(bh, num_kv, num_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, j, i: (b, i, 0)),  # qs
            pl.BlockSpec((None, block_q, d), lambda b, j, i: (b, i, 0)),  # do
            pl.BlockSpec((None, block_k, d), lambda b, j, i: (b, j, 0)),  # k
            pl.BlockSpec((None, block_k, d), lambda b, j, i: (b, j, 0)),  # v
            pl.BlockSpec((None, 8, block_q), lambda b, j, i: (b, 0, i)),  # l2
            pl.BlockSpec((None, 8, block_q), lambda b, j, i: (b, 0, i)),  # dl
        ],
        out_specs=[
            pl.BlockSpec((None, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * sq * sk * d,
            bytes_accessed=2 * (qs.size + k.size + v.size) * qs.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
    )(qs, do, k, v, l2, dl)

    dqs = pl.pallas_call(
        functools.partial(_dq_kernel, num_kv=num_kv, scale=scale),
        grid=(bh, num_q, num_kv),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, i, j: (b, i, 0)),  # qs
            pl.BlockSpec((None, block_q, d), lambda b, i, j: (b, i, 0)),  # do
            pl.BlockSpec((None, block_k, d), lambda b, i, j: (b, j, 0)),  # k
            pl.BlockSpec((None, block_k, d), lambda b, i, j: (b, j, 0)),  # v
            pl.BlockSpec((None, 8, block_q), lambda b, i, j: (b, 0, i)),  # l2
            pl.BlockSpec((None, 8, block_q), lambda b, i, j: (b, 0, i)),  # dl
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), qs.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=2 * (qs.size + k.size + v.size) * qs.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
    )(qs, do, k, v, l2, dl)
    return dqs, dk, dv


# ---------------------------------------------------------------------------
# public op: custom_vjp over (B, Sq, H, D)
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_train(q, k, v, block_q=1024, block_k=512,
                          interpret=None):
    """Differentiable flash attention, (B, S, H, D) -> (B, S, H, D)."""
    out, _ = _flash_train_fwd(q, k, v, block_q, block_k, interpret)
    return out


def _flash_train_fwd(q, k, v, block_q, block_k, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, sq, h, d = q.shape
    sk = k.shape[1]
    qs = (q * jnp.asarray(_LOG2E / (d**0.5), q.dtype)).astype(q.dtype)
    qr = qs.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kr = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vr = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    o_t, l2 = _fwd(qr, kr, vr, block_q, block_k, interpret)
    out = o_t.reshape(b, h, d, sq).transpose(0, 3, 1, 2)
    return out, (qr, kr, vr, o_t, l2, (b, h))


def _flash_train_bwd(block_q, block_k, interpret, res, g):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qr, kr, vr, o_t, l2, (b, h) = res
    bh, sq, d = qr.shape
    sk = kr.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    scale = 1.0 / (d**0.5)
    # g: (B, Sq, H, D) -> (bh, sq, d)
    do = g.transpose(0, 2, 1, 3).reshape(bh, sq, d).astype(qr.dtype)
    # delta[q] = rowsum(dO * O): cheap elementwise+reduce, done in XLA.
    # o_t is (bh, d, sq) — contract over d.
    delta = jnp.einsum(
        "bds,bsd->bs", o_t.astype(jnp.float32), do.astype(jnp.float32)
    )  # (bh, sq) fp32
    dl = jnp.broadcast_to(delta[:, None, :], (bh, 8, sq))
    dqs, dk, dv = _bwd_impl(
        qr, kr, vr, do, l2, dl, block_q, block_k, scale, interpret
    )
    dq = dqs.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    dk_ = dk.reshape(b, h, sk, d).transpose(0, 2, 1, 3)
    dv_ = dv.reshape(b, h, sk, d).transpose(0, 2, 1, 3)
    return dq, dk_, dv_


flash_attention_train.defvjp(_flash_train_fwd, _flash_train_bwd)
