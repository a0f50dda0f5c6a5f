"""Pallas TPU flash attention (non-causal, no mask).

Purpose-built for Diffuman4D's attention workloads (reference hot loop:
src/diffusers/models/attention.py:69-83 — 3D self-attention over
``(frames * hw)`` tokens, up to 98,304 tokens per window; plus per-frame 2D
self-attention and the VAE mid-block attention):

  * online-softmax streaming over KV blocks — O(block^2) VMEM instead of
    materializing the (S, S) score matrix (98k^2 would be 38 GB)
  * fp32 running max / normalizer / accumulator; the P @ V matmul runs in
    the input dtype (bf16) on the MXU, matching torch SDPA's precision
  * grid (batch*heads, q_blocks, kv_blocks); the kv axis is innermost and
    sequential on TPU so scratch accumulators carry across kv steps

No masking/causal support on purpose: this model never uses attention
masks (unet_multiview_condition.py:561-584 passes none).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 512
_NEG_INF = -1e30

# Mosaic's default scoped-VMEM cap on this toolchain is 16 MB (measured:
# v5 at s=16384, block_q=256 fails AOT compile with "Scoped allocation
# with size 28.07M and limit 16.00M" — scripts/repro_v5_16k.py). v5e has
# 128 MB of physical VMEM; raising the cap lets the single-pass kernels
# hold whole-sequence score blocks, which removes the per-grid-step fixed
# costs that dominate the model's 1k-4k-token attention shapes.
_VMEM_LIMIT = 100 * 1024 * 1024
from jax.experimental.pallas import tpu as _pltpu  # noqa: E402

_COMPILER_PARAMS = _pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def v5_vmem_ok(sk: int, block_q: int, d: int = 64, block_b: int = 1) -> bool:
    """Whether a single-pass kernel's fp32 score block (+ exp2 copy) and
    KV residency fit the raised VMEM cap with headroom for input
    double-buffering. Used by the dispatcher and the tuner so unmeasured
    nearest-match shapes can never route to an uncompilable config."""
    score = block_b * sk * block_q * 4 * 2  # scores + exp2(p) worst case
    kv = block_b * sk * d * 2 * 2 * 2  # K + V^T bf16, double-buffered
    return score + kv <= int(_VMEM_LIMIT * 0.85)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, *, scale, num_kv):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, _NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    q = q_ref[:]  # (bq, d)
    k = k_ref[:]  # (bk, d)
    v = v_ref[:]  # (bk, d)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale  # (bq, bk) fp32

    m_prev = m_s[:, :1]  # (bq, 1)
    l_prev = l_s[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)

    p = jnp.exp(s - m_new)  # (bq, bk) fp32
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    # P @ V on the MXU in the input dtype (matches torch SDPA internals)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_s[:] = acc_s[:] * alpha + pv

    m_s[:] = jnp.broadcast_to(m_new, m_s.shape)
    l_s[:] = jnp.broadcast_to(l_new, l_s.shape)

    @pl.when(j == num_kv - 1)
    def _finalize():
        o_ref[:] = (acc_s[:] / l_s[:, :1]).astype(o_ref.dtype)


def _flash_kernel_v2(
    q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, *, scale, num_kmaj, k_inner
):
    """Two-level KV blocking: the grid delivers a large k-major block to
    VMEM; an inner loop streams k_inner-wide chunks through the online
    softmax. Fewer grid steps -> less per-step fixed cost than v1."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, _NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    q = q_ref[:]  # (bq, d)
    n_inner = k_ref.shape[0] // k_inner

    def inner(ki, _):
        k = k_ref[pl.ds(ki * k_inner, k_inner), :]
        v = v_ref[pl.ds(ki * k_inner, k_inner), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale

        m_prev = m_s[:, :1]
        l_prev = l_s[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_s[:] = jnp.broadcast_to(alpha * l_prev + jnp.sum(p, -1, keepdims=True), l_s.shape)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_s[:] = acc_s[:] * alpha + pv
        m_s[:] = jnp.broadcast_to(m_new, m_s.shape)
        return 0

    jax.lax.fori_loop(0, n_inner, inner, 0)

    @pl.when(j == num_kmaj - 1)
    def _finalize():
        o_ref[:] = (acc_s[:] / l_s[:, :1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k_major", "block_k")
)
def flash_attention_v2(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 1024,
    block_k_major: int = 2048,
    block_k: int = 512,
) -> jnp.ndarray:
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / (d**0.5)
    block_q = min(block_q, sq)
    block_k_major = min(block_k_major, sk)
    block_k = min(block_k, block_k_major)
    if sq % block_q or sk % block_k_major or block_k_major % block_k:
        raise ValueError(
            f"shapes ({sq}, {sk}) not divisible by blocks "
            f"({block_q}, {block_k_major}, {block_k})"
        )

    qr = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kr = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vr = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    num_q = sq // block_q
    num_kmaj = sk // block_k_major

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel_v2, scale=scale, num_kmaj=num_kmaj, k_inner=block_k
        ),
        grid=(b * h, num_q, num_kmaj),
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
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qr.size + kr.size + vr.size + b * h * sq * d)
            * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qr, kr, vr)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def _flash_kernel_v3(
    q_ref, k_ref, vt_ref, o_ref, s_a, s_b, m_s, l_s, acc_s, *, num_kv
):
    """Transposed-score flash attention with a skewed MXU/VPU pipeline.

    Two d=64 inefficiencies in v1/v2/bundled (measured 67 TF/s at the hot
    65k-token shape, ~68% of the half-depth MXU ceiling):

      * P @ V contracts over d=64 — half the 128-wide MXU. Here scores are
        kept transposed (S^T = K @ Q^T, shape (bk, bq)) so the PV matmul is
        V^T @ P^T: contraction over bk (full 128 depth) with output
        (d, bq) — d on sublanes, bq on lanes — fully utilized. V arrives
        pre-transposed as (bh, d, sk) (one cheap XLA relayout per call).
      * exp/softmax VPU work serializes behind each score matmul. Here the
        score block for kv step j is staged in a double-buffered VMEM
        scratch and consumed at step j+1, so the compiler can overlap
        step j's QK^T (MXU) with step j-1's exp/stats (VPU). The grid runs
        num_kv+1 steps; the extra step drains the last block.

    Logits are pre-scaled by log2(e)*softmax_scale outside the kernel and
    the online softmax runs in base 2 (exp2), which keeps normalization
    exact while saving a VPU multiply per score element.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, _NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    # --- stage: score matmul for kv block j (skewed: consumed at j+1) ----
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

    # --- stage: softmax + PV for kv block j-1 ----------------------------
    def _process(s_ref):
        st = s_ref[:]  # (bk, bq) fp32, already scaled to log2 units
        m_prev = m_s[:1, :]  # (1, bq)
        l_prev = l_s[:1, :]
        m_cur = jnp.max(st, axis=0, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(st - m_new)  # (bk, bq) fp32
        l_new = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)
        # V^T @ P^T on the MXU: contraction over bk (full depth), output
        # (d, bq) fills all 128 lanes with bq.
        pv = jax.lax.dot_general(
            vt_ref[:], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_s[:] = acc_s[:] * alpha + pv
        m_s[:] = jnp.broadcast_to(m_new, m_s.shape)
        l_s[:] = jnp.broadcast_to(l_new, l_s.shape)

    @pl.when((j > 0) & (j % 2 == 1))
    def _process_a():
        _process(s_a)

    @pl.when((j > 0) & (j % 2 == 0))
    def _process_b():
        _process(s_b)

    @pl.when(j == num_kv)
    def _finalize():
        o_ref[:] = (acc_s[:] / l_s[:1, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention_v3(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 2048,
    block_k: int = 512,
) -> jnp.ndarray:
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    if sq % block_q or sk % block_k:
        raise ValueError(f"seq lens ({sq}, {sk}) not divisible by blocks")

    # Fold softmax scale and the exp->exp2 base change into Q once.
    log2e = 1.4426950408889634
    qs = (q * jnp.asarray(log2e / (d**0.5), q.dtype)).astype(q.dtype)

    qr = qs.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kr = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    # V pre-transposed to (bh, d, sk) so the kernel's PV contraction runs
    # at full MXU depth (see _flash_kernel_v3).
    vt = v.transpose(0, 2, 3, 1).reshape(b * h, d, sk)

    num_q = sq // block_q
    num_kv = sk // block_k

    out = pl.pallas_call(
        functools.partial(_flash_kernel_v3, num_kv=num_kv),
        grid=(b * h, num_q, num_kv + 1),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec(
                (None, block_k, d),
                lambda bh, i, j, _n=num_kv: (bh, jnp.minimum(j, _n - 1), 0),
            ),
            pl.BlockSpec(
                (None, d, block_k),
                lambda bh, i, j: (bh, 0, jnp.maximum(j - 1, 0)),
            ),
        ],
        out_specs=pl.BlockSpec((None, d, block_q), lambda bh, i, j: (bh, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b * h, d, sq), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_k, block_q), jnp.float32),  # score buf A
            pltpu.VMEM((block_k, block_q), jnp.float32),  # score buf B
            pltpu.VMEM((8, block_q), jnp.float32),  # running max (log2)
            pltpu.VMEM((8, block_q), jnp.float32),  # running normalizer
            pltpu.VMEM((d, block_q), jnp.float32),  # output accumulator^T
        ],
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qr.size + kr.size + vt.size + b * h * sq * d)
            * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qr, kr, vt)

    # (bh, d, sq) -> (B, Sq, H, D)
    return out.reshape(b, h, d, sq).transpose(0, 3, 1, 2)


def _flash_kernel_v4(q_ref, k_ref, vt_ref, o_ref, s_a, s_b, m_s, acc_s, *, num_kv):
    """v3 plus: the softmax normalizer rides the PV matmul.

    V^T arrives with an appended ones-row ((d+1, bk)); row d of the
    (d+1, bq) accumulator is then sum_k P[k, q] — the online-softmax
    normalizer — computed by the MXU instead of a separate VPU reduction
    over the (bk, bq) score block. The alpha rescale of the accumulator
    renormalizes output and normalizer together, so the VPU per score
    element does only max + exp2 (v3 also paid a sum pass, which made it
    VPU-bound at ~92 TF/s on v5e)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, _NEG_INF)
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
        m_cur = jnp.max(st, axis=0, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(st - m_new)
        # rows 0..d-1: sum_k p*V; row d: sum_k p  (normalizer)
        pv = jax.lax.dot_general(
            vt_ref[:], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
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
        o_ref[:] = (acc_s[:d, :] / acc_s[d : d + 1, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention_v4(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 2048,
    block_k: int = 512,
) -> jnp.ndarray:
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    if sq % block_q or sk % block_k:
        raise ValueError(f"seq lens ({sq}, {sk}) not divisible by blocks")

    log2e = 1.4426950408889634
    qs = (q * jnp.asarray(log2e / (d**0.5), q.dtype)).astype(q.dtype)

    qr = qs.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kr = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vt = v.transpose(0, 2, 3, 1).reshape(b * h, d, sk)
    # ones-row -> the PV matmul also produces the softmax normalizer
    vt1 = jnp.concatenate([vt, jnp.ones((b * h, 1, sk), vt.dtype)], axis=1)

    num_q = sq // block_q
    num_kv = sk // block_k

    out = pl.pallas_call(
        functools.partial(_flash_kernel_v4, num_kv=num_kv),
        grid=(b * h, num_q, num_kv + 1),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec(
                (None, block_k, d),
                lambda bh, i, j, _n=num_kv: (bh, jnp.minimum(j, _n - 1), 0),
            ),
            pl.BlockSpec(
                (None, d + 1, block_k),
                lambda bh, i, j: (bh, 0, jnp.maximum(j - 1, 0)),
            ),
        ],
        out_specs=pl.BlockSpec((None, d, block_q), lambda bh, i, j: (bh, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b * h, d, sq), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_k, block_q), jnp.float32),
            pltpu.VMEM((block_k, block_q), jnp.float32),
            pltpu.VMEM((8, block_q), jnp.float32),  # running max (log2)
            pltpu.VMEM((d + 1, block_q), jnp.float32),  # acc^T + normalizer
        ],
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qr.size + kr.size + vt1.size + b * h * sq * d)
            * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qr, kr, vt1)

    return out.reshape(b, h, d, sq).transpose(0, 3, 1, 2)


def _flash_kernel_v5(q_ref, k_ref, vt_ref, o_ref):
    """Single-KV-pass attention for short-to-medium sequences.

    The whole key sequence is one block, so there is no online softmax:
    one score matmul, one max, one exp2, one sum, one PV matmul — none of
    v1-v4's running-stat rescales or staging logic, and the grid has no
    kv axis (no drain step, far fewer grid-step fixed costs — which
    dominate at the model's per-frame 2D shapes, e.g. 4k tokens at 51
    TF/s under v3). Scores stay transposed like v3 so PV contracts over
    the full sequence at full MXU depth. VMEM holds the (sk, bq) fp32
    score block: callers bound block_q so sk*block_q*4 fits (~32 MB)."""
    st = jax.lax.dot_general(
        k_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (sk, bq) fp32, log2 units (q pre-scaled)
    m = jnp.max(st, axis=0, keepdims=True)  # (1, bq)
    p = jnp.exp2(st - m)
    l = jnp.sum(p, axis=0, keepdims=True)
    pv = jax.lax.dot_general(
        vt_ref[:], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (d, bq)
    o_ref[:] = (pv / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def flash_attention_v5(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 512,
) -> jnp.ndarray:
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    if sq % block_q:
        raise ValueError(f"sq {sq} not divisible by block_q {block_q}")

    log2e = 1.4426950408889634
    qs = (q * jnp.asarray(log2e / (d**0.5), q.dtype)).astype(q.dtype)

    qr = qs.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kr = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vt = v.transpose(0, 2, 3, 1).reshape(b * h, d, sk)

    out = pl.pallas_call(
        _flash_kernel_v5,
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((None, sk, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, d, sk), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, d, block_q), lambda bh, i: (bh, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b * h, d, sq), q.dtype),
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qr.size + kr.size + vt.size + b * h * sq * d)
            * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qr, kr, vt)

    return out.reshape(b, h, d, sq).transpose(0, 3, 1, 2)


def _flash_kernel_v6(q_ref, k_ref, vt_ref, o_ref):
    """v5 batched over (batch*heads): ``block_b`` rows per grid step.

    The model's per-frame 2D attention (reference attn2 path,
    src/diffusers/models/attention.py:116-121) runs at s=1k-4k with
    batch*heads in the hundreds — there the grid-step fixed costs dominate
    (v3 at the 2d@64sq shape: 6,400 grid steps for 1.37 TFLOP, measured
    53.5 TF/s). Batching heads per step divides the step count by
    ``block_b``; the matmuls become MXU batched dot_generals and the
    whole-sequence score block lives in (raised-cap) VMEM."""
    st = jax.lax.dot_general(
        k_ref[:], q_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (bb, sk, bq) fp32, log2 units (q pre-scaled)
    m = jnp.max(st, axis=1, keepdims=True)
    p = jnp.exp2(st - m)
    l = jnp.sum(p, axis=1, keepdims=True)  # (bb, 1, bq)
    pv = jax.lax.dot_general(
        vt_ref[:], p.astype(vt_ref.dtype), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (bb, d, bq)
    o_ref[:] = (pv / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_b"))
def flash_attention_v6(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 1024,
    block_b: int = 4,
) -> jnp.ndarray:
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    block_b = min(block_b, b * h)
    if sq % block_q or (b * h) % block_b:
        raise ValueError(
            f"(sq={sq}, b*h={b * h}) not divisible by blocks "
            f"({block_q}, {block_b})"
        )

    log2e = 1.4426950408889634
    qs = (q * jnp.asarray(log2e / (d**0.5), q.dtype)).astype(q.dtype)

    qr = qs.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kr = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vt = v.transpose(0, 2, 3, 1).reshape(b * h, d, sk)

    out = pl.pallas_call(
        _flash_kernel_v6,
        grid=(b * h // block_b, sq // block_q),
        in_specs=[
            pl.BlockSpec((block_b, block_q, d), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((block_b, sk, d), lambda bb, i: (bb, 0, 0)),
            pl.BlockSpec((block_b, d, sk), lambda bb, i: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, d, block_q), lambda bb, i: (bb, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b * h, d, sq), q.dtype),
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qr.size + kr.size + vt.size + b * h * sq * d)
            * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qr, kr, vt)

    return out.reshape(b, h, d, sq).transpose(0, 3, 1, 2)


def flash_supported(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> bool:
    """Whether shapes divide cleanly into flash blocks (else XLA fallback)."""
    if q.ndim != 4 or k.shape != v.shape:
        return False
    _, sq, _, d = q.shape
    sk = k.shape[1]
    if d % 64 != 0 or d > 512:
        return False
    bq = min(DEFAULT_BLOCK_Q, sq)
    bk = min(DEFAULT_BLOCK_K, sk)
    return sq % bq == 0 and sk % bk == 0


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention_bundled(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 1024,
    block_k: int = 1024,
) -> jnp.ndarray:
    """jax's bundled TPU flash-attention kernel
    (jax.experimental.pallas.ops.tpu.flash_attention) on our (B, S, H, D)
    layout — used by the auto-dispatcher for the largest sequences where it
    currently outruns the local kernel."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention as _jax_flash,
    )

    b, sq, h, d = q.shape
    block_q = min(block_q, sq)
    block_k = min(block_k, k.shape[1])
    bs = BlockSizes(
        block_q=block_q, block_k_major=block_k, block_k=block_k, block_b=1,
        block_q_major_dkv=block_q, block_k_major_dkv=block_k,
        block_k_dkv=block_k, block_q_dkv=block_q,
        block_k_major_dq=block_k, block_k_dq=block_k, block_q_dq=block_q,
    )
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _jax_flash(
        qt, kt, vt, causal=False, sm_scale=1.0 / (d**0.5), block_sizes=bs
    )
    return out.transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,  # (B, Sk, H, D)
    v: jnp.ndarray,  # (B, Sk, H, D)
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / (d**0.5)

    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    if sq % block_q or sk % block_k:
        raise ValueError(f"seq lens ({sq}, {sk}) not divisible by blocks")

    # (B, S, H, D) -> (B*H, S, D)
    qr = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kr = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vr = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)

    num_q = sq // block_q
    num_kv = sk // block_k

    grid = (b * h, num_q, num_kv)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, num_kv=num_kv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((None, block_k, d), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda bh, i, j: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running normalizer
            pltpu.VMEM((block_q, d), jnp.float32),  # output accumulator
        ],
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qr.size + kr.size + vr.size + b * h * sq * d)
            * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qr, kr, vr)

    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
