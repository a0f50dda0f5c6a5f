"""Pallas 3x3 conv for the VAE's large-spatial stages.

Why this exists (measured, r4 in-graph profile /tmp/units_r4b.log): XLA's
conv at the decoder tail shapes re-reads the input per kernel tap —
conv3x3 @1024^2x128 runs at 59 TF/s and a full ResnetBlock2D at 36.9,
while the same resnet at UNet shapes (128^2x320) runs at 157-195 TF/s.
The decode path (pipeline.py::decode, reference post_process
pipeline_diffuman4d.py:280-285) spends ~70% of its 0.205 s/img there.

Design (TPU-first, not a translation — the reference's VAE is stock
torch/cuDNN):

- grid = (batch, H/TR row tiles); the input stays in HBM (``pl.ANY``)
  and each step manually DMAs its (TR+2)-row halo window into a
  double-buffered VMEM scratch, prefetching the next tile's window while
  computing the current one. One HBM read total instead of XLA's ~9.
- the 9 taps are 9 MXU matmuls (TR*W, Cin) @ (Cin, Cout) accumulated in
  an fp32 VMEM scratch; width shifts become static accumulator slices
  (implicit zero padding), height shifts pick rows of the halo window.
- optional fused prologue: per-(batch, channel) affine ``x*scale+shift``
  + SiLU. With scale/shift folded from GroupNorm statistics (see
  ``groupnorm_affine``), a full ``GN -> silu -> conv`` chain becomes one
  cheap XLA stats reduction + this kernel — no normalized intermediate
  ever hits HBM.
- optional fused residual: the epilogue adds a same-shape residual
  (DMA'd with the same double-buffering), fusing ResnetBlock2D's
  ``x + h`` skip into conv2's output write.

Numerics: bf16 in/out, fp32 accumulation and fp32 affine/bias — matches
the repo-wide convention (fp32 norm statistics, bf16 matmuls).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _conv_kernel(
    x_hbm,
    scale_ref,
    shift_ref,
    w_ref,
    b_ref,
    res_hbm,
    out_ref,
    xs,
    rs,
    acc,
    sems,
    rsems,
    *,
    TR: int,
    nH: int,
    B: int,
    W: int,
    Cin: int,
    Cout: int,
    silu: bool,
    has_affine: bool,
    has_res: bool,
    out_dtype,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    step = b * nH + i
    nsteps = B * nH

    def issue_x(slot, s, start: bool):
        """Start (or wait on) the halo-window DMA for linear step ``s``.

        The window covers input rows [r0-1, r0+TR] clamped to [0, H);
        boundary tiles copy TR+1 rows and the missing halo row is zeroed
        after the wait. The wait path reconstructs the identical
        descriptor (standard Mosaic pattern)."""
        b2 = s // nH
        i2 = s % nH

        @pl.when(i2 == 0)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[b2, pl.ds(0, TR + 1)],
                xs.at[slot, pl.ds(1, TR + 1)],
                sems.at[slot],
            )
            dma.start() if start else dma.wait()

        @pl.when(jnp.logical_and(i2 > 0, i2 < nH - 1))
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[b2, pl.ds(i2 * TR - 1, TR + 2)],
                xs.at[slot],
                sems.at[slot],
            )
            dma.start() if start else dma.wait()

        @pl.when(i2 == nH - 1)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[b2, pl.ds(i2 * TR - 1, TR + 1)],
                xs.at[slot, pl.ds(0, TR + 1)],
                sems.at[slot],
            )
            dma.start() if start else dma.wait()

    def issue_r(slot, s, start: bool):
        b2 = s // nH
        i2 = s % nH
        dma = pltpu.make_async_copy(
            res_hbm.at[b2, pl.ds(i2 * TR, TR)],
            rs.at[slot],
            rsems.at[slot],
        )
        dma.start() if start else dma.wait()

    slot = step % 2
    nslot = (step + 1) % 2

    @pl.when(step == 0)
    def _():
        issue_x(slot, step, True)
        if has_res:
            issue_r(slot, step, True)

    @pl.when(step + 1 < nsteps)
    def _():
        issue_x(nslot, step + 1, True)
        if has_res:
            issue_r(nslot, step + 1, True)

    issue_x(slot, step, False)

    # The affine+silu prologue must happen BEFORE zero padding (the conv
    # pads the normalized activation with zeros, not raw x), so transform
    # the whole halo window in place first, then zero the halo rows.
    if has_affine or silu:
        t = xs[slot][...].astype(jnp.float32)
        if has_affine:
            t = t * scale_ref[b][None, None, :] + shift_ref[b][None, None, :]
        if silu:
            t = t * jax.nn.sigmoid(t)
        xs[slot] = t.astype(xs.dtype)

    @pl.when(i == 0)
    def _():
        xs[slot, 0] = jnp.zeros((W, Cin), xs.dtype)

    @pl.when(i == nH - 1)
    def _():
        xs[slot, TR + 1] = jnp.zeros((W, Cin), xs.dtype)

    for dy in range(3):
        src = xs[slot, pl.ds(dy, TR)].reshape(TR * W, Cin)
        for dx in range(3):
            tap = dy * 3 + dx
            w_tap = w_ref[pl.ds(tap * Cin, Cin)]  # (Cin, Cout)
            y = jnp.dot(src, w_tap, preferred_element_type=jnp.float32)
            y = y.reshape(TR, W, Cout)
            first = dy == 0
            if dx == 0:
                if first:
                    acc[:, pl.ds(1, W - 1)] = y[:, : W - 1]
                    acc[:, 0] = jnp.zeros((TR, Cout), jnp.float32)
                else:
                    acc[:, pl.ds(1, W - 1)] += y[:, : W - 1]
            elif dx == 1:
                acc[...] += y
            else:
                acc[:, pl.ds(0, W - 1)] += y[:, 1:]

    out = acc[...] + b_ref[0][None, None, :]
    if has_res:
        issue_r(slot, step, False)
        out = out + rs[slot].astype(jnp.float32)
    out_ref[0] = out.astype(out_dtype)


def _pick_tile_rows(H: int, W: int, Cin: int, Cout: int) -> int | None:
    """Largest TR in {32,16,8} with H%TR==0, >=2 tiles, and a VMEM
    footprint (double-buffered halo windows + fp32 accumulator + output
    block) comfortably under the 100MB cap."""
    for tr in (32, 16, 8):
        if H % tr or H // tr < 2:
            continue
        vmem = (
            2 * (tr + 2) * W * Cin * 2  # x windows (bf16, 2 slots)
            + tr * W * Cout * 4  # accumulator
            + 2 * tr * W * Cout * 2  # pipelined output block
            + 2 * tr * W * Cout * 2  # residual windows (worst case)
            + 9 * Cin * Cout * 2  # weights
        )
        if vmem <= 80 * 1024 * 1024:
            return tr
    return None


def pallas_conv3x3_ok(shape: tuple[int, ...], cout: int) -> bool:
    """Static eligibility gate: TPU-profitable shapes only. XLA's conv is
    fine (157-225 TF/s) at the UNet's small-spatial stages; the Pallas
    path wins where spatial is large relative to channels (measured
    crossover: >=256^2 at <=512ch, /tmp/units_r4b.log)."""
    if len(shape) != 4:
        return False
    _, H, W, Cin = shape
    big_spatial = H * W >= 256 * 256
    mid_spatial = H * W >= 128 * 128 and max(Cin, cout) >= 512
    return (
        Cin % 128 == 0
        and cout % 128 == 0
        and (big_spatial or mid_spatial)
        and W * max(Cin, cout) * 2 <= 2 * 1024 * 1024  # halo row must be cheap
        and _pick_tile_rows(H, W, Cin, cout) is not None
    )


@functools.partial(
    jax.jit, static_argnames=("silu", "tile_rows", "interpret")
)
def conv3x3(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    scale: jnp.ndarray | None = None,
    shift: jnp.ndarray | None = None,
    residual: jnp.ndarray | None = None,
    *,
    silu: bool = False,
    tile_rows: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused ``conv3x3(silu(x*scale+shift)) + bias (+ residual)``.

    x: (B,H,W,Cin) bf16 NHWC; w: (3,3,Cin,Cout); bias: (Cout,);
    scale/shift: (B,Cin) f32 per-batch-channel affine (defaults 1/0);
    residual: (B,H,W,Cout) added to the output. stride 1, SAME padding.

    Differentiable: the forward runs the Pallas kernel; the backward is
    the VJP of an exact XLA restatement of the same math (see
    ``_conv3x3_ref``), so the op composes with ``jax.grad`` / remat in
    the training step.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    TR = tile_rows or _pick_tile_rows(H, W, Cin, Cout)
    if TR is None:
        raise ValueError(f"no tile size for {x.shape}->{Cout}")
    has_affine = scale is not None
    if scale is None:
        scale = jnp.ones((B, Cin), jnp.float32)
    if shift is None:
        shift = jnp.zeros((B, Cin), jnp.float32)
    has_res = residual is not None
    # residual is DMA'd into an x.dtype scratch — a mismatched caller dtype
    # (e.g. fp32 residual with bf16 conv) would trip Mosaic at trace time
    res = (
        residual.astype(x.dtype)
        if has_res
        else jnp.zeros((B, 1, 1, Cout), x.dtype)
    )
    return _conv3x3_p(
        silu, has_affine, has_res, TR, interpret, x, w, bias, scale, shift,
        res,
    )


def _conv3x3_ref(x, w, bias, scale, shift, res, silu, has_affine, has_res):
    """XLA restatement of the kernel's math (bf16 taps, fp32 prologue /
    accumulation / bias) — the autodiff reference for the backward pass
    and the A/B baseline in tests."""
    h = x.astype(jnp.bfloat16)
    if has_affine or silu:
        t = h.astype(jnp.float32)
        if has_affine:
            t = t * scale[:, None, None, :] + shift[:, None, None, :]
        if silu:
            t = t * jax.nn.sigmoid(t)
        h = t.astype(jnp.bfloat16)
    # bf16-rounded operands, fp32 conv == bf16 MXU matmul with fp32
    # accumulation; all-fp32 operands keep lax.conv's transpose rule
    # happy under vjp (mixed bf16/fp32 cotangents are rejected)
    y = jax.lax.conv_general_dilated(
        h.astype(jnp.float32),
        w.astype(jnp.bfloat16).astype(jnp.float32),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + bias.astype(jnp.float32).reshape(1, 1, 1, -1)
    if has_res:
        y = y + res.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _conv3x3_p(silu, has_affine, has_res, tile_rows, interpret,
               x, w, bias, scale, shift, res):
    return _conv3x3_pallas(
        x, w, bias, scale, shift, res, silu=silu, has_affine=has_affine,
        has_res=has_res, tile_rows=tile_rows, interpret=interpret,
    )


def _conv3x3_p_fwd(silu, has_affine, has_res, tile_rows, interpret,
                   x, w, bias, scale, shift, res):
    out = _conv3x3_p(
        silu, has_affine, has_res, tile_rows, interpret, x, w, bias, scale,
        shift, res,
    )
    return out, (x, w, bias, scale, shift, res)


def _conv3x3_p_bwd(silu, has_affine, has_res, tile_rows, interpret,
                   saved, g):
    """Hand-written VJP in bf16 operands / fp32 accumulation.

    Deliberately NOT jax.vjp(_conv3x3_ref): lax.conv's transpose rule
    rejects mixed bf16/fp32 cotangents, and routing the ref through
    all-fp32 conv operands to appease it costs 8x MXU rate and doubled
    activation temps in the backward — measured as the r4 train-step
    regression (16.1 GB > 15.75 GB HBM at the 12-frame window that fit
    before). Both backward convs here are direct primal calls (bf16
    operands, fp32 accumulation), same cost shape as XLA's own conv
    grads."""
    x, w, bias, scale, shift, res = saved
    wb = w.astype(jnp.bfloat16)
    xb32 = x.astype(jnp.bfloat16).astype(jnp.float32)
    # recompute the prologue (cheap VPU) — pre-activation needed for the
    # silu/affine chain, post-activation for the weight grad
    pre = (
        xb32 * scale[:, None, None, :] + shift[:, None, None, :]
        if has_affine
        else xb32
    )
    act = pre * jax.nn.sigmoid(pre) if silu else pre
    h = act.astype(jnp.bfloat16)

    gb = g.astype(jnp.bfloat16)
    g32 = g.astype(jnp.float32)
    dbias = jnp.sum(g32, axis=(0, 1, 2)).astype(bias.dtype)
    dres = (
        g.astype(res.dtype) if has_res else jnp.zeros_like(res)
    )
    # d(activation): correlate g with the 180deg-flipped, IO-swapped kernel
    dh = jax.lax.conv_general_dilated(
        gb,
        jnp.flip(wb, (0, 1)).swapaxes(2, 3),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    # dw[ky,kx,ci,co] = sum_{b,oy,ox} h[b,oy+ky-1,ox+kx-1,ci] g[b,oy,ox,co]
    # — a conv contracting over (batch, spatial) with h's channels as the
    # "batch" and g as an (H, W)-sized kernel, padding 1 -> 3x3 output
    dw = jax.lax.conv_general_dilated(
        h,
        gb,
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("CHWN", "IHWO", "HWNC"),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)

    if silu:
        sig = jax.nn.sigmoid(pre)
        dpre = dh * (sig * (1.0 + pre * (1.0 - sig)))
    else:
        dpre = dh
    if has_affine:
        dscale = jnp.sum(dpre * xb32, axis=(1, 2)).astype(scale.dtype)
        dshift = jnp.sum(dpre, axis=(1, 2)).astype(shift.dtype)
        dx = (dpre * scale[:, None, None, :]).astype(x.dtype)
    else:
        dscale = jnp.zeros_like(scale)
        dshift = jnp.zeros_like(shift)
        dx = dpre.astype(x.dtype)
    return dx, dw, dbias, dscale, dshift, dres


_conv3x3_p.defvjp(_conv3x3_p_fwd, _conv3x3_p_bwd)


def _conv3x3_pallas(x, w, bias, scale, shift, res, *, silu, has_affine,
                    has_res, tile_rows, interpret):
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    TR = tile_rows
    nH = H // TR
    w2 = w.reshape(9 * Cin, Cout).astype(jnp.bfloat16)
    bias2 = bias.reshape(1, Cout).astype(jnp.float32)

    kernel = functools.partial(
        _conv_kernel,
        TR=TR,
        nH=nH,
        B=B,
        W=W,
        Cin=Cin,
        Cout=Cout,
        silu=silu,
        has_affine=has_affine,
        has_res=has_res,
        out_dtype=x.dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x (manual DMA)
            pl.BlockSpec(
                (B, Cin), lambda b, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (B, Cin), lambda b, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (9 * Cin, Cout), lambda b, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, Cout), lambda b, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # residual (manual DMA)
        ],
        out_specs=pl.BlockSpec(
            (1, TR, W, Cout), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TR + 2, W, Cin), jnp.bfloat16),
            pltpu.VMEM((2, TR, W, Cout), x.dtype),
            pltpu.VMEM((TR, W, Cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x.astype(jnp.bfloat16), scale, shift, w2, bias2, res)


def groupnorm_affine(
    x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
    groups: int, eps: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fold GroupNorm statistics into a per-(batch, channel) affine for
    the conv prologue: ``(x - mean) * rstd * gamma + beta`` ==
    ``x * scale + shift``. One fp32 stats reduction over (H,W,C/G) —
    the only pass over x that isn't fused into the conv."""
    B, H, W, C = x.shape
    # Reduce over (H, W) per channel FIRST — keeps C on the lanes (a
    # (B,HW,G,C/G) reshape puts 4 elements on the minor dim and runs
    # ~20x slower) — then group-reduce the tiny (B, C) moments.
    xf = x.astype(jnp.float32)
    s1 = jnp.mean(xf, axis=(1, 2))  # (B, C)
    s2 = jnp.mean(jnp.square(xf), axis=(1, 2))
    mean = s1.reshape(B, groups, -1).mean(axis=-1)  # (B, G)
    var = s2.reshape(B, groups, -1).mean(axis=-1) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)  # (B, G)
    rep = jnp.repeat(rstd, C // groups, axis=1)  # (B, C)
    mrep = jnp.repeat(mean, C // groups, axis=1)
    scale = rep * gamma.astype(jnp.float32)[None, :]
    shift = beta.astype(jnp.float32)[None, :] - mrep * scale
    return scale, shift
