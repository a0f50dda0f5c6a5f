"""Per-stage timing of the VAE decoder on the real chip.

VERDICT r2: decode measured 0.207 s/img at 1024^2 (~50 TF/s effective on
~10.5 TFLOP/img) — the worst MFU in the system. This decomposes it:
each decoder stage is timed standalone (random weights; timing only),
next to a raw 3x3-conv reference at the same (channels, resolution) so
XLA-conv MFU and norm/upsample overhead separate cleanly.

Usage: python scripts/profile_vae.py [--batch N]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from diffuman4d_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffuman4d_tpu.models.layers import GroupNorm, ResnetBlock2D, Upsample2D
from diffuman4d_tpu.models.vae import MidBlock


def sync(x):
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def time_mod(name, mod, shape, flops, iters=10):
    """The axon relay costs ~35 ms per host->device->host round trip, so a
    per-call sync would swamp sub-50ms ops. Dispatch ``iters`` async calls
    (the device executes its queue in order) and sync ONCE at the end —
    residual overhead is one round trip / iters."""
    x = jnp.zeros(shape, jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda p, v: mod.apply(p, v))
    sync(fwd(params, x))  # compile
    t0 = time.perf_counter()
    y = None
    for _ in range(iters):
        y = fwd(params, x)
    sync(y)
    dt = (time.perf_counter() - t0) / iters
    tf = flops / dt / 1e12
    print(f"{name:34s} {dt * 1e3:8.1f} ms  {tf:6.1f} TF/s", flush=True)
    return dt


class RawConv(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.ch, (3, 3), padding=1, dtype=jnp.bfloat16)(x)


class NormAct(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.silu(GroupNorm(32, 1e-6)(x))


def conv_flops(b, h, w, cin, cout):
    return 2 * 9 * cin * cout * b * h * w


def resnet_flops(b, h, w, cin, cout):
    f = conv_flops(b, h, w, cin, cout) + conv_flops(b, h, w, cout, cout)
    if cin != cout:
        f += 2 * cin * cout * b * h * w
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    b = args.batch
    print(f"device: {jax.devices()[0].platform}, batch {b}", flush=True)

    total = 0.0
    # decoder structure: conv_in(4->512)@128, mid(512)@128,
    # stage0: 3x res512@128 + up->256, stage1: 3x res512@256 + up->512,
    # stage2: res(512->256)+2x res256@512 + up->1024,
    # stage3: res(256->128)+2x res128@1024, norm+silu+conv_out(128->3)
    total += time_mod(
        "mid(512)@128^2", MidBlock(512), (b, 128, 128, 512),
        2 * resnet_flops(b, 128, 128, 512, 512)
        + 4 * 128**4 * 512 * b  # attn: QK+PV at 16k tokens
        + 4 * 2 * 512 * 512 * b * 128**2,  # qkv+out projections
    )
    total += time_mod(
        "res512@128^2 x3", ResnetBlock2D(512, use_temb=False),
        (b, 128, 128, 512), resnet_flops(b, 128, 128, 512, 512),
    ) * 3
    total += time_mod(
        "up512@128->256", Upsample2D(512), (b, 128, 128, 512),
        conv_flops(b, 256, 256, 512, 512),
    )
    total += time_mod(
        "res512@256^2 x3", ResnetBlock2D(512, use_temb=False),
        (b, 256, 256, 512), resnet_flops(b, 256, 256, 512, 512),
    ) * 3
    total += time_mod(
        "up512@256->512", Upsample2D(512), (b, 256, 256, 512),
        conv_flops(b, 512, 512, 512, 512),
    )
    total += time_mod(
        "res512->256@512^2", ResnetBlock2D(256, use_temb=False),
        (b, 512, 512, 512), resnet_flops(b, 512, 512, 512, 256),
    )
    total += time_mod(
        "res256@512^2 x2", ResnetBlock2D(256, use_temb=False),
        (b, 512, 512, 256), resnet_flops(b, 512, 512, 256, 256),
    ) * 2
    total += time_mod(
        "up256@512->1024", Upsample2D(256), (b, 512, 512, 256),
        conv_flops(b, 1024, 1024, 256, 256),
    )
    total += time_mod(
        "res256->128@1024^2", ResnetBlock2D(128, use_temb=False),
        (b, 1024, 1024, 256), resnet_flops(b, 1024, 1024, 256, 128),
    )
    total += time_mod(
        "res128@1024^2 x2", ResnetBlock2D(128, use_temb=False),
        (b, 1024, 1024, 128), resnet_flops(b, 1024, 1024, 128, 128),
    ) * 2
    total += time_mod(
        "out: norm+silu+conv@1024^2",
        nn.Sequential([NormAct(), RawConv(3)]), (b, 1024, 1024, 128),
        conv_flops(b, 1024, 1024, 128, 3),
    )
    print(f"--- stage sum: {total * 1e3 / b:.1f} ms/img", flush=True)

    print("\nraw conv / norm references:", flush=True)
    for ch, hw in [(512, 128), (512, 256), (256, 512), (128, 1024), (256, 1024)]:
        time_mod(
            f"conv3x3 {ch}ch@{hw}^2", RawConv(ch), (b, hw, hw, ch),
            conv_flops(b, hw, hw, ch, ch),
        )
    for ch, hw in [(512, 256), (256, 512), (128, 1024)]:
        time_mod(f"GN+silu {ch}ch@{hw}^2", NormAct(), (b, hw, hw, ch), 0)
    for ch, hw in [(512, 128), (512, 256), (256, 512)]:
        time_mod(
            f"upsample2x {ch}ch@{hw}^2", Upsample2D(ch), (b, hw, hw, ch),
            conv_flops(b, 2 * hw, 2 * hw, ch, ch),
        )


if __name__ == "__main__":
    main()
