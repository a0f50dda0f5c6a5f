"""Context-parallel UNet forward: one window's denoise step spread over
the mesh "model" axis.

The reference has nothing here — one window step is strictly single-GPU
(sampling_utils.py:44-51 pins one pipeline replica per device). On TPU the
window's *frame axis* (CFG batch of 32/48 frames, SURVEY §3.3) shards
cleanly: convs, norms, feed-forwards, and the per-frame 2D attention are
frame-local, so the only communication is the K/V all-gather inside the
deepest stages' 3D attention (ops/context_parallel.cp_attention_grouped)
— a few hundred MB over ICI vs the ~38 GB score matrix that never
materializes.

Layout contract (checked here):
  * global batch = groups * num_frames, b-major (CFG negative half first,
    pipeline_diffuman4d.py:382-386)
  * mesh axis size n: groups | n and n | batch, with >= 2 frames per
    shard so the 3D/2D attention stage gating (num_frames > 1) stays
    decidable from local shapes
"""

from __future__ import annotations

import jax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from diffuman4d_tpu.models.unet import UNetMultiviewCondition


def make_cp_unet_apply(unet: UNetMultiviewCondition, mesh, axis: str = "model"):
    """Returns ``fn(params, x, t, tem, num_frames, pose_features=None)``
    computing the UNet forward with the frame axis sharded over
    ``mesh[axis]``. Output matches the single-device forward exactly (same
    math; attention K/V gathered rather than resident)."""
    n = mesh.shape[axis]

    def apply_fn(params, x, t, tem, num_frames, pose_features=None):
        B = x.shape[0]
        groups = B // num_frames
        if B % num_frames:
            raise ValueError(f"batch {B} not a multiple of num_frames {num_frames}")
        if B % n:
            raise ValueError(f"batch {B} not divisible by mesh axis {axis}={n}")
        if n % groups:
            raise ValueError(
                f"mesh axis {axis}={n} must be a multiple of the CFG group "
                f"count {groups} so halves never straddle a shard"
            )
        local_frames = B // n
        if n > 1 and local_frames < 2:
            raise ValueError(
                f"{axis}={n} leaves {local_frames} frame/shard; need >= 2 "
                "(3D-attention stage gating is decided from local shapes)"
            )

        cp_unet = UNetMultiviewCondition(
            unet.config,
            dtype=unet.dtype,
            attn_implementation="cp",
            cp_groups=groups,
        )
        sh = P(axis)

        if pose_features is not None:
            def local(p, xl, tl, teml, pfl):
                return cp_unet.apply(
                    p, xl, tl, tem_indices=teml, num_frames=local_frames,
                    pose_features=pfl,
                )

            # check_vma=False: lets this shard_map also run under
            # jax.vmap(..., spmd_axis_name="data") for combined data x model
            # wave sampling (the vma check rejects the mixed manual axes)
            return shard_map(
                local, mesh=mesh,
                in_specs=(P(), sh, sh, sh, sh), out_specs=sh,
                check_vma=False,
            )(params, x, t, tem, pose_features)

        def local(p, xl, tl, teml):
            return cp_unet.apply(
                p, xl, tl, tem_indices=teml, num_frames=local_frames
            )

        return shard_map(
            local, mesh=mesh, in_specs=(P(), sh, sh, sh), out_specs=sh,
            check_vma=False,
        )(params, x, t, tem)

    return apply_fn
