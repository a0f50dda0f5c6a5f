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


# ---------------------------------------------------------------------------
# communication budget: the analytical model behind docs/SCALING.md
# ---------------------------------------------------------------------------
def three_d_attention_layers(cfg) -> list[tuple[int, int]]:
    """(downscale_exponent, n_transformer_layers) for every UNet stage
    whose attention runs in 3D (cross-frame) mode — the only stages that
    communicate under context parallelism (K/V all-gathers in
    ops/context_parallel.cp_attention_grouped; everything else is
    frame-local). Mirrors the forward's gating exactly
    (models/unet.py: down ``n_blocks-i-1 < k``, mid always, up ``i < k``;
    reference unet_multiview_condition.py:560/570/582)."""
    n_blocks = len(cfg.block_out_channels)
    k = cfg.num_3d_attn_blocks
    out = []
    for i in range(n_blocks - 1):  # CrossAttn down blocks
        if n_blocks - i - 1 < k:
            out.append((i, cfg.layers_per_block * cfg.transformer_layers_per_block))
    out.append((n_blocks - 1, cfg.transformer_layers_per_block))  # mid
    for i in range(1, n_blocks):  # CrossAttn up blocks
        if i < k:
            out.append(
                (n_blocks - 1 - i,
                 (cfg.layers_per_block + 1) * cfg.transformer_layers_per_block)
            )
    return out


def cp_comm_budget(cfg, num_frames: int, latent_hw: int, groups: int = 2,
                   n_model: int = 2, dtype_bytes: int = 2) -> dict:
    """Per-window-step CP communication budget at a given topology.

    Returns per-stage and total all-gather bytes *received per chip* for
    one UNet forward (K and V each all-gathered once per 3D transformer
    layer; each chip receives (n-1)/n of the full gathered size). The
    expected collective count is what tests/test_cp_unet.py pins against
    the lowered program."""
    stages = three_d_attention_layers(cfg)
    per_stage = []
    total_rx = 0
    n_layers_total = 0
    for stage_idx, n_layers in stages:
        hw = (latent_hw // (2**stage_idx)) ** 2
        heads = cfg.num_attention_heads[stage_idx]
        d = cfg.block_out_channels[stage_idx] // heads
        s_full = num_frames * hw  # tokens per group (CFG half)
        kv_full = 2 * groups * s_full * heads * d * dtype_bytes  # K + V
        rx = kv_full * (n_model - 1) // n_model * n_layers
        total_rx += rx
        n_layers_total += n_layers
        per_stage.append(
            {
                "stage_hw": latent_hw // (2**stage_idx),
                "layers": n_layers,
                "tokens_per_group": s_full,
                "kv_bytes_full": kv_full,
                "rx_bytes_per_chip": rx,
            }
        )
    return {
        "stages": per_stage,
        "n_3d_layers": n_layers_total,
        "expected_all_gathers": 2 * n_layers_total,  # K and V
        "rx_bytes_per_chip_total": total_rx,
    }
