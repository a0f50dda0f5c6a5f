"""Context (sequence) parallelism for the 3D attention.

The model's long axis is the joint (frames * hw) token sequence — up to
98,304 tokens per temporal window. For multi-chip execution the right
decomposition is: shard the *query* blocks across devices and all-gather
K/V — K/V at 98k tokens is only ~#heads * 64 * 2B * S ≈ 126 MB, while the
(S, S) score matrix (which never materializes thanks to flash) would be
38 GB. Each device then runs the local flash kernel over its query shard.

This is exact (not windowed/approximate) and composes with the data-
parallel task axis: mesh ("data", "model") with queries sharded on
"model".

Use inside shard_map:

    out = cp_dot_product_attention(q_local, k_local, v_local, axis="model")
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffuman4d_tpu.ops.attention import dot_product_attention


def cp_dot_product_attention(
    q: jnp.ndarray,  # (B, S_local, H, D) — query shard of this device
    k: jnp.ndarray,  # (B, S_local, H, D) — key shard of this device
    v: jnp.ndarray,  # (B, S_local, H, D)
    axis: str = "model",
    implementation: str = "auto",
) -> jnp.ndarray:
    """All-gather K/V over ``axis`` and attend the local query shard."""
    k_full = jax.lax.all_gather(k, axis, axis=1, tiled=True)
    v_full = jax.lax.all_gather(v, axis, axis=1, tiled=True)
    return dot_product_attention(q, k_full, v_full, implementation=implementation)


def cp_attention_grouped(
    q: jnp.ndarray,  # (B, S_local, H, D) — this shard's query tokens
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis: str = "model",
    groups: int = 1,
    implementation: str = "auto",
) -> jnp.ndarray:
    """Context-parallel attention for the UNet's 3D attention under
    ``shard_map`` with the window's *frame axis* sharded over ``axis``.

    The global batch is ``groups`` independent sequences laid out b-major
    (the CFG negative/positive halves, pipeline_diffuman4d.py:382-386) and
    each shard holds contiguous frames of exactly one group. K/V are
    all-gathered over the mesh axis (cheap: ~C·S·2B vs the never-
    materialized (S, S) score matrix) and restricted to this shard's group
    so CFG halves never attend across (reference semantics: attention
    spans one window batch only, attention.py:69-83)."""
    k_full = jax.lax.all_gather(k, axis, axis=1, tiled=True)
    v_full = jax.lax.all_gather(v, axis, axis=1, tiled=True)
    if groups > 1:
        n_shards = k_full.shape[1] // k.shape[1]
        if n_shards % groups:
            raise ValueError(
                f"mesh axis size {n_shards} must be a multiple of the "
                f"group count {groups} (CFG halves may not straddle shards)"
            )
        group_len = k_full.shape[1] // groups
        g = jax.lax.axis_index(axis) // (n_shards // groups)
        k_full = jax.lax.dynamic_slice_in_dim(k_full, g * group_len, group_len, 1)
        v_full = jax.lax.dynamic_slice_in_dim(v_full, g * group_len, group_len, 1)
    return dot_product_attention(q, k_full, v_full, implementation=implementation)


def shard_attention_over_mesh(mesh, q, k, v, implementation: str = "auto"):
    """Convenience: run one attention with the sequence axis sharded over
    the mesh 'model' axis (queries stay sharded end-to-end)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(None, "model", None, None)

    def f(ql, kl, vl):
        return cp_dot_product_attention(ql, kl, vl, axis="model",
                                        implementation=implementation)

    return shard_map(f, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)(
        q, k, v
    )
