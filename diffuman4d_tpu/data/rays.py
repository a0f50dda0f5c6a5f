"""Rays, Plücker embeddings, and relative poses — pure JAX, channels-last.

Behavioral parity targets (reference: src/data/utils/ray_utils.py):
  * pixel-center rays from K, R, T (ray_utils.py:75-91): pixel coords are
    (j+0.5, i+0.5), ray_o = -R^T T, ray_d = normalize(R^T(K^-1 x - T) - ray_o)
    with eps=1e-8 in the norm
  * Plücker embedding = concat(ray_d, ray_o x ray_d) (ray_utils.py:109-112)
  * relative poses w.r.t. the sample's first camera (ray_utils.py:115-119)

TPU-first difference: the reference computes the embedding at full image
resolution (1024^2) and bilinearly resizes it to latent resolution (128^2)
on the GPU (pipeline_diffuman4d.py:218-225 -> F.interpolate bilinear,
no antialias). Here :func:`calc_plucker_embeds_lowres` evaluates the rays
only at the exact bilinear tap coordinates and blends them with the exact
bilinear weights — bit-equivalent to "full-res then torch-bilinear-resize"
at a fraction (≈ (2*out/in)^2) of the FLOPs and memory.

Layout: channels-last, (B, H, W, 6).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Channel-last normalization with additive eps (ray_utils.py:5-8)."""
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def _rays_at_coords(
    ii: jnp.ndarray,  # (H',) row pixel coords, already +0.5 centered
    jj: jnp.ndarray,  # (W',) col pixel coords, already +0.5 centered
    K: jnp.ndarray,  # (B, 3, 3)
    R: jnp.ndarray,  # (B, 3, 3) world-to-camera rotation
    T: jnp.ndarray,  # (B, 3, 1) world-to-camera translation
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rays at the outer product of coords. Returns (ray_o, ray_d), each
    (B, H', W', 3); fp32 throughout."""
    K = K.astype(jnp.float32)
    R = R.astype(jnp.float32)
    T = T.astype(jnp.float32)
    invK = jnp.linalg.inv(K)  # (B, 3, 3)
    ray_o = -jnp.einsum("bij,bjk->bik", R.swapaxes(-1, -2), T)[..., 0]  # (B, 3)

    jg, ig = jnp.meshgrid(jj, ii, indexing="xy")  # (H', W') each
    xy1 = jnp.stack([jg, ig, jnp.ones_like(ig)], axis=-1)  # (H', W', 3)
    # pixel_camera = invK @ xy1 ; pixel_world = R^T (pixel_camera - T)
    pix_cam = jnp.einsum("bij,hwj->bhwi", invK, xy1)
    pix_world = jnp.einsum("bij,bhwj->bhwi", R.swapaxes(-1, -2), pix_cam - T[:, None, None, :, 0])
    ray_d = normalize(pix_world - ray_o[:, None, None, :])
    ray_o = jnp.broadcast_to(ray_o[:, None, None, :], ray_d.shape)
    return ray_o, ray_d


def get_rays(
    H: int, W: int, K: jnp.ndarray, R: jnp.ndarray, T: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full-resolution pixel-center rays. (B,H,W,3) each."""
    ii = jnp.arange(H, dtype=jnp.float32) + 0.5
    jj = jnp.arange(W, dtype=jnp.float32) + 0.5
    return _rays_at_coords(ii, jj, K, R, T)


def _pose_to_extrinsics(pose: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """camera-to-world pose (B,4,4) -> (R, T) of the world-to-camera extrinsic."""
    extrinsic = jnp.linalg.inv(pose.astype(jnp.float32))
    return extrinsic[:, :3, :3], extrinsic[:, :3, 3:]


def _plucker_from_rays(ray_o: jnp.ndarray, ray_d: jnp.ndarray) -> jnp.ndarray:
    plucker_normal = jnp.cross(ray_o, ray_d)
    return jnp.concatenate([ray_d, plucker_normal], axis=-1)


def calc_plucker_embeds(h: int, w: int, K: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Full-resolution Plücker embeddings, channels-last (B, h, w, 6).

    Mirrors ray_utils.py:101-112 (which returns (B, 6, h, w))."""
    R, T = _pose_to_extrinsics(pose)
    ray_o, ray_d = get_rays(h, w, K, R, T)
    return _plucker_from_rays(ray_o, ray_d)


def _bilinear_taps(in_size: int, out_size: int):
    """Tap indices and weights of a torch-style bilinear resize
    (align_corners=False, antialias=False) from ``in_size`` to ``out_size``.

    Returns (idx0, idx1, w1) arrays of shape (out_size,): the resized value
    at o is (1-w1[o])*x[idx0[o]] + w1[o]*x[idx1[o]].
    """
    o = jnp.arange(out_size, dtype=jnp.float32)
    src = (o + 0.5) * (in_size / out_size) - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    i0 = jnp.floor(src)
    w1 = src - i0
    idx0 = i0.astype(jnp.int32)
    idx1 = jnp.minimum(idx0 + 1, in_size - 1)
    return idx0, idx1, w1


def calc_plucker_embeds_lowres(
    h: int, w: int, K: jnp.ndarray, pose: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """Plücker embeddings equal to bilinear-downsampling the full-res
    embedding to (out_h, out_w), computed on 2x2 taps only.

    Equivalent to reference pipeline_diffuman4d.py:218-225 (encode full-res
    Plücker then F.interpolate(bilinear)) without materializing the
    full-res tensor. Output (B, out_h, out_w, 6), fp32.
    """
    R, T = _pose_to_extrinsics(pose)
    i0, i1, wi = _bilinear_taps(h, out_h)
    j0, j1, wj = _bilinear_taps(w, out_w)

    # Evaluate rays at the union grid of row taps x col taps: (2*out_h, 2*out_w)
    ii = jnp.concatenate([i0, i1]).astype(jnp.float32) + 0.5
    jj = jnp.concatenate([j0, j1]).astype(jnp.float32) + 0.5
    ray_o, ray_d = _rays_at_coords(ii, jj, K, R, T)
    emb = _plucker_from_rays(ray_o, ray_d)  # (B, 2*out_h, 2*out_w, 6)

    e00 = emb[:, :out_h, :out_w]
    e01 = emb[:, :out_h, out_w:]
    e10 = emb[:, out_h:, :out_w]
    e11 = emb[:, out_h:, out_w:]
    wi = wi[None, :, None, None]
    wj = wj[None, None, :, None]
    top = e00 * (1 - wj) + e01 * wj
    bot = e10 * (1 - wj) + e11 * wj
    return top * (1 - wi) + bot * wi


def calc_relative_poses(poses: jnp.ndarray) -> jnp.ndarray:
    """Poses relative to the first camera of the sample (ray_utils.py:115-119).

    The first row is the nearest conditioning camera for temporal samples /
    the first spatial label for spatial samples — this ordering is load-
    bearing (spatem_dataset.py:98-107)."""
    poses = poses.astype(jnp.float32)
    ref_pose_inv = jnp.linalg.inv(poses[0])
    return jnp.einsum("ij,bjk->bik", ref_pose_inv, poses)
