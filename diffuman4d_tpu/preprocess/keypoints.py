"""2D keypoint prediction (reference: scripts/preprocess/predict_keypoints.py
+ the vendored sapiens-lite demo pipeline).

The reference chain is RTMDet person detection -> Sapiens-2B top-down pose
(torchscript) -> UDP/DARK heatmap decode -> 133 COCO-WholeBody keypoints
JSON per image. The detector/pose networks are external checkpoints; they
are pluggable stages here with the same JSON file contract. The pure math —
UDP bbox warping, heatmap argmax, DARK Taylor-refinement decode
(pose_utils.py:55-180) — is implemented natively and unit-testable without
checkpoints.
"""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np


# ---------------------------------------------------------------------------
# pure math: UDP warp + DARK decode
# ---------------------------------------------------------------------------

def udp_warp_matrix(center: np.ndarray, scale: np.ndarray, rot_deg: float,
                    output_size: tuple[int, int]) -> np.ndarray:
    """Unbiased (UDP) affine from bbox space to network input space.
    center (2,), scale (2,) = bbox w/h, output_size (w, h) -> (2, 3)."""
    w_out, h_out = output_size
    rot = np.deg2rad(rot_deg)
    # unbiased scale: (out - 1) / scale
    sx = (w_out - 1) / scale[0]
    sy = (h_out - 1) / scale[1]
    cos, sin = np.cos(rot), np.sin(rot)
    m = np.array(
        [
            [cos * sx, -sin * sx, sx * (-center[0] * cos + center[1] * sin + 0.5 * scale[0])],
            [sin * sy, cos * sy, sy * (-center[0] * sin - center[1] * cos + 0.5 * scale[1])],
        ]
    )
    return m


def get_heatmap_maximum(heatmaps: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(K, H, W) -> argmax locations (K, 2) xy and scores (K,); negative
    scores get location (-1, -1)."""
    K, H, W = heatmaps.shape
    flat = heatmaps.reshape(K, -1)
    idx = flat.argmax(axis=1)
    scores = flat[np.arange(K), idx]
    keypoints = np.stack([idx % W, idx // W], axis=-1).astype(np.float32)
    keypoints[scores <= 0] = -1
    return keypoints, scores


def _gaussian_blur_heatmaps(heatmaps: np.ndarray, kernel: int) -> np.ndarray:
    """Max-preserving per-channel gaussian modulation (pose_utils
    gaussian_blur): blur, then rescale so each channel keeps its max."""
    from scipy.ndimage import gaussian_filter

    sigma = (kernel - 1) / 6.0  # opencv kernel-size -> sigma relationship
    out = np.empty_like(heatmaps)
    for k in range(heatmaps.shape[0]):
        origin_max = heatmaps[k].max()
        blurred = gaussian_filter(heatmaps[k], sigma, mode="constant")
        bmax = blurred.max()
        out[k] = blurred * (origin_max / bmax) if bmax > 0 else blurred
    return out


def refine_keypoints_dark_udp(
    keypoints: np.ndarray, heatmaps: np.ndarray, blur_kernel_size: int = 11
) -> np.ndarray:
    """DARK-UDP Taylor refinement (pose_utils.py:100-151): log-modulated
    heatmaps, 2nd-order Taylor step at the integer argmax."""
    keypoints = keypoints.copy()
    K, H, W = heatmaps.shape
    hm = _gaussian_blur_heatmaps(heatmaps, blur_kernel_size)
    hm = np.log(np.clip(hm, 1e-3, 50.0))
    pad = np.pad(hm, ((0, 0), (1, 1), (1, 1)), mode="edge").reshape(-1)

    index = keypoints[:, 0] + 1 + (keypoints[:, 1] + 1) * (W + 2)
    index += (W + 2) * (H + 2) * np.arange(K)
    index = index.astype(int)
    i_ = pad[index]
    ix1 = pad[index + 1]
    iy1 = pad[index + W + 2]
    ix1y1 = pad[index + W + 3]
    ix1_y1_ = pad[index - W - 3]
    ix1_ = pad[index - 1]
    iy1_ = pad[index - 2 - W]

    dx = 0.5 * (ix1 - ix1_)
    dy = 0.5 * (iy1 - iy1_)
    dxx = ix1 - 2 * i_ + ix1_
    dyy = iy1 - 2 * i_ + iy1_
    dxy = 0.5 * (ix1y1 - ix1 - iy1 + 2 * i_ - ix1_ - iy1_ + ix1_y1_)

    grad = np.stack([dx, dy], axis=-1)[..., None]  # (K, 2, 1)
    hess = np.stack(
        [np.stack([dxx, dxy], -1), np.stack([dxy, dyy], -1)], axis=-2
    )  # (K, 2, 2)
    hess_inv = np.linalg.inv(hess + np.finfo(np.float32).eps * np.eye(2))
    keypoints -= (hess_inv @ grad)[..., 0]
    return keypoints


def udp_decode(
    heatmaps: np.ndarray,
    input_size: tuple[int, int],
    heatmap_size: tuple[int, int],
    blur_kernel_size: int = 11,
) -> tuple[np.ndarray, np.ndarray]:
    """(K, H, W) heatmaps -> keypoints (K, 2) in input-space pixels, scores
    (K,) (pose_utils.py:153-180)."""
    keypoints, scores = get_heatmap_maximum(heatmaps)
    keypoints = refine_keypoints_dark_udp(keypoints, heatmaps, blur_kernel_size)
    W, H = heatmap_size
    # parity with pose_utils.py:178: the reference rescales by
    # input_size/(heatmap_size - 1) (not the unbiased (in-1)/(hm-1)); the
    # sapiens checkpoints are trained under this convention
    keypoints = keypoints / np.array([W - 1, H - 1]) * np.array(input_size)
    return keypoints, scores


# ---------------------------------------------------------------------------
# model stages (external checkpoints, pluggable)
# ---------------------------------------------------------------------------

class TorchscriptPoseModel:
    """Sapiens-lite torchscript pose estimator (vis_pose.py:195-212 loads
    torchscript checkpoints). Needs a local .pt2/.pt file."""

    def __init__(self, checkpoint_path: str, input_size=(768, 1024), device="cpu"):
        if not osp.isfile(checkpoint_path):
            raise FileNotFoundError(
                f"pose checkpoint not found: {checkpoint_path} (zero-egress "
                "environment; provide a local sapiens-lite torchscript file)"
            )
        import torch

        self.torch = torch
        self.model = torch.jit.load(checkpoint_path, map_location=device).eval()
        self.input_size = input_size  # (w, h)
        self.device = device

    def __call__(self, crop: np.ndarray) -> np.ndarray:
        """(H, W, 3) in [0,1] -> heatmaps (K, h, w)."""
        torch = self.torch
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        x = (crop - mean) / std
        x = torch.from_numpy(x.transpose(2, 0, 1))[None].to(self.device)
        with torch.no_grad():
            hm = self.model(x)
        return hm[0].cpu().numpy()


def predict_keypoints_for_image(
    image: np.ndarray,  # (H, W, 3) in [0, 1]
    pose_model,
    bbox: tuple[float, float, float, float] | None = None,
    heatmap_size: tuple[int, int] = (192, 256),
    bbox_padding: float = 1.25,
) -> dict:
    """Top-down single-person pose: bbox (or full image) -> UDP crop ->
    heatmaps -> DARK decode -> image-space keypoints JSON dict."""
    h, w = image.shape[:2]
    if bbox is None:
        bbox = (0.0, 0.0, float(w), float(h))
    x0, y0, x1, y1 = bbox
    center = np.array([(x0 + x1) / 2, (y0 + y1) / 2])
    in_w, in_h = pose_model.input_size
    # expand bbox to the model aspect ratio, padded
    bw, bh = (x1 - x0) * bbox_padding, (y1 - y0) * bbox_padding
    if bw / bh > in_w / in_h:
        bh = bw * in_h / in_w
    else:
        bw = bh * in_w / in_h
    scale = np.array([bw, bh])

    m = udp_warp_matrix(center, scale, 0.0, (in_w, in_h))
    crop = _affine_sample(image, m, (in_w, in_h))
    heatmaps = pose_model(crop)
    kpts, scores = udp_decode(heatmaps, (in_w, in_h), heatmap_size)

    # map back to image space: inverse of the UDP affine
    m_full = np.vstack([m, [0, 0, 1]])
    m_inv = np.linalg.inv(m_full)
    kph = np.concatenate([kpts, np.ones((len(kpts), 1))], axis=1)
    kpts_img = (m_inv @ kph.T).T[:, :2]
    return {
        "instance_info": [
            {"keypoints": kpts_img.tolist(), "keypoint_scores": scores.tolist()}
        ]
    }


def _affine_sample(image: np.ndarray, m: np.ndarray, out_wh: tuple[int, int]) -> np.ndarray:
    """Bilinear warp of (H, W, C) by 2x3 affine (dst <- src mapping)."""
    w_out, h_out = out_wh
    m_full = np.vstack([m, [0, 0, 1]])
    inv = np.linalg.inv(m_full)
    ys, xs = np.mgrid[0:h_out, 0:w_out]
    ones = np.ones_like(xs)
    dst = np.stack([xs, ys, ones], axis=-1).reshape(-1, 3).T
    src = (inv @ dst)[:2].T.reshape(h_out, w_out, 2)
    x = np.clip(src[..., 0], 0, image.shape[1] - 1)
    y = np.clip(src[..., 1], 0, image.shape[0] - 1)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    x1 = np.minimum(x0 + 1, image.shape[1] - 1)
    y1 = np.minimum(y0 + 1, image.shape[0] - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    out = (
        image[y0, x0] * (1 - wx) * (1 - wy)
        + image[y0, x1] * wx * (1 - wy)
        + image[y1, x0] * (1 - wx) * wy
        + image[y1, x1] * wx * wy
    )
    return out.astype(np.float32)


def predict_keypoints_dir(
    images_dir: str,
    out_kp2d_dir: str,
    pose_model,
    fmasks_dir: str | None = None,
    skip_exists: bool = True,
) -> int:
    """Walk images/{cam}/{frame}, write poses JSON per image. Uses the
    fmask bbox as the person detection when masks exist (replacing RTMDet
    for studio data where the subject is the only foreground)."""
    from PIL import Image as PILImage

    from diffuman4d_tpu.data.crops import mask_to_bbox

    count = 0
    for cam in sorted(os.listdir(images_dir)):
        cam_dir = osp.join(images_dir, cam)
        if not osp.isdir(cam_dir):
            continue
        for f in sorted(os.listdir(cam_dir)):
            stem = osp.splitext(f)[0]
            out = osp.join(out_kp2d_dir, cam, f"{stem}.json")
            if skip_exists and osp.isfile(out):
                try:
                    json.load(open(out))
                    continue
                except Exception:
                    pass
            img = np.asarray(PILImage.open(osp.join(cam_dir, f)).convert("RGB"), np.float32) / 255.0
            bbox = None
            if fmasks_dir is not None:
                mpath = osp.join(fmasks_dir, cam, f"{stem}.png")
                if osp.isfile(mpath):
                    mask = np.asarray(PILImage.open(mpath).convert("L"), np.float32) / 255.0
                    bb = mask_to_bbox(mask)
                    if bb is not None:
                        bbox = (max(bb[0], 0), max(bb[1], 0), bb[2], bb[3])
            res = predict_keypoints_for_image(img, pose_model, bbox=bbox)
            os.makedirs(osp.dirname(out), exist_ok=True)
            with open(out, "w") as fp:
                json.dump(res, fp)
            count += 1
    return count
