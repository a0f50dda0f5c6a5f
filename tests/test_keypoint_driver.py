"""Keypoint driver e2e with stub networks: proves the full chain the
reference vendors (vis_pose.py:396-462) runs — detection (torchscript
load + NMS or mask bbox), UDP crop, batched pose inference with padding,
DARK decode, JSON writing, and skip_exists resume — without the external
RTMDet/Sapiens checkpoints this host cannot download."""

import json
import os
import os.path as osp

import numpy as np
import pytest

from diffuman4d_tpu.preprocess.keypoints import (
    MaskDetector,
    TorchscriptDetector,
    nms_boxes,
    predict_keypoints_batch,
    predict_keypoints_dir,
    udp_warp_matrix,
)

K = 5
FRACS = np.array(
    [[0.5, 0.2], [0.3, 0.5], [0.7, 0.5], [0.4, 0.8], [0.6, 0.8]], np.float32
)


class StubPose:
    """Heatmaps with gaussians at fixed crop-space fractions — decoding
    must land on those positions mapped back through the UDP affine."""

    input_size = (192, 256)  # (w, h)
    heatmap_size = (48, 64)

    def __call__(self, crops):
        single = crops.ndim == 3
        b = 1 if single else crops.shape[0]
        w, h = self.heatmap_size
        ys, xs = np.mgrid[0:h, 0:w]
        hm = np.zeros((b, K, h, w), np.float32)
        for k, (fx, fy) in enumerate(FRACS):
            cx, cy = fx * (w - 1), fy * (h - 1)
            hm[:, k] = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * 2.0**2))
        return hm[0] if single else hm


def _expected_image_space(bbox, pad=1.25):
    """Where the stub's crop-space keypoints land in image space."""
    x0, y0, x1, y1 = bbox
    center = np.array([(x0 + x1) / 2, (y0 + y1) / 2])
    in_w, in_h = StubPose.input_size
    bw, bh = (x1 - x0) * pad, (y1 - y0) * pad
    if bw / bh > in_w / in_h:
        bh = bw * in_h / in_w
    else:
        bw = bh * in_w / in_h
    m = udp_warp_matrix(center, np.array([bw, bh]), 0.0, (in_w, in_h))
    m_inv = np.linalg.inv(np.vstack([m, [0, 0, 1]]))
    # stub fractions are over the heatmap grid; scale to input space the
    # same way udp_decode does: input_size / (heatmap_size - 1)
    hw, hh = StubPose.heatmap_size
    pts = FRACS * np.array([(hw - 1), (hh - 1)])
    pts = pts / np.array([hw - 1, hh - 1]) * np.array([in_w, in_h])
    ph = np.concatenate([pts, np.ones((K, 1))], axis=1)
    return (m_inv @ ph.T).T[:, :2]


def test_batch_decode_matches_expected():
    rng = np.random.default_rng(0)
    imgs = [rng.uniform(0, 1, (200, 160, 3)).astype(np.float32) for _ in range(3)]
    boxes = [(20.0, 30.0, 120.0, 180.0), None, (10.0, 10.0, 150.0, 190.0)]
    out = predict_keypoints_batch(
        imgs, boxes, StubPose(), batch_size=2,
        heatmap_size=StubPose.heatmap_size,
    )
    assert len(out) == 3
    for img, bb, res in zip(imgs, boxes, out):
        if bb is None:
            bb = (0.0, 0.0, float(img.shape[1]), float(img.shape[0]))
        got = np.asarray(res["instance_info"][0]["keypoints"])
        exp = _expected_image_space(bb)
        np.testing.assert_allclose(got, exp, atol=1.5)  # sub-heatmap-pixel
        assert len(res["instance_info"][0]["keypoint_scores"]) == K


def test_nms():
    boxes = np.array(
        [
            [0, 0, 10, 10, 0.9],
            [1, 1, 11, 11, 0.8],  # overlaps the first
            [50, 50, 60, 60, 0.7],
        ],
        np.float32,
    )
    keep = nms_boxes(boxes, iou_thr=0.3)
    assert list(keep) == [0, 2]


def test_torchscript_detector_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")

    class FixedDet(torch.nn.Module):
        def forward(self, x):
            boxes = torch.tensor(
                [[5.0, 5.0, 90.0, 95.0, 0.95],
                 [0.0, 0.0, 99.0, 99.0, 0.2],   # below score_thr
                 [6.0, 6.0, 91.0, 96.0, 0.90]]  # NMS'd away
            )
            labels = torch.tensor([0, 0, 0])
            return boxes, labels

    path = str(tmp_path / "det.pt")
    torch.jit.script(FixedDet()).save(path)
    det = TorchscriptDetector(path, score_thr=0.3, nms_thr=0.3)
    out = det(np.zeros((100, 100, 3), np.float32))
    assert out.shape == (1, 5)
    np.testing.assert_allclose(out[0, :4], [5, 5, 90, 95])

    with pytest.raises(FileNotFoundError):
        TorchscriptDetector(str(tmp_path / "missing.pt"))


def test_dir_driver_end_to_end(tmp_path):
    """images/{cam}/{frame} + fmasks -> kp2d JSONs, with resume."""
    from PIL import Image

    rng = np.random.default_rng(1)
    images_dir, fmasks_dir = str(tmp_path / "images"), str(tmp_path / "fmasks")
    out_dir = str(tmp_path / "kp2d")
    for cam in ["00", "01"]:
        os.makedirs(osp.join(images_dir, cam))
        os.makedirs(osp.join(fmasks_dir, cam))
        for frame in ["000000", "000001", "000002"]:
            img = (rng.uniform(0, 255, (120, 100, 3))).astype(np.uint8)
            Image.fromarray(img).save(osp.join(images_dir, cam, f"{frame}.webp"))
            mask = np.zeros((120, 100), np.uint8)
            mask[20:100, 25:80] = 255
            Image.fromarray(mask).save(osp.join(fmasks_dir, cam, f"{frame}.png"))

    n = predict_keypoints_dir(
        images_dir, out_dir, StubPose(), fmasks_dir=fmasks_dir, batch_size=4
    )
    assert n == 6
    res = json.load(open(osp.join(out_dir, "00", "000000.json")))
    got = np.asarray(res["instance_info"][0]["keypoints"])
    exp = _expected_image_space((25.0, 20.0, 80.0, 100.0))  # mask bbox
    np.testing.assert_allclose(got, exp, atol=2.0)

    # resume: valid JSONs are skipped; a corrupted one is redone
    with open(osp.join(out_dir, "01", "000002.json"), "w") as f:
        f.write("{corrupt")
    n2 = predict_keypoints_dir(
        images_dir, out_dir, StubPose(), fmasks_dir=fmasks_dir, batch_size=4
    )
    assert n2 == 1
    json.load(open(osp.join(out_dir, "01", "000002.json")))  # valid again


def test_mask_detector_empty():
    det = MaskDetector()
    assert det(np.zeros((10, 10, 3), np.float32), None).shape == (0, 5)
