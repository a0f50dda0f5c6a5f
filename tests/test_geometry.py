"""Geometry core: cameras, rays/Plücker, crops, images.

Where practical, parity is asserted against an inline torch re-derivation of
the reference math (torch-cpu is available in this image), so these act as
golden tests of reference behavior (ray_utils.py, camera_parser.py,
crop_utils.py, image_utils.py).
"""

import json

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from diffuman4d_tpu.data import cameras as cam
from diffuman4d_tpu.data import crops, images, rays
from diffuman4d_tpu.ops.resize import resize_bilinear, resize_nearest


def _random_camera(rng, h=64, w=64):
    f = rng.uniform(40, 80)
    K = np.array([[f, 0, w / 2 + rng.normal()], [0, f, h / 2 + rng.normal()], [0, 0, 1]])
    # random c2w pose
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    theta = rng.uniform(0, np.pi)
    Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(theta) * Kx + (1 - np.cos(theta)) * Kx @ Kx
    t = rng.normal(size=3)
    pose = np.eye(4)
    pose[:3, :3] = R
    pose[:3, 3] = t
    return K.astype(np.float32), pose.astype(np.float32)


def _torch_plucker(h, w, K, pose):
    """Reference math: ray_utils.py:11-112, torch fp32."""
    K = torch.from_numpy(np.asarray(K)).float()
    pose = torch.from_numpy(np.asarray(pose)).float()
    extrinsic = torch.inverse(pose)
    R = extrinsic[:, :3, :3]
    T = extrinsic[:, :3, 3:]
    invK = torch.inverse(K)
    ray_o = (-R.mT @ T)[..., 0]  # (B, 3)
    i, j = torch.meshgrid(
        torch.arange(h, dtype=torch.float32), torch.arange(w, dtype=torch.float32), indexing="ij"
    )
    i, j = i + 0.5, j + 0.5
    xy1 = torch.stack([j, i, torch.ones_like(i)], dim=-1)[..., None]  # (h, w, 3, 1)
    pix_cam = invK[:, None, None] @ xy1[None]
    pix_world = R.mT[:, None, None] @ (pix_cam - T[:, None, None])
    pix_world = pix_world[..., 0]
    ray_d = pix_world - ray_o[:, None, None]
    ray_d = ray_d / (torch.norm(ray_d, dim=-1, keepdim=True) + 1e-8)
    ray_o = ray_o[:, None, None].expand_as(ray_d)
    normal = torch.cross(ray_o, ray_d, dim=-1)
    return torch.cat([ray_d, normal], dim=-1).numpy()  # (B, h, w, 6)


class TestRays:
    def test_plucker_matches_reference_math(self):
        rng = np.random.default_rng(0)
        Ks, poses = zip(*[_random_camera(rng) for _ in range(3)])
        K = np.stack(Ks)
        pose = np.stack(poses)
        ours = np.asarray(rays.calc_plucker_embeds(64, 64, jnp.asarray(K), jnp.asarray(pose)))
        ref = _torch_plucker(64, 64, K, pose)
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_plucker_lowres_equals_fullres_then_torch_bilinear(self):
        rng = np.random.default_rng(1)
        K, pose = _random_camera(rng, h=64, w=64)
        K, pose = K[None], pose[None]
        full = _torch_plucker(64, 64, K, pose)  # (1, 64, 64, 6)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(full).permute(0, 3, 1, 2), size=(8, 8), mode="bilinear"
        ).permute(0, 2, 3, 1).numpy()
        ours = np.asarray(
            rays.calc_plucker_embeds_lowres(64, 64, jnp.asarray(K), jnp.asarray(pose), 8, 8)
        )
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_plucker_in_unit_range(self):
        # dataset invariant: plucker in [-1, 1] after scene normalization
        # (spatem_dataset.py:219-222) — holds for normalized scenes where
        # camera centers lie within the unit box.
        rng = np.random.default_rng(2)
        Ks, poses = zip(*[_random_camera(rng) for _ in range(4)])
        poses = cam.normalize_poses(np.stack(poses))
        emb = np.asarray(
            rays.calc_plucker_embeds(32, 32, jnp.asarray(np.stack(Ks)), jnp.asarray(poses))
        )
        assert emb.min() >= -1.0 - 1e-5 and emb.max() <= 1.0 + 1e-5

    def test_relative_poses(self):
        rng = np.random.default_rng(3)
        _, p0 = _random_camera(rng)
        _, p1 = _random_camera(rng)
        rel = np.asarray(rays.calc_relative_poses(jnp.asarray(np.stack([p0, p1]))))
        np.testing.assert_allclose(rel[0], np.eye(4), atol=1e-5)
        np.testing.assert_allclose(rel[1], np.linalg.inv(p0) @ p1, atol=1e-5)


class TestCameras:
    def test_parse_nerfstudio(self, tmp_path):
        rng = np.random.default_rng(4)
        frames = []
        for i in range(4):
            K, pose = _random_camera(rng)
            # store as OpenGL (the parser flips to OpenCV)
            gl = pose.copy()
            gl[:3, 1:3] *= -1
            frames.append(
                {
                    "fl_x": float(K[0, 0]),
                    "fl_y": float(K[1, 1]),
                    "cx": float(K[0, 2]),
                    "cy": float(K[1, 2]),
                    "h": 64,
                    "w": 64,
                    "transform_matrix": gl.tolist(),
                    "camera_label": f"{i:02d}",
                }
            )
        path = tmp_path / "transforms.json"
        path.write_text(json.dumps({"frames": frames}))
        cams = cam.parse_cameras(str(path), normalize_scene=False)
        assert set(cams) == {"00", "01", "02", "03"}
        # OpenGL flip must be undone: recovered pose == original OpenCV pose
        K0, pose0 = _random_camera(np.random.default_rng(4))
        np.testing.assert_allclose(cams["00"].pose, pose0, atol=1e-5)
        np.testing.assert_allclose(cams["00"].K, K0, atol=1e-4)

    def test_scene_norm_persisted(self, tmp_path):
        rng = np.random.default_rng(5)
        poses = np.stack([_random_camera(rng)[1] for _ in range(5)])
        normed = cam.normalize_poses(poses)
        centers = normed[:, :3, 3]
        mn, mx = centers.min(0), centers.max(0)
        np.testing.assert_allclose((mn + mx) / 2, 0.0, atol=1e-6)
        np.testing.assert_allclose(np.linalg.norm(mx - mn), 1.0, atol=1e-6)

    def test_nearest_input_camera(self):
        target = np.eye(4)
        p1 = np.eye(4)
        p1[:3, 3] = [5, 0, 0]
        p2 = np.eye(4)
        p2[:3, 3] = [1, 0, 0]
        assert cam.nearest_input_camera(target, [p1, p2]) == 1

    def test_transform_intrinsic(self):
        K = np.array([[100.0, 0, 50], [0, 100, 60], [0, 0, 1]])
        crop = [10, 20, 40, 40, 128, 128]
        out = cam.transform_intrinsic_for_crop(K, crop, 1024)
        s = 1024 / 40
        np.testing.assert_allclose(out[0, 2], (50 - 20) * s, rtol=1e-6)
        np.testing.assert_allclose(out[1, 2], (60 - 10) * s, rtol=1e-6)
        np.testing.assert_allclose(out[0, 0], 100 * s, rtol=1e-6)
        assert out[2, 2] == 1.0


class TestCrops:
    def test_mask_to_bbox(self):
        m = np.zeros((32, 32), np.float32)
        m[10:20, 5:15] = 1.0
        assert crops.mask_to_bbox(m) == (4, 9, 15, 20)
        assert crops.mask_to_bbox(np.zeros((8, 8), np.float32)) is None

    def test_crop_square_min_ratio(self):
        # tiny mask -> crop clamps at min_crop_ratio * h
        m = np.zeros((100, 100), np.float32)
        m[50:52, 50:52] = 1.0
        top, left, h, w, oh, ow = crops.mask_crop_aspect_ratio(m)
        assert (oh, ow) == (100, 100)
        assert h >= 70 and w >= 70
        assert h == w

    def test_crop_matches_reference_on_random_masks(self):
        # golden: replicate crop_utils.py math inline
        rng = np.random.default_rng(6)
        for _ in range(10):
            m = np.zeros((96, 128), np.float32)
            y0, x0 = rng.integers(0, 48), rng.integers(0, 64)
            y1, x1 = rng.integers(y0 + 2, 96), rng.integers(x0 + 2, 128)
            m[y0:y1, x0:x1] = 1.0
            got = crops.mask_crop_aspect_ratio(m)
            # reference math
            import math as _math

            xmin, ymin, xmax, ymax = x0 - 1, y0 - 1, x1, y1  # bbox w/ 1px expand
            xctr, yctr = (xmin + xmax) / 2, (ymin + ymax) / 2
            height = 2 * max(yctr - ymin, ymax - yctr, xctr - xmin, xmax - xctr)
            height = max(height, 0.7 * 96)
            width = int(height)
            xmin2, ymin2 = xctr - width / 2, yctr - height / 2
            xmax2, ymax2 = xctr + width / 2, yctr + height / 2
            exp = [
                _math.floor(ymin2),
                _math.floor(xmin2),
                _math.ceil(ymax2) - _math.floor(ymin2),
                _math.ceil(xmax2) - _math.floor(xmin2),
                96,
                128,
            ]
            assert got == exp

    def test_skeleton_to_mask(self):
        sk = np.zeros((100, 100, 3), np.float32)
        sk[40:60, 40:60] = 0.5
        m = crops.skeleton_to_mask(sk)
        # padded bbox filled: top pad 3*3=9, others 3 (plus the 1px bbox expand)
        assert m[40 - 1 - 9, 50] == 1.0
        assert m[50, 40 - 1 - 3] == 1.0
        assert m[0, 0] == 0.0


class TestImages:
    def test_norm_roundtrip(self):
        x = np.random.default_rng(7).uniform(0, 1, (4, 4, 3)).astype(np.float32)
        np.testing.assert_allclose(images.denorm_vae(images.norm_vae(x)), x, atol=1e-6)

    def test_apply_fmask_white(self):
        img = np.full((2, 2, 3), 0.25, np.float32)
        mask = np.array([[[1.0]], [[0.0]]], np.float32).reshape(2, 1, 1) * np.ones((2, 2, 1), np.float32)
        mask = np.zeros((2, 2, 1), np.float32)
        mask[0] = 1.0
        out = images.apply_fmask(img, mask, "white")
        np.testing.assert_allclose(out[0], 0.25)
        np.testing.assert_allclose(out[1], 1.0)

    def test_apply_fmask_vae_normalized(self):
        img = images.norm_vae(np.full((2, 2, 3), 0.25, np.float32))
        mask = images.norm_vae(np.ones((2, 2, 1), np.float32))
        out = images.apply_fmask(img, mask, "white", vae_normalized=True)
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_restore_cropped_roundtrip(self):
        yy, xx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 48), indexing="ij")
        orig = np.stack([yy, xx, 0.5 * (yy + xx)], axis=-1).astype(np.float32)
        pil = images.to_pil(orig)
        crop = [8, 4, 32, 32, 64, 48]
        cropped = images.crop_resize(pil, crop, 128, 128)
        restored = images.restore_cropped_image(cropped, crop)
        assert restored.shape == (64, 48, 3)
        # interior of the crop round-trips approximately (bicubic down+up)
        region_got = restored[10:38, 6:34]
        region_exp = orig[10:38, 6:34]
        assert np.abs(region_got - region_exp).mean() < 0.06
        # outside the crop is white
        np.testing.assert_allclose(restored[0, 47], 1.0)

    def test_restore_out_of_bounds_crop(self):
        # negative top/left (bbox expand can go -1): must not crash
        img = images.to_pil(np.full((16, 16, 3), 0.5, np.float32))
        out = images.restore_cropped_image(img, [-2, -2, 16, 16, 20, 20])
        assert out.shape == (20, 20, 3)


class TestDeviceResize:
    def test_bilinear_matches_torch(self):
        rng = np.random.default_rng(9)
        x = rng.normal(size=(2, 32, 48, 6)).astype(np.float32)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(8, 12), mode="bilinear"
        ).permute(0, 2, 3, 1).numpy()
        got = np.asarray(resize_bilinear(jnp.asarray(x), 8, 12))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_bilinear_upsample_matches_torch(self):
        rng = np.random.default_rng(10)
        x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(20, 24), mode="bilinear"
        ).permute(0, 2, 3, 1).numpy()
        got = np.asarray(resize_bilinear(jnp.asarray(x), 20, 24))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_nearest_matches_torch(self):
        rng = np.random.default_rng(11)
        x = rng.normal(size=(1, 16, 16, 1)).astype(np.float32)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(5, 7), mode="nearest"
        ).permute(0, 2, 3, 1).numpy()
        got = np.asarray(resize_nearest(jnp.asarray(x), 5, 7))
        np.testing.assert_allclose(got, ref)


class TestEasyvolcap:
    def test_parse_opencv_yaml_cameras(self, tmp_path):
        from diffuman4d_tpu.data.easyvolcap_io import read_easyvolcap_cameras

        intri = """%YAML:1.0
---
names:
   - "00"
   - "01"
K_00: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [ 800., 0., 320., 0., 800., 240., 0., 0., 1. ]
H_00: 480
W_00: 640
K_01: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [ 700., 0., 300., 0., 700., 220., 0., 0., 1. ]
H_01: 480
W_01: 640
"""
        extri = """%YAML:1.0
---
names:
   - "00"
   - "01"
R_00: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [ 1., 0., 0., 0., 1., 0., 0., 0., 1. ]
T_00: !!opencv-matrix
   rows: 3
   cols: 1
   dt: d
   data: [ 0.1, 0.2, 0.3 ]
R_01: !!opencv-matrix
   rows: 3
   cols: 1
   dt: d
   data: [ 0., 0., 1.5707963268 ]
T_01: !!opencv-matrix
   rows: 3
   cols: 1
   dt: d
   data: [ 0., 0., 0. ]
"""
        (tmp_path / "intri.yml").write_text(intri)
        (tmp_path / "extri.yml").write_text(extri)
        cams = read_easyvolcap_cameras(str(tmp_path))
        assert set(cams) == {"00", "01"}
        np.testing.assert_allclose(cams["00"]["K"][0, 0], 800.0)
        assert cams["00"]["H"] == 480 and cams["00"]["W"] == 640
        np.testing.assert_allclose(cams["00"]["RT"][:, 3], [0.1, 0.2, 0.3])
        # rodrigues: 90 deg about z
        R = cams["01"]["RT"][:, :3]
        np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)

        # end-to-end through parse_cameras
        from diffuman4d_tpu.data.cameras import parse_cameras

        parsed = parse_cameras(str(tmp_path), normalize_scene=False)
        assert set(parsed) == {"00", "01"}
        # c2w pose inverts the w2c RT
        w2c = np.eye(4)
        w2c[:3, :] = cams["00"]["RT"]
        np.testing.assert_allclose(parsed["00"].pose, np.linalg.inv(w2c), atol=1e-6)
