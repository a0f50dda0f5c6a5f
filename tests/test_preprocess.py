"""Preprocessing sidecars: triangulation roundtrip, visual hull, skeleton
drawing, UDP decode, background matting."""

import json
import os.path as osp

import numpy as np
import pytest


def _ring_cameras(n=8, radius=3.0, f=800.0, size=512):
    Ks, w2cs = [], []
    for i in range(n):
        th = 2 * np.pi * i / n
        c = np.array([radius * np.cos(th), 0.3, radius * np.sin(th)])
        fwd = -c / np.linalg.norm(c)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        pose = np.eye(4)
        pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = right, up2, fwd, c
        Ks.append(np.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1]], float))
        w2cs.append(np.linalg.inv(pose))
    return np.stack(Ks), np.stack(w2cs)


class TestTriangulation:
    def test_project_triangulate_roundtrip(self):
        from diffuman4d_tpu.preprocess.triangulate import (
            project_points,
            triangulate_points,
        )

        rng = np.random.default_rng(0)
        Ks, Ts = _ring_cameras(8)
        kp3d_true = rng.uniform(-0.5, 0.5, (133, 3))
        kp2d, depth, = project_points(kp3d_true, Ks, Ts)
        assert (depth > 0).all()
        # add noise to observations
        kp2d_noisy = kp2d + rng.normal(0, 0.3, kp2d.shape)
        scores = rng.uniform(0.7, 1.0, (8, 133))
        kp3d, reproj, n_views = triangulate_points(Ks, Ts, kp2d_noisy, scores)
        err = np.linalg.norm(kp3d - kp3d_true, axis=1)
        assert err.max() < 0.01, err.max()
        assert (np.asarray(reproj) < 1.0).all()

    def test_low_score_views_excluded(self):
        from diffuman4d_tpu.preprocess.triangulate import triangulate_one_point

        Ks, Ts = _ring_cameras(8)
        # only 2 good views -> below min_views -> None
        from diffuman4d_tpu.preprocess.triangulate import project_points

        kp3d = np.array([[0.1, 0.2, 0.0]])
        kp2d, _ = project_points(kp3d, Ks, Ts)
        scores = np.array([1.0, 1.0, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1])
        x, r, v = triangulate_one_point(Ks, Ts, kp2d[:, 0], scores)
        assert x is None and v == 2

    def test_finger_score_damping(self):
        from diffuman4d_tpu.preprocess.triangulate import damp_finger_scores

        s = np.ones(133)
        s[91] = 0.5  # left hand root
        out = damp_finger_scores(s)
        np.testing.assert_allclose(out[92:112], 0.25)
        np.testing.assert_allclose(out[113:133], 1.0)

    def test_reprojection_depths_positive_and_invalid_propagates(self):
        from diffuman4d_tpu.preprocess.triangulate import INVALID, project_points

        Ks, Ts = _ring_cameras(4)
        kp3d = np.array([[0.0, 0.0, 0.0], [INVALID, INVALID, INVALID]])
        kp2d, depth = project_points(kp3d, Ks, Ts)
        assert (depth[:, 0] > 0).all()
        assert (kp2d[:, 1] == INVALID).all()


class TestVisualHull:
    def test_carve_recovers_sphere(self):
        from diffuman4d_tpu.preprocess.visual_hull import (
            carve_visual_hull,
            make_projection_matrix,
        )

        size = 128
        Ks, w2cs = _ring_cameras(8, size=size, f=200.0)
        P = make_projection_matrix(Ks, w2cs).astype(np.float32)
        # render masks of a unit-ish sphere at origin
        r_sphere = 0.5
        masks = []
        for i in range(8):
            yy, xx = np.mgrid[0:size, 0:size]
            # project sphere center
            c = P[i] @ np.array([0, 0, 0, 1.0])
            u, v = c[0] / c[2], c[1] / c[2]
            pr = 200.0 * r_sphere / c[2]
            masks.append(((xx - u) ** 2 + (yy - v) ** 2 <= pr**2))
        masks = np.stack(masks)
        pts = carve_visual_hull(
            masks, P, bounds=(-1, 1, -1, 1, -1, 1), voxel_size=0.05,
            batch_size=100_000,
        )
        assert len(pts) > 0
        # all hull points near the sphere
        assert np.linalg.norm(pts, axis=1).max() < r_sphere * 1.5
        # hull encloses the sphere center region
        assert np.linalg.norm(pts, axis=1).min() < 0.1

    def test_ply_roundtrip(self, tmp_path):
        from diffuman4d_tpu.preprocess.visual_hull import save_pcd_ply

        pts = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
        path = str(tmp_path / "pc.ply")
        save_pcd_ply(path, pts)
        content = open(path, "rb").read()
        assert b"element vertex 10" in content
        assert len(content) > 100


class TestDrawSkeleton:
    def test_draw_produces_nonempty_map(self, tmp_path):
        from diffuman4d_tpu.preprocess.draw_skeleton import draw_one_skeleton

        rng = np.random.default_rng(0)
        kpts = rng.uniform(200, 800, (133, 2))
        data = {
            "instance_info": [
                {
                    "keypoints": kpts.tolist(),
                    "keypoint_scores": np.ones(133).tolist(),
                    "keypoint_depths": rng.uniform(1, 2, 133).tolist(),
                }
            ]
        }
        src = tmp_path / "kp.json"
        src.write_text(json.dumps(data))
        out = tmp_path / "map.webp"
        draw_one_skeleton(str(src), str(out))
        from PIL import Image

        img = np.asarray(Image.open(out))
        assert img.shape == (1024, 1024, 3)
        assert img.max() > 100  # something was drawn
        assert (img == 0).mean() > 0.5  # mostly black canvas

    def test_low_score_links_skipped(self, tmp_path):
        from diffuman4d_tpu.preprocess.draw_skeleton import draw_one_skeleton

        kpts = np.full((133, 2), 512.0)
        data = {
            "instance_info": [
                {"keypoints": kpts.tolist(), "keypoint_scores": (np.ones(133) * 0.1).tolist()}
            ]
        }
        src = tmp_path / "kp.json"
        src.write_text(json.dumps(data))
        out = tmp_path / "map.webp"
        draw_one_skeleton(str(src), str(out))
        from PIL import Image

        img = np.asarray(Image.open(out))
        assert img.max() == 0  # nothing above threshold

    def test_skeleton_table_shape(self):
        from diffuman4d_tpu.preprocess.skeleton_data import (
            coco_wholebody_keypoint_colors,
            coco_wholebody_skeleton,
        )

        sk = coco_wholebody_skeleton()
        assert len(sk) == 65  # 25 body+feet, 40 hands
        colors = coco_wholebody_keypoint_colors()
        assert len(colors) == 133
        # links reference valid keypoint ids
        for link in sk.values():
            i, j = link["link"]
            assert 0 <= i < 133 and 0 <= j < 133


class TestUDP:
    def test_heatmap_maximum(self):
        from diffuman4d_tpu.preprocess.keypoints import get_heatmap_maximum

        hm = np.zeros((2, 16, 24), np.float32)
        hm[0, 5, 7] = 1.0
        hm[1, 10, 3] = 0.8
        kp, sc = get_heatmap_maximum(hm)
        np.testing.assert_array_equal(kp[0], [7, 5])
        np.testing.assert_array_equal(kp[1], [3, 10])
        np.testing.assert_allclose(sc, [1.0, 0.8])

    def test_udp_decode_subpixel(self):
        # gaussian blob at a subpixel location must decode near it
        from diffuman4d_tpu.preprocess.keypoints import udp_decode

        H, W = 64, 48
        cx, cy = 20.3, 33.7
        yy, xx = np.mgrid[0:H, 0:W]
        hm = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 2.0**2))[None].astype(
            np.float32
        )
        kp, sc = udp_decode(hm, input_size=(W * 4, H * 4), heatmap_size=(W, H))
        # map expectation: kp in input space
        np.testing.assert_allclose(
            kp[0], [cx / (W - 1) * W * 4, cy / (H - 1) * H * 4], atol=1.5
        )

    def test_warp_matrix_center_maps_to_center(self):
        from diffuman4d_tpu.preprocess.keypoints import udp_warp_matrix

        center = np.array([100.0, 50.0])
        scale = np.array([200.0, 100.0])
        m = udp_warp_matrix(center, scale, 0.0, (64, 32))
        out = m @ np.array([100.0, 50.0, 1.0])
        np.testing.assert_allclose(out, [(64 - 1) / 2, (32 - 1) / 2], atol=1e-6)


class TestBackground:
    def test_chroma_key(self):
        from diffuman4d_tpu.preprocess.background import ChromaKeyMatting

        img = np.ones((64, 64, 3), np.float32)  # white bg
        img[20:40, 20:40] = [0.8, 0.2, 0.2]  # red person
        mask = ChromaKeyMatting()(img)
        assert mask[30, 30] == 1.0
        assert mask[5, 5] == 0.0

    def test_remove_background_dir(self, tmp_path):
        from diffuman4d_tpu.preprocess.background import remove_background
        from diffuman4d_tpu.data.images import to_pil

        img = np.ones((32, 32, 3), np.float32)
        img[10:20, 10:20] = 0.2
        d = tmp_path / "images" / "00"
        d.mkdir(parents=True)
        to_pil(img).save(d / "000000.webp", lossless=True)
        n = remove_background(
            str(tmp_path / "images"), str(tmp_path / "fmasks"),
            out_alpha_dir=str(tmp_path / "images_alpha"),
        )
        assert n == 1
        assert osp.isfile(tmp_path / "fmasks" / "00" / "000000.png")
        assert osp.isfile(tmp_path / "images_alpha" / "00" / "000000.png")

    def test_birefnet_missing_checkpoint_raises(self):
        from diffuman4d_tpu.preprocess.background import BiRefNetMatting

        with pytest.raises(FileNotFoundError, match="egress"):
            BiRefNetMatting("/nonexistent/birefnet")
