"""DNA-Rendering extraction + dataset expansion on synthetic fixtures:
a hand-built .smc HDF5 capture and parquet shards."""

import io
import json
import os.path as osp

import numpy as np
import pytest
from PIL import Image


class TestCCMAndIntrinsics:
    def test_apply_ccm_identity(self):
        from diffuman4d_tpu.preprocess.dna_extract import apply_ccm

        # identity quadratic: a=0, b=1, c=0 per channel (rows stored BGR)
        ccm = np.zeros((3, 3))
        ccm[:, 1] = 1.0
        img = np.random.default_rng(0).uniform(0, 255, (8, 8, 3)).astype(np.float32)
        out = apply_ccm(img, ccm)
        np.testing.assert_allclose(out, img, atol=1e-4)

    def test_apply_ccm_quadratic(self):
        from diffuman4d_tpu.preprocess.dna_extract import apply_ccm

        ccm = np.zeros((3, 3))
        # R row is index 2 in BGR storage: r' = 0.001 r^2 + 0.5 r + 10
        ccm[2] = [0.001, 0.5, 10.0]
        ccm[1, 1] = 1.0  # G identity
        ccm[0, 1] = 1.0  # B identity
        img = np.full((2, 2, 3), 100.0, np.float32)
        out = apply_ccm(img, ccm)
        np.testing.assert_allclose(out[..., 0], 0.001 * 100**2 + 0.5 * 100 + 10)
        np.testing.assert_allclose(out[..., 1], 100.0)

    def test_unified_intrinsics_5mp(self):
        from diffuman4d_tpu.preprocess.dna_extract import unified_intrinsics

        K = np.array([[2400.0, 0, 1240], [0, 2400, 1020], [0, 0, 1]])
        K2, (rw, rh), (l, t, r, b) = unified_intrinsics(K, 2048, 2448, cam_id=5, image_size=1024)
        tar_f = 2496 * (1024 / 1920)
        np.testing.assert_allclose(K2[0, 0], tar_f, rtol=1e-6)
        assert (r - l, b - t) == (1024, 1024)
        np.testing.assert_allclose(K2[0, 2], 512.0)
        np.testing.assert_allclose(K2[1, 2], 512.0)

    def test_unified_intrinsics_bad_cam(self):
        from diffuman4d_tpu.preprocess.dna_extract import unified_intrinsics

        with pytest.raises(ValueError, match="Unknown camera id"):
            unified_intrinsics(np.eye(3), 100, 100, cam_id=77)


class TestSMCExtraction:
    def _make_smc(self, path):
        import h5py

        rng = np.random.default_rng(0)
        with h5py.File(path, "w") as f:
            for cam in ("0", "1"):
                g = f.create_group(f"Camera_Parameter/{cam}")
                g["K"] = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
                g["D"] = np.zeros(5)
                g["RT"] = np.eye(4)
                g["Color_Calibration"] = np.stack(
                    [np.array([0.0, 1.0, 0.0])] * 3
                )  # identity CCM
                cg = f.create_group(f"Camera_5mp/{cam}/color")
                for fr in range(2):
                    img = (rng.uniform(0, 255, (480, 640, 3))).astype(np.uint8)
                    buf = io.BytesIO()
                    Image.fromarray(img).save(buf, format="JPEG", quality=95)
                    cg[str(fr)] = np.frombuffer(buf.getvalue(), np.uint8)

    def test_reader_and_extract(self, tmp_path):
        from diffuman4d_tpu.preprocess.dna_extract import SMCReader, extract_scene

        smc = str(tmp_path / "cap.smc")
        self._make_smc(smc)
        r = SMCReader(smc)
        calib = r.get_calibration()
        assert set(calib) == {"0", "1"}
        img = r.get_img("Camera_5mp", "0", 0)
        assert img.shape == (480, 640, 3)
        assert r.get_num_frames("Camera_5mp", "0") == 2
        r.close()

        # full extraction at a size whose center crop fits these intrinsics
        n = extract_scene(smc, str(tmp_path / "out"), image_size=256)
        assert n == 4
        out = Image.open(tmp_path / "out" / "images" / "00" / "000000.webp")
        assert out.size == (256, 256)


class TestParquetExpansion:
    def test_extract_parquet_tree(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from diffuman4d_tpu.preprocess.download import extract_parquet_tree

        shards = tmp_path / "shards"
        (shards / "images").mkdir(parents=True)
        (shards / "cameras").mkdir()
        (shards / "poses_3d").mkdir()

        img_bytes = io.BytesIO()
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_bytes, format="WEBP")
        tbl = pa.table(
            {
                "scene": ["sc"] * 2,
                "camera": ["00", "01"],
                "frame": ["000000"] * 2,
                "image": [img_bytes.getvalue()] * 2,
            }
        )
        pq.write_table(tbl, shards / "images" / "sc.parquet")
        pq.write_table(
            pa.table(
                {
                    "scene": ["sc"],
                    "cam_ns": [json.dumps({"frames": []})],
                    "sparse_pcd": [b"ply..."],
                    "cam_evc_intri": ["%YAML:1.0"],
                    "cam_evc_extri": ["%YAML:1.0"],
                }
            ),
            shards / "cameras" / "sc.parquet",
        )
        pq.write_table(
            pa.table({"scene": ["sc"], "frame": ["000000"], "pose_3d": ["{}"]}),
            shards / "poses_3d" / "sc.parquet",
        )

        n = extract_parquet_tree(str(shards), str(tmp_path / "data"))
        assert n == 4
        assert osp.isfile(tmp_path / "data" / "sc" / "transforms.json")
        assert osp.isfile(tmp_path / "data" / "sc" / "sparse_pcd.ply")
        assert osp.isfile(tmp_path / "data" / "sc" / "images" / "00" / "000000.webp")
        assert osp.isfile(tmp_path / "data" / "sc" / "poses_3d" / "000000.json")
        # idempotent without overwrite
        n2 = extract_parquet_tree(str(shards), str(tmp_path / "data"))
        assert n2 == n
