"""Nerfstudio export (reference: scripts/nerfstudio/diffuman4d_to_nerfstudio.py
:14-56 and sampling_runner.to_nerfstudio :79-84).

Rewrites the scene's ``transforms.json`` to point at the generated images,
splits out ``transforms_input.json`` for the input cameras, and copies the
sparse point cloud for 3DGS initialization. The reference additionally runs
BiRefNet to matte the generated images (alpha composites); that external
checkpoint is a pluggable stage here — when no matting model is configured,
the generated fmask-free JPEGs are referenced directly and a note is
recorded in the export manifest.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import shutil


def export_to_nerfstudio(
    scene_dir: str,
    output_dir: str,
    input_spa_labels: list[str],
    image_ext: str = ".jpg",
) -> str:
    transforms_path = osp.join(scene_dir, "transforms.json")
    if not osp.isfile(transforms_path):
        raise FileNotFoundError(transforms_path)
    with open(transforms_path) as f:
        tfs = json.load(f)

    images_dir = osp.join(output_dir, "images")
    frames_all, frames_input = [], []
    for frame in tfs.get("frames", []):
        cam = str(frame.get("camera_label"))
        cam_dir = osp.join(images_dir, cam)
        if not osp.isdir(cam_dir):
            continue
        for fname in sorted(os.listdir(cam_dir)):
            if not fname.endswith(image_ext):
                continue
            nf = dict(frame)
            nf["file_path"] = f"images/{cam}/{fname}"
            frames_all.append(nf)
            if cam in input_spa_labels:
                frames_input.append(nf)

    out_tfs = dict(tfs)
    out_tfs["frames"] = frames_all
    with open(osp.join(output_dir, "transforms.json"), "w") as f:
        json.dump(out_tfs, f, indent=2)

    out_tfs_in = dict(tfs)
    out_tfs_in["frames"] = frames_input
    with open(osp.join(output_dir, "transforms_input.json"), "w") as f:
        json.dump(out_tfs_in, f, indent=2)

    # sparse point cloud for 3DGS init (preprocess.sh:47 writes it into the
    # scene dir as sparse_pcd.ply)
    src_pcd = osp.join(scene_dir, "sparse_pcd.ply")
    if osp.isfile(src_pcd):
        shutil.copyfile(src_pcd, osp.join(output_dir, "sparse_pcd.ply"))

    manifest = {
        "num_frames": len(frames_all),
        "num_input_frames": len(frames_input),
        "alpha_matting": "not run (no matting checkpoint configured)",
    }
    with open(osp.join(output_dir, "export_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return output_dir
