"""CLI end-to-end on a synthetic scene (tiny arch, random weights):
sampling -> nerfstudio export -> evaluation, all through main()."""

import glob
import json
import os.path as osp

import pytest


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    from diffuman4d_tpu.cli import main
    from diffuman4d_tpu.data.synthetic import make_synthetic_scene

    make_synthetic_scene(str(tmp_path / "data"), "demo", num_cams=6, num_frames=2, image_size=64)
    out = tmp_path / "results"
    rc = main(
        [
            f"data.data_dir={tmp_path / 'data'}",
            "data.scene_label=demo",
            "data.height=64",
            "data.width=64",
            "model.arch=tiny",
            "model.dtype=fp32",
            "model.attn_implementation=xla",
            "sampler.spa_label_range=[0,6,1]",
            "sampler.tem_label_range=[0,2,1]",
            "sampler.input_spa_labels=[0,3]",
            "sampler.window_size=2",
            "sampler.alternation_rounds=2",
            f"sampler.output_dir={out}",
            "evaluating=true",
        ]
    )
    assert rc == 0
    # completeness: 6 cams x 2 frames
    assert len(glob.glob(str(out / "images" / "**" / "*.jpg"))) == 12
    # nerfstudio export
    tfs = json.loads((out / "transforms.json").read_text())
    assert len(tfs["frames"]) == 12
    tfs_in = json.loads((out / "transforms_input.json").read_text())
    assert {f["camera_label"] for f in tfs_in["frames"]} == {"00", "03"}
    # metrics over the 4 target cams x 2 frames
    metrics = json.loads((out / "metrics.json").read_text())
    assert len(metrics["values"]) == 8
    assert metrics["mean"]["psnr"] is not None
    # config tree log written
    assert osp.isfile(out / "config_tree.log")
    # resume state checkpointed
    assert osp.isfile(out / "state" / "grid_state.d4d")
