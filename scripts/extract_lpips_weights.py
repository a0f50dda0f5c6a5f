#!/usr/bin/env python
"""Extract LPIPS(VGG16) weights into the .npz layout consumed by
diffuman4d_tpu.data.lpips_vgg (keys: features.{i}.weight/bias, lin{k}.weight).

The runtime environment has zero egress, so this script runs wherever the
pretrained files already exist and the resulting .npz is shipped in:

  # torchvision VGG16 + the LPIPS package's pretrained lin heads
  python scripts/extract_lpips_weights.py \
      --vgg vgg16-397923af.pth --lin lpips_vgg.pth -o lpips_vgg.npz

  # or pull both from installed packages (torchvision / lpips / torchmetrics)
  python scripts/extract_lpips_weights.py --from-packages -o lpips_vgg.npz

Point $LPIPS_WEIGHTS at the output (or pass lpips_weights= to the
evaluator) and metrics.json gains the LPIPS column the reference computes
via torchmetrics (metric_utils.py:19).
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse

import numpy as np

_CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), np.float32)


def extract_vgg(state: dict) -> dict:
    """torch state_dict (torchvision vgg16 or an LPIPS net wrapper) ->
    features.{i}.weight/bias arrays."""
    out = {}
    for i in _CONV_IDS:
        for suffix in ("weight", "bias"):
            for key in (
                f"features.{i}.{suffix}",          # torchvision vgg16
                f"net.slice_map.{i}.{suffix}",      # defensive variants
                f"net.features.{i}.{suffix}",
            ):
                if key in state:
                    out[f"features.{i}.{suffix}"] = _to_np(state[key])
                    break
            else:
                raise KeyError(f"VGG16 conv {i} {suffix} not found in state dict")
    return out


def extract_lin(state: dict) -> dict:
    """LPIPS lin-head state dict (the `lpips` package's vgg.pth:
    lin{k}.model.1.weight; torchmetrics uses the same layout)."""
    out = {}
    for k in range(5):
        for key in (
            f"lin{k}.model.1.weight",
            f"lins.{k}.model.1.weight",
            f"lin{k}.weight",
        ):
            if key in state:
                out[f"lin{k}.weight"] = _to_np(state[key])
                break
        else:
            raise KeyError(f"lin head {k} not found in state dict")
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vgg", help="path to a torch VGG16 state dict (.pth)")
    ap.add_argument("--lin", help="path to an LPIPS lin-heads state dict (.pth)")
    ap.add_argument(
        "--from-packages",
        action="store_true",
        help="load from installed torchvision + lpips/torchmetrics packages",
    )
    ap.add_argument("-o", "--output", default="lpips_vgg.npz")
    args = ap.parse_args()

    import torch

    if args.from_packages:
        from torchvision.models import VGG16_Weights, vgg16

        vgg_state = vgg16(weights=VGG16_Weights.IMAGENET1K_V1).state_dict()
        try:
            import lpips as lpips_pkg

            lin_state = lpips_pkg.LPIPS(net="vgg").state_dict()
        except ImportError:
            from torchmetrics.image.lpip import (
                LearnedPerceptualImagePatchSimilarity,
            )

            m = LearnedPerceptualImagePatchSimilarity(net_type="vgg")
            lin_state = m.net.state_dict()
    else:
        if not (args.vgg and args.lin):
            ap.error("provide --vgg and --lin, or --from-packages")
        vgg_state = torch.load(args.vgg, map_location="cpu", weights_only=True)
        lin_state = torch.load(args.lin, map_location="cpu", weights_only=True)

    weights = {**extract_vgg(vgg_state), **extract_lin(lin_state)}
    np.savez(args.output, **weights)
    print(f"wrote {len(weights)} arrays to {args.output}")


if __name__ == "__main__":
    main()
