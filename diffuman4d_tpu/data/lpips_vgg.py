"""LPIPS(VGG16) distance in JAX (reference consumes torchmetrics'
LearnedPerceptualImagePatchSimilarity(net_type='vgg', normalize=True),
metric_utils.py:19).

Weights must be supplied as an ``.npz`` (zero-egress environment: no
torchvision download). Expected keys:
  features.{i}.weight / features.{i}.bias  — VGG16 conv layers (torch
    indices 0,2,5,7,10,12,14,17,19,21,24,26,28)
  lin{0..4}.weight                          — LPIPS 1x1 linear heads

Pipeline (normalize=True variant):
  x in [0,1] -> 2x - 1 -> (x - shift)/scale -> VGG features at
  relu{1_2, 2_2, 3_3, 4_3, 5_3} -> channel-unit-normalize -> squared
  difference -> 1x1 lin head -> spatial mean -> sum over layers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# torch feature indices of VGG16 conv layers and the relu taps after which
# LPIPS extracts features
_CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_TAPS = {3: 0, 8: 1, 15: 2, 22: 3, 29: 4}  # torch idx of relu -> lin head
_POOL_AFTER = {4, 9, 16, 23}  # maxpool positions

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv channel plan (in_ch -> out_ch per conv layer, torch index order)
_CONV_CHANNELS = {
    0: (3, 64), 2: (64, 64),
    5: (64, 128), 7: (128, 128),
    10: (128, 256), 12: (256, 256), 14: (256, 256),
    17: (256, 512), 19: (512, 512), 21: (512, 512),
    24: (512, 512), 26: (512, 512), 28: (512, 512),
}
_TAP_CHANNELS = [64, 128, 256, 512, 512]  # lin head input widths


def expected_schema() -> dict[str, tuple[int, ...]]:
    """The exact npz schema ``scripts/extract_lpips_weights.py`` must
    produce (documented in docs/LPIPS_WEIGHTS.md — no pretrained VGG16
    weights exist on this host, so the schema is the contract)."""
    schema: dict[str, tuple[int, ...]] = {}
    for i, (cin, cout) in _CONV_CHANNELS.items():
        schema[f"features.{i}.weight"] = (cout, cin, 3, 3)  # torch OIHW
        schema[f"features.{i}.bias"] = (cout,)
    for k, c in enumerate(_TAP_CHANNELS):
        schema[f"lin{k}.weight"] = (1, c, 1, 1)
    return schema


def validate_weights(weights: dict) -> None:
    """Raise ValueError unless ``weights`` matches :func:`expected_schema`
    exactly (missing/extra keys or wrong shapes). lin heads are accepted
    in any reshapeable layout with the right element count."""
    schema = expected_schema()
    missing = sorted(set(schema) - set(weights))
    extra = sorted(set(weights) - set(schema))
    if missing or extra:
        raise ValueError(
            f"LPIPS weights npz key mismatch: missing={missing[:4]} "
            f"extra={extra[:4]} (see docs/LPIPS_WEIGHTS.md for the schema)"
        )
    for key, shape in schema.items():
        got = tuple(weights[key].shape)
        ok = got == shape or (
            key.startswith("lin") and int(np.prod(got)) == int(np.prod(shape))
        )
        if not ok:
            raise ValueError(
                f"LPIPS weights: {key} has shape {got}, expected {shape}"
            )


@functools.partial(jax.jit, static_argnames=())
def _lpips_jit(params: dict, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    def scale_in(x):
        x = x * 2.0 - 1.0
        return (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)

    def vgg_taps(x):
        taps = []
        conv_i = 0
        i = 0
        while i <= 29:
            if i in _CONV_IDS:
                w = params[f"features.{i}.weight"]  # torch OIHW
                bkern = jnp.transpose(w, (2, 3, 1, 0))
                x = jax.lax.conv_general_dilated(
                    x,
                    bkern,
                    (1, 1),
                    "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                x = x + params[f"features.{i}.bias"]
                conv_i += 1
            elif i in _POOL_AFTER:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
            if i - 1 in _CONV_IDS:  # relu follows each conv
                pass
            x = x  # no-op
            if i in (1, 3, 6, 8, 11, 13, 15, 18, 20, 22, 25, 27, 29):
                x = jax.nn.relu(x)
            if i in _TAPS:
                taps.append(x)
            i += 1
        return taps

    fa = vgg_taps(scale_in(a))
    fb = vgg_taps(scale_in(b))
    total = 0.0
    for k, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
        nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        lin = params[f"lin{k}.weight"].reshape(-1)  # (C,)
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1))
    return total


def lpips_distance(weights: dict, pred: np.ndarray, gt: np.ndarray) -> float:
    """pred/gt: (H, W, 3) in [0, 1]."""
    params = {k: jnp.asarray(v) for k, v in weights.items()}
    a = jnp.asarray(pred, jnp.float32)[None]
    b = jnp.asarray(gt, jnp.float32)[None]
    return float(_lpips_jit(params, a, b))
