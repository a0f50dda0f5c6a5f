"""LPIPS math parity: the JAX implementation (data/lpips_vgg.py) vs an
independent torch forward of the same spec, fed identical random VGG16
weights.

The reference gates quality on torchmetrics'
LearnedPerceptualImagePatchSimilarity(net_type="vgg", normalize=True)
(src/data/utils/metric_utils.py:19). torchmetrics/torchvision are not
installed in this environment and pretrained weights cannot be downloaded
(zero egress), so parity is checked structurally: same random weights into
both implementations must give the same distance. Pretrained weights are
delivered later via scripts/extract_lpips_weights.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

# VGG16 torchvision `features` layout (conv idx, in_ch, out_ch)
_CONVS = [
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
_POOLS = {4, 9, 16, 23}
_RELUS = {1, 3, 6, 8, 11, 13, 15, 18, 20, 22, 25, 27, 29}
_TAPS = [3, 8, 15, 22, 29]
_TAP_CH = [64, 128, 256, 512, 512]

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _random_weights(seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    w = {}
    for i, cin, cout in _CONVS:
        std = (2.0 / (cin * 9)) ** 0.5  # keep activations in a sane range
        w[f"features.{i}.weight"] = rng.normal(
            0, std, (cout, cin, 3, 3)
        ).astype(np.float32)
        w[f"features.{i}.bias"] = rng.normal(0, 0.01, (cout,)).astype(np.float32)
    for k, ch in enumerate(_TAP_CH):
        # LPIPS lin heads are non-negative 1x1 convs
        w[f"lin{k}.weight"] = np.abs(
            rng.normal(0, 0.1, (1, ch, 1, 1))
        ).astype(np.float32)
    return w


def _torch_lpips(w: dict, a: np.ndarray, b: np.ndarray) -> float:
    """Independent torch forward of the LPIPS(VGG16, normalize=True) spec."""

    def prep(x):
        t = torch.from_numpy(np.ascontiguousarray(x)).permute(2, 0, 1)[None]
        t = t * 2.0 - 1.0
        return (t - _SHIFT) / _SCALE

    def taps(x):
        out = []
        for i in range(30):
            if f"features.{i}.weight" in w:
                x = F.conv2d(
                    x,
                    torch.from_numpy(w[f"features.{i}.weight"]),
                    torch.from_numpy(w[f"features.{i}.bias"]),
                    padding=1,
                )
            elif i in _POOLS:
                x = F.max_pool2d(x, 2)
            if i in _RELUS:
                x = F.relu(x)
            if i in _TAPS:
                out.append(x)
        return out

    fa, fb = taps(prep(a)), taps(prep(b))
    total = 0.0
    for k, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / (xa.norm(dim=1, keepdim=True) + 1e-10)
        nb = xb / (xb.norm(dim=1, keepdim=True) + 1e-10)
        lin = torch.from_numpy(w[f"lin{k}.weight"])
        total = total + F.conv2d((na - nb) ** 2, lin).mean()
    return float(total)


@pytest.fixture(scope="module")
def weights():
    return _random_weights()


def test_lpips_matches_independent_torch(weights):
    from diffuman4d_tpu.data.lpips_vgg import lpips_distance

    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)

    ours = lpips_distance(weights, a, b)
    ref = _torch_lpips(weights, a, b)
    assert ref > 0
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)


def test_lpips_zero_for_identical(weights):
    from diffuman4d_tpu.data.lpips_vgg import lpips_distance

    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    assert lpips_distance(weights, a, a) == 0.0


def test_lpips_monotone_in_noise(weights):
    """More corruption must score farther (sanity on the metric's sign)."""
    from diffuman4d_tpu.data.lpips_vgg import lpips_distance

    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    small = np.clip(a + rng.normal(0, 0.02, a.shape).astype(np.float32), 0, 1)
    big = np.clip(a + rng.normal(0, 0.3, a.shape).astype(np.float32), 0, 1)
    assert lpips_distance(weights, a, small) < lpips_distance(weights, a, big)


def test_metrics_use_lpips_when_weights_exist(tmp_path, weights):
    """ImageEvaluator must pick up weights from a file and stop returning
    NaN (VERDICT r1: metrics.json means were silently LPIPS-free)."""
    from diffuman4d_tpu.data.metrics import LPIPS

    path = tmp_path / "lpips_vgg.npz"
    np.savez(path, **weights)
    m = LPIPS(str(path))
    assert m.available
    rng = np.random.default_rng(4)
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    v = m(a, b)
    assert np.isfinite(v) and v > 0


def test_expected_schema_matches_random_weights():
    from diffuman4d_tpu.data.lpips_vgg import expected_schema, validate_weights

    w = _random_weights()
    assert set(expected_schema()) == set(w)
    validate_weights(w)  # should not raise


def test_validate_weights_rejects_bad_npz(tmp_path):
    from diffuman4d_tpu.data.lpips_vgg import validate_weights

    w = _random_weights()
    bad = dict(w)
    del bad["lin3.weight"]
    with pytest.raises(ValueError, match="missing"):
        validate_weights(bad)
    bad = dict(w)
    bad["features.0.weight"] = bad["features.0.weight"][:, :2]
    with pytest.raises(ValueError, match="shape"):
        validate_weights(bad)
    # a corrupt file must fail loudly at evaluator construction, not NaN
    from diffuman4d_tpu.data.metrics import LPIPS

    path = tmp_path / "lpips_vgg.npz"
    np.savez(path, **{k: v for k, v in w.items() if not k.startswith("lin")})
    with pytest.raises(ValueError):
        LPIPS(str(path))


def test_missing_weights_warns_loudly(caplog):
    import logging

    from diffuman4d_tpu.data.metrics import LPIPS

    with caplog.at_level(logging.WARNING, "diffuman4d_tpu.data.metrics"):
        lp = LPIPS(None)
    assert not lp.available
    assert any("LPIPS_WEIGHTS" in r.message for r in caplog.records)
