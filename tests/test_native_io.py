"""Native host data path: d4dio fused ops and the d4dmem allocator.

The fused u8->VAE-float ops must be BIT-exact with the numpy chain they
replace (images.py to_float/norm_vae/apply_fmask; reference behavior
image_utils.py:9-59) — the dataset picks whichever is available, so any
divergence would make results depend on the build environment.
"""

import numpy as np
import pytest

from diffuman4d_tpu.data.images import apply_fmask, norm_vae, to_float
from diffuman4d_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libd4dio not built"
)


def test_u8_to_vae_bit_exact():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), np.uint8)
    ref = norm_vae(to_float(img))
    out = native.u8_to_vae(img)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, ref)


@pytest.mark.skipif(
    not native.available() or not native.has_vae_fused(),
    reason="fused vae ops not in this libd4dio build",
)
def test_composite_white_vae_bit_exact():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 48, 3), np.uint8)
    # include exact 0 and 255 mask values (pure bg / pure fg)
    mask = rng.integers(0, 256, (64, 48, 1), np.uint8)
    mask[:8] = 0
    mask[-8:] = 255
    ref = apply_fmask(
        norm_vae(to_float(img)), norm_vae(to_float(mask)), "white",
        vae_normalized=True,
    )
    out = native.composite_white_vae(img, mask)
    np.testing.assert_array_equal(out, ref)
    # pure background rows are exactly white (=1.0 in VAE space)
    assert np.all(out[:4] == 1.0)


def test_crop_resize_matches_pil():
    from PIL import Image

    from diffuman4d_tpu.data.images import crop_resize as pil_crop_resize

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (96, 80, 3), np.uint8)
    crop = [10, 7, 64, 64]
    ref = np.asarray(
        pil_crop_resize(Image.fromarray(img), crop, 32, 32)
    )
    out = native.crop_resize(img, crop, 32, 32)
    # PIL-compatible bicubic: PIL evaluates the kernel in 8-bit fixed
    # point, d4dio in float — allow +-2 quantization on a tiny fraction
    diff = np.abs(ref.astype(int) - out.astype(int))
    assert diff.max() <= 2
    assert (diff > 1).mean() < 1e-3


def test_d4dmem_pool_reuse():
    """After tune_host_allocator, large numpy buffers come from the
    shared-anon pool and freed blocks are reused (hit counter grows)."""
    from diffuman4d_tpu.utils.jax_setup import tune_host_allocator

    tune_host_allocator()
    try:
        import importlib.util
        import os.path as osp
        import sysconfig

        ext = sysconfig.get_config_var("EXT_SUFFIX")
        so = osp.join(
            osp.dirname(__file__), "..", "native", "d4dmem", f"d4dmem{ext}"
        )
        # the module name must match the extension's PyInit_d4dmem symbol
        spec = importlib.util.spec_from_file_location("d4dmem", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except (ImportError, FileNotFoundError):
        pytest.skip("d4dmem not built")
    before = mod.stats()
    bufs = [np.full((2 << 20,), i, np.uint8) for i in range(4)]
    vals = [int(b[0]) for b in bufs]
    del bufs
    again = [np.full((2 << 20,), 9, np.uint8) for _ in range(4)]
    after = mod.stats()
    assert vals == [0, 1, 2, 3]
    assert all(int(b[0]) == 9 and int(b[-1]) == 9 for b in again)
    assert after["pool_hit"] + after["pool_miss"] > before["pool_hit"] + before["pool_miss"]
