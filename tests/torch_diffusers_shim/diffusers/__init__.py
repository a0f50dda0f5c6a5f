"""Minimal torch shim of the ``diffusers==0.33.1`` public surface consumed
by the reference (/root/reference/src/diffusers/**), written from the
published diffusers semantics — NOT from diffusers source (not installed
here) and NOT from the reference.

Purpose: let the reference's own pipeline/UNet code run unmodified on
torch-CPU as a *golden oracle* for composed end-to-end parity
(tests/test_reference_e2e_parity.py). The reference imports exactly the
symbols below (see pipeline_diffuman4d.py:20-31,
unet_multiview_condition.py:21-27, unet_multiview_blocks.py:21-27,
transformer_multiview.py:19-21, attention.py:7-10).

Every known or suspected divergence from real diffusers 0.33.1 is
catalogued with its safety argument in docs/SHIM_DIVERGENCES.md — read
that ledger before trusting or extending any module here.
"""

from .models import AutoencoderKL  # noqa: F401
from .schedulers import (  # noqa: F401
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
    EulerDiscreteScheduler,
    KarrasDiffusionSchedulers,
)

__version__ = "0.33.1-shim"
