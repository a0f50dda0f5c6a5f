"""diffusers.pipelines.pipeline_utils shim. The reference pipeline uses:
``register_modules`` (pipeline_diffuman4d.py:138), ``_execution_device``
(:207,267,317), ``progress_bar`` (:368), ``maybe_free_model_hooks``
(:435); from_pretrained/save machinery is not exercised in the oracle."""

import torch
from tqdm import tqdm

from ..configuration_utils import ConfigMixin


class DiffusionPipeline(ConfigMixin):
    def __init__(self):
        super().__init__()
        self._progress_bar_config = {}

    def register_modules(self, **kwargs):
        for name, module in kwargs.items():
            setattr(self, name, module)

    @property
    def _execution_device(self) -> torch.device:
        for attr in ("unet", "vae"):
            module = getattr(self, attr, None)
            if isinstance(module, torch.nn.Module):
                try:
                    return next(module.parameters()).device
                except StopIteration:  # pragma: no cover
                    pass
        return torch.device("cpu")

    def progress_bar(self, iterable=None, total=None):
        if iterable is not None:
            return tqdm(iterable, disable=True)
        return tqdm(total=total, disable=True)

    def maybe_free_model_hooks(self):
        return None


class StableDiffusionMixin:
    pass
