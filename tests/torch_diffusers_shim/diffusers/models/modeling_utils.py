"""diffusers.models.modeling_utils shim: ModelMixin provides the dtype /
device properties the reference reads (pipeline_diffuman4d.py:76-77)."""

import torch
import torch.nn as nn


class ModelMixin(nn.Module):
    _supports_gradient_checkpointing = False

    def __init__(self):
        super().__init__()

    @property
    def dtype(self) -> torch.dtype:
        return next(self.parameters()).dtype

    @property
    def device(self) -> torch.device:
        return next(self.parameters()).device

    def enable_gradient_checkpointing(self):  # pragma: no cover
        self.apply(
            lambda m: setattr(m, "gradient_checkpointing", True)
            if hasattr(m, "gradient_checkpointing")
            else None
        )
