"""diffusers.utils shim: logging adapter, BaseOutput, small helpers."""

import logging as _pylogging
from collections import OrderedDict
from dataclasses import fields, is_dataclass

import torch


class _LoggingModule:
    @staticmethod
    def get_logger(name=None):
        return _pylogging.getLogger(name or "diffusers")


logging = _LoggingModule()


def deprecate(*args, **kwargs):  # pragma: no cover - advisory only
    return None


def is_torch_version(operation: str, version: str) -> bool:
    """Compare the installed torch version (diffusers.utils.import_utils
    semantics; only >=/>/<=/< with major.minor[.patch] needed here)."""
    import operator

    ops = {">=": operator.ge, ">": operator.gt, "<=": operator.le,
           "<": operator.lt, "==": operator.eq}
    cur = tuple(int(x) for x in torch.__version__.split("+")[0].split(".")[:3])
    ref = tuple(int(x) for x in version.split(".")[:3])
    cur = cur + (0,) * (len(ref) - len(cur))
    return ops[operation](cur[: len(ref)], ref)


def replace_example_docstring(example_docstring):
    def decorator(fn):
        return fn

    return decorator


class BaseOutput(OrderedDict):
    """Dataclass-backed output container: attribute access + tuple-style
    integer indexing over non-None fields (diffusers.utils.BaseOutput
    semantics)."""

    def __post_init__(self):
        if is_dataclass(self):
            for f in fields(self):
                v = getattr(self, f.name)
                if v is not None:
                    self[f.name] = v

    def __getitem__(self, k):
        if isinstance(k, str):
            return dict(self)[k]
        return self.to_tuple()[k]

    def __setattr__(self, name, value):
        if name in self.keys() and value is not None:
            super().__setitem__(name, value)
        super().__setattr__(name, value)

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        super().__setattr__(key, value)

    def to_tuple(self):
        return tuple(self[k] for k in self.keys())
