"""diffusers.configuration_utils shim: @register_to_config captures the
full __init__ signature (defaults + passed values) into ``self.config``,
a frozen attribute/key-access dict — the semantics the reference relies
on (e.g. ``self.config.enable_pose_encoder``,
unet_multiview_condition.py:230,254,269)."""

import functools
import inspect


class FrozenDict(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(name) from e

    def __setattr__(self, name, value):  # pragma: no cover
        raise AttributeError("FrozenDict is immutable")


class ConfigMixin:
    config_name = "config.json"

    def register_to_config(self, **kwargs):
        internal = dict(getattr(self, "_internal_dict", {}))
        internal.update(kwargs)
        object.__setattr__(self, "_internal_dict", FrozenDict(internal))

    @property
    def config(self) -> FrozenDict:
        return getattr(self, "_internal_dict", FrozenDict())


def register_to_config(init):
    @functools.wraps(init)
    def inner_init(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {
            k: v
            for k, v in bound.arguments.items()
            if k != "self" and not k.startswith("_")
        }
        ConfigMixin.register_to_config(self, **cfg)
        init(self, *args, **kwargs)

    return inner_init
