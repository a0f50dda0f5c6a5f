"""diffusers.loaders shim: the reference only *inherits* these mixins
(pipeline_diffuman4d.py:21-26, unet_multiview_condition.py:22); none of
their methods are called in the inference path, so they are empty."""


class FromSingleFileMixin:
    pass


class IPAdapterMixin:
    pass


class StableDiffusionLoraLoaderMixin:
    pass


class TextualInversionLoaderMixin:
    pass


class PeftAdapterMixin:
    pass


class UNet2DConditionLoadersMixin:
    pass
