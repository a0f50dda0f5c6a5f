from .unet_2d_blocks import DownBlock2D, UpBlock2D  # noqa: F401
