from .transformer_2d import Transformer2DModel  # noqa: F401
