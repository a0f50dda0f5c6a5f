from .autoencoders.autoencoder_kl import AutoencoderKL  # noqa: F401
