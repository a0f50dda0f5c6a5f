"""diffusers.image_processor shim: only ``postprocess`` is consumed
(pipeline_diffuman4d.py:140,282-284)."""

import numpy as np
import torch


class VaeImageProcessor:
    def __init__(self, vae_scale_factor: int = 8, do_normalize: bool = True):
        self.vae_scale_factor = vae_scale_factor
        self.do_normalize = do_normalize

    @staticmethod
    def denormalize(images: torch.Tensor) -> torch.Tensor:
        return (images / 2 + 0.5).clamp(0, 1)

    @staticmethod
    def pt_to_numpy(images: torch.Tensor) -> np.ndarray:
        return images.cpu().permute(0, 2, 3, 1).float().numpy()

    def postprocess(self, image: torch.Tensor, output_type: str = "pt",
                    do_denormalize=None):
        if do_denormalize is None:
            do_denormalize = [self.do_normalize] * image.shape[0]
        image = torch.stack(
            [
                self.denormalize(image[i]) if do_denormalize[i] else image[i]
                for i in range(image.shape[0])
            ]
        )
        if output_type == "pt":
            return image
        image = self.pt_to_numpy(image)
        if output_type == "np":
            return image
        raise NotImplementedError(f"output_type={output_type} not supported in shim")
