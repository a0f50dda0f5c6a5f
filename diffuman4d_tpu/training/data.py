"""Training data: window batches sampled from a SpaTemDataset scene.

The reference ships no training loop; this builds batches matching the
inference contract (SURVEY §3.3): each element is one window —
spatial: input cameras + ``window_size`` contiguous-roll target cameras at
one frame; temporal: the nearest condition camera's track + one target
camera over ``window_size`` frames. Targets' clean VAE latents are the
diffusion x0; condition rows are flagged in ``is_cond``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from diffuman4d_tpu.utils.arrays import fast_stack

from diffuman4d_tpu.data.dataset import SpaTemDataset


@dataclass
class WindowBatcherConfig:
    window_size: int = 12
    spa_labels: list[str] | None = None
    tem_labels: list[str] | None = None
    input_spa_labels: list[str] = None


class WindowBatcher:
    def __init__(self, dataset: SpaTemDataset, cfg: WindowBatcherConfig):
        self.dataset = dataset
        self.cfg = cfg
        cams = dataset.cameras[dataset.scene_label]
        self.spa_labels = cfg.spa_labels or sorted(cams.keys())
        self.input_spa_labels = list(cfg.input_spa_labels)
        self.target_spa_labels = [
            s for s in self.spa_labels if s not in self.input_spa_labels
        ]
        self.tem_labels = cfg.tem_labels

    def sample_window(self, rng: np.random.Generator, domain: str):
        """-> dataset Sample for one training window."""
        w = self.cfg.window_size
        if domain == "spatial":
            tem = rng.choice(self.tem_labels)
            start = rng.integers(0, len(self.target_spa_labels))
            idx = [(start + i) % len(self.target_spa_labels) for i in range(w)]
            spa = self.input_spa_labels + [self.target_spa_labels[i] for i in idx]
            # dataset API wants full spa list ordering for spatial samples
            sample = self.dataset.get_item(
                scene_label=self.dataset.scene_label,
                spa_labels=spa,
                tem_labels=[tem],
                input_spa_labels=self.input_spa_labels,
            )
        elif domain == "temporal":
            target_cam = rng.choice(self.target_spa_labels)
            start = rng.integers(0, len(self.tem_labels))
            tems = [
                self.tem_labels[(start + i) % len(self.tem_labels)] for i in range(w)
            ]
            sample = self.dataset.get_item(
                scene_label=self.dataset.scene_label,
                spa_labels=[target_cam],
                tem_labels=tems,
                input_spa_labels=self.input_spa_labels,
            )
        else:
            raise ValueError(domain)
        return sample

    def make_batch(self, rng: np.random.Generator, batch_size: int, domain: str):
        """-> dict of stacked numpy arrays for ``encode_training_batch``."""
        samples = [self.sample_window(rng, domain) for _ in range(batch_size)]
        return {
            "pixel_values": fast_stack([s.pixel_values for s in samples]),
            "skeletons": fast_stack([s.skeletons for s in samples]),
            "is_cond": np.stack([s.cond_masks == 0.0 for s in samples]),
            "Ks": np.stack([s.Ks for s in samples]),
            "poses": np.stack([s.poses for s in samples]),
        }


def encode_training_batch(pipeline, raw: dict, key) -> dict:
    """Host batch -> device train-step batch: VAE-encode ALL rows' clean
    pixels (targets need x0 latents for the loss), Plücker at latent res."""
    import jax
    import jax.numpy as jnp

    B, L = raw["pixel_values"].shape[:2]
    dtype = pipeline.unet.dtype
    pix = jnp.asarray(raw["pixel_values"].reshape((B * L,) + raw["pixel_values"].shape[2:]), dtype)
    k_enc, key = jax.random.split(key)
    z = pipeline._encode_j(pipeline.params["vae"], pix, k_enc)
    lat = pipeline.latent_size
    latents_x0 = z.reshape(B, L, lat, lat, pipeline.latent_channels)

    Ks = jnp.asarray(raw["Ks"].reshape(B * L, 3, 3))
    poses = jnp.asarray(raw["poses"].reshape(B * L, 4, 4))
    plucker = pipeline._plucker_j(Ks, poses).reshape(B, L, lat, lat, 6)

    return {
        "latents_x0": latents_x0,
        "plucker": plucker.astype(dtype),
        "skeletons": jnp.asarray(raw["skeletons"], dtype),
        "is_cond": jnp.asarray(raw["is_cond"]),
    }
