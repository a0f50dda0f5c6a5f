"""Diffuman4D pipeline: condition preparation + sliding-iterative denoising.

Rebuilds src/diffusers/pipelines/diffuman4d/pipeline_diffuman4d.py as a
small set of jit-compiled programs:

  * :meth:`prepare_conditions` — VAE-encode conditional pixels (only rows
    that are actually consumed — the reference encodes every frame and then
    uses just the conditional rows, pipeline_diffuman4d.py:208-214/379),
    Plücker directly at latent resolution, pose features once per frame.
  * :meth:`sliding_denoise` — the window loop (reference :439-543) as one
    ``lax.fori_loop`` over a precomputed window matrix; the inner
    ``__call__`` denoise loop (:289-425) is unrolled ``num_denoising_steps``
    times (1 in every shipped config); per-latent scheduler state is a
    vectorized int32 index array.
  * :meth:`decode` — micro-batched VAE decode (:59-72).

CFG parity (:345-357, 382-386, 408-410): the negative half of the batch
replaces conditional-row latents with constant white latents (ones),
Plücker with zeros ("grey"), skeletons with black (whose pose-encoder
feature map is a constant, computed once), and uses the same cond masks.

Static shapes per (domain, sequence length, window count): exactly two
compiled variants per run configuration.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from diffuman4d_tpu.data.rays import calc_plucker_embeds_lowres
from diffuman4d_tpu.models.pose_encoder import PoseEncoder
from diffuman4d_tpu.models.unet import UNetMultiviewCondition
from diffuman4d_tpu.models.vae import AutoencoderKL
from diffuman4d_tpu.schedulers.diffusion import Scheduler
from diffuman4d_tpu.sampling.windows import step_counts


def _skel_u8(sk: np.ndarray) -> np.ndarray:
    """Skeleton row -> uint8 wire format. Identity for datasets running
    ``skeletons_uint8=True``; the [-1,1] fp path re-quantizes (exact
    round-trip of the original u8 — see SpaTemDataset.skeletons_uint8)."""
    sk = np.asarray(sk)
    if sk.dtype == np.uint8:
        return sk
    return np.clip(
        np.rint((sk.astype(np.float32) + 1.0) * 127.5), 0, 255
    ).astype(np.uint8)


@dataclass(frozen=True)
class SlidingConfig:
    """Sliding-denoise parameters (configs/sampler/*.yaml)."""

    window_size: int = 12
    sliding_stride: int = 1
    sliding_shift: int = 0
    bidirectional: bool = False
    num_denoising_steps: int = 1
    alternation_rounds: int = 3
    guidance_scale: float = 2.0
    # Domains whose CFG halves run as a sequential lax.map over two UNet
    # forwards of batch L instead of one fused batch-2L call. Identical
    # math (the halves share no state); halves the UNet live-set. The
    # demo_4d temporal wave program needs this on a single v5e: fused CFG
    # batch 48 compiles to temp 12.43 GB (+2.07 GB args) and OOMs next to
    # params + the 300-row skeleton stack (measured,
    # scripts/probe_temporal_mem.py, r5).
    split_cfg_domains: tuple = ()

    @property
    def do_cfg(self) -> bool:
        # guidance_scale == 1 disables CFG (pipeline_diffuman4d.py:149-151)
        return self.guidance_scale > 1.0

    @property
    def total_steps(self) -> int:
        return step_counts(
            self.window_size,
            self.sliding_stride,
            self.num_denoising_steps,
            self.bidirectional,
            self.alternation_rounds,
        )[1]

    @property
    def steps_per_alt(self) -> int:
        return step_counts(
            self.window_size,
            self.sliding_stride,
            self.num_denoising_steps,
            self.bidirectional,
            self.alternation_rounds,
        )[0]


class Diffuman4DPipeline:
    def __init__(
        self,
        unet: UNetMultiviewCondition,
        vae: AutoencoderKL,
        scheduler: Scheduler,
        params: dict,  # {"unet": ..., "vae": ...} flax variable dicts
        sliding: SlidingConfig = SlidingConfig(),
        image_size: int = 1024,
        vae_batch: int = 4,
        vae_decode_batch: int | None = None,
        window_chunk: int | None = 8,
        cond_cache: bool = True,
        skel_cache_mb: int = 3072,
        pix_cache_mb: int = 512,
        pose_cache_mb: int = 1536,
        cond_seed: int = 0,
    ):
        # decode at 1024^2 peaks ~1 GB activations per image in the decoder's
        # upper stages; small decode batches keep HBM headroom on 16 GB chips
        self.vae_decode_batch = vae_decode_batch or max(1, vae_batch // 2)
        # windows per device execution: one giant fori_loop over 44+ windows
        # is a single multi-minute device execution, which this environment's
        # compile/execute relay cannot survive (observed worker crashes);
        # chunking bounds each execution while latents stay device-resident
        # and dispatch stays async — identical math, zero extra transfers
        self.window_chunk = window_chunk
        self.unet = unet
        self.vae = vae
        self.base_scheduler = scheduler
        self.params = params
        self.sliding = sliding
        self.image_size = image_size
        self.latent_size = image_size // vae.config.downscale_factor
        self.latent_channels = vae.config.latent_channels
        self.vae_batch = vae_batch
        self.scheduler = scheduler.set_timesteps(sliding.total_steps)
        # Device-resident per-frame condition caches. Measured on the
        # demo_4d_tiny run (phases.json): prepare_conditions was 77% of
        # wall clock, dominated by re-uploading the same frames' skeletons
        # (~300 MB/task) through a host->device path that crawls while the
        # chip denoises. Tasks revisit every frame several times across
        # alternation rounds, so skeletons are kept on device as uint8
        # (quantization <= 1/255 — finer than bf16's ulp near +-1) and
        # conditional pixel latents are cached per frame with
        # frame-deterministic encode keys (cache hits are bit-identical to
        # recomputation, independent of task order — same philosophy as
        # grid-indexed init noise).
        #
        # All caches are byte-budgeted LRUs (ByteLRU): a demo_4d grid has
        # 7,200 distinct (camera, frame) cells (~21 GB of skeletons), so
        # insertion must evict, never merely stop — the round-3 real-chip
        # OOM came from open-loop budgets plus whole-sequence pose-feature
        # materialization. pose_cache_mb now doubles as the MATERIALIZE
        # THRESHOLD: a task whose whole-sequence pose features fit the
        # budget precomputes them once (LRU-cached per frame, so repeat
        # visits skip the encoder — the demo_3d/48-row regime); a task
        # that doesn't fit (demo_4d's 300-row temporal tasks, ~3.1 GB)
        # streams features per window chunk instead (see sliding_denoise),
        # which is what the reference effectively does by re-running its
        # pose encoder inside every window forward
        # (unet_multiview_condition.py:552-554).
        self.cond_cache = cond_cache
        self.cond_seed = cond_seed
        from diffuman4d_tpu.utils.arrays import ByteLRU

        self._skel_cache = ByteLRU(skel_cache_mb * (1 << 20))
        self._pix_cache = ByteLRU(pix_cache_mb * (1 << 20))
        self._pose_cache = ByteLRU(pose_cache_mb * (1 << 20))
        self._neg_pose = None

        self._unet_fwd = self._plain_unet_fwd
        self._encode_j = jax.jit(self._encode_impl)
        self._decode_j = jax.jit(self._decode_impl)
        self._decode_u8_j = jax.jit(self._decode_u8_impl)
        self._moments_j = jax.jit(
            lambda p, x: self.vae.apply(p, x, method="moments")
        )
        self._sample_lat_j = jax.jit(self._sample_lat_impl)
        self._skel_norm_j = jax.jit(
            lambda u8: (u8.astype(jnp.float32) / 127.5 - 1.0).astype(
                self.unet.dtype
            )
        )
        self._pose_j = jax.jit(self._pose_impl)
        self._chunk_batch_j = jax.jit(self._chunk_cond_batch_impl)
        self._plucker_j = jax.jit(self._plucker_impl)
        self._rejit_sliding()

    def clear_condition_caches(self) -> None:
        """Drop all device-resident per-frame condition caches (skeletons,
        conditional latents, pose features). Used by bench.py's cold tier
        to measure a first-visit task honestly."""
        self._skel_cache.clear()
        self._pix_cache.clear()
        self._pose_cache.clear()
        self._neg_pose = None

    def _rejit_sliding(self) -> None:
        self._sliding_j = jax.jit(
            self._sliding_impl, static_argnames=("domain", "num_denoising_steps")
        )
        self._sliding_batch_j = jax.jit(
            self._sliding_batch_impl, static_argnames=("domain", "num_denoising_steps")
        )
        self._mesh_unet_params = None

    def commit_mesh_params(self, mesh) -> None:
        """Replicate the UNet params over a (possibly multi-process) global
        mesh for the batched denoise jit. The original single-device params
        keep serving the per-process condition encode / output decode,
        which run on local data only."""
        from jax.sharding import PartitionSpec as P

        from diffuman4d_tpu.parallel.distributed import put_sharded

        self._mesh_unet_params = jax.tree.map(
            lambda p: put_sharded(mesh, P(), p), self.params["unet"]
        )

    def _plain_unet_fwd(self, unet_params, x, t, tem, num_frames,
                        pose_features=None):
        return self.unet.apply(
            unet_params, x, t, tem_indices=tem, num_frames=num_frames,
            pose_features=pose_features,
        )

    def enable_context_parallel(self, mesh, axis: str = "model") -> None:
        """Shard each window step's frame axis over ``mesh[axis]`` so one
        task's denoise uses every device on that axis (the reference pins
        one window step to one GPU, sampling_utils.py:44-51; this is a TPU
        win axis — see parallel/cp_unet.py). Composes with the task-wave
        "data" axis: batched sliding then vmaps with spmd_axis_name="data"
        so each mesh row denoises its own task context-parallel."""
        from diffuman4d_tpu.parallel.cp_unet import make_cp_unet_apply

        if mesh.shape[axis] > 1:
            self._unet_fwd = make_cp_unet_apply(self.unet, mesh, axis)
            self._cp_active = True
        else:
            self._unet_fwd = self._plain_unet_fwd
            self._cp_active = False
        self._rejit_sliding()  # drop traces that baked in the old forward

    # -- condition preparation ----------------------------------------
    # Encode / decode / pose all run as host loops over FIXED-shape jitted
    # micro-batches (pad the last chunk): one compile per program for the
    # whole run regardless of how many rows a task needs. Variable-batch
    # programs recompile per row count, and compiles cost minutes on this
    # environment's remote-compile path (micro-batching itself mirrors
    # pipeline_diffuman4d.py:47-72).
    @staticmethod
    def _fixed_chunks(x, b):
        n = x.shape[0]
        for i in range(0, n, b):
            c = x[i : i + b]
            pad = b - c.shape[0]
            if pad:
                c = jnp.pad(c, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
            yield c, min(b, n - i)

    def _encode_impl(self, vae_params, images, key):
        """One VAE-encode micro-batch (pipeline_diffuman4d.py:47-56)."""
        return self.vae.apply(vae_params, images, key, method="encode")

    def encode_images(self, images, key):
        n = images.shape[0]
        b = self.vae_batch
        keys = jax.random.split(key, -(-n // b))
        outs = [
            self._encode_j(self.params["vae"], c, keys[i])[:m]
            for i, (c, m) in enumerate(self._fixed_chunks(images, b))
        ]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    def _decode_impl(self, vae_params, latents):
        return self.vae.apply(vae_params, latents, method="decode")

    def _decode_u8_impl(self, vae_params, latents):
        """Decode + quantize to uint8 ON DEVICE. Bit-equal to the old
        host path (clip to [0,1] -> *255 + 0.5 -> truncate), but the host
        transfer shrinks to 3 bytes/px and — critically — no host-side
        ml_dtypes bf16->fp32 conversion, which runs at ~1.7 MB/s in numpy
        and dominated end-to-end time (measured 158 s for 44 images)."""
        x = self.vae.apply(vae_params, latents, method="decode")
        x01 = jnp.clip(x.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
        return jnp.floor(x01 * 255.0 + 0.5).astype(jnp.uint8)

    def decode_latents(self, latents):
        b = self.vae_decode_batch
        outs = [
            self._decode_j(self.params["vae"], c)[:m]
            for c, m in self._fixed_chunks(latents, b)
        ]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    def _pose_impl(self, unet_params, skeletons):
        """Pose features for one fixed micro-batch of frames."""
        pe_params = {"params": unet_params["params"]["pose_encoder"]}
        module = PoseEncoder(
            self.unet.config.block_out_channels[0], dtype=self.unet.dtype
        )
        return module.apply(pe_params, skeletons)

    def pose_features(self, skeletons):
        """Per-frame pose features + the constant black-skeleton negative
        (computed once; the reference re-runs the pose encoder per window,
        unet_multiview_condition.py:552-554)."""
        return (
            self._pose_from_skel(skeletons),
            self._neg_pose_feature(skeletons.shape[1:]),
        )

    def _plucker_impl(self, Ks, poses):
        return calc_plucker_embeds_lowres(
            self.image_size,
            self.image_size,
            Ks,
            poses,
            self.latent_size,
            self.latent_size,
        )

    def _h2d(self, x: np.ndarray) -> jnp.ndarray:
        """Host array -> device bf16 via a uint16 wire format holding the
        exact bf16 bit patterns. The round-to-nearest-even fp32->bf16
        conversion is done with integer ops on the host (numpy's ml_dtypes
        bf16 cast runs at ~MB/s; this is plain SIMD), halving the
        host->device bytes while staying bit-identical to a device-side
        fp32->bf16 cast. Full-precision models skip the shortcut."""
        if self.unet.dtype != jnp.bfloat16:
            return jnp.asarray(x, self.unet.dtype)
        f32 = np.ascontiguousarray(x, np.float32)
        u = f32.view(np.uint32)
        # round to nearest even: add 0x7FFF + lsb-of-result, drop 16 bits
        bits = ((u + np.uint32(0x7FFF) + ((u >> np.uint32(16)) & np.uint32(1)))
                >> np.uint32(16)).astype(np.uint16)
        return jax.lax.bitcast_convert_type(jnp.asarray(bits), jnp.bfloat16)

    def _frame_key(self, label) -> jax.Array:
        """Deterministic per-frame PRNG key: the posterior draw for a
        frame's conditional latent is a function of (cond_seed, label)
        only, so cached encodes are bit-identical to recomputation
        regardless of task batching or execution order."""
        import zlib

        h = zlib.crc32(repr(label).encode()) & 0x7FFFFFFF
        return jax.random.fold_in(jax.random.PRNGKey(self.cond_seed), h)

    def _sample_lat_impl(self, mean, logvar, keys):
        def one(m, lv, k):
            z = m.astype(jnp.float32) + jnp.exp(0.5 * lv) * jax.random.normal(
                k, m.shape, jnp.float32
            )
            return z

        z = jax.vmap(one)(mean, logvar, keys)
        return (z * self.vae.config.scaling_factor).astype(self.unet.dtype)

    def _cond_latents_cached(self, sample, cond_rows) -> jnp.ndarray:
        """Per-frame cached conditional latents (device-resident; ~128 KB
        per frame at 128^2). Misses run micro-batched VAE moments + a
        per-frame deterministic posterior draw."""
        labels = sample.labels
        miss = [i for i in cond_rows if labels[i] not in self._pix_cache]
        if miss:
            pix_miss = self._h2d(sample.pixel_values[np.asarray(miss)])
            means, logvars = [], []
            for c, m in self._fixed_chunks(pix_miss, self.vae_batch):
                mu, lv = self._moments_j(self.params["vae"], c)
                means.append(mu[:m])
                logvars.append(lv[:m])
            mean = means[0] if len(means) == 1 else jnp.concatenate(means)
            logvar = logvars[0] if len(logvars) == 1 else jnp.concatenate(logvars)
            keys = jnp.stack([self._frame_key(labels[i]) for i in miss])
            z = self._sample_lat_j(mean, logvar, keys)
            fresh = {labels[i]: z[j] for j, i in enumerate(miss)}
            for lb, row in fresh.items():
                self._pix_cache.put(lb, row, row.nbytes)
        else:
            fresh = {}
        return jnp.stack(
            [
                fresh[labels[i]]
                if labels[i] in fresh
                else self._pix_cache.value(labels[i])
                for i in cond_rows
            ]
        )

    def _skel_rows(self, sample, indices=None) -> list:
        """Per-frame device-resident uint8 skeleton rows (LRU-cached).
        Returns a list of (H, W, 3) uint8 device arrays — rows, not one
        stacked array, so an evicting cache and a live task can share the
        same buffers without doubling HBM."""
        skeletons, labels = sample.skeletons, sample.labels
        idx = range(len(labels)) if indices is None else indices
        rows = []
        for i in idx:
            lb = labels[i]
            a = self._skel_cache.value(lb)
            if a is None:
                u8 = _skel_u8(skeletons[i])
                a = jnp.asarray(u8)
                self._skel_cache.put(lb, a, u8.nbytes)
            rows.append(a)
        return rows

    def _skeletons_to_device(self, sample, indices=None) -> jnp.ndarray:
        """Stacked + normalized skeleton batch (model dtype) for the
        VAE-encode path (``enable_pose_encoder=False``)."""
        return self._skel_norm_j(jnp.stack(self._skel_rows(sample, indices)))

    def _pose_from_skel(self, skel_norm) -> jnp.ndarray:
        """Pose-encoder forward over a normalized skeleton batch, in fixed
        micro-batches (one compiled program regardless of row count)."""
        outs = [
            self._pose_j(self.params["unet"], c)[:m]
            for c, m in self._fixed_chunks(skel_norm, self.vae_batch)
        ]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    def _neg_pose_feature(self, skel_shape) -> jnp.ndarray:
        """Constant black-skeleton pose feature for the CFG negative half
        (pipeline_diffuman4d.py:349-356) — computed once per pipeline."""
        if self._neg_pose is None:
            b = self.vae_batch
            self._neg_pose = self._pose_j(
                self.params["unet"],
                -jnp.ones((b,) + tuple(skel_shape), self.unet.dtype),
            )[:1]
        return self._neg_pose

    def _pose_feature_bytes(self) -> int:
        """Per-row pose-feature size: (latent, latent, ch0) in model dtype."""
        ch0 = self.unet.config.block_out_channels[0]
        return (
            self.latent_size * self.latent_size * ch0
            * jnp.dtype(self.unet.dtype).itemsize
        )

    def _pose_features_lru(self, sample) -> jnp.ndarray:
        """Whole-task pose features through the per-frame ByteLRU: repeat
        frame visits (alternation rounds, shared cond tracks) skip both the
        skeleton path and the encoder; the encoder is deterministic, so
        hits are bit-identical to recomputation."""
        labels = sample.labels
        # snapshot hits BEFORE inserting misses: an insert may evict this
        # very task's older rows (LRU is byte-budgeted), and the local ref
        # keeps the device buffer alive for the stack below either way
        have = {
            lb: self._pose_cache.value(lb)
            for lb in labels if lb in self._pose_cache
        }
        miss = [i for i, lb in enumerate(labels) if lb not in have]
        if miss:
            fm = self._pose_from_skel(self._skeletons_to_device(sample, miss))
            for j, i in enumerate(miss):
                row = fm[j]
                have[labels[i]] = row
                self._pose_cache.put(labels[i], row, int(row.nbytes))
        return jnp.stack([have[lb] for lb in labels])

    def prepare_conditions(self, sample, key, stacked_skel: bool = False) -> dict:
        """Host Sample -> device condition dict. Only conditional rows'
        pixels are VAE-encoded; non-cond rows get zeros (never consumed).

        With the pose encoder enabled, the residency of pose features is
        budget-gated: a task whose whole-sequence features fit
        ``pose_cache_mb`` gets them materialized once ("pose_features",
        per-frame LRU-cached — the 48-row demo_3d regime, where per-chunk
        recompute would add encoder forwards to every window chunk). A
        task that doesn't fit (demo_4d's 300-row temporal tasks, ~3.1 GB
        bf16 — the round-3 OOM) instead carries the RAW uint8 skeletons
        ("skel_rows": list of per-frame device rows, or "skel_u8": one
        stacked array when ``stacked_skel`` — the wave path needs a
        stackable pytree leaf) and ``sliding_denoise`` computes features
        per window chunk — the same per-window-only device residency the
        reference gets from uploading each window separately
        (pipeline_diffuman4d.py:521-539).
        """
        dtype = self.unet.dtype
        is_cond_input = sample.cond_masks == 0.0  # inputs condition the model
        n = sample.pixel_values.shape[0]

        # encode conditional rows only — and transfer only those rows to the
        # device (48 full-res frames would be ~300 MB of dead HBM)
        cond_rows = np.nonzero(is_cond_input)[0]
        k_enc, key = jax.random.split(key)
        use_cache = self.cond_cache and getattr(sample, "labels", None) is not None
        if use_cache:
            z_cond = self._cond_latents_cached(sample, list(cond_rows))
        else:
            pix_cond = self._h2d(sample.pixel_values[cond_rows])
            z_cond = self.encode_images(pix_cond, k_enc)
        pix_latents = jnp.zeros(
            (n, self.latent_size, self.latent_size, self.latent_channels), dtype
        )
        pix_latents = pix_latents.at[jnp.asarray(cond_rows)].set(z_cond.astype(dtype))

        plucker = self._plucker_j(
            jnp.asarray(sample.Ks), jnp.asarray(sample.poses)
        ).astype(dtype)

        cond = {
            "pix_latents": pix_latents,
            "plucker": plucker,
            "is_cond": jnp.asarray(is_cond_input),
        }
        if self.unet.config.enable_pose_encoder:
            fits = n * self._pose_feature_bytes() <= self._pose_cache.budget
            if fits and use_cache:
                cond["pose_features"] = self._pose_features_lru(sample)
            elif fits:
                cond["pose_features"] = self._pose_from_skel(
                    self._skel_norm_j(jnp.asarray(sample.skeletons))
                    if sample.skeletons.dtype == np.uint8
                    else self._h2d(sample.skeletons).astype(dtype)
                )
            else:
                rows = (
                    self._skel_rows(sample)
                    if use_cache
                    else [jnp.asarray(_skel_u8(sk)) for sk in sample.skeletons]
                )
                if stacked_skel:
                    cond["skel_u8"] = jnp.stack(rows)
                else:
                    cond["skel_rows"] = rows
            cond["neg_pose_feature"] = self._neg_pose_feature(
                sample.skeletons.shape[1:]
            )
        else:
            k_sk, key = jax.random.split(key)
            if use_cache:
                skel_dev = self._skeletons_to_device(sample)
            elif sample.skeletons.dtype == np.uint8:
                skel_dev = self._skel_norm_j(jnp.asarray(sample.skeletons))
            else:
                skel_dev = self._h2d(sample.skeletons)
            cond["skeleton_latents"] = self.encode_images(
                skel_dev, k_sk
            ).astype(dtype)
        return cond

    def init_noise(self, spa_ids: np.ndarray, tem_ids: np.ndarray, seed: int):
        """Grid-indexed deterministic noise: latent (s, t) always draws the
        same init noise regardless of task batching (SURVEY §7 hard part d)."""
        base = jax.random.PRNGKey(seed)

        def one(s, t):
            k = jax.random.fold_in(jax.random.fold_in(base, s), t)
            return jax.random.normal(
                k, (self.latent_size, self.latent_size, self.latent_channels),
                jnp.float32,
            )

        noise = jax.vmap(one)(jnp.asarray(spa_ids), jnp.asarray(tem_ids))
        return (noise * self.scheduler.init_noise_sigma).astype(self.unet.dtype)

    # -- the sliding window loop --------------------------------------
    def _denoise_step(self, unet_params, cond_w, latents_w, t_idx_w, domain,
                      scheduler, guidance_scale, do_cfg, aux_w=None):
        """One denoising step on one window (reference __call__ body,
        pipeline_diffuman4d.py:369-423)."""
        is_cond = cond_w["is_cond"]  # (L,)
        L = latents_w.shape[0]
        dtype = latents_w.dtype

        t = scheduler.timestep_of(t_idx_w, is_cond)  # (L,)
        x = scheduler.scale_model_input(latents_w, t_idx_w)
        # conditional rows feed clean image latents (:378-379)
        sel = is_cond[:, None, None, None]
        x = jnp.where(sel, cond_w["pix_latents"], x)

        plucker = cond_w["plucker"]
        pose_features = cond_w.get("pose_features")
        skel_lat = cond_w.get("skeleton_latents")
        # negative half: white latents on cond rows, grey plucker, black
        # skeleton features (:349-356, 384-386)
        neg = None
        if do_cfg:
            neg = dict(
                x=jnp.where(sel, jnp.ones_like(x), x),
                plucker=jnp.zeros_like(plucker),
            )
            if pose_features is not None:
                neg["pose"] = jnp.broadcast_to(
                    cond_w["neg_pose_feature"], pose_features.shape
                )
            if skel_lat is not None:
                neg["skel"] = -jnp.ones_like(skel_lat)

        # the reference's cond-mask image is constant per frame; a broadcast
        # plane is exact (cond_masks nearest-resize, :242-249)
        h, w = latents_w.shape[1:3]
        mask_plane = jnp.broadcast_to(
            (~is_cond).astype(dtype)[:, None, None, None], (L, h, w, 1)
        )
        # temporal embedding indices: zeros (spatial) / tile(arange(L/2), 2)
        # per CFG half (unet_multiview_condition.py:527-546)
        if domain == "temporal":
            tem = jnp.tile(jnp.arange(L // 2, dtype=jnp.int32), 2)
        else:
            tem = jnp.zeros((L,), jnp.int32)

        def eps_of(xh, pluckerh, poseh, skelh):
            parts = [xh, pluckerh]
            if skelh is not None:
                parts.append(skelh)
            parts.append(mask_plane)
            return self._unet_fwd(
                unet_params, jnp.concatenate(parts, axis=-1), t, tem, L,
                pose_features=poseh,
            )

        if do_cfg and domain in self.sliding.split_cfg_domains:
            # sequential halves: one UNet live-set (batch L) at a time
            # instead of the fused batch-2L program (see SlidingConfig.
            # split_cfg_domains for the measured HBM numbers)
            def half(args):
                return eps_of(
                    args["x"], args["plucker"],
                    args.get("pose"), args.get("skel"),
                )

            pos = dict(x=x, plucker=plucker)
            if pose_features is not None:
                pos["pose"] = pose_features
            if skel_lat is not None:
                pos["skel"] = skel_lat
            stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), neg, pos)
            eps_pair = jax.lax.map(half, stacked)
            eps_u, eps_c = eps_pair[0], eps_pair[1]
            eps = eps_u + guidance_scale * (eps_c - eps_u)
        elif do_cfg:
            x2 = jnp.concatenate([neg["x"], x])
            plucker2 = jnp.concatenate([neg["plucker"], plucker])
            pose2 = (
                jnp.concatenate([neg["pose"], pose_features])
                if pose_features is not None else None
            )
            skel2 = (
                jnp.concatenate([neg["skel"], skel_lat])
                if skel_lat is not None else None
            )
            t2 = jnp.concatenate([t, t])
            tem2 = jnp.concatenate([tem, tem])
            mask2 = jnp.concatenate([mask_plane, mask_plane])

            parts = [x2, plucker2]
            if skel2 is not None:
                parts.append(skel2)
            parts.append(mask2)
            eps = self._unet_fwd(
                unet_params, jnp.concatenate(parts, axis=-1), t2, tem2, L,
                pose_features=pose2,
            )
            eps_u, eps_c = jnp.split(eps, 2)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
        else:
            eps = eps_of(x, plucker, pose_features, skel_lat)

        if scheduler.has_aux:
            new_latents, aux_w = scheduler.step_with_aux(
                eps, t_idx_w, latents_w, aux_w, mask=~is_cond
            )
        else:
            new_latents = scheduler.step(eps, t_idx_w, latents_w, mask=~is_cond)
        new_t_idx = t_idx_w + (~is_cond).astype(jnp.int32)
        return new_latents, new_t_idx, aux_w

    def _sliding_impl(
        self,
        unet_params,
        cond,
        latents,
        t_idx,
        windows,
        aux=None,
        cond_windows=None,
        *,
        domain: str,
        num_denoising_steps: int,
    ):
        scheduler = self.scheduler
        cfg = self.sliding
        gather_keys = [k for k in cond if k != "neg_pose_feature"]
        if scheduler.has_aux and aux is None:
            aux = scheduler.init_aux(latents.shape)

        def body(i, carry):
            latents, t_idx, aux = carry
            w = windows[i]  # (L,) — rows in the full sequence (latents)
            # chunk-streamed conditions are compact per-chunk arrays with
            # their own row numbering (see _chunk_cond)
            wc = w if cond_windows is None else cond_windows[i]
            cond_w = {k: jnp.take(cond[k], wc, axis=0) for k in gather_keys}
            if "neg_pose_feature" in cond:
                cond_w["neg_pose_feature"] = cond["neg_pose_feature"]
            lat_w = jnp.take(latents, w, axis=0)
            ti_w = jnp.take(t_idx, w, axis=0)
            aux_w = (
                jax.tree.map(lambda a: jnp.take(a, w, axis=0), aux)
                if scheduler.has_aux else None
            )
            for _ in range(num_denoising_steps):
                lat_w, ti_w, aux_w = self._denoise_step(
                    unet_params, cond_w, lat_w, ti_w, domain, scheduler,
                    cfg.guidance_scale, cfg.do_cfg, aux_w,
                )
            latents = latents.at[w].set(lat_w)
            t_idx = t_idx.at[w].set(ti_w)
            if scheduler.has_aux:
                aux = jax.tree.map(lambda a, u: a.at[w].set(u), aux, aux_w)
            return latents, t_idx, aux

        init = (latents, t_idx, aux if scheduler.has_aux else jnp.zeros(()))
        latents, t_idx, aux = jax.lax.fori_loop(0, windows.shape[0], body, init)
        return latents, t_idx, aux

    def _sliding_batch_impl(
        self, unet_params, cond_b, latents_b, t_idx_b, windows, aux_b=None,
        cond_windows=None, *,
        domain: str, num_denoising_steps: int,
    ):
        """vmap of the sliding loop over a leading task axis — tasks within
        an alternation round are independent (reference executes them from a
        thread queue in arbitrary order, sampling_runner.py:26-43), so SPMD
        over a mesh 'data' axis is exact. With context parallelism active
        the vmap carries spmd_axis_name="data" so the per-task shard_map
        (frame axis on "model") nests under the task axis — combined
        data x model meshes denoise data-many tasks at model-chip latency."""
        vmap_kw = (
            {"spmd_axis_name": "data"} if getattr(self, "_cp_active", False)
            else {}
        )
        if aux_b is not None:
            def one(cond, latents, t_idx, aux):
                return self._sliding_impl(
                    unet_params, cond, latents, t_idx, windows, aux,
                    cond_windows,
                    domain=domain, num_denoising_steps=num_denoising_steps,
                )

            return jax.vmap(one, **vmap_kw)(cond_b, latents_b, t_idx_b, aux_b)

        def one(cond, latents, t_idx):
            return self._sliding_impl(
                unet_params, cond, latents, t_idx, windows,
                cond_windows=cond_windows,
                domain=domain, num_denoising_steps=num_denoising_steps,
            )

        return jax.vmap(one, **vmap_kw)(cond_b, latents_b, t_idx_b)

    def _window_chunk_size(self, n_windows: int) -> int:
        """Largest chunk <= window_chunk that divides n_windows evenly, so
        every device execution compiles to ONE program shape."""
        c = min(self.window_chunk or n_windows, n_windows)
        while n_windows % c:
            c -= 1
        return c

    # -- per-chunk condition streaming ---------------------------------
    # A demo_4d temporal task is 300 rows; materializing every row's pose
    # features (~3.1 GB bf16 at 128^2 x 320) next to the 7,200-cell grid
    # and the params OOMs a 16 GB chip (observed round 3). The window loop
    # is already chunked, so conditions get the same treatment: each chunk
    # gathers only its windows' row union (~window + stride*(chunk-1) rows)
    # and computes pose features for just those rows. The pose encoder is
    # deterministic, so chunk-local recompute is bit-identical to a
    # whole-sequence precompute; the reference pays the same cost by
    # re-running its pose encoder inside every window's UNet forward
    # (unet_multiview_condition.py:552-554).
    @staticmethod
    def _chunk_rows(wchunk: np.ndarray, pad_u: int):
        """Unique rows used by a chunk of windows, plus the windows
        remapped into that compact row set. The union is padded to
        ``pad_u`` (repeating the last row — pad rows are never indexed)
        so all chunks compile to one program shape."""
        U = np.unique(wchunk)
        wc = np.searchsorted(U, wchunk).astype(wchunk.dtype)
        if pad_u > U.size:
            U = np.concatenate([U, np.full(pad_u - U.size, U[-1], U.dtype)])
        return U, wc

    def _chunk_pad_u(self, windows: np.ndarray, c: int) -> int:
        return max(
            np.unique(windows[i : i + c]).size
            for i in range(0, windows.shape[0], c)
        )

    _DENSE_COND_KEYS = ("pix_latents", "plucker", "is_cond", "skeleton_latents")

    def _chunk_cond(self, cond: dict, wchunk: np.ndarray, pad_u: int):
        """Single-task chunk conditions: dense per-row keys gathered to the
        chunk's row union; pose features computed fresh for those rows."""
        U, wc = self._chunk_rows(np.asarray(wchunk), pad_u)
        Uj = jnp.asarray(U)
        out = {
            k: jnp.take(cond[k], Uj, axis=0)
            for k in self._DENSE_COND_KEYS
            if k in cond
        }
        if "skel_rows" in cond:
            rows = cond["skel_rows"]
            sk = self._skel_norm_j(jnp.stack([rows[i] for i in U]))
            out["pose_features"] = self._pose_from_skel(sk)
        elif "skel_u8" in cond:
            sk = self._skel_norm_j(jnp.take(cond["skel_u8"], Uj, axis=0))
            out["pose_features"] = self._pose_from_skel(sk)
        if "neg_pose_feature" in cond:
            out["neg_pose_feature"] = cond["neg_pose_feature"]
        return out, jnp.asarray(wc)

    def _chunk_cond_batch_impl(self, unet_params, dense, skel_u8, U):
        """Batched (wave) chunk conditions, one jitted program: gather the
        row union along the per-task row axis and run the pose encoder on
        it (vmapped over the task axis, which may be mesh-sharded)."""
        out = {k: jnp.take(v, U, axis=1) for k, v in dense.items()}
        if skel_u8 is not None:
            sk = jnp.take(skel_u8, U, axis=1)
            norm = (sk.astype(jnp.float32) / 127.5 - 1.0).astype(
                self.unet.dtype
            )
            out["pose_features"] = jax.vmap(
                lambda s: self._pose_impl(unet_params, s)
            )(norm)
        return out

    def sliding_denoise_batch(self, cond_b, latents_b, t_idx_b, windows, domain,
                              aux_b=None, mesh=None):
        """Batched tasks, optionally sharded over a mesh 'data' axis."""
        from diffuman4d_tpu.utils.tracing import phase

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            from diffuman4d_tpu.parallel.distributed import put_sharded

            # multi-process safe: already-sharded arrays pass through,
            # host-global arrays are fed from this process's data rows
            put = lambda x: put_sharded(mesh, P("data"), x)
            with phase("pipe/put_sharded", sync=False):
                cond_b = jax.tree.map(put, cond_b)
                latents_b = put(latents_b)
                t_idx_b = put(t_idx_b)
                if aux_b is not None:
                    aux_b = jax.tree.map(put, aux_b)
        # streaming skeleton source never enters the denoise jit — pose
        # features are computed per window chunk (see _chunk_cond*)
        cond_b = dict(cond_b)
        skel_u8 = cond_b.pop("skel_u8", None)
        if "skel_rows" in cond_b:
            skel_u8 = jnp.stack(cond_b.pop("skel_rows"), axis=1)
        stream = skel_u8 is not None
        windows = np.asarray(windows)
        c = self._window_chunk_size(windows.shape[0])
        pad_u = self._chunk_pad_u(windows, c) if stream else 0
        t_b = jnp.asarray(t_idx_b, jnp.int32)
        if self.scheduler.has_aux and aux_b is None:
            # init once; re-initializing per chunk would drop multistep
            # history at chunk boundaries
            B = latents_b.shape[0]
            flat = self.scheduler.init_aux((B * latents_b.shape[1],) + latents_b.shape[2:])
            aux_b = jax.tree.map(
                lambda a: a.reshape((B, latents_b.shape[1]) + a.shape[1:]), flat
            )
            if mesh is not None:
                # fresh aux is single-device; commit it to the mesh so it
                # can join the global-array jit (required multi-process)
                aux_b = jax.tree.map(put, aux_b)
        aux_ret = aux_b
        for i in range(0, windows.shape[0], c):
            unet_params = (
                self._mesh_unet_params
                if mesh is not None and self._mesh_unet_params is not None
                else self.params["unet"]
            )
            if stream:
                with phase("pipe/chunk_cond", sync=False):
                    U, wc = self._chunk_rows(windows[i : i + c], pad_u)
                    cond_c = self._chunk_batch_j(
                        unet_params,
                        {k: v for k, v in cond_b.items()
                         if k != "neg_pose_feature"},
                        skel_u8,
                        # numpy: committed single-device arrays cannot join a
                        # global-mesh jit under multi-process (same as windows)
                        U,
                    )
                    if "neg_pose_feature" in cond_b:
                        cond_c["neg_pose_feature"] = cond_b["neg_pose_feature"]
            else:
                cond_c, wc = cond_b, None
            with phase("pipe/chunk_dispatch", sync=False):
                latents_b, t_b, aux_ret = self._sliding_batch_j(
                    unet_params,
                    cond_c,
                    latents_b,
                    t_b,
                    # numpy (not jnp.asarray): a committed single-device array
                    # cannot join a global-mesh jit under multi-process
                    windows[i : i + c],
                    aux_b,
                    wc,
                    domain=domain,
                    num_denoising_steps=self.sliding.num_denoising_steps,
                )
            if aux_b is not None:
                aux_b = aux_ret
        return latents_b, t_b, aux_ret

    def sliding_denoise(self, cond, latents, t_idx, windows, domain, aux=None):
        """Run all windows of one task. Returns (latents, t_idx, aux).

        Raises on the reference's schedule invariants
        (pipeline_diffuman4d.py:480-487, 546-551)."""
        t_idx = np.asarray(t_idx)
        is_cond = np.asarray(cond["is_cond"])
        tgt = t_idx[~is_cond]
        if (tgt != tgt[0]).any():
            raise ValueError(f"target timestep indices differ: {t_idx}")
        if (t_idx[is_cond] != 0).any():
            raise ValueError(f"input timestep indices nonzero: {t_idx}")
        expected_end = int(tgt[0]) + self.sliding.steps_per_alt

        windows = np.asarray(windows)
        c = self._window_chunk_size(windows.shape[0])
        stream = "skel_rows" in cond or "skel_u8" in cond
        pad_u = self._chunk_pad_u(windows, c) if stream else 0
        if self.scheduler.has_aux and aux is None:
            # materialize once so every chunk call shares one trace
            aux = self.scheduler.init_aux(latents.shape)
        t_dev = jnp.asarray(t_idx, jnp.int32)
        for i in range(0, windows.shape[0], c):
            wchunk = windows[i : i + c]
            if stream:
                cond_c, wc = self._chunk_cond(cond, wchunk, pad_u)
            else:
                cond_c, wc = cond, None
            latents, t_dev, aux_ret = self._sliding_j(
                self.params["unet"],
                cond_c,
                latents,
                t_dev,
                jnp.asarray(wchunk),
                aux,
                wc,
                domain=domain,
                num_denoising_steps=self.sliding.num_denoising_steps,
            )
            if self.scheduler.has_aux:
                aux = aux_ret
        t_idx = t_dev

        t_after = np.asarray(t_idx)
        if (t_after[~is_cond] != expected_end).any():
            raise ValueError(
                f"target latents advanced to {t_after[~is_cond]}, expected "
                f"{expected_end}"
            )
        if (t_after[is_cond] != 0).any():
            raise ValueError("input latent timesteps changed")
        return latents, t_idx, aux

    # -- outputs --------------------------------------------------------
    def decode(self, latents) -> np.ndarray:
        """Latents -> uint8 images (reference post_process, :280-285, fused
        with the to-uint8 save conversion). Decoded on device in
        micro-batches; each chunk's host copy starts asynchronously so
        transfers overlap the next chunk's decode compute."""
        b = self.vae_decode_batch
        chunks = []
        for c, m in self._fixed_chunks(latents, b):
            u8 = self._decode_u8_j(self.params["vae"], c)
            try:
                u8.copy_to_host_async()
            except Exception:  # noqa: BLE001 — backend may not support it
                pass
            chunks.append((u8, m))
        # preallocate + per-chunk copy: np.concatenate's fresh 100+ MB
        # allocation first-touch-faults at 22-74 MB/s on this host
        # (CLAUDE.md); the tuned allocator + incremental writes don't
        if not chunks:
            return np.empty(
                (0, self.image_size, self.image_size, 3), np.uint8
            )
        n = sum(m for _, m in chunks)
        first = np.asarray(chunks[0][0])
        out = np.empty((n,) + first.shape[1:], first.dtype)
        pos = 0
        for i, (u8, m) in enumerate(chunks):
            arr = first if i == 0 else np.asarray(u8)
            out[pos : pos + m] = arr[:m]
            pos += m
        return out
