"""Diffuman4D-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for 4D-consistent
human view synthesis with spatio-temporal diffusion models.

Re-designed from scratch for TPU hardware with the capabilities of
zju3dv/Diffuman4D (see /root/reference): sparse-view human videos ->
dense camera x frame image grids via a sliding-iterative spatio-temporal
diffusion sampler, exported to nerfstudio format for 3DGS/4DGS.

Design stance (differs from the reference on purpose):
  * channels-last (NHWC) layouts everywhere -- native for TPU convolutions
  * pure-functional flax.linen models, parameters as pytrees
  * vectorized per-latent scheduler state (int32 timestep-index arrays)
    instead of one deepcopied scheduler object per latent
  * the sliding-window schedule is precomputed index matrices consumed by
    lax loops -- no Python control flow inside jit
  * round-level parallelism is SPMD over a jax.sharding.Mesh (tasks within
    an alternation round are independent), not thread-per-GPU queues
  * Pallas flash-attention kernels for the 65k-98k token 3D attention
"""

__version__ = "0.1.0"
