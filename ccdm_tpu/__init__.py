"""ccdm_tpu — TPU-native continuous conditional diffusion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of eric98040/CCDM
(arXiv 2405.03546): CcDPM / CCDM / DMD2-M model families over continuous
regression labels, with vicinal losses, ILI label embeddings, label-conditioned
noise covariance H(y), classifier-free guidance, and DDPM/DDIM sampling —
implemented TPU-first (NHWC layouts, lax.scan samplers, pjit/shard_map data
parallelism over a jax.sharding.Mesh, device-resident vicinity batch
construction).
"""

__version__ = "0.1.0"
