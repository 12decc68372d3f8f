"""trinerflet_tpu: a TPU-native wavelet-triplane NeRF framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of TriNeRFLet
(arXiv 2401.06191): multiscale wavelet triplane NeRF reconstruction and
diffusion-guided NeRF super-resolution, built for TPU hardware (MXU-friendly
batched compute, static shapes, `jax.sharding` data/model parallelism).
"""

__version__ = "0.1.0"
