"""hpvaegan_tpu — TPU-native HP-VAE-GAN framework (JAX/XLA/Pallas/pjit).

A from-scratch rebuild of the capabilities of lior1990/hp-vae-gan
("Hierarchical Patch VAE-GAN", arXiv 2006.12226), designed TPU-first:
channels-last layouts, jitted per-scale train steps, explicit PRNG keys,
matmul-based align-corners resizes, spectral-norm state threaded through
pure functions, and jax.sharding device-mesh parallelism.
"""

__version__ = "0.1.0"
