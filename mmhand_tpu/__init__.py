"""mmhand_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of VITA-Group/mm-hand (MM-HAND, ACM MM 2020).

A pose-conditioned GAN for 3D-aware multi-modal hand-image synthesis plus the
full data-augmentation study stack: dataset preprocessing, GAN training,
synthetic-data generation, image-quality / pose-consistency evaluation, and
downstream hand-pose-estimator retraining on real/synthetic mixtures.

Design notes
------------
* All model math is JAX, compiled by XLA; layouts are NHWC (TPU-preferred);
  compute dtype is bfloat16 with float32 parameters and optimizer state.
* Data parallelism is the only parallelism axis the problem has (the
  reference uses NCCL DDP; see reference options/base_options.py:171-178).
  Here it is a `jax.sharding.Mesh` with one axis, a `shard_map`-wrapped
  train step, `psum` for gradients, and cross-replica batch-norm statistics.
* Hot raster ops of the reference's CPU data path (21-channel Gaussian
  heatmap splat, depth-ordered bone-ellipse jointsmap) are on-device Pallas
  kernels with jnp fallbacks.
"""

__version__ = "0.1.0"
