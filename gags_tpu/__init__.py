"""gags_tpu — a TPU-native JAX framework for granularity-aware 3D Gaussian
feature distillation (GAGS-class capabilities, rebuilt TPU-first).

Layer map (bottom → top):

  core/      pure math: camera transforms, spherical harmonics, quaternions,
             3D covariance construction.
  splat/     the differentiable Gaussian rasterizer: a slow pure-JAX reference
             implementation plus the production Pallas tile-binned kernel with
             custom VJP.
  knn/       nearest-neighbour scale initialisation (simple-knn equivalent).
  scene/     COLMAP parsing, PLY I/O with semantic fields, camera datasets,
             language-feature (SAM+CLIP) supervision store.
  models/    GaussianField pytree + feature/scale decoders (flax).
  gad/       granularity-aware distillation: jitted train step, losses,
             checkpoints, training loop.
  gas/       granularity-aware segmentation: depth sampling, SAM prompting,
             CLIP mask embedding.
  query/     open-vocabulary querying: text relevancy, IoU/localization eval,
             3D grounding, edit ops.
  parallel/  device-mesh sharding (camera-batch DP, tile-space sharding).
  cli/       command-line entry points mirroring the reference shell drivers.
"""

__version__ = "0.1.0"
