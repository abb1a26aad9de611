"""manus_tpu — a TPU-native articulated 3D Gaussian splatting framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
brown-ivl/manus (MANUS: Markerless Grasp Capture using Articulated 3D
Gaussians): differentiable Gaussian rasterization, LBS-articulated hand
models, static object models, scene compositing with hand-object contact
estimation, and the geometric preprocessing pipeline — all built TPU-first
(SPMD over device meshes, static shapes, Pallas kernels for the raster hot
path).

Layout:
  utils/     pure math: transforms, spherical harmonics, cameras, losses
  ops/       compute kernels: projection, tile binning, rasterizer (Pallas +
             XLA reference), KNN, grid sampling, skinning
  models/    Gaussian parameter store (padded pytree) + densification
  data/      dataset loaders (BRICS static/dynamic layouts, synthetic scenes)
  parallel/  mesh + sharding helpers for multi-chip execution
  train/     workloads (object / hand / composite), optimizer, trainer loop
  preprocess/ geometric pose pipeline: triangulation, IK, one-euro filter
"""

__version__ = "0.1.0"
