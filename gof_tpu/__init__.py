"""gof_tpu — a TPU-native Gaussian Opacity Fields framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
autonomousvision/gaussian-opacity-fields (3D Gaussian Splatting with
ray-Gaussian intersection rendering, fused geometry regularizers, and
level-set mesh extraction), built for TPU hardware:

- rendering is an associative scan: per-(Gaussian, pixel) alphas are computed
  fully in parallel on the VPU, transmittance via cumulative products, and
  color/normal accumulation rides the MXU as tall-skinny matmuls;
- tile binning is gather-based (no scatter, no atomics) and fully
  deterministic;
- gradients are hand-written Pallas kernels under `jax.custom_vjp` for the
  blend loop, and plain `jax.grad` of pure jnp functions for everything the
  reference implements as 600 lines of hand-derived CUDA backward.

Package map (roughly mirrors the reference's layer map, SURVEY.md §1):
  gof_tpu.ops       - quadrics / binning / Pallas rasterizer / integrate / knn
  gof_tpu.model     - Gaussian parameter pytree, densification, appearance net
  gof_tpu.data      - COLMAP / Blender readers, Scene container
  gof_tpu.mesh      - marching tetrahedra, Delaunay, TSDF fusion
  gof_tpu.parallel  - jax.sharding meshes: camera-batch DP & scene parallelism
  gof_tpu.utils     - losses, schedules, image metrics, PLY I/O
"""

__version__ = "0.1.0"

import jax as _jax

# Default matmul/einsum precision on TPU (and this CPU backend) is
# bfloat16-level, which corrupts the 3x3 geometry math (quaternions,
# view2gaussian, EWA Jacobians) at ~5e-3 relative error. Pin full f32
# precision globally; the hot Pallas kernels opt into lower precision
# explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "highest")
