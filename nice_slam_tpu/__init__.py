"""nice_slam_tpu — a TPU-native neural implicit SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the dense RGB-D SLAM system
NICE-SLAM (reference: WohimLee/NICE-SLAM-annotation).  The scene is four
axis-aligned feature-grid volumes decoded by small MLPs; camera tracking and
map optimization are differentiable-volume-rendering loops compiled as single
XLA programs (`lax.scan` inner loops), distributed over a `jax.sharding.Mesh`
by ray-sharding with `psum` gradient reductions.

Layer map (mirrors SURVEY.md §1 of the reference):
  core/      L0  math & sampling primitives (cameras, rays, compositing)
  ops/       L0  hot kernels: trilinear grid interpolation (XLA + Pallas)
  models/    L1  scene representation (NICE grids+decoders, iMAP MLP)
  render/    L2  volume renderer
  engine/    L3/L4 tracker, mapper, keyframes, single-controller orchestrator
  io/        L5  dataset ingest (replica/scannet/tumrgbd/cofusion/azure)
  mesh/      L5  mesher (TPU field query + native marching cubes)
  eval/      L7  ATE / reconstruction metrics
  parallel/  —   device-mesh sharding of the tracking/mapping steps
  utils/     —   config, checkpointing, optimizer, visualization
"""

__version__ = "0.1.0"
