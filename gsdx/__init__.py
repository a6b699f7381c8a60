"""gsdx — TPU-native dynamic Gaussian-splatting tracking and graph-based neural dynamics.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the CUDA/torch
reference pipeline `robo-alex/gs-dynamics` (dynamic 3D Gaussian tracking, GNN
dynamics training, Gaussian-skinned rollouts, MPPI planning), re-designed for
TPU hardware: fixed shapes, scan/jit compiled optimization loops, Pallas tile
compositing kernels, and `jax.sharding` meshes for multi-chip scale-out.

Layers (bottom-up), mirroring SURVEY.md §7.1:
  core/      pytree param structs, camera math, quaternion ops
  kernels/   Pallas kernels (tile compositor fwd/bwd) + KNN/FPS device ops
  render/    differentiable Gaussian rasterizer (projection, binning, compositing)
  track/     dynamic-GS per-timestep tracking optimizer (losses, densify)
  graph/     radius-graph edge construction, FPS downsampling, dataset assembly
  dynamics/  GNN dynamics model (interaction-network message passing) + trainer
  rollout/   GNN rollout + motion interpolation (Gaussian skinning)
  plan/      MPPI planner (jit sample→rollout→reward→update)
  dist/      device-mesh partitioning: sharded render/train steps
  io/        episode/npz/ply/splat readers-writers, YAML config
  realworld/ env interface, fake (replay) backend, shared-memory camera stack
  apps/      CLI drivers: track, preprocess, train, predict, demo, plan
"""

__version__ = "0.1.0"
