"""mrfa_tpu — a TPU-native (JAX/XLA/Pallas) framework for unsupervised face animation.

Re-implements the full capability surface of JialeTao/MRFA ("Learning Motion
Refinement for Unsupervised Face Animation", NeurIPS 2023) with a TPU-first
design: NHWC layouts, functional modules, jit-compiled train/eval steps,
matmul-form resampling where possible, Pallas kernels for the hot gather ops,
and `jax.sharding` data/model parallelism over a device mesh.

Layout (mirrors reference layering, see SURVEY.md):
  ops/       L0 tensor ops and geometry (grid-sample matrix, resize, TPS, ...)
  nn/        neural blocks (BatchNorm w/ torch semantics, conv blocks, Hourglass)
  models/    model components (priors, dense motion, RaftFlow, generator) + MRFA
  parallel/  mesh + sharding helpers
  train/     losses, equivariance transforms, optimizers, train step
  data/      dataset + augmentation (host side)
  utils/     checkpointing (orbax + torch converter), logging, visualization
  cli/       run / demo entry points
"""

__version__ = "0.1.0"
