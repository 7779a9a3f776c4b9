"""traiNNer-TPU: a TPU-native (JAX/Flax/XLA/Pallas) image & video restoration
training framework with the capabilities of victorca25/traiNNer.

Layer map (mirrors reference layers, re-designed TPU-first — see SURVEY.md):
  options/   config system (YAML/JSON options files, preset overlays, arch defaults)
  ops/       image ops: flax building blocks, resize (MATLAB-parity), filters, colors
  models/    network architectures (generators, discriminators, feature extractors)
  losses/    composable loss stack (pixel, SSIM, perceptual, adversarial, ...)
  data/      host-side datasets + on-device batched degradation pipeline
  parallel/  device mesh / sharding / collectives layer (pjit over ICI/DCN)
  train/     training strategies (TrainState, optimizers, schedulers, trainers)
  utils/     metrics (PSNR/SSIM), logging, checkpointing, torch interop
"""

__version__ = "0.1.0"
