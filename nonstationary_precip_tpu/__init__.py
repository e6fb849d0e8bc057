"""nonstationary_precip_tpu — a TPU-native Gaussian-process inference framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
``Stansfash/nonstationary-precip`` research codebase (PyTorch/GPyTorch):
nonstationary Gibbs-kernel GPs with latent lengthscale processes, sparse
(SGPR) inference, spatio-temporal sum kernels, and deep GPs trained with
doubly-stochastic variational inference — all expressed as pure functions
over pytrees, compiled with ``jit``/``scan``, with the hot Gram/Cholesky
paths implemented as Pallas TPU kernels.

Layering (bottom-up):
  ops/      — Pallas MXU/VPU kernels + lax fallbacks (Gram, Cholesky, TRSM)
  kernels/  — pure covariance functions as pytree dataclasses
  priors/   — latent positive processes (log-normal GP, matrix-normal)
  models/   — exact GP, Gibbs MAP GPs, SGPR, spatio-temporal, SVGP/DeepGP
  train/    — optax loops under lax.scan, metrics, checkpointing, logging
  data/     — CSV loaders, whitening / Box-Cox transforms, split harness
  parallel/ — jax.sharding mesh + shard_map data-parallel ELBO
"""

__version__ = "0.1.0"

from nonstationary_precip_tpu.utils import config  # noqa: F401
