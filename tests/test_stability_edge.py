"""Pins the CPU-f32 stability edge (VERDICT r3 #8).

The sparse-gibbs and ST-nonstat benchmark configs ride a numerical edge:
their f32 CPU trajectories can diverge where the TPU ones don't (f64
gradients agree to 13 digits — rounding chaos, not a bug; CLAUDE.md).
The CPU quality gate was widened x2 in response, which traded away
sensitivity: a change that genuinely WORSENS conditioning would now
surface only as mysterious suite flakiness.

This file gets the sensitivity back deliberately, by pinning the root
variable instead of the chaotic symptom.  The edge is governed by the
conditioning of the inducing Gibbs Gram K_zz(exp log_ell_z) + EPSILON*I
that ``nystrom_root`` factorises every step (cond ~ 5e6 at trained poses
— the same measurement that killed Cholesky warm-starting, DESIGN.md
§11).  For each edge config we train a short deterministic CPU-f32
trajectory of the REAL benchmark config and assert:

  * the trajectory invariant that holds on both backends at this budget:
    finite losses, net decrease (divergence at this short budget would be
    a regression, not chaos — the documented chaos needs the full 2000+
    step benchmark budgets to express), and
  * cond(K_zz + eps I), evaluated in f64 at the trained pose, stays below
    a pinned band (measured value + ~2.5x headroom).  Conditioning is a
    smooth deterministic function of the trained field — the quantity a
    conditioning regression must move first.

Measured 2026-08-20 (CPU f32, this exact seed/budget):
  sparse-gibbs  split 0, M=250, 150 steps: cond(K_zz) = 2.753e6
  st-nonstat    M=100, 150 steps:          cond(K_zz) = 1.750e6
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from nonstationary_precip_tpu.data.dataprep import shuffle_split
from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram
from nonstationary_precip_tpu.priors import LogNormalProcess
from nonstationary_precip_tpu.train import fit
from nonstationary_precip_tpu.utils.config import BASE_SEED, EPSILON


def _cond_kzz_f64(z, log_ell_z):
    """cond_2 of the factorised inducing Gram, in f64 (deterministic)."""
    z64 = jnp.asarray(np.asarray(z), jnp.float64)
    ell = jnp.exp(jnp.asarray(np.asarray(log_ell_z), jnp.float64))
    k = gibbs_gram(z64, ell, z64, ell) + EPSILON * jnp.eye(
        z64.shape[0], dtype=jnp.float64
    )
    w = jnp.linalg.eigvalsh(k)
    return float(w[-1] / w[0])


def _prior(dtype):
    return LogNormalProcess.create(
        2, mean=math.log(0.3), outputscale=1.0, lengthscale=1.3, dtype=dtype
    )


def test_sparse_gibbs_edge_conditioning_pinned():
    from nonstationary_precip_tpu.data.datasets import load_uib_spatial
    from nonstationary_precip_tpu.models import GibbsSparseGP
    from nonstationary_precip_tpu.ops.kmeans import kmeans_inducing_points

    _, x, y = load_uib_spatial()
    xn = (x - x.mean(0)) / x.std(0, ddof=1)
    yn = (y - y.mean()) / y.std(ddof=1)
    x_tr, y_tr, _, _ = shuffle_split(xn, yn, 0.8, BASE_SEED)
    x_train = jnp.asarray(x_tr, jnp.float32)
    y_train = jnp.asarray(y_tr, jnp.float32)

    prior = _prior(jnp.float32)
    z = kmeans_inducing_points(jax.random.PRNGKey(BASE_SEED), x_train, 250)
    model = GibbsSparseGP.create(z, prior, noise=0.011, outputscale=0.644)

    res = fit(
        model, lambda m, xx, yy: m.loss(xx, yy), x_train, y_train,
        lr=1e-2, num_steps=150, mask=model.trainable(),
    )
    losses = np.asarray(res.losses)
    assert np.all(np.isfinite(losses)), "edge trajectory went non-finite"
    assert losses[-1] < losses[0], "edge trajectory did not improve"

    cond = _cond_kzz_f64(res.model.z, res.model.log_ell_z)
    print(f"sparse-gibbs trained-pose cond(K_zz) = {cond:.4g}")
    # measured 2026-08-20: 2.753e6 (f64 eigvals at the 150-step f32
    # pose).  Band = x2.5: a conditioning regression trips this before it
    # turns the full-budget f32 benchmark trajectory chaotic.
    assert cond < 6.9e6, f"cond(K_zz) {cond:.4g} beyond the pinned edge band"


def test_st_nonstat_edge_conditioning_pinned():
    from nonstationary_precip_tpu.data.datasets import spatio_temporal_month_split
    from nonstationary_precip_tpu.models.spatio_temporal import (
        SparseSpatioTemporalNonstationary,
    )
    from nonstationary_precip_tpu.ops.kmeans import kmeans_inducing_points

    x_train, y_train, _, _, _, _, _, _ = spatio_temporal_month_split()
    x_train = jnp.asarray(x_train, jnp.float32)
    y_train = jnp.asarray(y_train, jnp.float32)

    prior = _prior(jnp.float32)
    z = kmeans_inducing_points(jax.random.PRNGKey(BASE_SEED), x_train, 100)
    model = SparseSpatioTemporalNonstationary.create(z, prior)

    res = fit(
        model, lambda m, xx, yy: m.loss(xx, yy), x_train, y_train,
        lr=0.015, num_steps=150, mask=model.trainable(),
    )
    losses = np.asarray(res.losses)
    assert np.all(np.isfinite(losses)), "edge trajectory went non-finite"
    assert losses[-1] < losses[0], "edge trajectory did not improve"

    # the ST model's fragile factorisation is the SPATIAL inducing Gram
    # (its _spatial_root slices dims 1:3 of z)
    cond = _cond_kzz_f64(res.model.z[:, 1:3], res.model.log_ell_z)
    print(f"st-nonstat trained-pose cond(K_zz) = {cond:.4g}")
    # measured 2026-08-20: 1.750e6.  Band = x2.5.
    assert cond < 4.4e6, f"cond(K_zz) {cond:.4g} beyond the pinned edge band"
