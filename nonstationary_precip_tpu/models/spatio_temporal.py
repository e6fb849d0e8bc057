"""Spatio-temporal GP models over (time, lon, lat) inputs.

``SpatioTemporalStationary`` — exact GP with the reference's separable sum
kernel  Scale(RBF(t)·Periodic(t), outputscale > 7) + Scale(RBF(lon, lat))
(/root/reference/models/spatio_temporal_models.py:17-33).

``SparseSpatioTemporalNonstationary`` — the reference's sum of a sparse
nonstationary *spatial* Gibbs kernel (latent lengthscale field at inducing
points, SGPR low-rank + added loss term) and a sparse *temporal*
stationary kernel sharing the same frozen inducing points
(spatio_temporal_models.py:35-126).  Training uses the dense sum of the
two Nyström approximations (N ≈ 1.6k ⇒ one Cholesky on the MXU);
prediction conditions exactly on the approximate (Nyström + diagonal
correction) kernel — repairing the reference's dense-fallback predict,
which treats the full covariance matrix as its own low-rank root
(spatio_temporal_models.py:104-113; documented defect, SURVEY.md §7).
"""

from __future__ import annotations

import jax.numpy as jnp

from nonstationary_precip_tpu.kernels.base import Scale
from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram
from nonstationary_precip_tpu.kernels.inducing import nystrom_root
from nonstationary_precip_tpu.kernels.stationary import RBF, Periodic
from nonstationary_precip_tpu.models.distributions import MVN
from nonstationary_precip_tpu.models.exact_gp import ExactGP
from nonstationary_precip_tpu.models.likelihoods import GaussianLikelihood
from nonstationary_precip_tpu.ops.linalg import (
    cho_solve,
    mvn_logpdf_from_chol,
    safe_cholesky,
    tri_solve,
)
from nonstationary_precip_tpu.priors.lognormal_process import LogNormalProcess
from nonstationary_precip_tpu.utils.struct import pytree_dataclass, trainable_mask
from nonstationary_precip_tpu.utils.transforms import positive, raw_init


def make_stationary_st_kernel(dtype=jnp.float32):
    """Scale(RBF(t)·Periodic(t), outputscale>7) + Scale(RBF(lon,lat))."""
    temporal = Scale.create(
        RBF.create(1, active_dims=(0,), dtype=dtype)
        * Periodic.create(1, active_dims=(0,), dtype=dtype),
        outputscale=7.6931,  # softplus(0) above the GreaterThan(7) bound
        lower_bound=7.0,
        dtype=dtype,
    )
    spatial = Scale.create(RBF.create(1, active_dims=(1, 2), dtype=dtype), dtype=dtype)
    return temporal + spatial


@pytree_dataclass(static=("mean_type",))
class SpatioTemporalStationary(ExactGP):
    """Exact GP with the stationary separable kernel and zero mean.

    Registered as its own pytree node (registration is per-class, not
    inherited), so instances round-trip through jit/tree ops AS this
    class rather than decaying to ExactGP."""

    @classmethod
    def create(cls, noise: float = None, dtype=jnp.float32):  # type: ignore[override]
        # super(), not ExactGP: the base classmethod constructs via cls(),
        # so this round-trips as a SpatioTemporalStationary instance
        # (isinstance checks, checkpoint-restore branching, repr)
        return super().create(
            make_stationary_st_kernel(dtype), noise=noise, mean_type="zero", dtype=dtype
        )


@pytree_dataclass(static=("scale_correction",))
class SparseSpatioTemporalNonstationary:
    """Sum of sparse nonstationary-spatial and sparse stationary-temporal
    kernels over x = (time, lon, lat), sharing frozen inducing points z.

    Spatial part: Scale ∘ Nyström(Gibbs) on columns (1, 2) with latent
    log-lengthscale field at z[:, (1, 2)].  Temporal part:
    Nyström(Scale(RBF·Periodic)) on column 0 with z[:, (0,)] — the Scale
    sits *inside* the inducing wrapper, as in the reference (:42-43).
    """

    prior: LogNormalProcess
    likelihood: GaussianLikelihood
    z: jnp.ndarray  # (M, 3) frozen
    log_ell_z: jnp.ndarray  # (M, 2)
    raw_spatial_outputscale: jnp.ndarray
    temporal_kernel: Scale  # Scale(RBF(0)·Periodic(0), >7)
    scale_correction: bool = False

    SPATIAL_DIMS = (1, 2)
    TEMPORAL_DIMS = (0,)

    @classmethod
    def create(cls, z, prior: LogNormalProcess, noise=None, outputscale=1.0, dtype=jnp.float32):
        z = jnp.asarray(z, dtype=dtype)
        temporal = Scale.create(
            RBF.create(1, active_dims=(0,), dtype=dtype)
            * Periodic.create(1, active_dims=(0,), dtype=dtype),
            outputscale=7.6931,
            lower_bound=7.0,
            dtype=dtype,
        )
        return cls(
            prior=prior,
            likelihood=GaussianLikelihood.create(noise, dtype=dtype),
            z=z,
            log_ell_z=prior.init_log_field(z[:, jnp.array(cls.SPATIAL_DIMS)]).astype(dtype),
            raw_spatial_outputscale=raw_init(jnp.asarray(outputscale, dtype=dtype)),
            temporal_kernel=temporal,
        )

    def trainable(self, train_noise=True, train_scale=True):
        def pred(path: str) -> bool:
            if path.startswith("prior/"):
                return False
            if path == "z":
                return False  # reference freezes shared inducing points (:44)
            if "raw_noise" in path:
                return train_noise
            if "raw_spatial_outputscale" in path:
                return train_scale
            return True

        return trainable_mask(self, pred)

    # -- covariance pieces ---------------------------------------------------

    def _spatial_root(self, x):
        """Unscaled Nyström root of the Gibbs spatial kernel at x (N, M)."""
        xs = x[:, jnp.array(self.SPATIAL_DIMS)]
        zs = self.z[:, jnp.array(self.SPATIAL_DIMS)]
        ell_z = jnp.exp(self.log_ell_z)
        ell_x = self.prior.conditional_mean(xs, (zs, ell_z))
        k_xz = gibbs_gram(xs, ell_x, zs, ell_z)
        k_zz = gibbs_gram(zs, ell_z, zs, ell_z)
        root, _ = nystrom_root(k_xz, k_zz)
        return root

    def _temporal_root(self, x):
        """Nyström root of the scaled temporal kernel at x (N, M)."""
        k_xz = self.temporal_kernel(x, self.z)
        k_zz = self.temporal_kernel(self.z)
        root, _ = nystrom_root(k_xz, k_zz)
        return root

    @property
    def spatial_outputscale(self):
        return positive(self.raw_spatial_outputscale)

    # -- objective -------------------------------------------------------------

    def loss(self, x, y):
        """−(log N(y; 0, s²Q_sp + Q_t + σ²I) + added_sp + added_t)/N.

        Both added loss terms follow GPyTorch's harvesting: the temporal
        one on the scaled kernel (Scale inside the wrapper), the spatial
        one on the unscaled base kernel unless ``scale_correction``.
        """
        n = y.shape[-1]
        noise = self.likelihood.noise
        s2 = self.spatial_outputscale

        root_sp_u = self._spatial_root(x)
        root_t = self._temporal_root(x)

        k = s2 * (root_sp_u @ root_sp_u.T) + root_t @ root_t.T
        k_noisy = k + noise * jnp.eye(n, dtype=k.dtype)
        chol = safe_cholesky(k_noisy)
        logp = mvn_logpdf_from_chol(y, jnp.zeros_like(y), chol)

        q_sp_diag_u = jnp.sum(root_sp_u * root_sp_u, axis=-1)
        sp_scale = s2 if self.scale_correction else 1.0
        added_sp = -0.5 * jnp.sum(sp_scale * (1.0 - q_sp_diag_u)) / noise

        kt_diag = self.temporal_kernel.diag(x)
        q_t_diag = jnp.sum(root_t * root_t, axis=-1)
        added_t = -0.5 * jnp.sum(kt_diag - q_t_diag) / noise

        prior_term = self.prior.log_prob(
            self.z[:, jnp.array(self.SPATIAL_DIMS)], self.log_ell_z
        )
        return -(logp + added_sp + added_t + prior_term) / n

    # -- prediction --------------------------------------------------------------

    def _approx_kernel(self, x1, x2=None):
        """Nyström-approximate sum kernel K̃(x1, x2), with the SGPR diagonal
        corrections applied on the symmetric case (eval-mode semantics of
        gibbs_kernels.py:224-232)."""
        r1_sp, r1_t = self._spatial_root(x1), self._temporal_root(x1)
        s2 = self.spatial_outputscale
        if x2 is None:
            k = s2 * (r1_sp @ r1_sp.T) + r1_t @ r1_t.T
            corr_sp = jnp.clip(1.0 - jnp.sum(r1_sp * r1_sp, axis=-1), 0.0, None)
            corr_t = jnp.clip(
                self.temporal_kernel.diag(x1) - jnp.sum(r1_t * r1_t, axis=-1), 0.0, None
            )
            return k + jnp.diag(s2 * corr_sp + corr_t)
        r2_sp, r2_t = self._spatial_root(x2), self._temporal_root(x2)
        return s2 * (r1_sp @ r2_sp.T) + r1_t @ r2_t.T

    def posterior(self, x_train, y_train, x_new, *, noiseless: bool = True) -> MVN:
        """Exact conditioning on the approximate kernel."""
        n = y_train.shape[-1]
        noise = self.likelihood.noise
        k_xx = self._approx_kernel(x_train) + noise * jnp.eye(n, dtype=x_train.dtype)
        k_sx = self._approx_kernel(x_new, x_train)
        k_ss = self._approx_kernel(x_new)
        chol = safe_cholesky(k_xx)
        mean = k_sx @ cho_solve(chol, y_train)
        v = tri_solve(chol, k_sx.T)
        cov = k_ss - v.T @ v
        if not noiseless:
            cov = cov + noise * jnp.eye(cov.shape[-1], dtype=cov.dtype)
        return MVN(mean, cov)

    def predictive(self, x_train, y_train, x_new) -> MVN:
        return self.posterior(x_train, y_train, x_new, noiseless=False)
