"""Whitened sparse variational GP layer (SVGP).

Functional redesign of the reference's ``DeepGPHiddenLayer``
(/root/reference/models/dgps.py:15-70): GPyTorch's
``CholeskyVariationalDistribution`` + whitened ``VariationalStrategy`` with
learned inducing locations, Scale(RBF-ARD) kernel, constant or (shared)
linear mean.

Whitened parameterisation: u = L_zz⁻¹ (f(z) − μ(z)) with q(u) = N(m, SSᵀ),
so the marginal posterior at x is

    mean(x) = μ(x) + A m,          A = K_xz L_zz⁻ᵀ
    var(x)  = k(x,x) − rowsum(A²) + rowsum((A S)²)

and KL(q(u) ‖ N(0, I)) = ½ (‖m‖² + ‖S‖_F² − M − 2 Σ log diag S).

All output dims are carried in a leading batch axis and vmapped — one
compiled program regardless of width.  DSVI propagates *marginal* samples
between layers (Salimbeni & Deisenroth 2017), which is the variance the
ELBO needs; the reference's full-covariance rsample per minibatch is an
S×B×B Cholesky per layer that buys nothing for the bound.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nonstationary_precip_tpu.ops.linalg import safe_cholesky, tri_solve
from nonstationary_precip_tpu.utils.config import EPSILON
from nonstationary_precip_tpu.utils.struct import pytree_dataclass
from nonstationary_precip_tpu.utils.transforms import positive

_MEAN_CONSTANT = "constant"
_MEAN_LINEAR = "linear"


@pytree_dataclass(static=("mean_type",))
class SVGPLayer:
    """One whitened SVGP layer with O output dims (O = 1 for the scalar head).

    Shapes:
      z          (O, M, Din)   learned inducing locations
      var_mean   (O, M)        whitened variational mean
      var_chol   (O, M, M)     whitened variational root (lower tri used)
      raw_outputscale (O,)     Scale kernel
      raw_lengthscale (O, Din) RBF-ARD
      mean_w     (Din, O) / mean_b (O,)  for linear mean; mean_b only for constant
    """

    z: jnp.ndarray
    var_mean: jnp.ndarray
    var_chol: jnp.ndarray
    raw_outputscale: jnp.ndarray
    raw_lengthscale: jnp.ndarray
    mean_b: jnp.ndarray
    mean_w: Optional[jnp.ndarray] = None
    mean_type: str = _MEAN_CONSTANT

    @classmethod
    def create(
        cls,
        key: jax.Array,
        input_dims: int,
        output_dims: int,
        num_inducing: int = 250,
        mean_type: str = _MEAN_CONSTANT,
        dtype=jnp.float32,
    ):
        """Init mirrors the reference (dgps.py:17-46): z ~ N(0, 1), whitened
        variational dist at the prior (m = 0, S = I ⇒ KL = 0), GPyTorch
        default softplus(0) kernel hypers, zero mean weights."""
        o = output_dims
        z = jax.random.normal(key, (o, num_inducing, input_dims), dtype=dtype)
        eye = jnp.broadcast_to(
            jnp.eye(num_inducing, dtype=dtype), (o, num_inducing, num_inducing)
        )
        mean_w = (
            jnp.zeros((input_dims, o), dtype=dtype) if mean_type == _MEAN_LINEAR else None
        )
        return cls(
            z=z,
            var_mean=jnp.zeros((o, num_inducing), dtype=dtype),
            var_chol=eye,
            raw_outputscale=jnp.zeros((o,), dtype=dtype),
            raw_lengthscale=jnp.zeros((o, input_dims), dtype=dtype),
            mean_b=jnp.zeros((o,), dtype=dtype),
            mean_w=mean_w,
            mean_type=mean_type,
        )

    # -- internals -----------------------------------------------------------

    def _mean(self, x):
        """Prior mean, (O, N).  Linear mean is shared across outputs as in
        GPyTorch's LinearMean(input_dims) without batch shape (dgps.py:43)."""
        if self.mean_type == _MEAN_LINEAR:
            m = x @ self.mean_w + self.mean_b  # (N, O)
            return m.T
        n = x.shape[-2]
        return jnp.broadcast_to(self.mean_b[:, None], (self.mean_b.shape[0], n))

    def gram_zz(self):
        """K_zz + εI per output, (O, M, M)."""
        ell = positive(self.raw_lengthscale)
        s2 = positive(self.raw_outputscale)
        m = self.var_mean.shape[-1]
        eye = jnp.eye(m, dtype=self.var_mean.dtype)

        def gram(z_o, ell_o, s2_o):
            zs = z_o / ell_o
            z_sq = jnp.sum(zs * zs, axis=-1)
            return s2_o * jnp.exp(
                -0.5
                * jnp.maximum(z_sq[:, None] + z_sq[None, :] - 2.0 * zs @ zs.T, 0.0)
            )

        return jax.vmap(gram)(self.z, ell, s2) + EPSILON * eye

    def packed_variational(self):
        """[m | tril(S) | I] per output, (O, M, 2M+1).

        The lower-triangle restriction is a constant-mask MULTIPLY, not
        ``jnp.tril``: value- and gradient-identical (zero cotangent above
        the diagonal either way), but tril lowers to select_n whose
        backward emitted layout-mismatched (O, M, M) copies inside the
        training while-loop (device trace 2026-08-17)."""
        m = self.var_mean.shape[-1]
        eye = jnp.eye(m, dtype=self.var_mean.dtype)
        rows = jnp.arange(m)[:, None]
        cols = jnp.arange(m)[None, :]
        tril_mask = (rows >= cols).astype(self.var_mean.dtype)
        return jnp.concatenate(
            [
                self.var_mean[:, :, None],
                self.var_chol * tril_mask,
                jnp.broadcast_to(eye, self.var_chol.shape),
            ],
            axis=2,
        )

    def precompute(self):
        """Sample-independent factors per output:
        (chol(K_zz+εI) (O, M, M), L⁻ᵀ (O, M, M), W (O, M, 2M+1)).

        Hoisted out of the DSVI S-sample vmap — everything here depends
        only on parameters.  W = L⁻ᵀ·[m | tril(S) | I] packs the whitened
        variational mean, root, and identity side by side so the
        per-sample marginals collapse to ONE MXU matmul

            K_xz @ W = [mean-part | A·S | A]     (N, 2M+1)

        instead of three (A, A·m, A·S): the DSVI step at the benchmark
        shapes is launch-overhead-bound, not FLOP-bound, so per-sample op
        count is the thing to minimise.  (``precompute_layers`` stacks
        several layers through ONE batched chol/solve/matmul — use it
        when multiple layers share M.)"""
        return precompute_layers([self])[0]


    def marginals(self, x: jnp.ndarray, pre=None):
        """Posterior marginals at x (N, Din) → (mean (O, N), var (O, N))."""
        ell = positive(self.raw_lengthscale)  # (O, Din)
        s2 = positive(self.raw_outputscale)  # (O,)
        if pre is None:
            pre = self.precompute()
        w = pre[2]
        m = self.var_mean.shape[-1]

        def one(z_o, ell_o, s2_o, w_o):
            xs = x / ell_o
            zs = z_o / ell_o
            x_sq = jnp.sum(xs * xs, axis=-1)
            z_sq = jnp.sum(zs * zs, axis=-1)
            k_xz = s2_o * jnp.exp(
                -0.5
                * jnp.maximum(x_sq[:, None] + z_sq[None, :] - 2.0 * xs @ zs.T, 0.0)
            )
            out = k_xz @ w_o  # (N, 2M+1): [A·m | A·S | A] in one matmul
            mean = out[:, 0]
            a_s = out[:, 1 : m + 1]
            a = out[:, m + 1 :]
            var = s2_o - jnp.sum(a * a, axis=-1) + jnp.sum(a_s * a_s, axis=-1)
            return mean, jnp.clip(var, 1e-10, None)

        means, variances = jax.vmap(one)(self.z, ell, s2, w)
        return means + self._mean(x), variances

    def kl(self) -> jnp.ndarray:
        """Σ_o KL(q(u_o) ‖ N(0, I)).

        tril / diagonal are constant-mask reductions (not jnp.tril /
        jnp.diagonal): identical values and gradients, but diagonal's
        backward is a scatter-add that materialised full (O, M, M)
        buffers + layout copies in the training loop (trace 2026-08-17)."""
        mdim = self.var_mean.shape[-1]
        rows = jnp.arange(mdim)[:, None]
        cols = jnp.arange(mdim)[None, :]
        tril_mask = (rows >= cols).astype(self.var_chol.dtype)
        eye = (rows == cols).astype(self.var_chol.dtype)
        s = self.var_chol * tril_mask
        diag = jnp.sum(self.var_chol * eye, axis=-1)  # (O, M)
        m = self.var_mean
        per_o = 0.5 * (
            jnp.sum(m * m, axis=-1)
            + jnp.sum(s * s, axis=(-2, -1))
            - mdim
            - 2.0 * jnp.sum(jnp.log(jnp.abs(diag) + 1e-20), axis=-1)
        )
        return jnp.sum(per_o)

    def sample(self, key: jax.Array, x: jnp.ndarray, pre=None) -> jnp.ndarray:
        """One marginal sample at x: (N, O) — layer output feeding the next
        layer (DSVI sample propagation)."""
        mean, var = self.marginals(x, pre)
        eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
        return (mean + jnp.sqrt(var) * eps).T

    def joint(self, x: jnp.ndarray, pre=None):
        """Full posterior over the batch: (mean (O, N), cov (O, N, N)).

        cov = K_xx − A Aᵀ + (A S)(A S)ᵀ with A = K_xz L_zz⁻ᵀ — what
        GPyTorch's VariationalStrategy returns (the reference's layers
        rsample from this joint; dgps.py:48-70)."""
        ell = positive(self.raw_lengthscale)
        s2 = positive(self.raw_outputscale)
        if pre is None:
            pre = self.precompute()
        # both precompute paths (fused Pallas and the XLA fallback) carry a
        # real L⁻ᵀ in pre[1] — pallas_svgp.svgp_precompute_fused returns
        # (l, w, linv) unconditionally
        linv_t = pre[1]

        def one(z_o, m_o, s_o, ell_o, s2_o, li_o):
            xs = x / ell_o
            zs = z_o / ell_o
            x_sq = jnp.sum(xs * xs, axis=-1)
            z_sq = jnp.sum(zs * zs, axis=-1)
            k_xz = s2_o * jnp.exp(
                -0.5 * jnp.maximum(x_sq[:, None] + z_sq[None, :] - 2.0 * xs @ zs.T, 0.0)
            )
            k_xx = s2_o * jnp.exp(
                -0.5 * jnp.maximum(x_sq[:, None] + x_sq[None, :] - 2.0 * xs @ xs.T, 0.0)
            )
            a = k_xz @ li_o  # (N, M)
            s_tril = jnp.tril(s_o)
            a_s = a @ s_tril
            cov = k_xx - a @ a.T + a_s @ a_s.T
            return a @ m_o, cov

        means, covs = jax.vmap(one)(self.z, self.var_mean, self.var_chol, ell, s2, linv_t)
        return means + self._mean(x), covs

    def sample_joint(self, key: jax.Array, x: jnp.ndarray, pre=None) -> jnp.ndarray:
        """One batch-correlated sample (N, O) — GPyTorch-parity propagation
        (full B×B Cholesky per output; see deep_gp.py ``full_cov``)."""
        mean, cov = self.joint(x, pre)
        n = cov.shape[-1]
        chol = safe_cholesky(cov + 1e-4 * jnp.eye(n, dtype=cov.dtype))
        eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
        return (mean + jnp.einsum("onm,om->on", chol, eps)).T


def precompute_layers(layers):
    """Batched precompute across layers sharing the inducing count M:
    ONE batched Cholesky, ONE batched triangular solve, and ONE batched
    W matmul over the concatenated (ΣO, M, M) K_zz stack, split back per
    layer.  The DSVI step is dominated by per-op latency at M = 250
    (ablation 2026-08-16: precompute = 0.535 ms of a 0.68 ms forward).

    On TPU f32 the whole pipeline further fuses into ONE Pallas launch
    (ops/pallas_svgp.py — gram, batched-inside Cholesky recurrence, and
    W = L⁻ᵀ[m|S|I]), which also exports the recurrence's L⁻¹ by-product,
    so the per-layer tuple carries a real L⁻ᵀ on both paths and the
    kernel's custom VJP runs on MXU GEMMs instead of triangular solves
    (backward was 0.46 ms of the 0.98 ms DSVI step)."""
    m = layers[0].var_mean.shape[-1]
    assert all(l.var_mean.shape[-1] == m for l in layers)
    packed_all = jnp.concatenate([l.packed_variational() for l in layers], axis=0)
    sizes = [l.var_mean.shape[0] for l in layers]

    fused = _try_fused_precompute(layers, packed_all)
    if fused is not None:
        l_all, w_all, linv_all = fused
        linv_t_all = jnp.swapaxes(linv_all, -1, -2)
    else:
        eye = jnp.eye(m, dtype=layers[0].var_mean.dtype)
        k_all = jnp.concatenate([l.gram_zz() for l in layers], axis=0)  # (ΣO, M, M)
        l_all = safe_cholesky(k_all)
        eye_b = jnp.broadcast_to(eye, l_all.shape)
        linv_all = jax.lax.linalg.triangular_solve(
            l_all, eye_b, left_side=True, lower=True
        )
        linv_t_all = jnp.swapaxes(linv_all, -1, -2)
        w_all = linv_t_all @ packed_all  # (ΣO, M, 2M+1)

    out = []
    off = 0
    for o in sizes:
        out.append(
            (
                l_all[off : off + o],
                linv_t_all[off : off + o],
                w_all[off : off + o],
            )
        )
        off += o
    return out


def _try_fused_precompute(layers, packed_all):
    """Concatenate (z, 1/ℓ, s²) across layers — feature dims padded to the
    max (ghost dims: z=0, ℓ=1 contribute nothing to the RBF gram) — and
    run the single-launch Pallas precompute.  Returns None if ineligible
    (CPU, f64, M > 256, D > 8)."""
    from nonstationary_precip_tpu.ops import pallas_svgp

    d_max = max(l.z.shape[-1] for l in layers)

    def pad_d(arr, fill):
        pad = d_max - arr.shape[-1]
        if pad == 0:
            return arr
        widths = [(0, 0)] * (arr.ndim - 1) + [(0, pad)]
        return jnp.pad(arr, widths, constant_values=fill)

    z_all = jnp.concatenate([pad_d(l.z, 0.0) for l in layers], axis=0)
    if not pallas_svgp.eligible(z_all):
        return None
    ell_all = jnp.concatenate(
        [pad_d(positive(l.raw_lengthscale), 1.0) for l in layers], axis=0
    )
    s2_all = jnp.concatenate([positive(l.raw_outputscale) for l in layers], axis=0)
    return pallas_svgp.svgp_precompute_fused(z_all, ell_all, s2_all, packed_all)
