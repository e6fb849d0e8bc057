"""Deep GP trained with doubly-stochastic variational inference (DSVI).

Redesign of the reference ``DeepGP`` (/root/reference/models/dgps.py:72-111):
a stack of whitened SVGP hidden layers (width 2, linear mean) and a scalar
SVGP head (constant mean) under a Gaussian likelihood, trained on the
DSVI ELBO with S marginal samples propagated through the stack:

  ELBO/datum = mean_S mean_B E_{q(f_L)}[log N(y | f_L, σ²)] − Σ_layers KL / N

using the closed-form Gaussian expected log-likelihood
E[log N(y|f,σ²)] = log N(y|μ,σ²) − var/(2σ²)  (GPyTorch's
``expected_log_prob``, harvested the same way by VariationalELBO +
DeepApproximateMLL, deepgp_spatial_bench.py:61).

Two reference defects repaired (SURVEY.md §7):
  * dgps.py:88 appends the *same* hidden-layer object num_layers times
    (silent weight sharing) — here layers are distinct by default, with
    ``share_hidden=True`` to reproduce the reference's tying;
  * dgps.py:111 returns only the last test batch — predict here maps over
    all of x.

Weight sharing under jit: tied layers are carried once in the pytree and
reused, so "4 layers" costs one layer of parameters exactly like the
reference.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from nonstationary_precip_tpu.models.distributions import DiagNormal
from nonstationary_precip_tpu.models.likelihoods import GaussianLikelihood
from nonstationary_precip_tpu.models.svgp import SVGPLayer
from nonstationary_precip_tpu.utils.struct import pytree_dataclass

NUM_OUTPUT_DIMS = 2  # reference module constant, dgps.py:13


@pytree_dataclass(static=("share_hidden", "num_layers"))
class DeepGP:
    """hidden layers (Din→2→…→2, linear means) + scalar head (constant mean)."""

    layers: Tuple[SVGPLayer, ...]
    head: SVGPLayer
    likelihood: GaussianLikelihood
    share_hidden: bool = False
    num_layers: int = 1

    @classmethod
    def create(
        cls,
        key: jax.Array,
        input_dims: int,
        num_layers: int = 2,
        num_inducing: int = 250,
        hidden_dims: int = NUM_OUTPUT_DIMS,
        share_hidden: bool = False,
        dtype=jnp.float32,
    ):
        keys = jax.random.split(key, num_layers + 1)
        if share_hidden:
            if input_dims != hidden_dims:
                raise ValueError(
                    "share_hidden requires input_dims == hidden_dims "
                    "(the reference reapplies one 2→2 layer)"
                )
            layers = (
                SVGPLayer.create(
                    keys[0], input_dims, hidden_dims, num_inducing, "linear", dtype
                ),
            )
        else:
            dims = [input_dims] + [hidden_dims] * num_layers
            layers = tuple(
                SVGPLayer.create(
                    keys[i], dims[i], dims[i + 1], num_inducing, "linear", dtype
                )
                for i in range(num_layers)
            )
        head = SVGPLayer.create(keys[-1], hidden_dims, 1, num_inducing, "constant", dtype)
        return cls(
            layers=layers,
            head=head,
            likelihood=GaussianLikelihood.create(dtype=dtype),
            share_hidden=share_hidden,
            num_layers=num_layers,
        )

    def _hidden_stack(self):
        if self.share_hidden:
            return tuple(self.layers[0] for _ in range(self.num_layers))
        return self.layers

    # -- forward -----------------------------------------------------------------

    def propagate(self, key: jax.Array, x: jnp.ndarray, num_samples: int, *, full_cov: bool = False):
        """Push S samples through the stack.

        ``full_cov=False`` (default) propagates marginal samples — the
        standard DSVI estimator, and all the ELBO needs.  ``full_cov=True``
        propagates batch-correlated samples from each layer's joint
        posterior, replicating GPyTorch's rsample-from-the-joint behaviour
        (dgps.py:48-70) at the cost of an S×layers×B×B Cholesky.

        Returns the head's marginals per sample: (mean (S, B), var (S, B)).
        """
        stack = self._hidden_stack()
        keys = jax.random.split(key, num_samples)
        # K_zz factors are sample-independent: hoist them out of the vmap,
        # and run every layer through ONE batched chol/solve/matmul
        # (svgp.precompute_layers) — per-op latency at M=250 dominates
        from nonstationary_precip_tpu.models.svgp import precompute_layers

        uniq = list(self.layers) + [self.head]
        ms = {l.var_mean.shape[-1] for l in uniq}
        if len(ms) == 1:
            pre_uniq = precompute_layers(uniq)
        else:  # mixed inducing counts: per-layer fallback
            pre_uniq = [l.precompute() for l in uniq]
        pre_head = pre_uniq[-1]
        if self.share_hidden:
            pre = [pre_uniq[0]] * len(stack)
        else:
            pre = pre_uniq[:-1]

        # the FIRST layer's input x is the same for every DSVI sample, so
        # its marginals are sample-independent — computed once here instead
        # of S times inside the vmap (measured 2026-08-16: the non-precompute
        # share of the step is latency-bound at ~0.36 ms fwd+bwd; this cuts
        # (S−1)/S of layer 1's gram/matmul chain).  RNG semantics unchanged:
        # the per-sample key split and eps draw are identical to sample().
        m1 = v1 = None
        if not full_cov and stack:
            m1, v1 = stack[0].marginals(x, pre[0])

        def one_sample(k):
            h = x
            for i, (layer, layer_pre) in enumerate(zip(stack, pre)):
                k, sub = jax.random.split(k)
                if full_cov:
                    h = layer.sample_joint(sub, h, layer_pre)  # (B, hidden)
                elif i == 0:
                    eps = jax.random.normal(sub, m1.shape, dtype=m1.dtype)
                    h = (m1 + jnp.sqrt(v1) * eps).T  # (B, hidden)
                else:
                    h = layer.sample(sub, h, layer_pre)  # (B, hidden)
            mean, var = self.head.marginals(h, pre_head)  # (1, B)
            return mean[0], var[0]

        means, variances = jax.vmap(one_sample)(keys)
        return means, variances

    # -- objective ---------------------------------------------------------------

    def _fused_loss(self, key, x, y, num_data, num_samples):
        """Fused-data-term path (ops/pallas_elbo.py): the whole per-sample
        layer chain + likelihood runs as ONE Pallas launch with a
        hand-derived one-launch backward, eliminating the ~30 diffuse
        small fusions of the composed step (DESIGN.md §12).  Bit-identical
        sampling (same key schedule as ``propagate``).  Returns None when
        the topology/backend is ineligible."""
        from nonstationary_precip_tpu.models.svgp import precompute_layers
        from nonstationary_precip_tpu.ops.pallas_elbo import (
            _elbo_eligible,
            fused_data_term,
        )
        from nonstationary_precip_tpu.ops.pallas_elbo import elbo_enabled
        from nonstationary_precip_tpu.utils.transforms import positive

        # the cheap env/backend/trace-context gate FIRST: with the fused
        # path off (default) nothing below may run — precompute_layers is
        # three M×M Cholesky pipelines that eager callers would execute
        # and discard
        if not elbo_enabled():
            return None
        if (
            self.share_hidden
            or self.num_layers != 2
            or len(self.layers) != 2
            or self.layers[0].mean_type != "linear"
            or self.head.mean_type != "constant"
        ):
            return None
        l1, l2, hd = self.layers[0], self.layers[1], self.head
        if not (
            l1.z.shape[0] == 2
            and l2.z.shape[0] == 2
            and hd.z.shape[0] == 1
            and l2.z.shape[-1] == 2
            and hd.z.shape[-1] == 2
            and l1.z.shape[1] == l2.z.shape[1] == hd.z.shape[1]
        ):
            return None

        pre = precompute_layers([l1, l2, hd])
        params = dict(
            z1=l1.z, ell1=positive(l1.raw_lengthscale),
            s21=positive(l1.raw_outputscale), w1=pre[0][2],
            mw1=l1.mean_w, mb1=l1.mean_b,
            z2=l2.z, ell2=positive(l2.raw_lengthscale),
            s22=positive(l2.raw_outputscale), w2=pre[1][2],
            mw2=l2.mean_w, mb2=l2.mean_b,
            zh=hd.z, ellh=positive(hd.raw_lengthscale),
            s2h=positive(hd.raw_outputscale), wh=pre[2][2],
            mbh=hd.mean_b,
        )
        if not _elbo_eligible(x, params):
            return None

        b = x.shape[0]

        def eps_for(k):
            k1, sub1 = jax.random.split(k)
            e1 = jax.random.normal(sub1, (2, b), dtype=x.dtype)
            _, sub2 = jax.random.split(k1)
            e2 = jax.random.normal(sub2, (2, b), dtype=x.dtype)
            return e1, e2

        eps1, eps2 = jax.vmap(eps_for)(jax.random.split(key, num_samples))
        data_term = fused_data_term(
            x, y, eps1, eps2, params, self.likelihood.noise, True
        )
        kl = self.head.kl() + self.layers[0].kl() + self.layers[1].kl()
        return -(data_term - kl / num_data)

    def loss(self, key: jax.Array, x, y, num_data: int, num_samples: int = 3, *, full_cov: bool = False, fused_elbo=None):
        """−ELBO per datum; num_data is the full-train-set N for the KL and
        minibatch β-scaling.

        ``fused_elbo``: None (default) auto-dispatches the Pallas fused
        data term on TPU for the flagship topology when NSGP_PALLAS_ELBO=1;
        False forces the composed path.  shard_map/pmap traces are
        auto-detected and take the composed path regardless (custom-VJP
        outputs break replication inference there, DESIGN.md §11)."""
        if not full_cov and fused_elbo is not False:
            fused = self._fused_loss(key, x, y, num_data, num_samples)
            if fused is not None:
                return fused
        means, variances = self.propagate(key, x, num_samples, full_cov=full_cov)
        noise = self.likelihood.noise
        ell = -0.5 * (
            jnp.log(2.0 * jnp.pi * noise) + ((y - means) ** 2 + variances) / noise
        )  # (S, B) closed-form expected log-likelihood
        data_term = jnp.mean(jnp.mean(ell, axis=-1), axis=0)
        if self.share_hidden:
            # tied layers contribute one KL (one q(u) exists), as in the
            # reference where named_variational_strategies dedupes modules
            kl = self.head.kl() + self.layers[0].kl()
        else:
            kl = self.head.kl()
            for layer in self._hidden_stack():
                kl = kl + layer.kl()
        return -(data_term - kl / num_data)

    # -- prediction ---------------------------------------------------------------

    def predict(self, key: jax.Array, x, num_samples: int = 10):
        """Predictive mixture over S sample paths, with observation noise
        (the reference's likelihood(model(x_batch)), dgps.py:100-111).

        Returns (mixture DiagNormal, per-sample means (S, B), per-sample
        vars (S, B))."""
        means, variances = self.propagate(key, x, num_samples)
        noise = self.likelihood.noise
        variances = variances + noise
        mix_mean = jnp.mean(means, axis=0)
        mix_var = jnp.mean(variances + means**2, axis=0) - mix_mean**2
        return DiagNormal(mix_mean, mix_var), means, variances
