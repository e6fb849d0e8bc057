#!/usr/bin/env python3
"""Large-N matrix-free Gibbs-GP gate: convergence + dense parity as a
BANDED benchmark row (VERDICT r3 #1).

The large-N regime (``GibbsExactGP.loss_matrixfree`` /
``ops/lazy_cg.lazy_cg_mll`` with the fused Gram·v matvec, fused backward
panel sweep, and the rank-150 pivoted-Cholesky/Woodbury preconditioner)
is the capability the reference only gestures at through
``gpytorch.settings.max_cg_iterations`` (reference
``experiments/spatial_exp.py:199``) — and that regime is DEFINED by
converged solves.  This driver turns the convergence evidence that
previously lived only in probes (tools/probe_precond_chip.json) into a
row ``run_benchmarks.py --check`` hard-fails on:

  * train the shipped config for ``--steps`` Adam steps at ``--n``
    (synthetic data: the per-point lengthscale FIELD trains, the
    flagship kernel shape),
  * "rmse" slot  := final mBCG relative residual of the K⁻¹y solve at
    the TRAINED pose (``ops/lazy_cg.lazy_cg_diagnostics``) — band 1e-2,
  * "nlpd" slot  := |loss_lazy − loss_dense| / |loss_dense| against the
    exact dense-Cholesky oracle at the same pose — band 5e-2 (the MLL
    value differs by SLQ estimator noise at 8 probes, so the oracle
    check is statistical, not bitwise).  Gradient cosine vs the dense
    oracle is printed and asserted ≥ 0.98.

Run: python -m nonstationary_precip_tpu.experiments.gibbs_largen --n 16384
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from nonstationary_precip_tpu.train.config import ExperimentConfig

_D = 2


@dataclass
class LargeNConfig(ExperimentConfig):
    n: int = 16384
    steps: int = 20
    rank: int = 150
    iters: int = 0  # 0 = the shipped auto budget (16 for N<=32768, 32 above)


def _data(n, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, _D)), jnp.float32)
    y = jnp.sin(2 * x[:, 0]) * jnp.cos(x[:, 1]) + 0.1 * jnp.asarray(
        rng.normal(size=n), jnp.float32
    )
    return x, y


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from nonstationary_precip_tpu.kernels.gibbs import packed_gibbs_cross
    from nonstationary_precip_tpu.ops.lazy_cg import (
        lazy_cg_diagnostics,
        lazy_cg_mll,
    )
    from nonstationary_precip_tpu.ops.linalg import (
        mvn_logpdf_from_chol,
        safe_cholesky,
    )
    from nonstationary_precip_tpu.ops.pallas_matvec import (
        packed_gibbs_panel_vjp,
        scaled_packed_gibbs_matvec_builder,
    )
    from nonstationary_precip_tpu.utils.transforms import positive

    cfg = LargeNConfig(max_iters=0).parse_args(argv)
    n = cfg.n
    iters = cfg.iters or (16 if n <= 32768 else 32)
    rank = cfg.rank
    block = 2048
    x, y = _data(n)
    key = jax.random.PRNGKey(cfg.seed)
    cross = packed_gibbs_cross(_D)
    on_tpu = jax.default_backend() == "tpu"
    builder = scaled_packed_gibbs_matvec_builder(_D) if on_tpu else None
    pvjp = packed_gibbs_panel_vjp(_D) if on_tpu else None

    params = {
        "log_ell_pp": jnp.zeros((n, _D), jnp.float32),
        "raw_s2": jnp.asarray(0.5, jnp.float32),
        "log_noise": jnp.asarray(-2.0, jnp.float32),
    }

    def loss(p):
        aug = jnp.concatenate([x, p["log_ell_pp"]], axis=1)
        return (
            -lazy_cg_mll(
                p["raw_s2"], aug, y, key, jnp.exp(p["log_noise"]),
                block=block, num_probes=8, max_iters=iters, tol=1e-6,
                precond_rank=rank, cross_fn=cross,
                matvec_builder=builder, panel_vjp=pvjp,
            )
            / n
        )

    def loss_dense(p):
        ell = jnp.exp(p["log_ell_pp"])
        from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram_reference

        k = positive(p["raw_s2"]) * gibbs_gram_reference(x, ell, x, ell)
        k = k + jnp.exp(p["log_noise"]) * jnp.eye(n, dtype=x.dtype)
        return -mvn_logpdf_from_chol(y, jnp.zeros_like(y), safe_cholesky(k)) / n

    opt = optax.adam(1e-2)

    @jax.jit
    def train(p):
        st = opt.init(p)

        def body(carry, _):
            pp, s = carry
            val, g = jax.value_and_grad(loss)(pp)
            up, s = opt.update(g, s)
            return (optax.apply_updates(pp, up), s), val

        (p, _), vals = jax.lax.scan(body, (p, st), None, length=cfg.steps)
        return p, vals

    p, vals = train(params)
    jax.block_until_ready(vals)
    assert bool(jnp.all(jnp.isfinite(vals))), "training diverged"
    print(
        f"[gibbs_largen] n={n} r{rank}-i{iters}: loss "
        f"{float(vals[0]):.4f} -> {float(vals[-1]):.4f} over {cfg.steps} steps",
        flush=True,
    )

    aug = jnp.concatenate([x, p["log_ell_pp"]], axis=1)
    diag = lazy_cg_diagnostics(
        p["raw_s2"], aug, y, key, jnp.exp(p["log_noise"]),
        block=block, num_probes=8, max_iters=iters, tol=1e-6,
        precond_rank=rank, cross_fn=cross, matvec_builder=builder,
    )
    print(f"[gibbs_largen] trained-pose diagnostics: {diag}", flush=True)

    lv, lg = jax.jit(jax.value_and_grad(loss))(p)
    dv, dg = jax.jit(jax.value_and_grad(loss_dense))(p)
    lf = jnp.concatenate([jnp.ravel(v) for v in jax.tree.leaves(lg)])
    df = jnp.concatenate([jnp.ravel(v) for v in jax.tree.leaves(dg)])
    cos = float(jnp.dot(lf, df) / (jnp.linalg.norm(lf) * jnp.linalg.norm(df)))
    rel = float(jnp.abs(lv - dv) / jnp.abs(dv))
    print(
        f"[gibbs_largen] dense-oracle parity: loss rel diff {rel:.3e}  "
        f"grad cosine {cos:.5f}",
        flush=True,
    )
    assert cos >= 0.98, f"gradient direction drifted from dense oracle: {cos}"
    assert not diag["broke"], "mBCG flagged breakdown at the trained pose"
    return diag["relres_solve"], rel


if __name__ == "__main__":
    out = main()
    print(f"relres_solve={out[0]:.3e}  loss_rel_diff={out[1]:.3e}")
