#!/usr/bin/env python3
"""Multivariate-Gibbs kernel demo: sample a Gram on a 2-D grid and draw a
GP sample — the reference's executable ``__main__`` smoke demo
(/root/reference/models/multivariate_gibbs_kernel.py:152-170) without the
pymc3 dependency.

Run: python examples/mv_gibbs_demo.py [outdir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main(outdir="."):
    from nonstationary_precip_tpu.models import MultivariateGibbsGP
    from nonstationary_precip_tpu.ops.linalg import safe_cholesky

    num_grid = 30
    g = np.linspace(2, 3, num_grid)
    gx, gy = np.meshgrid(g, g)
    x = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], axis=1), jnp.float32)

    key = jax.random.PRNGKey(173)
    model = MultivariateGibbsGP.create(key, x, noise=0.01)
    k = model.gram(x, model.h)
    print("Gram:", k.shape, "diag mean:", float(jnp.diagonal(k).mean()))

    chol = safe_cholesky(k + 1e-4 * jnp.eye(k.shape[0]))
    f = chol @ jax.random.normal(jax.random.PRNGKey(1), (k.shape[0],))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(9, 4))
    axes[0].matshow(np.asarray(k))
    axes[0].set_title("Multivariate Gibbs Gram")
    axes[1].contourf(gx, gy, np.asarray(f).reshape(num_grid, num_grid), cmap="jet", alpha=0.7)
    axes[1].set_title("GP sample")
    fig.savefig(f"{outdir}/mv_gibbs_demo.png", dpi=130, bbox_inches="tight")
    print(f"wrote {outdir}/mv_gibbs_demo.png")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
