#!/usr/bin/env python3
"""Matrix-normal prior sampling demo — the reference's ``__main__`` at
/root/reference/models/latent_priors.py:101-123, Kronecker-free.

Run: python examples/matrix_normal_demo.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from nonstationary_precip_tpu.priors.matrix_normal import (
        MatrixNormalPrior,
        latent_rbf_row_cov,
    )

    num_grid = 30
    g = np.linspace(-2, 2, num_grid)
    gx, gy = np.meshgrid(g, g)
    x = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], axis=1), jnp.float32)

    row_cov = latent_rbf_row_cov(x, [0.5, 0.5])
    prior = MatrixNormalPrior(jnp.zeros((x.shape[0], 2)), row_cov, jnp.eye(2))
    h = prior.sample(jax.random.PRNGKey(173))
    print("H sample:", h.shape, "log_prob:", float(prior.log_prob(h)))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(9, 4))
    for d in range(2):
        axes[d].contourf(gx, gy, np.asarray(h[:, d]).reshape(num_grid, num_grid))
        axes[d].set_title(f"H column {d} (smooth latent field)")
    fig.savefig("matrix_normal_demo.png", dpi=130, bbox_inches="tight")
    print("wrote matrix_normal_demo.png")


if __name__ == "__main__":
    main()
