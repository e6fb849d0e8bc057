#!/usr/bin/env python3
"""Quickstart 4/4 — data-parallel DSVI over a device mesh.

The DSVI ELBO is a mean over minibatch elements plus a parameter-only KL,
so data parallelism is exact: shard the batch over the mesh, evaluate the
data term per device, and let AD insert the one gradient psum
(``parallel.dp.dp_value_and_grad``).  On real hardware the mesh covers TPU
chips over ICI; here it runs on 8 virtual CPU devices so the sharded path
is testable anywhere.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
       python examples/quickstart_dataparallel.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    import jax

    # Demo runs on the virtual 8-device CPU mesh so it works anywhere
    # (this host has ONE real TPU chip; on a real pod slice drop this line
    # and the experiments' --mesh paths shard over the chips instead).
    if os.environ.get("NSGP_DP_BACKEND", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nonstationary_precip_tpu.models import DeepGP
    from nonstationary_precip_tpu.parallel.dp import dp_value_and_grad, shard_batch
    from nonstationary_precip_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()  # 1-D data mesh over every visible device
    print(f"mesh: {mesh.devices.shape[0]} × {mesh.devices[0].platform}")

    rng = np.random.default_rng(0)
    n = 512  # batch divisible by the device count
    x = jnp.asarray(rng.standard_normal((n, 2)), jnp.float32)
    y = jnp.sin(x[:, 0]) + 0.1 * x[:, 1]

    k_init, key = jax.random.split(jax.random.PRNGKey(173))
    model = DeepGP.create(k_init, input_dims=2, num_layers=2, num_inducing=32)

    def loss_fn(m, xb, yb):
        # per-shard mean data term; KL carries its own global normalisation.
        # Fold the mesh position into the key so DSVI sample noise is
        # decorrelated across shards.
        kk = jax.random.fold_in(key, jax.lax.axis_index("data"))
        return m.loss(kk, xb, yb, num_data=n, num_samples=3)

    vag = jax.jit(dp_value_and_grad(loss_fn, mesh))
    xs, ys = shard_batch(mesh, x, y)

    opt = optax.adam(0.01)
    state = opt.init(model)
    for step in range(5):
        loss, grads = vag(model, xs, ys)
        updates, state = opt.update(grads, state)
        model = optax.apply_updates(model, updates)
        print(f"step {step}: loss {float(loss):.4f}")

    # parity: sharded loss == mean of per-shard losses replayed one device
    # at a time with the same folded keys (the DSVI ELBO is stochastic, so
    # the oracle must draw the identical per-shard sample noise)
    d = mesh.devices.shape[0]
    per_shard = n // d
    per = []
    for s in range(d):
        sl = slice(s * per_shard, (s + 1) * per_shard)
        kk = jax.random.fold_in(key, s)
        per.append(float(model.loss(kk, x[sl], y[sl], num_data=n, num_samples=3)))
    ref = float(np.mean(per))
    got = float(vag(model, xs, ys)[0])
    assert abs(ref - got) < 1e-4 * max(1.0, abs(ref)), (ref, got)
    print(f"sharded loss matches 1-device replay: {got:.6f} vs {ref:.6f}")
    print("ok")


if __name__ == "__main__":
    main()
