#!/usr/bin/env python3
"""AOT-export the hot programs as serialized StableHLO (jax.export).

The axon tunnel makes first-compiles cost 3-20 minutes; beyond the
persistent compilation cache (`make warm`), this exports the flagship
programs to self-contained artifacts that a serving process can load and
run without JAX tracing or a Python model definition:

  exports/dsvi_train_step.bin   one DSVI Adam step (donated state)
  exports/dsvi_predict.bin      predictive mixture marginals at B points
  exports/gibbs_map_step.bin    one Gibbs exact-GP MAP Adam step (N=1024)

Round-trip check: each artifact is deserialized and executed, outputs
compared against the live-traced function.

Run: python tools/export_aot.py [outdir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from jax import export as jexport  # noqa: E402


def export_fn(fn, args, path: Path):
    """Serialize jit(fn) at the given example args; verify round-trip.

    jax.export can only serialize registered pytree types, so the
    artifact's calling convention is FLAT: it takes the example args'
    tree leaves in ``jax.tree_util.tree_flatten`` order and returns flat
    output leaves — the treedefs live inside the traced closure and a
    serving process needs neither JAX pytree registrations nor the model
    classes."""
    leaves, treedef = jax.tree_util.tree_flatten(args)

    def flat_fn(*flat):
        out = fn(*jax.tree_util.tree_unflatten(treedef, flat))
        return tuple(jax.tree_util.tree_leaves(out))

    exp = jexport.export(jax.jit(flat_fn))(*leaves)
    data = exp.serialize()
    path.write_bytes(data)
    # round-trip: deserialize and run
    rt = jexport.deserialize(data)
    out_rt = rt.call(*leaves)
    out_live = jax.jit(flat_fn)(*leaves)
    for a, b in zip(jax.tree_util.tree_leaves(out_rt), jax.tree_util.tree_leaves(out_live)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    print(f"exported {path.name}: {len(data)/1e6:.2f} MB, round-trip exact", flush=True)


def main(outdir="exports"):
    out = Path(outdir)
    out.mkdir(exist_ok=True)

    from nonstationary_precip_tpu.models import DeepGP, GibbsExactGP
    from nonstationary_precip_tpu.priors import LogNormalProcess

    # --- DSVI train step + predict (benchmark shapes) --------------------
    rng = np.random.default_rng(0)
    b = 315
    x = jnp.asarray(rng.normal(size=(b, 2)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]), jnp.float32)
    key = jax.random.PRNGKey(173)
    model = DeepGP.create(key, input_dims=2, num_layers=2, num_inducing=250)
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(model)

    def dsvi_step(m, s, k, xb, yb):
        loss, grads = jax.value_and_grad(
            lambda mm: mm.loss(k, xb, yb, num_data=b, num_samples=3)
        )(m)
        updates, s = optimizer.update(grads, s, m)
        return optax.apply_updates(m, updates), s, loss

    export_fn(dsvi_step, (model, opt_state, key, x, y), out / "dsvi_train_step.bin")

    def dsvi_predict(m, k, xb):
        dist, _, _ = m.predict(k, xb, num_samples=10)
        return dist.mean, dist.var

    export_fn(dsvi_predict, (model, key, x), out / "dsvi_predict.bin")

    # --- Gibbs exact MAP step at the fused-kernel size -------------------
    n = 1024
    xg = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
    yg = jnp.asarray(np.sin(np.asarray(xg)[:, 0]), jnp.float32)
    prior = LogNormalProcess.create(2, mean=float(np.log(0.3)), outputscale=1.0, lengthscale=1.3)
    gmodel = GibbsExactGP.create(xg, prior, noise=0.011, outputscale=0.644)
    pc = prior.gram_chol(xg)
    gopt = optax.adam(0.01)
    gstate = gopt.init(gmodel)

    def gibbs_step(m, s):
        loss, grads = jax.value_and_grad(lambda mm: mm.loss(xg, yg, pc))(m)
        updates, s = gopt.update(grads, s, m)
        return optax.apply_updates(m, updates), s, loss

    export_fn(gibbs_step, (gmodel, gstate), out / "gibbs_map_step.bin")


if __name__ == "__main__":
    main(*sys.argv[1:])
