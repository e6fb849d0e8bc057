"""Training-loop machinery: scan fit, early stop, minibatch scheduler."""

import numpy as np
import jax
import jax.numpy as jnp

from nonstationary_precip_tpu.train.optim import fit, fit_minibatched


def _quad_loss(m, target):
    return jnp.sum((m["w"] - target) ** 2)


def test_fit_converges_on_quadratic():
    model = {"w": jnp.zeros(4)}
    target = jnp.asarray([1.0, -2.0, 0.5, 3.0])
    res = fit(model, _quad_loss, target, lr=0.1, num_steps=500)
    np.testing.assert_allclose(np.asarray(res.model["w"]), np.asarray(target), atol=1e-2)
    assert res.steps == 500
    assert res.losses.shape == (500,)


def test_fit_early_stop_on_threshold():
    model = {"w": jnp.zeros(2)}
    target = jnp.asarray([1.0, 1.0])
    res = fit(
        model, _quad_loss, target, lr=0.2, num_steps=5000, threshold=1e-9, chunk=100
    )
    assert res.steps < 5000  # stopped when |Δloss| < threshold


def test_fit_early_stop_is_per_step_within_chunk():
    """The |Δloss| rule is evaluated per step over the recorded trace (the
    reference's per-iteration semantics, precipitation_baselines.py:389-390),
    not just on the two chunk-boundary losses — a converged trajectory must
    stop after its FIRST chunk even with a huge chunk size."""
    model = {"w": jnp.asarray([1.0, 1.0])}
    target = jnp.asarray([1.0, 1.0])  # already optimal: every Δloss ≈ 0
    res = fit(
        model, _quad_loss, target, lr=1e-4, num_steps=4000, threshold=1e-12, chunk=2000
    )
    assert res.steps == 2000


def test_fit_threshold_defaults_to_moderate_chunk():
    """With a threshold but no explicit chunk, fit must not run the whole
    budget as one scan (which could never stop early) — the default chunk
    becomes min(num_steps, 500)."""
    model = {"w": jnp.asarray([1.0, 1.0])}
    target = jnp.asarray([1.0, 1.0])  # already optimal
    res = fit(model, _quad_loss, target, lr=1e-4, num_steps=5000, threshold=1e-12)
    assert res.steps == 500


def test_fit_aot_cache_pins_and_reloads(tmp_path, monkeypatch):
    """aot_key + NSGP_AOT_DIR pins the compiled chunk executable to disk;
    a second fit loads the pin and produces identical trajectories."""
    monkeypatch.setenv("NSGP_AOT_DIR", str(tmp_path))
    monkeypatch.setenv("NSGP_AOT_CPU_OK", "1")  # pin mechanics under test
    model = {"w": jnp.zeros(2)}
    target = jnp.asarray([1.0, -1.0])
    res1 = fit(model, _quad_loss, target, lr=0.1, num_steps=40, chunk=20,
               aot_key="quad")
    pins = list(tmp_path.glob("quad-s20-*.jaxexec"))
    assert len(pins) == 1
    res2 = fit(model, _quad_loss, target, lr=0.1, num_steps=40, chunk=20,
               aot_key="quad")
    np.testing.assert_array_equal(np.asarray(res1.losses), np.asarray(res2.losses))
    np.testing.assert_array_equal(
        np.asarray(res1.model["w"]), np.asarray(res2.model["w"])
    )
    # and still exactly matches the non-AOT path
    res3 = fit(model, _quad_loss, target, lr=0.1, num_steps=40, chunk=20)
    np.testing.assert_array_equal(np.asarray(res1.losses), np.asarray(res3.losses))


def test_fit_aot_cache_corrupt_pin_falls_back(tmp_path, monkeypatch):
    """A corrupted/stale pin must fall back to a fresh compile (and
    overwrite the pin), never crash or return wrong results."""
    monkeypatch.setenv("NSGP_AOT_DIR", str(tmp_path))
    monkeypatch.setenv("NSGP_AOT_CPU_OK", "1")  # pin mechanics under test
    model = {"w": jnp.zeros(2)}
    target = jnp.asarray([1.0, -1.0])
    res1 = fit(model, _quad_loss, target, lr=0.1, num_steps=20, aot_key="q2")
    pin = next(tmp_path.glob("q2-*.jaxexec"))
    pin.write_bytes(b"garbage not a pickle")
    res2 = fit(model, _quad_loss, target, lr=0.1, num_steps=20, aot_key="q2")
    np.testing.assert_array_equal(np.asarray(res1.losses), np.asarray(res2.losses))
    assert pin.stat().st_size > 100  # re-pinned over the garbage


def test_fit_mask_freezes_leaves():
    model = {"w": jnp.zeros(2), "frozen": jnp.ones(2)}

    def loss(m, t):
        return jnp.sum((m["w"] - t) ** 2) + jnp.sum(m["frozen"] ** 2)

    mask = {"w": True, "frozen": False}
    res = fit(model, loss, jnp.asarray([2.0, 2.0]), lr=0.1, num_steps=200, mask=mask)
    np.testing.assert_allclose(np.asarray(res.model["frozen"]), 1.0)
    np.testing.assert_allclose(np.asarray(res.model["w"]), 2.0, atol=1e-2)


def test_fit_splits_matches_sequential(rng):
    """Batched K-split training must reproduce per-split sequential runs
    (Adam is elementwise, so trajectories are identical)."""
    from nonstationary_precip_tpu.train.vmapped import fit_splits, unstack_pytree

    k = 3
    models = [{"w": jnp.zeros(2)} for _ in range(k)]
    targets = [jnp.asarray(rng.normal(size=2), jnp.float32) for _ in range(k)]

    res = fit_splits(models, _quad_loss, targets, lr=0.1, num_steps=100)
    batched = unstack_pytree(res.model, k)
    assert res.losses.shape == (100, k)  # per-split traces, not the sum

    for i in range(k):
        seq = fit(models[i], _quad_loss, targets[i], lr=0.1, num_steps=100)
        np.testing.assert_allclose(
            np.asarray(batched[i]["w"]), np.asarray(seq.model["w"]), rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(res.losses[:, i]), np.asarray(seq.losses), rtol=1e-5, atol=1e-7
        )


def test_fit_splits_stacked_passthrough(rng):
    """A ``Stacked``-wrapped arg (already stacked on the split axis, e.g.
    the batched gram_pre hoist in experiments/spatial_gibbs.py) must give
    bit-identical results to the per-split sequence form."""
    from nonstationary_precip_tpu.train.vmapped import (
        Stacked,
        eval_splits,
        fit_splits,
        stack_pytrees,
    )

    k = 3
    models = [{"w": jnp.zeros(2)} for _ in range(k)]
    targets = [jnp.asarray(rng.normal(size=2), jnp.float32) for _ in range(k)]

    res_seq = fit_splits(models, _quad_loss, targets, lr=0.1, num_steps=50)
    res_stk = fit_splits(
        models, _quad_loss, Stacked(stack_pytrees(targets)), lr=0.1, num_steps=50
    )
    np.testing.assert_array_equal(
        np.asarray(res_seq.model["w"]), np.asarray(res_stk.model["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(res_seq.losses), np.asarray(res_stk.losses)
    )

    ev = lambda m, t: jnp.sum((m["w"] - t) ** 2)  # noqa: E731
    e_seq = eval_splits(res_seq.model, ev, targets)
    e_stk = eval_splits(res_seq.model, ev, Stacked(stack_pytrees(targets)))
    np.testing.assert_array_equal(np.asarray(e_seq), np.asarray(e_stk))


def test_fit_minibatched_splits_matches_sequential(rng):
    """K-split lockstep minibatch training must reproduce the per-split
    sequential ``fit_minibatched`` runs (same schedules, same keys; Adam
    is elementwise so the summed-loss gradient is each split's own)."""
    import jax

    from nonstationary_precip_tpu.train.optim import (
        fit_minibatched,
        fit_minibatched_splits,
    )
    from nonstationary_precip_tpu.train.vmapped import unstack_pytree

    k, n, d = 3, 20, 2
    xs = [jnp.asarray(rng.normal(size=(n, d)), jnp.float32) for _ in range(k)]
    ys = [jnp.asarray(rng.normal(size=n), jnp.float32) for _ in range(k)]
    models = [{"w": jnp.zeros(d)} for _ in range(k)]
    keys = [jax.random.PRNGKey(100 + i) for i in range(k)]

    def loss_fn(m, kk, xb, yb):
        # key-dependent so the per-step DSVI-key plumbing is exercised
        noise = jax.random.normal(kk, ()) * 1e-3
        return jnp.mean((xb @ m["w"] - yb) ** 2) + noise

    res_b = fit_minibatched_splits(
        models, loss_fn, xs, ys, keys=keys, num_epochs=4, batch_size=8,
        lr=0.05, seeds=list(range(k)),
    )
    assert res_b.losses.shape == (res_b.steps, k)
    parts = unstack_pytree(res_b.model, k)
    for i in range(k):
        seq = fit_minibatched(
            models[i], loss_fn, xs[i], ys[i], key=keys[i], num_epochs=4,
            batch_size=8, lr=0.05, seed=i,
        )
        np.testing.assert_allclose(
            np.asarray(parts[i]["w"]), np.asarray(seq.model["w"]), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(res_b.losses[:, i]), np.asarray(seq.losses), rtol=1e-5, atol=1e-6
        )


def test_fit_splits_mesh_parity():
    """fit_splits/eval_splits with the K axis sharded over the mesh must
    match the single-device stacked run, and reject a hand-batched loss
    (one custom call GSPMD cannot partition)."""
    import jax
    import pytest
    from jax.sharding import Mesh

    from nonstationary_precip_tpu.train.vmapped import eval_splits, fit_splits

    k = 8
    targets = [jnp.asarray([0.5 * i, -0.25 * i]) for i in range(k)]
    models = [{"w": jnp.zeros(2)} for _ in range(k)]
    mesh = Mesh(np.array(jax.devices()[:8]), ("split",))

    res_1 = fit_splits(models, _quad_loss, targets, lr=0.1, num_steps=40)
    res_m = fit_splits(models, _quad_loss, targets, lr=0.1, num_steps=40, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(res_m.model["w"]), np.asarray(res_1.model["w"]), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res_m.losses), np.asarray(res_1.losses), rtol=1e-6, atol=1e-7
    )

    ev = lambda m, t: jnp.sum((m["w"] - t) ** 2)  # noqa: E731
    e_1 = eval_splits(res_1.model, ev, targets)
    e_m = eval_splits(res_1.model, ev, targets, mesh=mesh)
    np.testing.assert_allclose(np.asarray(e_m), np.asarray(e_1), rtol=1e-6, atol=1e-7)

    with pytest.raises(ValueError, match="vmapped loss"):
        fit_splits(
            models, _quad_loss, targets, num_steps=1, mesh=mesh,
            batched_loss=lambda m, t: jnp.zeros(k),
        )


def test_fit_minibatched_splits_mesh_parity(rng):
    """Split-parallel lockstep training (K sharded over the mesh) must
    reproduce the single-device lockstep run — splits are independent, so
    sharding the K axis changes placement, not arithmetic."""
    import jax
    from jax.sharding import Mesh

    from nonstationary_precip_tpu.train.optim import fit_minibatched_splits

    k, n, d = 8, 16, 2
    xs = [jnp.asarray(rng.normal(size=(n, d)), jnp.float32) for _ in range(k)]
    ys = [jnp.asarray(rng.normal(size=n), jnp.float32) for _ in range(k)]
    models = [{"w": jnp.full(d, 0.1 * i)} for i in range(k)]
    keys = [jax.random.PRNGKey(7 + i) for i in range(k)]

    def loss_fn(m, kk, xb, yb):
        noise = jax.random.normal(kk, ()) * 1e-3
        return jnp.mean((xb @ m["w"] - yb) ** 2) + noise

    kw = dict(keys=keys, num_epochs=3, batch_size=8, lr=0.05, seeds=list(range(k)))
    res_1 = fit_minibatched_splits(models, loss_fn, xs, ys, **kw)
    mesh = Mesh(np.array(jax.devices()[:8]), ("split",))
    res_m = fit_minibatched_splits(models, loss_fn, xs, ys, mesh=mesh, **kw)
    np.testing.assert_allclose(
        np.asarray(res_m.model["w"]), np.asarray(res_1.model["w"]), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res_m.losses), np.asarray(res_1.losses), rtol=1e-6, atol=1e-7
    )
    # K not divisible over the mesh is an explicit error, not silent truncation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divide"):
        fit_minibatched_splits(
            models[:3], loss_fn, xs[:3], ys[:3], mesh=mesh,
            keys=keys[:3], num_epochs=1, batch_size=8, seeds=[0, 1, 2],
        )


def test_fit_restarts_picks_best(rng):
    from nonstationary_precip_tpu.train.vmapped import fit_restarts

    target = jnp.asarray([1.0, -1.0])
    # one init close, one far with a huge offset that Adam can't close in time
    models = [{"w": jnp.asarray([0.9, -0.9])}, {"w": jnp.asarray([50.0, 50.0])}]
    best, best_loss, finals = fit_restarts(
        models, _quad_loss, target, lr=0.05, num_steps=60
    )
    assert finals.shape == (2,)
    assert best_loss == float(finals.min())
    np.testing.assert_allclose(np.asarray(best["w"]), np.asarray(target), atol=0.2)


def test_mvn_and_diag_sampling(key, rng):
    from nonstationary_precip_tpu.models.distributions import DiagNormal, MVN

    a = rng.normal(size=(4, 4))
    cov = jnp.asarray(a @ a.T + 4 * np.eye(4))
    mean = jnp.asarray(rng.normal(size=4))
    draws = MVN(mean, cov).sample(key, num_samples=4000)
    assert draws.shape == (4000, 4)
    np.testing.assert_allclose(draws.mean(0), np.asarray(mean), atol=0.2)
    emp_cov = np.cov(np.asarray(draws).T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.5)

    d = DiagNormal(mean, jnp.ones(4))
    s = d.sample(key, 1000)
    assert s.shape == (1000, 4)
    np.testing.assert_allclose(np.asarray(s).std(0), 1.0, atol=0.15)


def test_fit_nan_guard_stops():
    model = {"w": jnp.ones(1)}

    def exploding(m, _):
        # Adam walks w up toward 2 and overshoots → sqrt of negative → NaN
        return jnp.sqrt(2.0 - m["w"][0])

    res = fit(model, exploding, jnp.zeros(1), lr=0.5, num_steps=400, chunk=20)
    assert res.steps < 400  # guard tripped at a chunk boundary


def test_fit_minibatched_covers_epochs(key):
    n, b, epochs = 10, 4, 3
    x = jnp.arange(n, dtype=jnp.float32)[:, None]
    y = jnp.zeros(n)
    seen = []

    model = {"w": jnp.zeros(1)}

    def loss(m, kk, xb, yb):
        return jnp.mean((xb @ m["w"] - yb) ** 2)

    res = fit_minibatched(
        model, loss, x, y, key=key, num_epochs=epochs, batch_size=b, lr=0.01, seed=0
    )
    # ceil(10/4)=3 steps/epoch × 3 epochs
    assert res.steps == 9
    assert res.losses.shape == (9,)
    del seen


def test_fit_minibatched_warns_on_nonfinite(capsys):
    """A diverging minibatched run must print the non-finite warning
    (post-hoc failure detection — the schedule is one compiled scan)."""
    import jax

    def bad_loss(m, k, xb, yb):
        return jnp.sum((m["w"] - yb.sum()) ** 2) * jnp.inf

    model = {"w": jnp.zeros(2)}
    x = jnp.ones((16, 2))
    y = jnp.ones(16)
    fit_minibatched(
        model, bad_loss, x, y, key=jax.random.PRNGKey(0),
        num_epochs=2, batch_size=8, lr=0.1,
    )
    assert "NON-FINITE" in capsys.readouterr().out


def test_fit_lr_backoff_recovers_from_divergence():
    """lr_backoff: a chunk that NaNs is retried from its start snapshot
    at half the lr (the lr lives in optimizer state via
    inject_hyperparams, so a halving never recompiles); the fit then
    converges where the no-backoff run aborts."""
    model = {"w": jnp.ones(1)}

    def cliffed(m, _):
        # minimum at w = 0.5; NaN cliff at w < -0.05: Adam at lr 2.0
        # overshoots straight off the cliff, at lr 1.0 it converges
        # (probed: lr 1.0 reaches loss 3e-4, lr 2.0 NaNs in chunk 1)
        w = m["w"][0]
        return (w - 0.5) ** 2 + 0.0 * jnp.sqrt(w + 0.05)

    control = fit(model, cliffed, jnp.zeros(1), lr=2.0, num_steps=60, chunk=6)
    assert not np.isfinite(np.asarray(control.losses)[-1])  # guard aborts

    res = fit(
        model, cliffed, jnp.zeros(1), lr=2.0, num_steps=60, chunk=6, lr_backoff=3
    )
    losses = np.asarray(res.losses)
    assert np.isfinite(losses).all()  # retried chunks never enter the trace
    assert res.steps == 60
    assert abs(float(res.model["w"][0]) - 0.5) < 0.1


def test_fit_lr_backoff_budget_exhausts_to_nan_guard():
    """When every halving still diverges, the guard must still stop the
    fit (no infinite retry loop), exactly like lr_backoff=0."""
    model = {"w": jnp.ones(1)}

    def always_nan(m, _):
        return jnp.sqrt(-jnp.abs(m["w"][0]))  # NaN from step 0

    res = fit(
        model, always_nan, jnp.zeros(1), lr=0.1, num_steps=40, chunk=4, lr_backoff=2
    )
    assert res.steps == 4  # one recorded (failed) chunk, then stop


def test_fit_lr_backoff_does_not_retrace():
    """The halved lr must stay a strong-typed f32 device scalar — swapping
    in a Python float changes the jit signature (weak_type) and forces a
    3-20 min axon recompile per retry, defeating the design."""
    model = {"w": jnp.ones(1)}
    calls = {"n": 0}

    def cliffed(m, _):
        calls["n"] += 1  # traces, not executions
        w = m["w"][0]
        return (w - 0.5) ** 2 + 0.0 * jnp.sqrt(w + 0.05)

    fit(model, cliffed, jnp.zeros(1), lr=2.0, num_steps=24, chunk=6, lr_backoff=3)
    # one trace for the chunk program, regardless of how many backoff
    # retries ran (4 chunks + >=1 retry all share it)
    assert calls["n"] == 1, f"chunk program retraced {calls['n']} times"


def test_fit_nan_guard_catches_mid_chunk_nonfinite():
    """A loss that goes non-finite mid-chunk and 'recovers' by the chunk's
    last step must still trip the guard (the Adam moments are already
    contaminated)."""
    model = {"w": jnp.zeros(())}

    def spiky(m, _):
        # inf exactly at step w==3 (w increments by ~1 per Adam step at
        # lr 1 from the constant-gradient loss), finite elsewhere
        w = m["w"]
        return jnp.where(jnp.abs(w - 3.0) < 0.5, jnp.inf, -w)

    res = fit(model, spiky, jnp.zeros(1), lr=1.0, num_steps=40, chunk=10)
    assert res.steps == 10  # stopped at the first chunk boundary


def test_epoch_schedule_batch_larger_than_n():
    """batch_size > n must clamp (DataLoader semantics), not crash the
    wrap-around reshape."""
    from nonstationary_precip_tpu.train.optim import _epoch_schedule

    sched = _epoch_schedule(0, n=10, num_epochs=2, batch_size=32)
    assert sched.shape == (2, 10)
    assert set(sched[0].tolist()) == set(range(10))


def test_fit_zero_steps_is_noop():
    model = {"w": jnp.ones(1)}
    res = fit(model, lambda m, _: jnp.sum(m["w"] ** 2), jnp.zeros(1), num_steps=0)
    assert res.steps == 0 and res.losses.shape == (0,)
    np.testing.assert_array_equal(np.asarray(res.model["w"]), 1.0)


def test_fit_splits_rejects_heterogeneous_masks(rng):
    import pytest

    from nonstationary_precip_tpu.train.vmapped import fit_splits
    from nonstationary_precip_tpu.models import ExactGP
    from nonstationary_precip_tpu.kernels import RBF, Scale

    x = jnp.asarray(rng.normal(size=(12, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(12,)), jnp.float32)
    models = [ExactGP.create(Scale.create(RBF.create(2))) for _ in range(2)]
    masks = [jax.tree.map(lambda _: True, m) for m in models]
    # flip one leaf of split 1's mask
    leaves, treedef = jax.tree_util.tree_flatten(masks[1])
    leaves[0] = not leaves[0]
    masks[1] = jax.tree_util.tree_unflatten(treedef, leaves)
    with pytest.raises(ValueError, match="mask differs"):
        fit_splits(
            models,
            lambda m, xx, yy: m.loss(xx, yy),
            [x, x],
            [y, y],
            masks=masks,
            lr=0.05,
            num_steps=2,
        )
