"""Infrastructure: data prep, config, checkpointing, logging, kmeans, DP mesh."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nonstationary_precip_tpu.data.dataprep import (
    box_cox_transform,
    load_csv,
    shuffle_split,
    sklearn_style_shuffle,
    train_test_split,
    whitening_transform,
)
from nonstationary_precip_tpu.data.datasets import (
    load_uib_spatial,
    load_uib_spatio_temporal,
    load_khyber_time_series,
    spatio_temporal_month_split,
)
from nonstationary_precip_tpu.ops.kmeans import kmeans_inducing_points
from nonstationary_precip_tpu.train.config import ExperimentConfig
from nonstationary_precip_tpu.train.checkpoint import (
    BestCheckpointer,
    restore_pytree,
    save_pytree,
)
from nonstationary_precip_tpu.train.logging import MetricsLogger, param_table
from nonstationary_precip_tpu.utils.config import DATASET_DIR


def test_datasets_load_with_documented_shapes():
    _, x, y = load_uib_spatial()
    assert x.shape == (394, 2) and y.shape == (394,)
    t, tp = load_khyber_time_series()
    assert t.shape == (342,)
    _, xst, yst = load_uib_spatio_temporal()
    assert xst.shape == (5676, 3) and yst.shape == (5676,)


def test_spatio_temporal_month_split_shapes():
    x_tr, y_tr, x_te, y_te, meany, stdy, x_norm, y_raw = spatio_temporal_month_split()
    # 43 sites × 4 months train, × 1 month test (the CSV is 43 sites ×
    # 132 months = 5676 rows; SURVEY.md §2.4's 394×12 reading is wrong)
    assert x_tr.shape == (43 * 4, 3)
    assert x_te.shape == (43, 3)
    assert abs(x_norm.mean()) < 1e-6
    assert stdy > 0


def test_whitening_and_boxcox(rng):
    data = np.abs(rng.normal(size=(50, 3))) + 0.1
    w = whitening_transform(data)
    np.testing.assert_allclose(w.x.mean(0), 0, atol=1e-12)
    np.testing.assert_allclose(w.x.std(0, ddof=1), 1, rtol=1e-10)
    bc = box_cox_transform(data)
    np.testing.assert_allclose(bc.inverse(bc.y), data[:, -1], rtol=1e-8)


def test_splits(rng):
    x = rng.normal(size=(100, 2))
    y = rng.normal(size=100)
    xtr, ytr, xte, yte = train_test_split(x, y, 0.8)
    assert len(xtr) == 80 and len(xte) == 20
    xtr2, ytr2, xte2, yte2 = shuffle_split(x, y, 0.8, seed=1)
    assert len(xtr2) == 80
    # deterministic given seed
    xtr3, *_ = shuffle_split(x, y, 0.8, seed=1)
    np.testing.assert_array_equal(xtr2, xtr3)
    s1 = sklearn_style_shuffle(x, 3)
    s2 = sklearn_style_shuffle(x, 3)
    np.testing.assert_array_equal(s1, s2)


def test_config_parse_and_dump(tmp_path):
    cfg = ExperimentConfig(lr=0.5)
    cfg2 = cfg.parse_args(["--max_iters", "7", "--model", "Foo"])
    assert cfg2.max_iters == 7 and cfg2.model == "Foo" and cfg2.lr == 0.5
    cfg2.dump(tmp_path / "c.json")
    assert json.loads((tmp_path / "c.json").read_text())["max_iters"] == 7


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": (jnp.ones((2, 2)), jnp.asarray(3.0))}
    save_pytree(tmp_path / "ck", tree)
    like = jax.tree_util.tree_map(jnp.zeros_like, tree)
    restored = restore_pytree(tmp_path / "ck", like)
    np.testing.assert_allclose(np.asarray(restored["a"]), np.arange(5.0))
    np.testing.assert_allclose(np.asarray(restored["b"][0]), 1.0)


def test_best_checkpointer(tmp_path):
    ck = BestCheckpointer(tmp_path)
    model = {"w": jnp.ones(3)}
    assert set(ck.update(1, model, objective=1.0, rmse=0.5, nlpd=2.0)) == {
        "objective",
        "rmse",
        "nlpd",
    }
    assert ck.update(2, model, objective=2.0, rmse=0.6, nlpd=3.0) == []
    assert ck.update(3, model, objective=0.5, rmse=0.6, nlpd=3.0) == ["objective"]
    ck.save_final(3, model)
    assert (tmp_path / "final" / "meta.json").exists()


def test_metrics_logger(tmp_path):
    logger = MetricsLogger(tmp_path, name="t", use_tensorboard=False)
    logger.scalars(1, loss=0.5)
    logger.scalars(2, loss=0.25, rmse=1.0)
    logger.close()
    lines = [json.loads(l) for l in (tmp_path / "t.jsonl").read_text().splitlines()]
    assert lines[1]["rmse"] == 1.0


def test_param_table_and_masks():
    from nonstationary_precip_tpu.models import GibbsExactGP
    from nonstationary_precip_tpu.priors import LogNormalProcess

    x = jnp.zeros((5, 2))
    prior = LogNormalProcess.create(2)
    model = GibbsExactGP.create(x, prior, noise=0.01, outputscale=0.5)
    table = param_table(model, model.trainable())
    assert "log_ell" in table
    assert "Total trainable params" in table


def test_kmeans(key, rng):
    # three well-separated clusters → centroids must land near them
    centres = np.array([[0, 0], [10, 0], [0, 10.0]])
    pts = np.concatenate([c + 0.1 * rng.normal(size=(30, 2)) for c in centres])
    z = np.asarray(kmeans_inducing_points(key, jnp.asarray(pts, jnp.float64), 3, iters=20))
    d = np.linalg.norm(z[:, None, :] - centres[None], axis=-1).min(axis=0)
    assert (d < 0.5).all()


def test_dp_value_and_grad_matches_single_device(key):
    """psum-averaged DP gradients == single-device gradients of the mean loss."""
    from nonstationary_precip_tpu.models import DeepGP
    from nonstationary_precip_tpu.parallel import dp_value_and_grad, make_mesh

    n_dev = min(len(jax.devices()), 8)
    batch = 4 * n_dev
    model = DeepGP.create(key, input_dims=2, num_layers=1, num_inducing=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 2), jnp.float32)
    y = jnp.sin(x[:, 0])
    fixed = jax.random.PRNGKey(2)

    def per_shard_loss(m, xs, ys):
        # data term is a per-point mean and the KL carries global num_data,
        # so shard means psum-average to the global mean exactly
        return m.loss(fixed, xs, ys, num_data=batch, num_samples=1)

    mesh = make_mesh(n_dev)
    loss_dp, grads_dp = jax.jit(dp_value_and_grad(per_shard_loss, mesh))(model, x, y)

    # single-device oracle: mean of per-shard losses with the same keys
    losses, grads = [], []
    for s in range(n_dev):
        sl = slice(s * 4, (s + 1) * 4)
        l, g = jax.value_and_grad(per_shard_loss)(model, x[sl], y[sl])
        losses.append(l)
        grads.append(g)
    loss_ref = np.mean([float(l) for l in losses])
    grads_ref = jax.tree_util.tree_map(lambda *gs: sum(gs) / n_dev, *grads)

    np.testing.assert_allclose(float(loss_dp), loss_ref, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads_dp), jax.tree_util.tree_leaves(grads_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_sharded_prediction_matches_single_device(key, rng):
    """Test-point-sharded predictive marginals == single-device result."""
    from nonstationary_precip_tpu.kernels import RBF, Scale
    from nonstationary_precip_tpu.models import ExactGP
    from nonstationary_precip_tpu.parallel import make_mesh, sharded_marginals

    n_dev = min(len(jax.devices()), 8)
    x = rng.normal(size=(40, 2)).astype(np.float32)
    y = np.sin(x[:, 0]).astype(np.float32)
    xs = rng.normal(size=(5 * n_dev + 3, 2)).astype(np.float32)  # pad path
    model = ExactGP.create(Scale.create(RBF.create(2)), noise=0.1, mean_type="zero")
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def predict_fn(m, x_shard):
        post = m.predictive(xj, yj, x_shard)
        return post.mean, post.var

    mesh = make_mesh(n_dev)
    mean_sh, var_sh = jax.jit(sharded_marginals(predict_fn, mesh))(model, jnp.asarray(xs))

    ref = model.predictive(xj, yj, jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(mean_sh), np.asarray(ref.mean), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_sh), np.asarray(ref.var), rtol=1e-4, atol=1e-6)


def test_sharded_sgpr_matches_single_device(rng):
    """Row-sharded collapsed bound (and its grads) == dense single-device
    SGPR loss for both value and gradients."""
    from nonstationary_precip_tpu.kernels import RBF, Scale
    from nonstationary_precip_tpu.kernels.inducing import nystrom_root
    from nonstationary_precip_tpu.models.sgpr import SGPR
    from nonstationary_precip_tpu.parallel import make_mesh
    from nonstationary_precip_tpu.parallel.sharded_sgpr import (
        sharded_sgpr_value_and_grad,
    )

    n_dev = min(len(jax.devices()), 8)
    n = 8 * n_dev
    x = rng.normal(size=(n, 2)).astype(np.float32)
    y = np.sin(x[:, 0]).astype(np.float32)
    z = x[::4].copy()
    model = SGPR.create(
        Scale.create(RBF.create(2, lengthscale=1.1), outputscale=0.8), z, noise=0.1
    )
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def root_fn(m, x_s):
        k_xz = m.kernel(x_s, m.z)
        k_zz = m.kernel(m.z)
        root, _ = nystrom_root(k_xz, k_zz)
        return root

    def trace_fn(m, x_s, root):
        return m.kernel.diag(x_s) - jnp.sum(root * root, axis=-1)

    mesh = make_mesh(n_dev)
    vag = jax.jit(sharded_sgpr_value_and_grad(root_fn, trace_fn, mesh))
    loss_sh, grads_sh = vag(model, xj, yj)

    loss_ref, grads_ref = jax.value_and_grad(lambda m: m.loss(xj, yj))(model)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads_sh), jax.tree_util.tree_leaves(grads_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3, atol=2e-5)


@pytest.mark.parametrize("scale_correction", [True, False])
def test_gibbs_sparse_sharded_loss_matches_single_device(rng, scale_correction):
    """Sharded GibbsSparseGP bound == its dense loss on an 8-device mesh,
    for BOTH scale_correction semantics (the trace residual must follow
    the model's flag, not hard-code one convention)."""
    from nonstationary_precip_tpu.models import GibbsSparseGP
    from nonstationary_precip_tpu.models.gibbs_gp import gibbs_sparse_sharded_loss
    from nonstationary_precip_tpu.parallel import make_mesh
    from nonstationary_precip_tpu.priors import LogNormalProcess

    n_dev = min(len(jax.devices()), 8)
    n = 6 * n_dev
    x = rng.normal(size=(n, 2)).astype(np.float32)
    y = np.sin(x[:, 0]).astype(np.float32)
    prior = LogNormalProcess.create(2, mean=np.log(0.3), outputscale=1.0, lengthscale=1.3)
    model_base = GibbsSparseGP.create(x[::4].copy(), prior, noise=0.05, outputscale=0.7)
    model = model_base.replace(scale_correction=scale_correction)

    mesh = make_mesh(n_dev)
    loss_sh = jax.jit(gibbs_sparse_sharded_loss(mesh))(
        model, jnp.asarray(x), jnp.asarray(y)
    )
    loss_ref = model.loss(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=3e-5)


def test_load_csv_matches_pandas():
    arr = load_csv(DATASET_DIR / "uib_spatial.csv")
    assert arr.shape == (394, 3)


def test_fastcsv_cell_error_semantics(tmp_path):
    """Native reader: empty cells → NaN (pandas parity), non-numeric cells
    error out rather than silently becoming 0 — load_csv then falls back
    to pandas so both paths agree on user-supplied files."""
    from nonstationary_precip_tpu.data import fastcsv

    if not fastcsv.available():
        pytest.skip("libfastcsv not built")
    p = tmp_path / "x.csv"
    p.write_text("a,b,c\n1,,3\n4,5,6\n")
    arr = fastcsv.read_csv(p)
    assert np.isnan(arr[0, 1]) and arr[1, 2] == 6
    p.write_text("a,b\n1,garbage\n")
    with pytest.raises(ValueError):
        fastcsv.read_csv(p)
    p.write_text("a,b\n1,2junk\n")
    with pytest.raises(ValueError):
        fastcsv.read_csv(p)
    # trailing empty cell must be NaN on ITS row — the old strtod-driven
    # parser skipped the newline and stole the next line's first value
    p.write_text("a,b,c\n1,2,\n4,5,6\n")
    arr = fastcsv.read_csv(p)
    assert np.isnan(arr[0, 2]) and arr[1, 0] == 4 and arr[1, 2] == 6
    # ragged rows (too few / too many fields) error like the pandas path
    # instead of stealing across lines / silently truncating
    p.write_text("a,b,c\n1,2\n4,5,6\n")
    with pytest.raises(ValueError):
        fastcsv.read_csv(p)
    p.write_text("a,b,c\n1,2,3,4\n4,5,6\n")
    with pytest.raises(ValueError):
        fastcsv.read_csv(p)


def test_experiment_modules_import():
    import importlib

    for mod in [
        "seard_spatial",
        "spatial_gibbs",
        "spatio_temporal",
        "spatiotemporal_stationary",
        "spatiotemporal_dgp",
        "temporal",
        "deepgp_spatial",
        "precipitation_baselines",
        "sgpr_bench",
    ]:
        importlib.import_module(f"nonstationary_precip_tpu.experiments.{mod}")


def test_native_fastcsv_matches_pandas():
    import pandas as pd

    from nonstationary_precip_tpu.data import fastcsv

    if not fastcsv.available():
        import pytest

        pytest.skip("libfastcsv not built (no g++ in env)")
    for fname in ["uib_spatial.csv", "uib_spatio_temporal.csv", "khyber_time_series.csv"]:
        a = fastcsv.read_csv(DATASET_DIR / fname)
        b = np.asarray(pd.read_csv(DATASET_DIR / fname).values, dtype=np.float64)
        np.testing.assert_allclose(a, b)


def test_cli_dispatcher_lists_experiments(capsys):
    import sys

    from nonstationary_precip_tpu.__main__ import main, EXPERIMENTS

    argv = sys.argv
    sys.argv = ["prog", "list"]
    try:
        main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    for name in EXPERIMENTS:
        assert name in out


def test_sharded_cholesky_matches_single_device(rng):
    """Mesh-distributed blocked Cholesky == XLA factorisation (rows
    sharded over the 8-device virtual mesh)."""
    from nonstationary_precip_tpu.parallel import make_mesh, sharded_cholesky

    n_dev = min(len(jax.devices()), 8)
    n = 256 * n_dev
    r = rng.normal(size=(n, 64)).astype(np.float32)
    a = jnp.asarray(r @ r.T / 64 + 2.0 * np.eye(n, dtype=np.float32))
    mesh = make_mesh(n_dev)
    l_sh = jax.jit(sharded_cholesky(mesh, block=128))(a)
    l_ref = jnp.linalg.cholesky(a)
    np.testing.assert_allclose(np.asarray(l_sh), np.asarray(l_ref), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.triu(np.asarray(l_sh), 1), 0.0)


@pytest.mark.parametrize("grid", [(4, 2), (2, 4)])
def test_sharded_cholesky_2d_matches_single_device(rng, grid):
    """2-D-mesh (SUMMA-style) distributed Cholesky == XLA factorisation,
    both mesh orientations."""
    from nonstationary_precip_tpu.parallel import make_mesh_2d, sharded_cholesky_2d

    if len(jax.devices()) < grid[0] * grid[1]:
        pytest.skip("needs 8 devices")
    n = 1024
    r = rng.normal(size=(n, 64)).astype(np.float32)
    a = jnp.asarray(r @ r.T / 64 + 2.0 * np.eye(n, dtype=np.float32))
    mesh = make_mesh_2d(*grid)
    l_sh = jax.jit(sharded_cholesky_2d(mesh, block=128))(a)
    l_ref = jnp.linalg.cholesky(a)
    np.testing.assert_allclose(np.asarray(l_sh), np.asarray(l_ref), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.triu(np.asarray(l_sh), 1), 0.0)


def test_sharded_mvn_logpdf_matches_dense(rng):
    from nonstationary_precip_tpu.parallel import make_mesh
    from nonstationary_precip_tpu.parallel.distributed_chol import sharded_mvn_logpdf

    n_dev = min(len(jax.devices()), 8)
    n = 128 * n_dev
    r = rng.normal(size=(n, 64)).astype(np.float32)
    a = jnp.asarray(r @ r.T / 64 + 2.0 * np.eye(n, dtype=np.float32))
    y = jnp.asarray(np.sin(np.arange(n) / 7).astype(np.float32))
    mesh = make_mesh(n_dev)
    lp = jax.jit(sharded_mvn_logpdf(mesh, block=128))(a, y)
    import scipy.stats

    ref = scipy.stats.multivariate_normal(np.zeros(n), np.asarray(a, np.float64)).logpdf(
        np.asarray(y, np.float64)
    )
    np.testing.assert_allclose(float(lp), ref, rtol=1e-4)


def test_eval_splits_matches_per_split_loop():
    """eval_splits (one jitted vmapped program) must reproduce the eager
    per-split evaluation it replaced in the experiment drivers."""
    import numpy as np

    from nonstationary_precip_tpu.kernels import RBF, Scale
    from nonstationary_precip_tpu.models import ExactGP
    from nonstationary_precip_tpu.train import nlpd_joint, rmse_rescaled
    from nonstationary_precip_tpu.train.vmapped import eval_splits, stack_pytrees

    rng = np.random.default_rng(5)
    k = 3
    models, args = [], []
    for _ in range(k):
        xtr = jnp.asarray(rng.normal(size=(25, 2)), jnp.float32)
        ytr = jnp.asarray(rng.normal(size=(25,)), jnp.float32)
        xte = jnp.asarray(rng.normal(size=(10, 2)), jnp.float32)
        yte = jnp.asarray(rng.normal(size=(10,)), jnp.float32)
        stdy = jnp.asarray(rng.uniform(0.5, 2.0), jnp.float32)
        models.append(
            ExactGP.create(Scale.create(RBF.create(2)), noise=0.1)
        )
        args.append((xtr, ytr, xte, yte, stdy))

    def eval_one(m, xtr, ytr, xte, yte, sy):
        pred = m.predictive(xtr, ytr, xte)
        return rmse_rescaled(pred.mean, yte, sy), nlpd_joint(pred, yte, sy)

    batched_r, batched_n = eval_splits(
        stack_pytrees(models), eval_one, *tuple(zip(*args))
    )
    for i in range(k):
        r_i, n_i = eval_one(models[i], *args[i])
        assert abs(float(batched_r[i] - r_i)) < 1e-5
        assert abs(float(batched_n[i] - n_i)) < 1e-4


def test_wait_for_backend_retries_then_succeeds(monkeypatch):
    from nonstationary_precip_tpu.utils import backend

    calls = {"n": 0}

    class _Ok:
        returncode = 0

    def fake_run(*a, **k):
        calls["n"] += 1
        if calls["n"] < 3:
            raise backend.subprocess.TimeoutExpired(cmd="probe", timeout=1)
        return _Ok()

    monkeypatch.setattr(backend.subprocess, "run", fake_run)
    monkeypatch.setattr(backend.time, "sleep", lambda s: None)
    backend.wait_for_backend(max_wait_s=1e9)
    assert calls["n"] == 3


def test_wait_for_backend_gives_up(monkeypatch):
    import pytest

    from nonstationary_precip_tpu.utils import backend

    class _Bad:
        returncode = 1
        stderr = b"UNAVAILABLE: TPU backend setup/compile error"

    monkeypatch.setattr(backend.subprocess, "run", lambda *a, **k: _Bad())
    monkeypatch.setattr(backend.time, "sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        backend.wait_for_backend(max_wait_s=0.0)


def test_results_dir_env_override(monkeypatch, tmp_path):
    """NSGP_RESULTS_DIR redirects artifact output so tiny-budget smoke
    runs can't clobber the shipped full-budget results/ artifacts."""
    import importlib

    from nonstationary_precip_tpu.utils import config as cfg

    monkeypatch.setenv("NSGP_RESULTS_DIR", str(tmp_path / "alt"))
    try:
        importlib.reload(cfg)
        assert cfg.RESULTS_DIR == tmp_path / "alt"
    finally:
        monkeypatch.delenv("NSGP_RESULTS_DIR")
        importlib.reload(cfg)
    assert cfg.RESULTS_DIR.name == "results"
