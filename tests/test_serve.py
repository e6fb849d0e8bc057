"""Batch-inference CLI (nonstationary_precip_tpu.serve): fit → save →
restore → serve round-trips for each model family at tiny budgets."""

import numpy as np
import pytest

from nonstationary_precip_tpu import serve


def _args(tmp_path, model, extra=()):
    return [
        "--model", model,
        "--output", str(tmp_path / f"{model}.csv"),
        *extra,
    ]


def _read(path):
    return np.loadtxt(path, delimiter=",", skiprows=1)


@pytest.mark.parametrize(
    "model,extra",
    [
        ("seard", ["--max_iters", "20"]),
        ("gibbs_exact", ["--max_iters", "5"]),
        ("gibbs_sparse", ["--max_iters", "5", "--num_inducing", "30"]),
        ("mv_gibbs", ["--max_iters", "5"]),
        ("mv_gibbs_sparse", ["--max_iters", "5", "--num_inducing", "30"]),
        ("deepgp", ["--num_epochs", "2", "--num_inducing", "16"]),
    ],
)
def test_serve_fits_and_writes(tmp_path, model, extra):
    mean, std = serve.main(_args(tmp_path, model, extra))
    out = _read(tmp_path / f"{model}.csv")
    assert out.shape == (394, 4)  # lon, lat, pred_mean, pred_std
    assert np.isfinite(out).all()
    assert (out[:, 3] > 0).all()  # predictive std strictly positive
    np.testing.assert_allclose(out[:, 2], mean, rtol=1e-6)


def test_serve_checkpoint_roundtrip(tmp_path):
    ckpt = str(tmp_path / "ckpt" / "seard")
    mean_fit, _ = serve.main(
        _args(tmp_path, "seard", ["--max_iters", "20", "--save_checkpoint", ckpt])
    )
    mean_restored, _ = serve.main(
        _args(tmp_path, "seard", ["--checkpoint", ckpt])
    )
    np.testing.assert_allclose(mean_restored, mean_fit, rtol=1e-6)


def test_serve_deepgp_checkpoint_roundtrip(tmp_path):
    """DeepGP restore exercises the full nested-pytree checkpoint path
    (layers tuple + head + likelihood) and the stochastic predict must be
    reproducible given the same key."""
    ckpt = str(tmp_path / "ckpt" / "deepgp")
    extra = ["--num_epochs", "2", "--num_inducing", "16"]
    mean_fit, _ = serve.main(
        _args(tmp_path, "deepgp", [*extra, "--save_checkpoint", ckpt])
    )
    mean_restored, _ = serve.main(
        _args(tmp_path, "deepgp", [*extra, "--checkpoint", ckpt])
    )
    np.testing.assert_allclose(mean_restored, mean_fit, rtol=1e-6)


def test_serve_points_csv(tmp_path):
    pts = tmp_path / "pts.csv"
    pts.write_text("lon,lat\n73.0,35.0\n74.5,36.0\n75.5,34.5\n")
    mean, std = serve.main(
        _args(tmp_path, "seard", ["--max_iters", "20", "--points_csv", str(pts)])
    )
    assert mean.shape == (3,) and std.shape == (3,)
    out = _read(tmp_path / "seard.csv")
    assert out.shape == (3, 4)
    np.testing.assert_allclose(out[:, 0], [73.0, 74.5, 75.5])


@pytest.mark.parametrize(
    "model,extra",
    [
        ("st_stationary", ["--max_iters", "5"]),
        ("st_nonstationary", ["--max_iters", "5", "--num_inducing", "30"]),
    ],
)
def test_serve_spatio_temporal(tmp_path, model, extra):
    from nonstationary_precip_tpu.data.dataprep import load_csv
    from nonstationary_precip_tpu.utils.config import DATASET_DIR

    # first 4 months of the cube (43 sites × 4) — exact-GP-sized
    cube = load_csv(DATASET_DIR / "uib_spatio_temporal.csv")[: 43 * 4]
    small = tmp_path / "st_small.csv"
    np.savetxt(
        small, cube, delimiter=",", header="idx,time,lon,lat,tp", comments=""
    )
    mean, std = serve.main(
        _args(
            tmp_path,
            model,
            ["--train_csv", str(small), "--x_cols", "1,2,3", "--y_col", "4", *extra],
        )
    )
    out = _read(tmp_path / f"{model}.csv")
    assert out.shape == (43 * 4, 5)  # time, lon, lat, pred_mean, pred_std
    assert np.isfinite(out).all()
    assert (out[:, 4] > 0).all()


def test_serve_matrixfree_gibbs(tmp_path):
    """--matrixfree true routes the exact Gibbs family through the
    matrix-free CG path (loss_matrixfree / posterior_matrixfree): finite
    raw-unit predictions, positive stds, and means consistent with the
    dense serve at the same tiny budget — same MAP estimand, different
    solver (truncated mBCG + stochastic logdet vs Cholesky)."""
    extra = ["--max_iters", "5"]
    mean_dense, _ = serve.main(_args(tmp_path, "gibbs_exact", extra))
    mean_mf, _ = serve.main(
        _args(
            tmp_path,
            "gibbs_exact",
            [*extra, "--matrixfree", "true", "--precond_rank", "32"],
        )
    )
    out = _read(tmp_path / "gibbs_exact.csv")
    assert out.shape == (394, 4)  # lon, lat, pred_mean, pred_std
    assert np.isfinite(out).all()
    assert (out[:, 3] > 0).all()
    corr = np.corrcoef(np.asarray(mean_dense), np.asarray(mean_mf))[0, 1]
    assert corr > 0.95, corr


def test_serve_chunked_matrixfree_gibbs(tmp_path, capsys):
    """--chunked true routes fit AND predict through the host-chunked
    drivers (fit_chunked + chunked posterior state, DESIGN §27-28) —
    the product path for N past the execution wall, exercised tiny:
    finite raw-unit output, convergence evidence printed, means
    consistent with the plain matrix-free serve."""
    extra = ["--max_iters", "5", "--precond_rank", "32"]
    mean_mf, _ = serve.main(
        _args(tmp_path, "gibbs_exact", [*extra, "--matrixfree", "true"])
    )
    mean_ck, _ = serve.main(
        _args(
            tmp_path,
            "gibbs_exact",
            [*extra, "--matrixfree", "true", "--chunked", "true",
             "--chunk_iters", "8", "--n_chunks", "4"],
        )
    )
    out = _read(tmp_path / "gibbs_exact.csv")
    assert out.shape == (394, 4)
    assert np.isfinite(out).all()
    assert (out[:, 3] > 0).all()
    logs = capsys.readouterr().out
    assert "chunked fit" in logs and "relres" in logs
    corr = np.corrcoef(np.asarray(mean_mf), np.asarray(mean_ck))[0, 1]
    assert corr > 0.95, corr


def test_serve_matrixfree_rejected_for_other_models(tmp_path):
    with pytest.raises(SystemExit, match="matrixfree"):
        serve.main(_args(tmp_path, "seard", ["--matrixfree", "true"]))


def test_serve_rejects_unknown_model(tmp_path):
    with pytest.raises(SystemExit):
        serve.main(_args(tmp_path, "nonsense"))


def test_serve_refuses_nonfinite_predictions(tmp_path, monkeypatch):
    """A diverged fit must exit nonzero, not write NaN CSVs."""

    def nan_predict(name, model, train_x, train_y, pts, key, **kw):
        import jax.numpy as jnp

        n = pts.shape[0]
        return jnp.full((n,), jnp.nan), jnp.ones((n,))

    monkeypatch.setattr(serve, "_predict", nan_predict)
    out = tmp_path / "seard.csv"
    with pytest.raises(SystemExit, match="non-finite"):
        serve.main(_args(tmp_path, "seard", ["--max_iters", "2"]))
    assert not out.exists()


def test_run_benchmarks_pathology_autoretry(monkeypatch, tmp_path):
    """A row whose wallclock trips the 4x-calm flag is rerun once and the
    faster wallclock recorded; fast rows run exactly once."""
    import json
    import sys
    import time

    sys.path.insert(0, str(serve.Path(__file__).parent.parent))
    # importing run_benchmarks is side-effect-free by design (its process
    # config happens in main(); a past import-time NSGP_AOT_DIR leak let
    # CPU tests write unreliable XLA:CPU pins)
    import run_benchmarks as rb

    monkeypatch.setattr(rb, "RESULTS", tmp_path / "r.json")
    monkeypatch.setitem(
        rb.EXPECTED_BANDS, "fake_row", {"rmse": 1.0, "nlpd": 1.0, "calm_s": 0.02}
    )
    calls = {"n": 0}

    def slow_then_fast(argv):
        calls["n"] += 1
        if calls["n"] == 1:
            time.sleep(0.2)  # > 4 x calm_s = 0.08 s → pathological
        return 0.5, 0.5

    rb.run("fake_row", slow_then_fast, [])
    assert calls["n"] == 2
    entry = json.loads((tmp_path / "r.json").read_text())["fake_row"]
    assert entry["wallclock_s"] < 0.2 and "wallclock_note" not in entry

    calls["n"] = 10  # any call is now fast
    rb.run("fake_row", slow_then_fast, [])
    assert calls["n"] == 11  # no retry


def test_serve_diverged_fit_never_saves_checkpoint(tmp_path, monkeypatch):
    """The finite-prediction gate must also protect --save_checkpoint: a
    diverged fit that exits nonzero may not leave a NaN checkpoint behind
    for a later --checkpoint run to restore."""

    def nan_predict(name, model, train_x, train_y, pts, key, **kw):
        import jax.numpy as jnp

        n = pts.shape[0]
        return jnp.full((n,), jnp.nan), jnp.ones((n,))

    monkeypatch.setattr(serve, "_predict", nan_predict)
    ckpt = tmp_path / "ckpt" / "seard"
    with pytest.raises(SystemExit, match="non-finite"):
        serve.main(
            _args(
                tmp_path,
                "seard",
                ["--max_iters", "2", "--save_checkpoint", str(ckpt)],
            )
        )
    assert not ckpt.exists() and not ckpt.with_suffix(".npz").exists()


def test_serve_chunked_predict_matches_unchunked():
    """Large query grids are served in fixed-size chunks (bounding device
    memory at O(chunk²) instead of the full N*×N* joint covariance); the
    chunked marginals must match the single-program ones."""
    import jax.numpy as jnp
    import numpy as np

    from nonstationary_precip_tpu.kernels import RBF, Scale
    from nonstationary_precip_tpu.models import ExactGP

    rng = np.random.default_rng(0)
    tx = jnp.asarray(rng.normal(size=(40, 2)), jnp.float32)
    ty = jnp.asarray(rng.normal(size=(40,)), jnp.float32)
    pts = jnp.asarray(rng.normal(size=(53, 2)), jnp.float32)  # 53 = 3×16+5 (ragged tail)
    model = ExactGP.create(Scale.create(RBF.create(2)), mean_type="constant")

    m_full, v_full = serve._predict("seard", model, tx, ty, pts, None, chunk=4096)
    m_chunk, v_chunk = serve._predict("seard", model, tx, ty, pts, None, chunk=16)
    np.testing.assert_allclose(np.asarray(m_chunk), np.asarray(m_full), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(v_chunk), np.asarray(v_full), rtol=2e-5, atol=2e-6)


def test_run_benchmarks_retry_failure_keeps_first_run(monkeypatch, tmp_path):
    """If the pathology retry itself raises (e.g. the service degrades
    into a full outage between the runs), the first run's valid metrics
    must be recorded, not discarded as a row failure."""
    import json
    import sys
    import time

    sys.path.insert(0, str(serve.Path(__file__).parent.parent))
    import run_benchmarks as rb

    monkeypatch.setattr(rb, "RESULTS", tmp_path / "r.json")
    monkeypatch.setitem(
        rb.EXPECTED_BANDS, "fake_row", {"rmse": 1.0, "nlpd": 1.0, "calm_s": 0.02}
    )
    calls = {"n": 0}

    def slow_then_raise(argv):
        calls["n"] += 1
        if calls["n"] == 1:
            time.sleep(0.2)  # trips the 4x-calm pathology flag
            return 0.5, 0.5
        raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")

    rb.run("fake_row", slow_then_raise, [])
    assert calls["n"] == 2
    entry = json.loads((tmp_path / "r.json").read_text())["fake_row"]
    assert entry["rmse"] == 0.5 and "error" not in entry
    assert "wallclock_note" in entry  # still flagged as pathological
