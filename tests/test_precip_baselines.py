"""End-to-end runs of the production driver incl. the resume path.

The reference's checkpoints are write-only
(/root/reference/experiments/precipitation_baselines.py:380-397); here
restore is first-class, so train → checkpoint → resume must round-trip.
"""

import json

import numpy as np

from nonstationary_precip_tpu.experiments import precipitation_baselines as pb


def _argv(tmp_path, name, extra=()):
    return [
        "--logdir", str(tmp_path),
        "--name", name,
        "--inference", "sparse",
        "--num_inducing", "20",
        "--max_iters", "20",
        "--log_interval", "10",
        "--test_interval", "10",
        "--threshold", "0",
        *extra,
    ]


def test_driver_end_to_end_and_resume(tmp_path):
    r, nl = pb.main(_argv(tmp_path, "t1"))
    assert np.isfinite(r) and np.isfinite(nl)

    run = tmp_path / "t1"
    assert (run / "config.json").exists()
    assert (run / "params.txt").exists()
    assert (run / "final" / "meta.json").exists()
    assert (run / "best" / "meta.json").exists()  # objective improves from init
    # JSONL observability: scalar records at each chunk boundary
    recs = [json.loads(l) for l in (run / "train.jsonl").read_text().splitlines()]
    assert any("rmse" in rec for rec in recs)
    assert all("objective" in rec for rec in recs)

    # resume from the final checkpoint: training continues from the saved
    # state, so the first recorded objective of t2 must be ~the last of t1
    r2, nl2 = pb.main(_argv(tmp_path, "t2", ["--resume", str(run / "final")]))
    assert np.isfinite(r2)
    recs2 = [json.loads(l) for l in (tmp_path / "t2" / "train.jsonl").read_text().splitlines()]
    first_resumed = recs2[0]["objective"]
    last_original = recs[-1]["objective"]
    assert abs(first_resumed - last_original) < 0.5 * abs(last_original) + 0.1


def test_driver_censored_split(tmp_path):
    r, nl = pb.main(_argv(tmp_path, "t3", ["--test_type", "censored"]))
    assert np.isfinite(r) and np.isfinite(nl)
