"""Smoke-run every examples/ quickstart at a tiny budget.

The quickstarts are user-facing documentation; these tests keep them
from drifting as the library API evolves (the reference's only runnable
docs were its ``__main__`` demos, SURVEY.md §4 — ours are tested).
"""

import importlib.util
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).parent.parent / "examples"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_quickstart_exact_gp(capsys):
    _load("quickstart_exact_gp").main(num_steps=20)
    assert "ok" in capsys.readouterr().out


def test_quickstart_gibbs_spatial(capsys):
    _load("quickstart_gibbs_spatial").main(max_iters=5)
    assert "ok" in capsys.readouterr().out


def test_quickstart_deepgp(capsys):
    _load("quickstart_deepgp").main(num_epochs=2)
    assert "ok" in capsys.readouterr().out


def test_quickstart_cg_largen(capsys):
    _load("quickstart_cg_largen").main(n=300, num_steps=4)
    assert "ok" in capsys.readouterr().out


def test_quickstart_lazy_largen(capsys):
    _load("quickstart_lazy_largen").main(n=240, num_steps=4, block=60)
    assert "ok" in capsys.readouterr().out


def test_quickstart_gibbs_largen(capsys):
    _load("quickstart_gibbs_largen").main(
        n=192, num_steps=4, refresh=2, block=48
    )


def test_quickstart_gibbs_chunked(capsys):
    _load("quickstart_gibbs_chunked").main(n=160, num_steps=6, block=40)
    assert "ok" in capsys.readouterr().out


def test_quickstart_sharded_largen(capsys):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    _load("quickstart_sharded_largen").main(n=240, num_steps=4)
    assert "ok" in capsys.readouterr().out


def test_quickstart_dataparallel(capsys):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    _load("quickstart_dataparallel").main()
    out = capsys.readouterr().out
    assert "sharded loss matches" in out and "ok" in out
