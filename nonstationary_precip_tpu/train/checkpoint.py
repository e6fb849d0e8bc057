"""Checkpointing: Orbax pytree checkpoints with save *and* restore.

The reference only ever writes checkpoints — dill'd whole models and
rolling best.tar/best_rmse.tar/best_nlpd.tar/final.tar with optimizer
state (precipitation_baselines.py:248,323-341,380-397) — and implements no
resume path.  Here both directions exist: any model/opt-state pytree saves
through Orbax (falling back to npz-of-leaves when Orbax is unavailable),
and ``BestCheckpointer`` reproduces the rolling best-objective/best-RMSE/
best-NLPD triple.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Any

import jax
import numpy as np


def save_pytree(path, tree: Any):
    """Save a pytree of arrays; Orbax when available, npz fallback."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.absolute(), tree, force=True)
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(str(path) + ".npz", *[np.asarray(l) for l in leaves])
    with open(str(path) + ".treedef.pkl", "wb") as fh:
        pickle.dump(treedef, fh)


def restore_pytree(path, like: Any) -> Any:
    """Restore a pytree saved by ``save_pytree``; ``like`` provides the
    structure (and dtypes for Orbax's typed restore)."""
    path = Path(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path.absolute(), target=like)
    except Exception:
        pass
    data = np.load(str(path) + ".npz")
    leaves = [data[k] for k in data.files]
    treedef = jax.tree_util.tree_structure(like)
    like_leaves = jax.tree_util.tree_leaves(like)
    leaves = [
        np.asarray(l, dtype=np.asarray(ll).dtype) for l, ll in zip(leaves, like_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


class BestCheckpointer:
    """Rolling best-objective / best-RMSE / best-NLPD checkpoints
    (the reference's best.tar / best_rmse.tar / best_nlpd.tar,
    precipitation_baselines.py:323-341,380-386)."""

    def __init__(self, logdir):
        self.dir = Path(logdir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.best = {"objective": np.inf, "rmse": np.inf, "nlpd": np.inf}

    def update(self, step: int, model, opt_state=None, **metrics) -> list:
        """Save under each metric that improved; returns which did."""
        improved = []
        for key in self.best:
            if key in metrics and float(metrics[key]) < self.best[key]:
                self.best[key] = float(metrics[key])
                tag = "best" if key == "objective" else f"best_{key}"
                save_pytree(self.dir / tag / "model", model)
                if opt_state is not None:
                    save_pytree(self.dir / tag / "opt_state", opt_state)
                (self.dir / tag / "meta.json").write_text(
                    json.dumps({"step": step, **{k: float(v) for k, v in metrics.items()}})
                )
                improved.append(key)
        return improved

    def save_final(self, step: int, model, opt_state=None):
        save_pytree(self.dir / "final" / "model", model)
        if opt_state is not None:
            save_pytree(self.dir / "final" / "opt_state", opt_state)
        (self.dir / "final" / "meta.json").write_text(json.dumps({"step": step}))
