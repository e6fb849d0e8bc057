"""Observability: JSONL metric stream, TensorBoard scalars, param tables.

Mirrors the reference's logging surface (SURVEY.md §5): stdout iteration
prints, TensorBoard scalars/figures (precipitation_baselines.py:256-377),
and PrettyTable parameter listings (utils/metrics.py:11-34) — rebuilt as:

  * ``MetricsLogger``  — JSONL (always) + tensorboardX (if importable);
  * ``param_table``    — parameter name/shape/#elements table from any
    model pytree, with trainability flags from a mask;
  * ``trainable_param_names`` — the reference helper, pytree edition.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from nonstationary_precip_tpu.utils.struct import path_leaves


class MetricsLogger:
    """Append-only JSONL metric log with optional TensorBoard mirroring."""

    def __init__(self, logdir, name: str = "run", use_tensorboard: bool = True):
        self.dir = Path(logdir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / f"{name}.jsonl"
        self._fh = open(self.path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(logdir=str(self.dir / "tb" / name))
            except Exception:
                self._tb = None

    def scalars(self, step: int, **values):
        rec = {"step": int(step), "time": time.time()}
        for k, v in values.items():
            rec[k] = float(np.asarray(v))
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, float(np.asarray(v)), step)

    def figure(self, step: int, tag: str, fig):
        if self._tb is not None:
            self._tb.add_figure(tag, fig, step)
        # close regardless: without tensorboardX the figure would otherwise
        # accumulate in pyplot's manager every plot-interval callback
        try:
            import matplotlib.pyplot as plt

            plt.close(fig)
        except Exception:
            pass

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


def trainable_param_names(model, mask=None):
    """Names of trainable leaves (reference ``get_trainable_param_names``,
    utils/metrics.py:27-34)."""
    names = []
    mask_leaves = None
    if mask is not None:
        mask_leaves = [m for _, m in path_leaves(mask)]
    for i, (name, leaf) in enumerate(path_leaves(model)):
        if mask_leaves is not None and not bool(np.asarray(mask_leaves[i]).all()):
            continue
        names.append(name)
    return names


def param_table(model, mask=None) -> str:
    """Formatted parameter table (reference ``print_trainable_param_names``,
    utils/metrics.py:11-24) — no PrettyTable dependency."""
    rows = []
    total = 0
    mask_leaves = None
    if mask is not None:
        mask_leaves = [m for _, m in path_leaves(mask)]
    for i, (name, leaf) in enumerate(path_leaves(model)):
        trainable = True
        if mask_leaves is not None:
            trainable = bool(np.asarray(mask_leaves[i]).all())
        size = int(np.prod(np.asarray(jax.numpy.shape(leaf)) if hasattr(leaf, "shape") else 1))
        if trainable:
            total += size
        rows.append((name, str(getattr(leaf, "shape", ())), size, trainable))
    width = max((len(r[0]) for r in rows), default=10) + 2
    lines = [f"{'Parameter':<{width}}{'shape':<16}{'#':<10}trainable"]
    lines.append("-" * (width + 36))
    for name, shape, size, tr in rows:
        lines.append(f"{name:<{width}}{shape:<16}{size:<10}{tr}")
    lines.append(f"Total trainable params: {total}")
    return "\n".join(lines)
