"""Bundled Khyber / Upper-Indus-Basin benchmark dataset loaders.

The five CSVs shipped with the reference (documented in SURVEY.md §2.4):

  uib_spatial.csv / khyber_jan.csv   394 rows: lon, lat, tp
  khyber_time_series.csv             342 rows: time, tp
  uib_spatio_temporal.csv /
  khyber_2000_2010_tp.csv            5676 rows: idx, time, lon, lat, tp
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from nonstationary_precip_tpu.utils.config import DATASET_DIR


def load_uib_spatial():
    """(data_df, x[394,2](lon,lat), y[394]) — reference ``load_khyber_data``
    (/root/reference/experiments/spatial_exp.py:35-39)."""
    df = pd.read_csv(DATASET_DIR / "uib_spatial.csv", dtype=np.float64)
    arr = np.asarray(df)
    return df, arr[:, 0:2], arr[:, -1]


def load_khyber_time_series():
    """(time[342], tp[342]) monthly 1979-2007 at one Khyber point."""
    df = pd.read_csv(DATASET_DIR / "khyber_time_series.csv", dtype=np.float64)
    arr = np.asarray(df)
    return arr[:, 0], arr[:, 1]


def load_uib_spatio_temporal():
    """(data_df, x[5676,3](time,lon,lat), y[5676])."""
    df = pd.read_csv(DATASET_DIR / "uib_spatio_temporal.csv")
    arr = np.asarray(df, dtype=np.float64)
    return df, arr[:, 1:4], arr[:, -1]


def spatio_temporal_month_split():
    """Year-2000 months 1-4 train / month 5 test, standardised — the
    reference's ``load_train_test``
    (/root/reference/experiments/spatio_temporal_exp.py:36-56).

    The CSV holds 43 sites × 132 monthly steps (2000-2010), so this split
    yields 172 train rows and 43 test rows.

    Returns (x_train, y_train, x_test, y_test, meany, stdy, x_norm, y_raw).
    """
    df, _, _ = load_uib_spatio_temporal()
    df = df[df["time"] < 2001].copy()
    df["month"] = df["time"].rank(method="dense").astype("int")
    df = df[df["month"] < 6]
    arr = np.asarray(df, dtype=np.float64)
    x = arr[:, 1:4]  # time, lon, lat
    y = arr[:, -2]  # tp (last col is month)

    meanx, stdx = x.mean(axis=0), x.std(axis=0, ddof=1)
    x_norm = (x - meanx) / stdx
    meany, stdy = float(y.mean()), float(y.std(ddof=1))
    y_norm = (y - meany) / stdy

    split = int((df["month"] < 5).sum())
    return (
        x_norm[:split],
        y_norm[:split],
        x_norm[split:],
        y_norm[split:],
        meany,
        stdy,
        x_norm,
        y,
    )
