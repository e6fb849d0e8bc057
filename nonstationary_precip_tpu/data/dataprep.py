"""Data preparation: CSV ingestion and host-side transforms.

TPU-native equivalent of /root/reference/utils/dataprep.py.  All transforms
run on host in float64 (numpy/scipy) at data-prep time — Box-Cox parameter
fitting is a scipy MLE and has no business inside jit — and the resulting
arrays are shipped to device once, as a single static-shape batch.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pandas as pd
import scipy.stats
from scipy.special import inv_boxcox


def load_csv(filepath) -> np.ndarray:
    """CSV → float64 ndarray (reference ``download_data``,
    /root/reference/utils/dataprep.py:9-12).

    Uses the native single-pass reader (csrc/fastcsv.cpp via ctypes) when
    built; falls back to pandas."""
    try:
        from nonstationary_precip_tpu.data import fastcsv

        if fastcsv.available():
            return fastcsv.read_csv(filepath)
    except Exception:
        pass
    df = pd.read_csv(filepath)
    return np.asarray(df.values, dtype=np.float64)


def prep_inputs(data: np.ndarray) -> np.ndarray:
    """Standardise all-but-last columns (reference ``prep_inputs``,
    /root/reference/utils/dataprep.py:14-22)."""
    x = data[:, :-1]
    meanx = x.mean(axis=0)
    stdx = x.std(axis=0, ddof=1)
    return (x - meanx) / stdx


def load_netcdf_precip(filepath, var: str = "observation"):
    """NWS CONUS netCDF precipitation loader (the reference's
    precipitation_baselines.py:150-168 input path).  Gated: netCDF4/xarray
    are not in this image and the reference never shipped the file; raises
    a clear error unless a netCDF reader is importable."""
    try:
        import xarray as xr  # noqa: F401

        ds = xr.open_dataset(filepath)
        arr = ds[var]
        lat = ds["lat"].values.reshape(-1)
        lon = ds["lon"].values.reshape(-1)
        vals = np.asarray(arr.values, dtype=np.float64).reshape(-1)
        mask = np.isfinite(vals)
        return np.stack([lon[mask], lat[mask], vals[mask]], axis=1)
    except ImportError as e:
        raise ImportError(
            "netCDF input needs xarray/netCDF4, which this image lacks; "
            "use the CSV path (load_csv)"
        ) from e


class BoxCox(NamedTuple):
    x: np.ndarray
    y: np.ndarray
    lmbda: float

    def inverse(self, y_tr: np.ndarray) -> np.ndarray:
        return inv_boxcox(y_tr, self.lmbda)


def box_cox_transform(data: np.ndarray) -> BoxCox:
    """Standardised inputs + Box-Cox-transformed outputs (reference
    ``box_cox_transform``/``prep_outputs``, /root/reference/utils/dataprep.py:24-33).

    The fitted lambda is retained so raw-space metrics can invert the
    transform (as /root/reference/experiments/spatiotemporal_stationary.py:99-101 does).
    """
    y = data[:, -1]
    y_tr, lmbda = scipy.stats.boxcox(y)
    return BoxCox(x=prep_inputs(data), y=y_tr, lmbda=float(lmbda))


class Whitened(NamedTuple):
    x: np.ndarray
    y: np.ndarray
    meanx: np.ndarray
    stdx: np.ndarray
    meany: float
    stdy: float


def whitening_transform(data: np.ndarray) -> Whitened:
    """Zero-mean/unit-std inputs and outputs (reference
    ``whitening_transform``, /root/reference/utils/dataprep.py:35-43).

    Uses ddof=1 std to match ``torch.std_mean``'s unbiased default.
    """
    x = data[:, :-1]
    y = data[:, -1]
    meanx = x.mean(axis=0)
    stdx = x.std(axis=0, ddof=1)
    meany = float(y.mean())
    stdy = float(y.std(ddof=1))
    return Whitened((x - meanx) / stdx, (y - meany) / stdy, meanx, stdx, meany, stdy)


def train_test_split(x: np.ndarray, y: np.ndarray, train_prop: float):
    """Contiguous head/tail split (reference ``train_test_split``,
    /root/reference/utils/dataprep.py:45-52)."""
    import math

    n_train = int(math.floor(train_prop * len(x)))
    return x[:n_train], y[:n_train], x[n_train:], y[n_train:]


def shuffle_split(x: np.ndarray, y: np.ndarray, train_prop: float, seed: int):
    """Shuffled random split, the 10-seed harness used across the
    reference's benchmarks (e.g. /root/reference/experiments/spatial_exp.py:142-150).

    Uses ceil for the train count as spatial_exp.py does.
    """
    import math

    rng = np.random.default_rng(seed)
    n_train = int(math.ceil(train_prop * len(x)))
    idx = np.arange(len(x))
    rng.shuffle(idx)
    tr, te = idx[:n_train], idx[n_train:]
    return x[tr], y[tr], x[te], y[te]


def sklearn_style_shuffle(data: np.ndarray, random_state: int) -> np.ndarray:
    """Row shuffle replicating sklearn.utils.shuffle(data, random_state)
    (used by /root/reference/experiments/seard_spatial_benchmark.py:37 and
    deepgp_spatial_bench.py:49) so split membership matches the reference
    benchmarks bit-for-bit given the same random_state.
    """
    rs = np.random.RandomState(random_state)
    idx = np.arange(len(data))
    rs.shuffle(idx)
    return data[idx]
