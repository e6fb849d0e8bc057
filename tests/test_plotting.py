"""Plotting smoke tests (Agg backend, no cartopy required)."""

import numpy as np

from nonstationary_precip_tpu.utils.plotting import (
    facetgrid_plot,
    lengthscale_map,
    simple_plot,
)


def test_simple_plot(tmp_path, rng):
    lon = 71 + 12 * rng.random(50)
    lat = 30 + 8 * rng.random(50)
    vals = rng.random(50)
    fig = simple_plot(lon, lat, vals, title="tp", savepath=tmp_path / "f.png")
    assert (tmp_path / "f.png").exists()
    assert fig is not None


def test_facetgrid_plot(tmp_path, rng):
    lon = 71 + 12 * rng.random(43)
    lat = 30 + 8 * rng.random(43)
    months = [rng.random(43) * 7 for _ in range(5)]
    fig = facetgrid_plot(lon, lat, months, suptitle="Ground Truth", savepath=tmp_path / "g.png")
    assert (tmp_path / "g.png").exists()
    assert fig is not None


def test_lengthscale_map(tmp_path, rng):
    lon = 71 + 12 * rng.random(30)
    lat = 30 + 8 * rng.random(30)
    ell = np.exp(rng.normal(size=(30, 2)))
    fig = lengthscale_map(lon, lat, ell, savepath=tmp_path / "l.png")
    assert (tmp_path / "l.png").exists()
    assert fig is not None
