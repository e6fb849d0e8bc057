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


def test_etopo_relief_map_with_dem(tmp_path, rng):
    """Hillshaded relief + station overlay from a user-supplied DEM grid
    (the reference's plot_uib_etopo_image counterpart; Basemap's bundled
    etopo raster is replaced by a caller-provided elevation model)."""
    from nonstationary_precip_tpu.utils.plotting import etopo_relief_map

    glon = np.linspace(71, 83, 48)
    glat = np.linspace(30, 38, 32)
    gx, gy = np.meshgrid(glon, glat)
    elev = 3000 + 2000 * np.sin(gx / 2) * np.cos(gy / 1.5)  # synthetic terrain
    dem = {"elevation": elev, "lon": glon, "lat": glat}

    lon = 71 + 12 * rng.random(40)
    lat = 30 + 8 * rng.random(40)
    vals = rng.random(40)
    fig = etopo_relief_map(lon, lat, vals, dem=dem, savepath=tmp_path / "relief.png")
    assert (tmp_path / "relief.png").exists()
    assert fig is not None


def test_etopo_relief_map_npz_and_fallback(tmp_path, rng):
    from nonstationary_precip_tpu.utils.plotting import etopo_relief_map

    glon = np.linspace(71, 83, 24)
    glat = np.linspace(30, 38, 16)
    elev = rng.random((16, 24)) * 5000
    p = tmp_path / "dem.npz"
    np.savez(p, elevation=elev, lon=glon, lat=glat)
    lon = 71 + 12 * rng.random(10)
    lat = 30 + 8 * rng.random(10)
    fig = etopo_relief_map(lon, lat, rng.random(10), dem=str(p), savepath=tmp_path / "r2.png")
    assert (tmp_path / "r2.png").exists()
    # no DEM anywhere → graceful simple_plot fallback, never fabricated terrain
    fig2 = etopo_relief_map(lon, lat, rng.random(10), savepath=tmp_path / "r3.png")
    assert (tmp_path / "r3.png").exists()
    assert fig2 is not None
