import numpy as np
import pytest

from horayzon_tpu import geoid


def test_grid_sample_bilinear():
    g = geoid.GeoidGrid(
        lat=np.array([0.0, 1.0, 2.0]),
        lon=np.array([10.0, 11.0, 12.0]),
        values=np.arange(9.0).reshape(3, 3))
    # exact nodes
    out = g.sample(np.array([10.0, 12.0]), np.array([0.0, 2.0]))
    np.testing.assert_allclose(out, [[0.0, 2.0], [6.0, 8.0]])
    # centre of the first cell = mean of its 4 corners
    mid = g.sample(np.array([10.5]), np.array([0.5]))
    np.testing.assert_allclose(mid, [[2.0]])
    # descending-latitude queries work without flipping
    out_desc = g.sample(np.array([10.0]), np.array([2.0, 0.0]))
    np.testing.assert_allclose(out_desc, [[6.0], [0.0]])
    # clamped outside the grid
    np.testing.assert_allclose(
        g.sample(np.array([9.0]), np.array([-1.0])), [[0.0]])


def test_undulation_validation():
    with pytest.raises(NotImplementedError, match="not supported"):
        geoid.undulation([0.0], [0.0], geoid="EGM2008")
    with pytest.raises(ValueError, match="coverage"):
        geoid.undulation([181.0], [0.0])
    with pytest.raises(ValueError, match="coverage"):
        geoid.undulation([-150.0], [48.0], geoid="GEOID12A")
    with pytest.raises(ValueError, match="monotonically increasing"):
        geoid.undulation([1.0, 0.0], [0.0, 1.0])
    with pytest.raises(ValueError, match="monotonic"):
        geoid.undulation([0.0, 1.0], [0.0, 2.0, 1.0])


def test_undulation_from_cached_grid(monkeypatch):
    """EGM96 longitude wrap: the grid is stored 0..360, queries come in
    [-180, 180] — a synthetic grid with values = native longitude must
    return the wrapped longitude at negative query lons."""
    lon = np.linspace(0.0, 360.0, 145)
    lat = np.linspace(-90.0, 90.0, 73)
    vals = np.broadcast_to(lon, (lat.size, lon.size)).copy()
    monkeypatch.setitem(geoid._GRID_CACHE, "EGM96",
                        geoid.GeoidGrid(lat=lat, lon=lon, values=vals))
    out = geoid.undulation(np.array([-90.0, 0.0, 90.0]),
                           np.array([10.0, -45.0]))
    np.testing.assert_allclose(out, [[270.0, 0.0, 90.0]] * 2)
    # descending latitude axis returns rows in the requested order
    out_desc = geoid.undulation(np.array([45.0]), np.array([30.0, -30.0]))
    np.testing.assert_allclose(out_desc, [[45.0], [45.0]])
