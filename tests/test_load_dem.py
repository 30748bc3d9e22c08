import os
import tempfile

import numpy as np

from horayzon_tpu import load_dem


def _write_asc(path, data, x0=600000.0, y0=180000.0, cell=25.0,
               nodata=True):
    with open(path, "w") as f:
        f.write(f"ncols {data.shape[1]}\n"
                f"nrows {data.shape[0]}\n"
                f"xllcorner {x0}\n"
                f"yllcorner {y0}\n"
                f"cellsize {cell}\n")
        if nodata:
            f.write("NODATA_value -9999\n")
        for row in data:
            f.write(" ".join(f"{v:.2f}" for v in row) + "\n")


def test_dhm25_numpy_loader_crop_and_nan():
    rng = np.random.default_rng(0)
    data = rng.uniform(200, 3000, size=(40, 50)).astype(np.float32)
    data[5, 7] = -9999.0
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "dem.asc")
        _write_asc(path, data)
        domain = {"x_min": 600000.0 + 5 * 25, "x_max": 600000.0 + 45 * 25,
                  "y_min": 180000.0 + 5 * 25, "y_max": 180000.0 + 35 * 25}
        x, y, elev = load_dem.dhm25(path, domain, engine="numpy")
        # y descending (north-up), x ascending, cell centres
        assert (np.diff(x) > 0).all() and (np.diff(y) < 0).all()
        assert x[0] - (600000.0 + 5 * 25 + 12.5) < 25
        # cropped region inside the file extent
        assert elev.shape == (len(y), len(x))
        # -9999 -> NaN (if inside the crop)
        src_rows = slice(40 - 35, 40 - 5)
        assert np.isnan(elev).sum() == (data[src_rows, 5:45] == -9999).sum()


def test_dhm25_native_parser_matches_numpy():
    try:
        from horayzon_tpu.native import fastdem
        fastdem.get_lib()
    except Exception:
        import pytest
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(1)
    data = rng.uniform(0, 100, size=(30, 30)).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "dem.asc")
        _write_asc(path, data)
        domain = {"x_min": 600000.0, "x_max": 600000.0 + 30 * 25,
                  "y_min": 180000.0, "y_max": 180000.0 + 30 * 25}
        x1, y1, e1 = load_dem.dhm25(path, domain, engine="numpy")
        assert e1.shape == (30, 30)
        # compare the native parser output directly with the written data
        vals = fastdem.load_esri_ascii(path, 6)
        np.testing.assert_allclose(vals.reshape(30, 30),
                                   np.round(data, 2), atol=5e-3)


def test_print_dem_info_runs(capsys):
    load_dem.print_dem_info(np.array([[1.0, np.nan], [3.0, 4.0]]))
    out = capsys.readouterr().out
    assert "NaN" in out


def test_crop_centres_cover_and_slices():
    """NASADEM-style centre crop: keeps centres inside the closed domain
    interval; raises when the domain is not strictly inside the mosaic."""
    import pytest

    lon = np.linspace(6.0, 8.0, 41)           # ascending
    lat = np.linspace(47.0, 45.0, 41)         # descending (north-up)
    elev = np.arange(41 * 41, dtype=np.float32).reshape(41, 41)
    dom = dict(x_min=6.5, x_max=7.5, y_min=45.5, y_max=46.5)
    e, x, y = load_dem._crop_centres(elev, lon, lat, **dom)
    assert x.min() >= 6.5 and x.max() <= 7.5
    assert y.min() >= 45.5 and y.max() <= 46.5
    assert e.shape == (len(y), len(x))
    i0 = np.flatnonzero(lat <= 46.5)[0]
    j0 = np.flatnonzero(lon >= 6.5)[0]
    np.testing.assert_array_equal(e, elev[i0:i0 + len(y), j0:j0 + len(x)])
    with pytest.raises(ValueError, match="cover"):
        load_dem._crop_centres(elev, lon, lat, 5.0, 7.0, 45.5, 46.5)


def test_nasadem_preprocess_trims_shared_margin():
    """The margin-trim hook drops exactly the duplicated edge sample and
    leaves already-trimmed tiles alone (duck-typed xarray stand-in)."""

    class FakeDs:
        def __init__(self, sizes):
            self.sizes = dict(sizes)
            self.trimmed = None

        def isel(self, **kw):
            self.trimmed = kw
            return self

    ds = FakeDs({"lon": 3601, "lat": 3601})
    out = load_dem.preprocess(ds)
    assert out.trimmed == {"lon": slice(0, 3600), "lat": slice(0, 3600)}
    ds2 = FakeDs({"lon": 3600, "lat": 3601})
    out2 = load_dem.preprocess(ds2)
    assert out2.trimmed == {"lat": slice(0, 3600)}
    ds3 = FakeDs({"lon": 3600, "lat": 3600})
    assert load_dem.preprocess(ds3).trimmed is None
