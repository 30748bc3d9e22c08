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
