import numpy as np
import pytest

from horayzon_tpu import transform, direction, domain


def test_lonlat2ecef_sphere_equator():
    x, y, z = transform.lonlat2ecef(np.array([0.0]), np.array([0.0]),
                                    np.array([0.0], dtype=np.float32),
                                    "sphere")
    assert np.isclose(x[0], 6370997.0)
    assert np.isclose(y[0], 0.0)
    assert np.isclose(z[0], 0.0)


def test_lonlat2ecef_wgs84_pole():
    x, y, z = transform.lonlat2ecef(np.array([0.0]), np.array([90.0]),
                                    np.array([0.0], dtype=np.float32),
                                    "WGS84")
    b = 6378137.0 * (1.0 - 1.0 / 298.257223563)
    assert np.isclose(z[0], b)
    assert abs(x[0]) < 1e-6


def test_ecef2enu_origin_maps_to_zero():
    t = transform.TransformerEcef2enu(7.5, 46.5, "WGS84")
    x, y, z = transform.ecef2enu(np.array([t.x_ecef_or]),
                                 np.array([t.y_ecef_or]),
                                 np.array([t.z_ecef_or]), t)
    assert np.allclose([x[0], y[0], z[0]], 0.0, atol=1e-3)


def test_ecef2enu_roundtrip():
    t = transform.TransformerEcef2enu(7.5, 46.5, "WGS84")
    lon = np.linspace(7.0, 8.0, 5)
    lat = np.linspace(46.0, 47.0, 5)
    h = np.linspace(0, 3000, 5).astype(np.float32)
    xe, ye, ze = transform.lonlat2ecef(lon, lat, h, "WGS84")
    x, y, z = transform.ecef2enu(xe, ye, ze, t)
    xb, yb, zb = transform.enu2ecef(x, y, z, t)
    assert np.allclose(xb, xe, atol=1.0)
    assert np.allclose(yb, ye, atol=1.0)
    assert np.allclose(zb, ze, atol=1.0)


def test_ecef2enu_vector_unit_norm_preserved():
    t = transform.TransformerEcef2enu(7.5, 46.5, "sphere")
    vec = direction.surf_norm(np.array([7.5]), np.array([46.5]))
    out = transform.ecef2enu_vector(vec, t)
    # Surface normal at the ENU origin must be (0, 0, 1)
    assert np.allclose(out, [0.0, 0.0, 1.0], atol=1e-6)


def test_swiss_roundtrip():
    lon = np.array([7.0, 8.5])
    lat = np.array([46.2, 47.0])
    h = np.array([500.0, 1500.0], dtype=np.float32)
    e, n, h_ch = transform.wgs2swiss(lon, lat, h)
    lon2, lat2, h2 = transform.swiss2wgs(e, n, h_ch.astype(np.float32))
    assert np.allclose(lon2, lon, atol=2e-4)
    assert np.allclose(lat2, lat, atol=2e-4)
    assert np.allclose(h2, h, atol=0.5)


def test_rotation_matrix_glob2loc_shape_and_rows():
    vec_north = np.zeros((4, 5, 3), dtype=np.float32)
    vec_north[..., 1] = 1.0
    vec_norm = np.zeros((4, 5, 3), dtype=np.float32)
    vec_norm[..., 2] = 1.0
    rot = transform.rotation_matrix_glob2loc(vec_north, vec_norm)
    assert rot.shape == (6, 7, 3, 3)
    assert np.isnan(rot[0, 0]).all()
    assert np.allclose(rot[1, 1], np.eye(3))


def test_surf_norm_unit_and_direction():
    lon = np.array([0.0, 90.0, 0.0])
    lat = np.array([0.0, 0.0, 90.0])
    v = direction.surf_norm(lon, lat)
    assert np.allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-6)
    assert np.allclose(v[0], [1, 0, 0], atol=1e-6)
    assert np.allclose(v[1], [0, 1, 0], atol=1e-6)
    assert np.allclose(v[2], [0, 0, 1], atol=1e-6)


def test_north_dir_orthogonal_unit():
    lon = np.linspace(-120, 120, 7)
    lat = np.linspace(-60, 60, 7)
    v_norm = direction.surf_norm(lon, lat)
    x, y, z = transform.lonlat2ecef(lon, lat,
                                    np.zeros(7, dtype=np.float32), "WGS84")
    v_north = direction.north_dir(x, y, z, v_norm, "WGS84")
    assert np.allclose(np.linalg.norm(v_north, axis=-1), 1.0, atol=1e-6)
    dots = np.sum(v_north * v_norm, axis=-1)
    assert np.allclose(dots, 0.0, atol=1e-6)
    # Northern component of the north vector must be positive (z grows north
    # in the northern hemisphere ECEF too for |lat| < 90)
    assert (v_north[:, 2] > 0).all()


def test_domain_planar():
    d = domain.planar_grid({"x_min": 0.0, "x_max": 100.0,
                            "y_min": 0.0, "y_max": 50.0}, dist_search=2.0)
    assert d["x_min"] == -2000.0 and d["x_max"] == 2100.0
    assert d["y_min"] == -2000.0 and d["y_max"] == 2050.0


def test_domain_curved_sphere():
    d = domain.curved_grid({"lon_min": 7.0, "lon_max": 8.0,
                            "lat_min": 46.0, "lat_max": 47.0},
                           dist_search=50.0, ellps="sphere")
    # Meridian shift on a sphere: dist / R in degrees
    dlat = np.rad2deg(50000.0 / 6370997.0)
    assert np.isclose(d["lat_max"], 47.0 + dlat, atol=1e-6)
    assert np.isclose(d["lat_min"], 46.0 - dlat, atol=1e-6)
    assert d["lon_min"] < 7.0 and d["lon_max"] > 8.0


def test_domain_curved_invalid():
    with pytest.raises(ValueError):
        domain.curved_grid({"lon_min": 8.0, "lon_max": 7.0,
                            "lat_min": 46.0, "lat_max": 47.0})
