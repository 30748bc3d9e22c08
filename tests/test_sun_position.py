import numpy as np

from horayzon_tpu import sun_position, transform


def test_declination_at_solstices_and_equinox():
    _, dec_jun, _, _ = sun_position.sun_ra_dec(["2026-06-21T12:00:00"])
    _, dec_dec, _, _ = sun_position.sun_ra_dec(["2026-12-21T12:00:00"])
    _, dec_mar, _, _ = sun_position.sun_ra_dec(["2026-03-20T12:00:00"])
    assert abs(np.rad2deg(dec_jun[0]) - 23.44) < 0.1
    assert abs(np.rad2deg(dec_dec[0]) + 23.44) < 0.1
    assert abs(np.rad2deg(dec_mar[0])) < 0.5


def test_sun_distance_near_one_au():
    _, _, r, _ = sun_position.sun_ra_dec(["2026-07-04T00:00:00"])
    # aphelion ~1.017 AU
    assert abs(r[0] / sun_position.AU - 1.0167) < 0.002
    _, _, r, _ = sun_position.sun_ra_dec(["2026-01-03T00:00:00"])
    assert abs(r[0] / sun_position.AU - 0.9833) < 0.002


def test_azimuth_elevation_sanity():
    # Equator, equinox, ~solar noon (true solar time ~ UTC at lon 0):
    az, el = sun_position.sun_azimuth_elevation(["2026-03-20T12:07:00"],
                                                lon=0.0, lat=0.0)
    assert el[0] > 85.0
    # Mid-northern latitude, local noon: sun due south
    az, el = sun_position.sun_azimuth_elevation(["2026-06-21T12:00:00"],
                                                lon=0.0, lat=50.0)
    assert 150.0 < az[0] < 210.0
    assert 55.0 < el[0] < 70.0
    # Midnight: below horizon
    az, el = sun_position.sun_azimuth_elevation(["2026-06-21T00:00:00"],
                                                lon=0.0, lat=50.0)
    assert el[0] < 0.0


def test_sun_position_enu_consistent_with_az_el():
    trans = transform.TransformerEcef2enu(7.5, 46.5, "WGS84")
    t = ["2026-06-21T12:00:00"]
    enu = sun_position.sun_position_enu(t, trans)
    az_expect, el_expect = sun_position.sun_azimuth_elevation(
        t, lon=7.5, lat=46.5)
    v = enu[0] / np.linalg.norm(enu[0])
    el_enu = np.rad2deg(np.arcsin(v[2]))
    az_enu = np.rad2deg(np.arctan2(v[0], v[1])) % 360.0
    # ENU route includes Earth-centre offset/parallax; ~0.1 deg agreement
    assert abs(el_enu - el_expect[0]) < 0.2
    assert abs((az_enu - az_expect[0] + 180) % 360 - 180) < 0.2


def test_sun_position_planar_geometry():
    p = sun_position.sun_position_planar([90.0], [30.0], dist=1000.0)
    assert np.allclose(p[0], [1000 * np.cos(np.deg2rad(30)), 0.0,
                              1000 * np.sin(np.deg2rad(30))], atol=1e-3)
