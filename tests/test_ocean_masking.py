import numpy as np

from horayzon_tpu import ocean_masking, transform


def _island_mask(n=60):
    lat = -54.0 + np.arange(n) * 0.01
    lon = -37.0 + np.arange(n) * 0.01
    lon2, lat2 = np.meshgrid(lon, lat)
    land = ((lon2 + 36.7) ** 2 + (lat2 + 53.7) ** 2) < 0.04
    return lon, lat, land


def test_coastline_contours_points_near_boundary():
    lon, lat, land = _island_mask()
    contours = ocean_masking.coastline_contours(lon, lat,
                                                land.astype(np.uint8))
    assert len(contours) >= 1
    pts = np.vstack(contours)
    # Every contour point lies within one cell of a land/sea transition
    assert pts.shape[1] == 2
    assert pts[:, 0].min() >= lon.min() and pts[:, 0].max() <= lon.max()
    # The island's circular boundary has radius ~0.2 around (-36.7, -53.7)
    r = np.hypot(pts[:, 0] + 36.7, pts[:, 1] + 53.7)
    assert (np.abs(r - 0.2) < 0.03).mean() > 0.9


def test_coastline_distance_and_buffer():
    lon, lat, land = _island_mask()
    contours = ocean_masking.coastline_contours(lon, lat,
                                                land.astype(np.uint8))
    pts = np.vstack(contours)
    pex, pey, pez = transform.lonlat2ecef(
        pts[:, 0], pts[:, 1], np.zeros(len(pts), np.float32), "WGS84")
    pts_ecef = np.stack([pex, pey, pez], axis=-1)
    lon2, lat2 = np.meshgrid(lon, lat)
    xe, ye, ze = transform.lonlat2ecef(lon2, lat2,
                                       np.zeros_like(lon2, np.float32),
                                       "WGS84")
    dist = ocean_masking.coastline_distance(xe, ye, ze, land, pts_ecef)
    assert np.isnan(dist[land]).all()
    assert np.nanmin(dist) >= 0.0
    # far ocean corners are > 10 km from the island
    assert dist[0, 0] > 10000.0

    buf = ocean_masking.coastline_buffer(xe, ye, ze, land, pts_ecef, lat,
                                         10000.0, 0.01, "WGS84",
                                         block_size=5)
    assert buf.dtype == bool
    assert not buf[land].any()          # land never masked
    assert buf[0, 0]                    # far ocean masked out
    # cells just offshore stay unmasked
    near = (~land) & (dist < 5000.0)
    assert not buf[near].any()
