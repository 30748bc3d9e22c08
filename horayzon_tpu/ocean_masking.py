# Copyright (c) 2026
# MIT License
"""Ocean masking: coastline polygons, contours, distances and buffers.

Equivalent of reference ``horayzon/ocean_masking.py``
(get_gshhs_coastlines ocean_masking.py:23, coastline_contours :112,
coastline_distance :163, coastline_buffer :217).  Masking is a *work
reduction* device: cells outside the coastline buffer are skipped by the
horizon/shadow kernels (reference horizon_comp.cpp:749).

Optional dependencies are gated at call time: ``fiona``/``shapely`` for the
GSHHG polygon query, ``scikit-image`` for sub-cell contour tracing (a pure
NumPy edge-midpoint fallback is built in).  Distance queries use SciPy's
KDTree as in the reference.
"""

import os
import shutil
import time
import zipfile

import numpy as np
from scipy.spatial import KDTree

from horayzon_tpu import transform
from horayzon_tpu.auxiliary import get_path_aux_data
from horayzon_tpu.download import file as download_file


def get_gshhs_coastlines(domain):
    """Relevant GSHHS coastline polygons for a lon/lat domain.

    Mirrors reference ocean_masking.py:23-108: downloads GSHHG on first use,
    caches polygon bounding boxes to ``.npy``, queries them with an STRtree
    and crops intersecting polygons to the domain.  Requires the optional
    dependencies ``fiona`` and ``shapely``.
    """
    try:
        import fiona
        from shapely.geometry import shape, box
        from shapely.strtree import STRtree
    except ImportError as exc:
        raise ImportError("get_gshhs_coastlines requires the optional "
                          "dependencies 'fiona' and 'shapely'") from exc

    keys_req = ("lon_min", "lon_max", "lat_min", "lat_max")
    if not set(keys_req).issubset(set(domain.keys())):
        raise ValueError("one or multiple key(s) are missing in 'domain'")
    if (domain["lon_min"] >= domain["lon_max"]) \
            or (domain["lat_min"] >= domain["lat_max"]):
        raise ValueError("invalid domain extent")

    path_aux_data = get_path_aux_data()
    if not os.path.isdir(path_aux_data + "GSHHG"):
        file_url = ("http://www.soest.hawaii.edu/pwessel/gshhg/"
                    "gshhg-shp-2.3.7.zip")
        print("Download GSHHG data:")
        download_file(file_url, path_aux_data)
        file_zipped = path_aux_data + os.path.split(file_url)[-1]
        with zipfile.ZipFile(file_zipped, "r") as zip_ref:
            zip_ref.extractall(path_aux_data + "GSHHG")
        os.remove(file_zipped)
        shutil.rmtree(path_aux_data + "GSHHG/WDBII_shp/", ignore_errors=True)
        shutil.rmtree(path_aux_data + "GSHHG/GSHHS_shp/h/",
                      ignore_errors=True)
        shutil.rmtree(path_aux_data + "GSHHG/GSHHS_shp/i/",
                      ignore_errors=True)

    shp_file = path_aux_data + "GSHHG/GSHHS_shp/f/GSHHS_f_L1.shp"
    file_bbc = path_aux_data + "GSHHG/Bounding_boxes_coastlines.npy"
    if not os.path.isfile(file_bbc):
        ds = fiona.open(shp_file)
        bounds = np.empty((len(ds), 4), dtype=np.float32)
        for idx, var in enumerate(ds):
            bounds[idx, :] = shape(var["geometry"]).bounds
        ds.close()
        np.save(file_bbc, bounds)

    bounds = np.load(file_bbc)
    geoms = [box(xmin, ymin, xmax, ymax)
             for xmin, ymin, xmax, ymax in bounds]
    tree = STRtree(geoms)
    quer_rang = [domain["lon_min"], domain["lat_min"],
                 domain["lon_max"], domain["lat_max"]]
    ind = tree.query(box(*quer_rang))

    ds = fiona.open(shp_file)
    poly_all = [shape(ds[int(i)]["geometry"]) for i in ind]
    ds.close()
    print("Number of polygons: " + str(len(poly_all)))

    quer_rang_s = box(*quer_rang)
    poly_coastlines = []
    for poly in poly_all:
        if quer_rang_s.contains(poly):
            poly_coastlines.append(poly)
        elif quer_rang_s.intersects(poly):
            poly_coastlines.append(quer_rang_s.intersection(poly))
    return poly_coastlines


def _edge_midpoints(lon, lat, mask_bin):
    """Pure-NumPy fallback for contour points: midpoints of grid edges where
    the binary mask changes (sufficient for KDTree distance queries)."""
    m = mask_bin.astype(np.int8)
    pts = []
    dh = m[:, 1:] != m[:, :-1]   # horizontal neighbours differ
    ii, jj = np.nonzero(dh)
    if len(ii):
        pts.append(np.stack([(lon[jj] + lon[jj + 1]) / 2.0, lat[ii]],
                            axis=1))
    dv = m[1:, :] != m[:-1, :]
    ii, jj = np.nonzero(dv)
    if len(ii):
        pts.append(np.stack([lon[jj], (lat[ii] + lat[ii + 1]) / 2.0],
                            axis=1))
    if not pts:
        return []
    return [np.vstack(pts)]


def coastline_contours(lon, lat, mask_bin):
    """Coastline contours from a binary land-sea mask.

    Mirrors reference ocean_masking.py:112-160: contours are traced at the
    0.5 level and snapped to half-cell lon/lat coordinates.  Uses
    scikit-image when available; otherwise falls back to an unordered
    edge-midpoint point cloud (equivalent for distance queries).
    """
    lon = np.asarray(lon)
    lat = np.asarray(lat)
    mask_bin = np.asarray(mask_bin)
    if (lat.ndim != 1) or (lon.ndim != 1):
        raise ValueError("Input coordinates arrays must be 1-dimensional")
    if (mask_bin.shape[0] != len(lat)) or (mask_bin.shape[1] != len(lon)):
        raise ValueError("Input data has inconsistent dimension length(s)")
    if (mask_bin.dtype != np.uint8) or (len(np.unique(mask_bin)) != 2) \
            or (not np.all(np.unique(mask_bin) == [0, 1])):
        raise ValueError("'mask_bin' must be of type 'uint8' and may only "
                         "contain 0 and 1")
    try:
        from skimage.measure import find_contours
    except ImportError:
        return _edge_midpoints(lon, lat, mask_bin)

    contours = find_contours(mask_bin, 0.5, fully_connected="high")
    lon_ind = np.linspace(lon[0], lon[-1], len(lon) * 2 - 1)
    lat_ind = np.linspace(lat[0], lat[-1], len(lat) * 2 - 1)
    contours_latlon = []
    for c in contours:
        pts = np.empty(c.shape, dtype=np.float64)
        pts[:, 0] = lon_ind[(c[:, 1] * 2).astype(np.int32)]
        pts[:, 1] = lat_ind[(c[:, 0] * 2).astype(np.int32)]
        contours_latlon.append(pts)
    return contours_latlon


def coastline_distance(x_ecef, y_ecef, z_ecef, mask_land, pts_ecef):
    """Minimal chord distance between water cells and the coastline.

    Mirrors reference ocean_masking.py:163-214 (KDTree nearest-neighbour
    query); land cells get NaN."""
    x_ecef = np.asarray(x_ecef)
    mask_land = np.asarray(mask_land)
    if x_ecef.shape != mask_land.shape:
        raise ValueError("Input data has inconsistent dimension length(s)")
    if mask_land.dtype != np.bool_:
        raise ValueError("'mask_land' must be a boolean mask")
    tree = KDTree(pts_ecef)
    pts_quer = np.vstack((x_ecef[~mask_land], np.asarray(y_ecef)[~mask_land],
                          np.asarray(z_ecef)[~mask_land])).transpose()
    dist_quer, _ = tree.query(pts_quer, k=1, workers=-1)
    dist_chord = np.full(x_ecef.shape, np.nan, dtype=np.float64)
    dist_chord[~mask_land] = dist_quer
    return dist_chord


def coastline_buffer(x_ecef, y_ecef, z_ecef, mask_land, pts_ecef, lat,
                     dist_thr, dem_res, ellps, block_size=(5 * 2 + 1)):
    """Mask cells whose distance from the coastline exceeds ``dist_thr``.

    Mirrors reference ocean_masking.py:217-345: blocks of cells are first
    classified with a single centre query plus the block's maximal chord
    length; only ambiguous blocks fall through to per-cell queries.
    """
    x_ecef = np.asarray(x_ecef)
    y_ecef = np.asarray(y_ecef)
    z_ecef = np.asarray(z_ecef)
    mask_land = np.asarray(mask_land)
    lat = np.asarray(lat)
    if (x_ecef.shape != mask_land.shape) or (x_ecef.shape[0] != len(lat)):
        raise ValueError("Input data has inconsistent dimension length(s)")
    if mask_land.dtype != np.bool_:
        raise ValueError("'mask_land' must be a boolean mask")
    if ellps not in ("sphere", "WGS84", "GRS80"):
        raise ValueError("invalid value for 'ellps'")
    if block_size % 2 != 1:
        raise ValueError("Integer value for 'block_size' must be uneven")

    t_beg_func = time.time()
    # Maximal chord length across half a block (ocean_masking.py:269-283)
    lat_ini = np.maximum(np.abs(lat).min() - 1.0, 0.0)
    half = int((block_size - 1) / 2)
    lon_pair = np.array([0.0, dem_res * half], dtype=np.float64)
    lat_pair = np.array([lat_ini, lat_ini + dem_res * half],
                        dtype=np.float64)
    h_pair = np.zeros(2, dtype=np.float32)
    cx, cy, cz = transform.lonlat2ecef(lon_pair, lat_pair, h_pair,
                                       ellps=ellps)
    chord_max = float(np.sqrt(np.diff(cx) ** 2 + np.diff(cy) ** 2
                              + np.diff(cz) ** 2)[0])
    if chord_max > dist_thr:
        raise ValueError("Maximal chord distance is larger than 'dist_thr'")

    tree = KDTree(pts_ecef)
    slic = (slice(half, None, block_size), slice(half, None, block_size))
    pts_quer = np.vstack((x_ecef[slic].ravel(), y_ecef[slic].ravel(),
                          z_ecef[slic].ravel())).transpose()
    dist_quer, _ = tree.query(pts_quer, k=1, workers=-1)

    shp = x_ecef[slic].shape
    dist_2d = dist_quer.reshape(shp)
    mask_buffer = np.full(x_ecef.shape, -1, dtype=np.int32)
    blocks = np.full(dist_2d.shape, -1, dtype=np.int32)
    blocks[dist_2d <= (dist_thr - chord_max)] = 0   # inside buffer
    blocks[dist_2d > (dist_thr + chord_max)] = 1    # outside buffer
    slic_sd = (slice(0, shp[0] * block_size), slice(0, shp[1] * block_size))
    mask_buffer[slic_sd] = np.repeat(
        np.repeat(blocks, block_size, axis=0), block_size,
        axis=1)[:x_ecef.shape[0], :x_ecef.shape[1]]

    mask_rem = (mask_buffer == -1)
    frac = mask_rem.sum() / mask_buffer.size * 100.0
    print(f"Number of remaining grid cells: {mask_rem.sum()} "
          f"(fraction: {frac:.2f} %)")
    pts_quer = np.vstack((x_ecef[mask_rem], y_ecef[mask_rem],
                          z_ecef[mask_rem])).transpose()
    if len(pts_quer):
        dist_quer, _ = tree.query(pts_quer, k=1, workers=-1)
        mask_buffer[mask_rem] = (dist_quer > dist_thr).astype(np.int32)
    mask_buffer[mask_land] = 0
    print("Run time: %.2f" % (time.time() - t_beg_func) + " s")
    return mask_buffer.astype(bool)
